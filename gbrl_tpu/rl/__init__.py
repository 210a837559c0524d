"""Framework-native RL algorithms over GBT models (the reference delegates
algorithms to its companion repo GBRL_SB3, reference README.md:19).

PPO, A2C and AWR are production paths with head-to-head artifacts against
the unmodified reference core (examples/results_*_vs_ref.json).  SAC is
EXPERIMENTAL: it learns contextual-bandit tasks (tests/test_sac.py) and
runs at full speed, but does not solve Pendulum at small GBT budgets —
bootstrapped 1-step/n-step TD through boosted-tree critics leaves the
value head too flat for a useful dQ/da signal (diagnosis and swept
configurations: examples/sac_pendulum.py docstring, ROADMAP.md).
"""
from .buffers import RolloutBuffer  # noqa: F401
from .ppo import PPO  # noqa: F401
from .a2c import A2C  # noqa: F401
from .awr import AWR  # noqa: F401
from .sac import SAC  # noqa: F401
from .buffers import ReplayBuffer  # noqa: F401
