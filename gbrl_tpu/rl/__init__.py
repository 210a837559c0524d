from .buffers import RolloutBuffer  # noqa: F401
from .ppo import PPO  # noqa: F401
from .a2c import A2C  # noqa: F401
from .awr import AWR  # noqa: F401
from .sac import SAC  # noqa: F401
from .buffers import ReplayBuffer  # noqa: F401
