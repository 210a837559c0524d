"""gbrl_tpu — TPU-native Gradient Boosted Trees for Reinforcement Learning.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of NVlabs/gbrl:
trees fit to per-sample policy/value gradients, learning rates applied by
optimizers at prediction time, shared/separate actor-critic ensembles,
control variates, SHAP, and multi-host data-parallel fitting over a device
mesh.
"""
import os as _os


def _enable_persistent_compile_cache() -> None:
    """Persistent XLA compilation cache (opt-out: GBRL_TPU_NO_CACHE=1).

    The fused boosting programs compile in 10s of seconds on TPU targets;
    caching them on disk makes every process after the first start at full
    speed (measured: a fresh process's first fit_loop call 6.2s -> 3.6s on
    a small shape; the RL update programs save minutes).  Respects an
    existing user-configured cache dir."""
    if _os.environ.get("GBRL_TPU_NO_CACHE"):
        return
    try:
        import jax
        if (jax.config.jax_compilation_cache_dir
                or _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            return
        cache = _os.environ.get(
            "GBRL_TPU_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "gbrl_tpu",
                          "xla"))
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_persistent_compile_cache()

from .config import TreeConfig, APPROVED_OPTIMIZERS, VALID_OPTIMIZER_ARGS  # noqa: F401,E402
from .ensemble import Ensemble, init_ensemble  # noqa: F401
from .optimizers import OptimizerSpec  # noqa: F401
from .models import (GBTModel, ActorCritic, ParametricActor,  # noqa: F401
                     GaussianActor, ContinuousCritic, DiscreteCritic)
from .learners import (GBTLearner, MultiGBTLearner,  # noqa: F401
                       SharedActorCriticLearner, SeparateActorCriticLearner)

__version__ = "0.1.0"


def cuda_available() -> bool:
    """API-parity shim (reference: gbrl/__init__.py cuda_available). Always
    False: the accelerator here is TPU."""
    return False


def tpu_available() -> bool:
    import jax
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False
