"""gbrl_tpu — TPU-native Gradient Boosted Trees for Reinforcement Learning.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of NVlabs/gbrl:
trees fit to per-sample policy/value gradients, learning rates applied by
optimizers at prediction time, shared/separate actor-critic ensembles,
control variates, SHAP, and multi-host data-parallel fitting over a device
mesh.
"""
import os as _os


def _machine_fingerprint() -> str:
    """Short hash of the host's CPU feature set (+ arch).  XLA's CPU
    backend AOT-compiles for the build machine's features; loading such an
    entry on a host with different features can SIGILL
    (xla cpu_aot_loader "Compile machine features ... doesn't match"
    warnings observed when one shared cache dir served two hosts), so the
    cache directory is keyed per machine."""
    import hashlib
    import platform
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1]
                                                   .split()))
                    break
    except OSError:
        feats += " " + platform.processor()
    return hashlib.blake2b(feats.encode(), digest_size=6).hexdigest()


def _enable_persistent_compile_cache() -> None:
    """Persistent XLA compilation cache (opt-out: GBRL_TPU_NO_CACHE=1).

    The fused boosting programs compile in 10s of seconds on TPU targets;
    caching them on disk makes every process after the first start at full
    speed (measured: a fresh process's first fit_loop call 6.2s -> 3.6s on
    a small shape; the RL update programs save minutes).  Respects an
    existing user-configured cache dir.  The directory name embeds a CPU
    feature fingerprint so a cache populated on one machine is never
    loaded on a differently-featured one (see _machine_fingerprint)."""
    if _os.environ.get("GBRL_TPU_NO_CACHE"):
        return
    try:
        import jax
        if (jax.config.jax_compilation_cache_dir
                or _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            return
        # CPU-only processes skip the persistent cache entirely: XLA:CPU
        # AOT entries embed compiler pseudo-features (+prefer-no-scatter/
        # +prefer-no-gather) that never appear in the host feature probe,
        # so every cache LOAD warns "could lead to ... SIGILL" even on the
        # machine that wrote it — and CPU compiles are fast anyway.  The
        # cache exists for the 10s-of-seconds TPU program compiles.
        plat = (getattr(jax.config, "jax_platforms", None)
                or _os.environ.get("JAX_PLATFORMS", ""))
        if plat and plat.split(",")[0].strip().lower() == "cpu":
            return
        cache = _os.environ.get(
            "GBRL_TPU_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "gbrl_tpu",
                          "xla-" + _machine_fingerprint()))
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
