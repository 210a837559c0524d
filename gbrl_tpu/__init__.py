"""gbrl_tpu — TPU-native Gradient Boosted Trees for Reinforcement Learning.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of NVlabs/gbrl:
trees fit to per-sample policy/value gradients, learning rates applied by
optimizers at prediction time, shared/separate actor-critic ensembles,
control variates, SHAP, and multi-host data-parallel fitting over a device
mesh.
"""
from .config import TreeConfig, APPROVED_OPTIMIZERS, VALID_OPTIMIZER_ARGS  # noqa: F401
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
