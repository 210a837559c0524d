"""ctypes backend over the UNMODIFIED reference C++ core (via ref_shim.cpp),
plus a torch facade (`RefActorCritic`, `RefGaussianActorCritic`) with the same
call/step contract as gbrl_tpu.models.ActorCritic — so gbrl_tpu's RL classes
(rl/a2c.py, rl/awr.py) run UNCHANGED on top of the reference core for
head-to-head baselines on gymnasium envs with no C++ physics port.

Gradient convention: the GBT core fits `dL/dpred * n_samples` where L is the
mean loss — identical to ActorCritic.step (models/actor_critic.py:132-137)
and the reference binding (reference gbrl/models/base.py grads*n pattern).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np
import torch as th

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF_SRC = "/root/reference/gbrl/src/cpp"
_lib = None


def build_shim() -> str:
    so = os.path.join(_HERE, "ref_shim.so")
    src = os.path.join(_HERE, "ref_shim.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cpps = [os.path.join(_REF_SRC, f) for f in
            ("gbrl.cpp", "fitter.cpp", "node.cpp", "predictor.cpp",
             "split_candidate_generator.cpp", "optimizer.cpp",
             "scheduler.cpp", "loss.cpp", "math_ops.cpp", "types.cpp",
             "utils.cpp", "shap.cpp", "data_structs.cpp")]
    subprocess.run(
        ["g++", "-O3", "-fopenmp", "-std=c++14", "-shared", "-fPIC",
         f"-I{_REF_SRC}", "-I/root/reference/gbrl/include",
         src] + cpps + ["-o", so],
        check=True, capture_output=True)
    return so


def load_shim():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_shim())
        lib.ref_create.restype = ctypes.c_void_p
        lib.ref_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        lib.ref_set_optimizer.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float]
        lib.ref_set_feature_weights.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.ref_set_bias.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.ref_predict.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p]
        lib.ref_step.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int]
        lib.ref_num_trees.argtypes = [ctypes.c_void_p]
        lib.ref_num_trees.restype = ctypes.c_int
        lib.ref_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class RefModel:
    """Thin handle over one reference GBRL ensemble."""

    def __init__(self, input_dim: int, output_dim: int, policy_dim: int,
                 max_depth: int = 4, min_data_in_leaf: int = 0,
                 n_bins: int = 256, par_th: int = 2, cv_beta: float = 0.9,
                 score: str = "cosine", generator: str = "Quantile",
                 use_cv: bool = False, batch_size: int = 5000,
                 grow_policy: str = "oblivious", verbose: int = 0):
        self.lib = load_shim()
        self.F, self.O = input_dim, output_dim
        self.h = self.lib.ref_create(
            input_dim, output_dim, policy_dim, max_depth, min_data_in_leaf,
            n_bins, par_th, cv_beta, score.encode(), generator.encode(),
            int(use_cv), batch_size, grow_policy.encode(), verbose)
        w = np.ones(input_dim, dtype=np.float32)
        self.lib.ref_set_feature_weights(
            self.h, w.ctypes.data_as(ctypes.c_void_p), input_dim)

    def set_optimizer(self, algo: str, lr: float, start_idx: int,
                      stop_idx: int, scheduler: str = "Const",
                      stop_lr: float = 1.0e-4, T: int = 10000,
                      beta_1: float = 0.9, beta_2: float = 0.999,
                      eps: float = 1.0e-8, shrinkage: float = 1.0e-5):
        self.lib.ref_set_optimizer(
            self.h, algo.encode(), scheduler.encode(), lr, start_idx,
            stop_idx, stop_lr, T, beta_1, beta_2, eps, shrinkage)

    def predict(self, obs: np.ndarray) -> np.ndarray:
        obs = np.ascontiguousarray(obs, dtype=np.float32)
        if obs.ndim == 1:
            obs = obs.reshape(1, -1)
        n = obs.shape[0]
        out = np.empty((n, self.O), dtype=np.float32)
        self.lib.ref_predict(self.h, obs.ctypes.data_as(ctypes.c_void_p),
                             n, self.F, self.O,
                             out.ctypes.data_as(ctypes.c_void_p))
        return out

    def step(self, obs: np.ndarray, grads: np.ndarray):
        obs = np.ascontiguousarray(obs, dtype=np.float32)
        grads = np.ascontiguousarray(grads, dtype=np.float32)
        self.lib.ref_step(self.h, obs.ctypes.data_as(ctypes.c_void_p),
                          grads.ctypes.data_as(ctypes.c_void_p),
                          obs.shape[0], self.F)

    def get_num_trees(self) -> int:
        return self.lib.ref_num_trees(self.h)

    def set_feature_weights(self, w: np.ndarray):
        w = np.ascontiguousarray(w, dtype=np.float32)
        self.lib.ref_set_feature_weights(
            self.h, w.ctypes.data_as(ctypes.c_void_p), self.F)

    def set_bias(self, bias: np.ndarray):
        bias = np.ascontiguousarray(bias, dtype=np.float32).reshape(-1)
        self.lib.ref_set_bias(self.h,
                              bias.ctypes.data_as(ctypes.c_void_p), self.O)

    def __del__(self):
        try:
            self.lib.ref_free(self.h)
        except Exception:
            pass


def _row_clip(g: np.ndarray, max_norm) -> np.ndarray:
    """Per-sample L2 gradient clip (reference gbrl/common/utils.py
    clip_grad_norm semantics)."""
    if not max_norm:
        return g
    norms = np.sqrt((g * g).sum(axis=-1, keepdims=True))
    return g * np.minimum(1.0, max_norm / (norms + 1e-8))


class _RefLearnerShim:
    """Just enough learner surface for gbrl_tpu.rl facades' capability
    probes (no vocab, no student model, no mirror)."""
    vocab = None
    student_model = None
    specs = ()


class RefGaussianActor:
    """Reference-core stand-in for gbrl_tpu.models.GaussianActor
    (fixed-std mode) with the __call__/step contract used by rl/awr.py."""

    def __init__(self, input_dim: int, act_dim: int, actor_lr: float,
                 log_std_init: float = -0.5,
                 tree_struct: Optional[dict] = None,
                 feature_weights: Optional[np.ndarray] = None,
                 batch_size: int = 5000):
        ts = dict(max_depth=4, n_bins=256, min_data_in_leaf=0, par_th=2,
                  grow_policy="oblivious")
        ts.update(tree_struct or {})
        self.act_dim = act_dim
        self.log_std_init = log_std_init
        self.model = RefModel(
            input_dim, act_dim, policy_dim=act_dim,
            max_depth=ts["max_depth"], n_bins=ts["n_bins"],
            min_data_in_leaf=ts["min_data_in_leaf"], par_th=ts["par_th"],
            batch_size=batch_size, grow_policy=ts["grow_policy"])
        self.model.set_optimizer("SGD", actor_lr, 0, act_dim)
        if feature_weights is not None:
            self.model.set_feature_weights(feature_weights)
        self.learner = _RefLearnerShim()
        self.params = None
        self.inputs = None

    def __call__(self, observations, requires_grad: bool = True):
        obs = np.asarray(observations, dtype=np.float32)
        mu = th.tensor(self.model.predict(obs), requires_grad=requires_grad)
        log_std = th.full_like(mu.detach(), self.log_std_init)
        if requires_grad:
            self.params = mu
            self.inputs = obs
        return mu, log_std

    def step(self, mu_grad_clip=None, log_std_grad_clip=None):
        n = len(self.inputs)
        g = self.params.grad.detach().numpy() * n
        g = _row_clip(g, mu_grad_clip)
        self.model.step(self.inputs, g)
        self.inputs = None

    def get_num_trees(self) -> int:
        return self.model.get_num_trees()


class RefGBTModel:
    """Reference-core stand-in for gbrl_tpu.models.GBTModel (scalar-output
    critic) with the __call__/step contract used by rl/awr.py."""

    def __init__(self, input_dim: int, lr: float,
                 tree_struct: Optional[dict] = None,
                 feature_weights: Optional[np.ndarray] = None,
                 batch_size: int = 5000):
        ts = dict(max_depth=4, n_bins=256, min_data_in_leaf=0, par_th=2,
                  grow_policy="oblivious")
        ts.update(tree_struct or {})
        self.model = RefModel(
            input_dim, 1, policy_dim=1, max_depth=ts["max_depth"],
            n_bins=ts["n_bins"], min_data_in_leaf=ts["min_data_in_leaf"],
            par_th=ts["par_th"], batch_size=batch_size,
            grow_policy=ts["grow_policy"])
        self.model.set_optimizer("SGD", lr, 0, 1)
        if feature_weights is not None:
            self.model.set_feature_weights(feature_weights)
        self.learner = _RefLearnerShim()
        self.params = None
        self.inputs = None

    def __call__(self, observations, requires_grad: bool = True,
                 tensor: bool = True):
        obs = np.asarray(observations, dtype=np.float32)
        preds = self.model.predict(obs)[:, 0]
        if not tensor:
            return preds
        v = th.tensor(preds, requires_grad=requires_grad)
        if requires_grad:
            self.params = v
            self.inputs = obs
        return v

    def set_bias_from_targets(self, targets):
        # reference GBTModel.set_bias_from_targets: bias = mean(targets)
        self.model.set_bias(
            np.asarray([np.mean(np.asarray(targets))], dtype=np.float32))

    def step(self):
        n = len(self.inputs)
        g = self.params.grad.detach().numpy().reshape(n, 1) * n
        self.model.step(self.inputs, g)
        self.inputs = None

    def get_num_trees(self) -> int:
        return self.model.get_num_trees()


class RefActorCritic:
    """Reference-core stand-in for gbrl_tpu.models.ActorCritic (shared
    tree, discrete policy head + scalar value tail) with the same
    __call__/step contract used by rl/a2c.py."""

    def __init__(self, input_dim: int, n_actions: int,
                 policy_algo: str = "Adam", policy_lr: float = 0.05,
                 value_lr: float = 0.01, control_variates: bool = True,
                 tree_struct: Optional[dict] = None,
                 batch_size: int = 5000):
        ts = dict(max_depth=4, n_bins=256, min_data_in_leaf=0, par_th=2,
                  grow_policy="oblivious")
        ts.update(tree_struct or {})
        O = n_actions + 1
        self.n_actions = n_actions
        self.model = RefModel(
            input_dim, O, policy_dim=n_actions, max_depth=ts["max_depth"],
            min_data_in_leaf=ts["min_data_in_leaf"], n_bins=ts["n_bins"],
            par_th=ts["par_th"], use_cv=control_variates,
            batch_size=batch_size, grow_policy=ts["grow_policy"])
        self.model.set_optimizer(policy_algo, policy_lr, 0, n_actions)
        self.model.set_optimizer("SGD", value_lr, n_actions, O)
        self.params = None
        self.inputs = None
        # rl/a2c.py probes these to decide the mirror path; the reference
        # core serves its own fast CPU predicts, so no mirror
        self.learner = self

    def __call__(self, observations, requires_grad: bool = True):
        obs = np.asarray(observations, dtype=np.float32)
        preds = self.model.predict(obs)
        theta = th.tensor(preds[:, :self.n_actions],
                          requires_grad=requires_grad)
        value = th.tensor(preds[:, self.n_actions],
                          requires_grad=requires_grad)
        if requires_grad:
            self.params = (theta, value)
            self.inputs = obs
        return theta, value

    def step(self):
        theta, value = self.params
        n = len(self.inputs)
        grads = np.concatenate(
            [theta.grad.detach().numpy() * n,
             value.grad.detach().numpy().reshape(-1, 1) * n],
            axis=1)
        self.model.step(self.inputs, grads)
        self.inputs = None

    def get_num_trees(self) -> int:
        return self.model.get_num_trees()
