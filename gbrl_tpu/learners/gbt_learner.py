"""GBTLearner: single-ensemble learner (reference: gbrl/learners/gbt_learner.py:43-581).

Owns one Ensemble pytree and drives the jit'd boosting/prediction programs.
Replaces the reference's pybind ``GBRL_CPP`` handle; checkpointing uses a
single .npz + JSON sidecar instead of the versioned binary format
(gbrl.cpp:1130-1252) and supports training continuation after load.
"""
from __future__ import annotations

import functools
import json
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TreeConfig
from ..ensemble import (Ensemble, ensemble_from_numpy, ensemble_to_numpy,
                        ensure_capacity, init_ensemble)
from ..optimizers import OptimizerSpec, adam_delta
from ..ops.boosting import boost_step, fit_loop, predict_sgd
from ..common.utils import (CategoryVocab, NumericalData, ensure_2d,
                            get_index_mapping, is_torch, preprocess_features,
                            to_numpy, validate_array)
from .base import BaseLearner

SAVE_SUFFIX = ".gbrl_model"


def _fast_cache_key_threshold() -> Optional[int]:
    """Opt-in threshold (bytes) above which predict-cache keys may use the
    O(1MB) probabilistic strided scheme instead of hashing every byte.

    Default: None — EXACT hashing for all sizes (blake2b at ~600 MB/s
    costs ~1.7 ms/MB, measured; a 64 MB rollout is ~110 ms once per
    update phase).  Set ``GBRL_TPU_FAST_CACHE_KEY_MB=<n>`` to re-enable
    the strided keying for arrays above n MB when that cost matters."""
    import os
    v = os.environ.get("GBRL_TPU_FAST_CACHE_KEY_MB", "")
    if not v:
        return None
    try:
        return int(float(v) * (1 << 20))
    except ValueError:
        return None


@functools.partial(jax.jit, static_argnums=(0, 3))
def _predict_jit(cfg: TreeConfig, ens: Ensemble, Xn, specs, start_tree,
                 stop_tree, Xc=None):
    preds = predict_sgd(cfg, ens, Xn, specs, start_tree, stop_tree, Xc)
    for spec in specs:
        if spec.algo == "Adam":
            preds = preds - adam_delta(cfg, ens, Xn, spec, start_tree,
                                       stop_tree, Xc)
    return preds


@functools.partial(jax.jit, static_argnums=(0, 3))
def _predict_delta_jit(cfg: TreeConfig, ens: Ensemble, Xn, specs, start_tree):
    """Bias-free sum of SGD tree updates over [start_tree, n_trees) — the
    incremental part added on top of a cached prediction."""
    from ..optimizers import sgd_coeff
    from ..ops.predict import weighted_leaf_sum
    coeff = sgd_coeff(specs, ens.capacity, cfg.output_dim, ens.n_trees,
                      start_tree, ens.capacity)
    return weighted_leaf_sum(cfg, ens, Xn, coeff)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _predict_one_tree_jit(cfg: TreeConfig, ens: Ensemble, Xn, specs, t):
    """SGD update of the single tree at (traced) index t: O(N * depth) work
    regardless of ensemble size — powers the incremental predict cache."""
    from ..optimizers import scheduler_lr
    from ..ops.predict import single_tree_leaf_values

    def sl(arr):
        return jax.lax.dynamic_slice(
            arr, (t,) + (0,) * (arr.ndim - 1),
            (1,) + arr.shape[1:])[0]

    tree = dict(feat=sl(ens.feat), thr=sl(ens.thr),
                cat_code=sl(ens.cat_code), is_split=sl(ens.is_split),
                is_numeric=sl(ens.is_numeric),
                leaf_values=sl(ens.leaf_values))
    v = single_tree_leaf_values(cfg, tree, Xn)          # [N, O]
    O = cfg.output_dim
    coeff = jnp.zeros((O,), dtype=jnp.float32)
    j = jnp.arange(O)
    for spec in specs:
        mask = ((j >= spec.start_idx) & (j < spec.stop_idx)
                ).astype(jnp.float32)
        coeff = coeff - scheduler_lr(spec, t) * mask
    return v * coeff[None, :]


class GBTLearner(BaseLearner):
    def __init__(self, input_dim: int, output_dim: int, tree_struct: Dict,
                 optimizers: Union[Dict, List[Dict], None],
                 params: Dict = None, verbose: int = 0, device: str = "tpu",
                 policy_dim: int = 0, name: str = "GBRL"):
        super().__init__(input_dim, output_dim, tree_struct, optimizers,
                         params, verbose, device)
        self.learner_name = name
        if policy_dim:
            self.cfg = self.cfg.replace(policy_dim=policy_dim)
        self.ens: Optional[Ensemble] = None
        self.specs: Tuple[OptimizerSpec, ...] = ()
        self.feature_weights = np.ones(input_dim, dtype=np.float32)
        fw = self.params.get("feature_weights")
        if fw is not None:
            fw = np.asarray(fw, dtype=np.float32).reshape(-1)
            assert len(fw) == input_dim, \
                "feature weights dim must equal input dim"
            assert (fw >= 0).all(), "feature weights must be non-negative"
            self.feature_weights = fw
        self.vocab: Optional[CategoryVocab] = None
        self._mapping_set = False
        self.num_mask = np.ones(input_dim, dtype=bool)   # original-order mask
        self.total_iterations = 0
        self.student_model: Optional["GBTLearner"] = None
        self._pred_cache = None   # (input-hash, n_trees, preds) for SGD delta

    # ------------------------------------------------------------------ setup
    def reset(self) -> None:
        if self.optimizers is not None:
            self.specs = tuple(OptimizerSpec.from_dict(o)
                               for o in self.optimizers)
            self._validate_specs()
        self.ens = init_ensemble(self.cfg)
        self._mapping_set = False
        self.total_iterations = 0
        self._pred_cache = None
        self._rl_host_n_trees = None   # RL loops re-arm their host counter

    def _validate_specs(self) -> None:
        """Column-range validation (reference: gbrl.cpp:452-525)."""
        assert len(self.specs) <= self.output_dim, \
            "number of optimizers must be <= output_dim"
        for s in self.specs:
            assert 0 <= s.start_idx < s.stop_idx <= self.output_dim, \
                f"optimizer range [{s.start_idx}, {s.stop_idx}) invalid for " \
                f"output_dim {self.output_dim}"

    def set_feature_mapping(self, num_mask: np.ndarray) -> None:
        """Record which original columns are numeric (first-step lazy setup,
        reference: gbt_learner.py:124-128, gbrl.cpp:271-316)."""
        num_mask = np.asarray(num_mask, dtype=bool)
        assert len(num_mask) == self.input_dim
        self.num_mask = num_mask
        n_num = int(num_mask.sum())
        n_cat = self.input_dim - n_num
        self.cfg = self.cfg.replace(n_num_features=n_num, n_cat_features=n_cat)
        if n_cat > 0 and self.vocab is None:
            self.vocab = CategoryVocab(n_cat)
        self._mapping_set = True

    def _internal_feature_weights(self) -> jnp.ndarray:
        """Per-internal-feature weights in [num block | cat block] order.

        Maps through the original-column positions for both grow policies
        (the reference maps only for oblivious, fitter.cpp:431-435, and
        indexes greedily by internal position, fitter.cpp:331-332 — an
        inconsistency that only differs on mixed num/cat inputs)."""
        order = np.concatenate([np.where(self.num_mask)[0],
                                np.where(~self.num_mask)[0]])
        return jnp.asarray(self.feature_weights[order])

    def _n_codes(self) -> int:
        """Static (power-of-two padded) categorical code-space bound so the
        jit signature only changes O(log vocab) times as the vocab grows."""
        if self.vocab is None:
            return 0
        mx = max((len(m) for m in self.vocab.maps), default=0)
        n = 8
        while n < mx:
            n *= 2
        return n

    def _infer_mapping_from(self, inputs) -> None:
        if self._mapping_set:
            return
        _, num_mask = get_index_mapping(inputs)
        if len(num_mask) != self.input_dim:
            # tuple input or already-split data: assume numeric-first layout
            num, cat = preprocess_features(inputs)
            n_num = 0 if num is None else num.shape[1]
            num_mask = np.zeros(self.input_dim, dtype=bool)
            num_mask[:n_num] = True
        self.set_feature_mapping(num_mask)

    def _disambiguate_1d(self, inputs):
        """1D input of length input_dim is one sample; otherwise it is a
        column of input_dim == 1 (binding.cpp:820-930)."""
        if isinstance(inputs, tuple):
            return inputs
        arr = inputs
        nd = arr.ndim if hasattr(arr, "ndim") else np.asarray(arr).ndim
        if nd == 1:
            n = len(arr)
            if n == self.input_dim and self.input_dim > 1:
                return arr.reshape(1, -1) if hasattr(arr, "reshape") else \
                    np.asarray(arr).reshape(1, -1)
            return arr.reshape(-1, 1) if hasattr(arr, "reshape") else \
                np.asarray(arr).reshape(-1, 1)
        return inputs

    def _prepare(self, inputs, grow_vocab: bool, with_key: bool = False):
        """inputs -> (Xn [N, Fn] jnp, Xc codes [N, Fc] jnp | None[, key])."""
        inputs = self._disambiguate_1d(inputs)
        num, cat = preprocess_features(inputs)
        self._infer_mapping_from(inputs)
        if num is None:
            num = np.zeros((cat.shape[0], 0), dtype=np.float32)
        Xn = jnp.asarray(num)
        Xc = None
        codes = None
        if cat is not None and cat.shape[1] > 0:
            codes = self.vocab.encode(cat, grow=grow_vocab)
            Xc = jnp.asarray(codes)
        if not with_key:
            return Xn, Xc
        import hashlib
        h = hashlib.blake2b(digest_size=16)
        fast_over = _fast_cache_key_threshold()
        for arr in ((num,) if codes is None else (num, codes)):
            a = np.ascontiguousarray(arr)
            h.update(str(a.shape).encode())
            if fast_over is None or a.nbytes <= fast_over:
                # EXACT keying (default): hash every byte.  blake2b runs at
                # ~600 MB/s on this class of host, so typical RL replay
                # buffers (1-8 MB) cost 1.5-12 ms once per update phase —
                # cheap insurance against a collision silently serving
                # stale predictions.
                h.update(memoryview(a).cast("B"))
            else:
                # opt-in O(1MB) probabilistic keying for huge buffers
                # (GBRL_TPU_FAST_CACHE_KEY_MB): two coprime-strided ~1MB
                # subsamples (one offset mid-array) + per-row and global
                # float64 sums.  Collisions require agreement on both
                # stride lattices AND every row sum — permutations and
                # compensating in-row edits are caught — but this is
                # probabilistic, not exact.
                flat = a.reshape(-1)
                step = max(1, (flat.size * flat.itemsize) >> 20)
                h.update(flat[::step].tobytes())
                step2 = step + 1
                h.update(flat[(step // 2)::step2].tobytes())
                if a.ndim == 2:
                    h.update(a.sum(axis=1, dtype=np.float64).tobytes())
                h.update(np.asarray(
                    flat.sum(dtype=np.float64)).tobytes())
        return Xn, Xc, h.digest()

    # ------------------------------------------------------------------ train
    def step(self, inputs: NumericalData, grads: NumericalData) -> None:
        """One boosting iteration on per-sample gradients
        (reference: gbt_learner.py:105-148 -> GBRL::step -> Fitter::step_cpu)."""
        assert self.ens is not None, "call reset() first"
        Xn, Xc = self._prepare(inputs, grow_vocab=True)
        n = int(Xn.shape[0]) if Xn.shape[1] > 0 else int(Xc.shape[0])
        if isinstance(grads, tuple):
            arrs = [to_numpy(gr).reshape(n, -1) for gr in grads]
            grads = np.concatenate(arrs, axis=1)
        g = to_numpy(grads).reshape(n, -1)
        assert g.shape[1] == self.output_dim, \
            f"grads dim {g.shape[1]} != output_dim {self.output_dim}"
        self.ens = ensure_capacity(self.ens, int(self.ens.n_trees) + 1)
        fw = self._internal_feature_weights()
        n_num = self.cfg.n_num_features
        fw_num, fw_cat = fw[:n_num], fw[n_num:]
        self.ens = boost_step(self.cfg, self.ens, Xn, jnp.asarray(g),
                              fw_num, Xc, fw_cat, self._n_codes())
        self.total_iterations += 1
        if getattr(self, "_rl_host_n_trees", None) is not None:
            self._rl_host_n_trees += 1   # keep the RL host counter exact

    def fit(self, features: NumericalData, targets: NumericalData,
            iterations: int, shuffle: bool = True,
            loss_type: str = "MultiRMSE", seed: int = 42) -> float:
        """Supervised multi-iteration fit (reference: gbt_learner.py:150-183,
        GBRL::fit gbrl.cpp:983-1104: SGD-only, host-side shuffle,
        bias = mean(targets), cycling mini-batches)."""
        assert self.ens is not None, "call reset() first"
        assert loss_type == "MultiRMSE", "only MultiRMSE is implemented"
        for s in self.specs:
            if s.algo == "Adam":
                raise RuntimeError(
                    "Adam optimizer not supported in fit function. Use SGD")
        num, cat = preprocess_features(features)
        self._infer_mapping_from(features)
        y = ensure_2d(to_numpy(targets))
        codes = None
        if cat is not None:
            codes = self.vocab.encode(cat, grow=True)
        X = num if num is not None else np.zeros((y.shape[0], 0), np.float32)
        N = X.shape[0]
        if shuffle:
            perm = np.random.default_rng(seed).permutation(N)
            X, y = X[perm], y[perm]
            if codes is not None:
                codes = codes[perm]
        bs = min(self.cfg.batch_size, N)
        n_pad = ((N + bs - 1) // bs) * bs
        Xp = np.zeros((n_pad, X.shape[1]), dtype=np.float32)
        yp = np.zeros((n_pad, y.shape[1]), dtype=np.float32)
        Xp[:N], yp[:N] = X, y
        Xcp = None
        if codes is not None:
            # padded rows reuse row 0's codes; masked out of counts/loss
            Xcp = np.zeros((n_pad, codes.shape[1]), dtype=np.int32)
            Xcp[:N] = codes
            Xcp[N:] = codes[0] if N > 0 else 0
            Xcp = jnp.asarray(Xcp)
        self.ens = ensure_capacity(self.ens, int(self.ens.n_trees) + iterations)
        self.ens = self.ens.replace(bias=jnp.asarray(y.mean(axis=0)))
        self._pred_cache = None
        # host mirrors skip the bias fetch when the version matches — every
        # bias write must bump it or a live mirror serves the stale bias
        self._bias_version = getattr(self, "_bias_version", 0) + 1
        fw = self._internal_feature_weights()
        n_num = self.cfg.n_num_features
        self.ens, loss, per_iter = fit_loop(
            self.cfg, int(iterations), self.ens, jnp.asarray(Xp),
            jnp.asarray(yp), jnp.int32(N), self.specs,
            fw[:n_num], Xcp, fw[n_num:], self._n_codes())
        self._last_fit_losses = np.asarray(per_iter)
        if getattr(self, "_rl_host_n_trees", None) is not None:
            self._rl_host_n_trees += int(iterations)
        if self.verbose > 0:
            # per-iteration batch loss (fitter.cpp:232-234)
            for i, l in enumerate(self._last_fit_losses):
                print(f"Boosting iteration: {i + 1} - MultiRMSE Loss: {l}")
        self.total_iterations += int(iterations)
        return float(loss)

    # -------------------------------------------------------------- inference
    def predict(self, inputs: NumericalData, requires_grad: bool = True,
                start_idx: int = 0, stop_idx: Optional[int] = None,
                tensor: bool = True):
        """Ensemble prediction over trees [start_idx, stop_idx)
        (reference: gbt_learner.py:455-500).  Returns a torch leaf tensor
        (requires_grad) or numpy array.

        Full-range SGD predictions on a repeated input are served
        incrementally: only trees added since the cached call are evaluated
        (leaf values are immutable once fit, so cache + delta reproduces a
        full predict).  Input identity is established by an EXACT blake2b
        content hash of every byte (default; ~1.7 ms/MB measured).  Setting
        ``GBRL_TPU_FAST_CACHE_KEY_MB=<n>`` switches batches above n MB to
        an O(1MB) strided probabilistic key — documented opt-in, not the
        default, because a collision would silently serve stale
        predictions.  This makes the predict-inside-training-loop pattern
        O(new trees)."""
        assert self.ens is not None, "call reset() first"
        Xn, Xc, key = self._prepare(inputs, grow_vocab=False, with_key=True)
        n_trees = int(self.ens.n_trees)
        cacheable = ((start_idx in (0, None)) and (stop_idx in (None, 0))
                     and Xc is None
                     and all(s.algo == "SGD" for s in self.specs))
        preds = None
        if cacheable and self._pred_cache is not None:
            ckey, cn, cpred = self._pred_cache
            if ckey == key and cn <= n_trees and \
                    cpred.shape[0] == Xn.shape[0]:
                if cn == n_trees:
                    preds = cpred
                elif n_trees - cn <= 8:
                    # few new trees: evaluate each alone, O(k * N * depth)
                    preds = cpred
                    for t in range(cn, n_trees):
                        preds = preds + np.asarray(_predict_one_tree_jit(
                            self.cfg, self.ens, Xn, self.specs,
                            jnp.int32(t)))
                else:
                    delta = _predict_delta_jit(self.cfg, self.ens, Xn,
                                               self.specs, jnp.int32(cn))
                    preds = cpred + np.asarray(delta)
        if preds is None:
            stop = stop_idx if stop_idx else int(self.ens.capacity)
            preds = np.asarray(_predict_jit(
                self.cfg, self.ens, Xn, self.specs,
                jnp.int32(start_idx or 0), jnp.int32(stop), Xc))
        if cacheable:
            self._pred_cache = (key, n_trees, preds)
        out = preds
        if self.student_model is not None:
            out = out + np.asarray(self.student_model.predict(
                inputs, requires_grad=False, tensor=False)).reshape(out.shape)
        if self.output_dim == 1:
            out = out.reshape(-1)     # binding.cpp:282-283: 1D for out_dim 1
        if tensor:
            import torch as th
            t = th.from_numpy(np.ascontiguousarray(out).copy())
            if requires_grad:
                t.requires_grad_(True)
            return t
        return out

    def predict_async(self, inputs: NumericalData):
        """Dispatch a full-ensemble SGD prediction WITHOUT waiting for the
        result: returns the raw device array [N, output_dim].

        Powers pipelined rollouts: the caller fetches (np.asarray) one env
        group's predictions while other groups' predicts are in flight, so
        device round-trip latency overlaps with host env stepping."""
        assert self.ens is not None, "call reset() first"
        Xn, Xc = self._prepare(inputs, grow_vocab=False)
        out = _predict_jit(self.cfg, self.ens, Xn, self.specs,
                           jnp.int32(0), jnp.int32(self.ens.capacity), Xc)
        # start the d2h transfer now so the later np.asarray is ~free
        # (device->host copies otherwise only begin at fetch time)
        out.copy_to_host_async()
        return out

    # ----------------------------------------------------------- introspection
    def get_iteration(self) -> int:
        return int(self.ens.n_trees) if self.ens is not None else 0

    def get_num_trees(self) -> int:
        return int(self.ens.n_trees) if self.ens is not None else 0

    def get_total_iterations(self) -> int:
        return self.total_iterations

    def get_schedule_learning_rates(self):
        from ..optimizers import scheduler_lr
        t = jnp.int32(self.get_iteration())
        lrs = [float(scheduler_lr(s, t)) for s in self.specs]
        return lrs[0] if len(lrs) == 1 else tuple(lrs)

    def get_optimizers(self) -> list:
        """Full optimizer configuration as a list of dicts, one per
        optimizer, using the reference binding's field names
        (binding.cpp:393-419 optimizerToDict; its literal ``"eps]"`` key
        is corrected to ``"eps"`` here)."""
        return [dict(algo=s.algo, init_lr=float(s.init_lr),
                     start_idx=int(s.start_idx),
                     stop_idx=int(s.stop_idx) if s.stop_idx
                     else self.output_dim,
                     scheduler_func=s.scheduler, stop_lr=float(s.stop_lr),
                     T=int(s.T), beta_1=float(s.beta_1),
                     beta_2=float(s.beta_2), eps=float(s.eps))
                for s in self.specs]

    def set_bias(self, bias) -> None:
        b = to_numpy(bias).reshape(-1)
        assert len(b) == self.output_dim, \
            f"bias length {len(b)} != output_dim {self.output_dim}"
        self.ens = self.ens.replace(bias=jnp.asarray(b))
        self._pred_cache = None   # bias is baked into cached predictions
        # version stamp lets host mirrors skip the per-sync bias fetch
        self._bias_version = getattr(self, "_bias_version", 0) + 1

    def get_bias(self) -> np.ndarray:
        return np.asarray(self.ens.bias)

    def set_feature_weights(self, feature_weights) -> None:
        if np.isscalar(feature_weights):
            fw = np.full(self.input_dim, feature_weights, dtype=np.float32)
        else:
            fw = to_numpy(feature_weights).reshape(-1)
        assert len(fw) == self.input_dim, \
            "feature weights dim must equal input dim"
        assert (fw >= 0).all(), "feature weights must be non-negative"
        self.feature_weights = fw

    def get_feature_weights(self) -> np.ndarray:
        return self.feature_weights.copy()

    def get_device(self) -> str:
        return self.device

    def get_metadata(self) -> Dict:
        """Metadata dict (analog of binding.cpp get_metadata:309-328)."""
        from ..utils.introspection import get_ensemble_metadata
        return get_ensemble_metadata(self.cfg, self.ens)

    def get_ensemble_data(self) -> Dict[str, np.ndarray]:
        """All SoA ensemble arrays as numpy (binding.cpp:330-390)."""
        from ..utils.introspection import get_ensemble_data
        return get_ensemble_data(self.cfg, self.ens)

    def print_ensemble_metadata(self) -> None:
        c = self.cfg
        print(f"GBRL-TPU ensemble: trees={self.get_num_trees()} "
              f"output_dim={c.output_dim} max_depth={c.max_depth} "
              f"n_bins={c.n_bins} policy={c.grow_policy} "
              f"score={c.split_score_func} generator={c.generator_type} "
              f"cv={c.use_control_variates}")

    def print_tree(self, tree_idx: int) -> None:
        from ..utils.introspection import format_tree
        print(format_tree(self.cfg, self.ens, tree_idx))

    def plot_tree(self, tree_idx: int, filename: str) -> None:
        from ..utils.introspection import plot_tree
        plot_tree(self.cfg, self.ens, tree_idx, filename)

    def tree_shap(self, tree_idx: int, features,
                  ref_compat: bool = False) -> np.ndarray:
        """SHAP values of one tree [N, input_dim, output_dim] — computed on
        device (the reference is CPU-only here, gbrl.cpp:1271-1278).

        ``ref_compat=True`` instead reproduces the reference C++
        implementation bit-for-bit on host, including its nearest-ancestor
        convention for repeated path features, which deviates from exact
        Shapley (see ops/shap_refcompat.py)."""
        Xn, Xc = self._prepare(features, grow_vocab=False)
        if ref_compat:
            from ..ops.shap_refcompat import ensemble_shap_ref_compat
            return ensemble_shap_ref_compat(
                self.cfg, self.ens, np.asarray(Xn),
                None if Xc is None else np.asarray(Xc), tree_idx=tree_idx)
        from ..ops.shap_device import ensemble_shap_device
        return np.asarray(ensemble_shap_device(
            self.cfg, self.ens, Xn, Xc, self.input_dim,
            jnp.int32(tree_idx)))

    def shap(self, features, ref_compat: bool = False) -> np.ndarray:
        """Ensemble SHAP values [N, input_dim, output_dim].

        Default: exact path-dependent TreeSHAP on device (matches
        brute-force Shapley enumeration and the ``shap`` package's
        TreeExplainer semantics).  ``ref_compat=True`` reproduces the
        reference C++ outputs exactly (ops/shap_refcompat.py)."""
        Xn, Xc = self._prepare(features, grow_vocab=False)
        if ref_compat:
            from ..ops.shap_refcompat import ensemble_shap_ref_compat
            return ensemble_shap_ref_compat(
                self.cfg, self.ens, np.asarray(Xn),
                None if Xc is None else np.asarray(Xc))
        from ..ops.shap_device import ensemble_shap_device
        return np.asarray(ensemble_shap_device(self.cfg, self.ens, Xn, Xc,
                                               self.input_dim))

    # ------------------------------------------------------------- checkpoint
    def save(self, filename: str) -> None:
        filename = _with_suffix(filename)
        state = ensemble_to_numpy(self.ens)
        meta = dict(
            input_dim=self.input_dim, output_dim=self.output_dim,
            tree_struct=self.tree_struct, params={
                k: v for k, v in self.params.items()
                if k != "feature_weights"},
            optimizers=self.optimizers, verbose=self.verbose,
            device=self.device, total_iterations=self.total_iterations,
            num_mask=self.num_mask.tolist(),
            mapping_set=self._mapping_set,
            vocab=self.vocab.to_state() if self.vocab else None,
        )
        with open(filename, "wb") as f:
            np.savez_compressed(
                f, __meta__=np.frombuffer(
                    json.dumps(meta).encode(), dtype=np.uint8),
                feature_weights=self.feature_weights, **state)

    @classmethod
    def load(cls, filename: str, device: str = "tpu") -> "GBTLearner":
        filename = _with_suffix(filename)
        data = np.load(filename, allow_pickle=False)
        meta = json.loads(bytes(data["__meta__"]).decode())
        learner = cls(input_dim=meta["input_dim"],
                      output_dim=meta["output_dim"],
                      tree_struct=meta["tree_struct"],
                      optimizers=meta["optimizers"], params=meta["params"],
                      verbose=meta["verbose"], device=device)
        learner.reset()
        arrs = {k: data[k] for k in
                ("feat", "thr", "cat_code", "is_split", "is_numeric",
                 "leaf_values", "counts", "depths", "bias", "n_trees")}
        learner.ens = ensemble_from_numpy(arrs)
        learner.feature_weights = data["feature_weights"].copy()
        learner.total_iterations = meta["total_iterations"]
        if meta["mapping_set"]:
            learner.set_feature_mapping(np.asarray(meta["num_mask"], bool))
        if meta["vocab"] is not None:
            learner.vocab = CategoryVocab.from_state(meta["vocab"])
        return learner

    def export(self, filename: str, modelname: Optional[str] = None,
               export_format: str = "float",
               export_type: str = "full") -> None:
        """Self-contained C-header inference export (types.cpp:409-676);
        export_type 'compact' emits per-level tables for oblivious trees
        (types.h:170-174)."""
        from ..utils.c_export import export_ensemble_header
        export_ensemble_header(self.cfg, self.ens, filename,
                               modelname or "gbrl_model", self.specs,
                               export_format, export_type, self.vocab)

    def save_reference_format(self, filename: str) -> None:
        """Write a reference-compatible binary .gbrl_model (round-trip
        verified: the unmodified reference C++ loads it and reproduces our
        predictions; tests/test_reference_import.py)."""
        from ..utils.reference_export import export_reference_model
        export_reference_model(self, filename)

    def distil(self, obs, targets, params: Dict, verbose: int = 0):
        """Train a compact student on this ensemble's outputs and swap it in
        (reference: gbt_learner.py:502-551)."""
        student_struct = dict(self.tree_struct)
        student_struct["max_depth"] = params.get(
            "max_depth", student_struct.get("max_depth", 4))
        lr = params.get("lr", 1.0)
        student = GBTLearner(
            self.input_dim, self.output_dim, student_struct,
            [dict(algo="SGD", init_lr=lr, start_idx=0,
                  stop_idx=self.output_dim, scheduler="Const")],
            {k: v for k, v in self.params.items() if k != "feature_weights"},
            verbose, self.device)
        student.reset()
        loss = student.fit(obs, targets,
                           params.get("distil_budget", 1000), shuffle=False)
        old_bv = getattr(self, "_bias_version", 0)
        self.__dict__.update(student.__dict__)
        self._pred_cache = None
        # the student was never armed, so dict.update left any stale RL
        # host counter in place — the ensemble just changed wholesale; the
        # bias version must also advance past anything a mirror has seen
        self._rl_host_n_trees = None
        self._bias_version = max(old_bv,
                                 getattr(student, "_bias_version", 0)) + 1
        return loss, params

    def __copy__(self) -> "GBTLearner":
        c = GBTLearner(self.input_dim, self.output_dim, dict(self.tree_struct),
                       [dict(o) for o in self.optimizers] if self.optimizers
                       else None, dict(self.params), self.verbose, self.device)
        c.cfg = self.cfg
        c.specs = self.specs
        c.ens = self.ens          # pytrees are immutable; safe to share
        c.feature_weights = self.feature_weights.copy()
        c.num_mask = self.num_mask.copy()
        c._mapping_set = self._mapping_set
        c.vocab = (CategoryVocab.from_state(self.vocab.to_state())
                   if self.vocab else None)
        c.total_iterations = self.total_iterations
        c._pred_cache = None
        return c


def _with_suffix(filename: str) -> str:
    return filename if filename.endswith(SAVE_SUFFIX) else filename + SAVE_SUFFIX
