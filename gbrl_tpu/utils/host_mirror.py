r"""Host-resident ensemble mirror for microsecond rollout forwards.

RL rollouts call ``predict`` on tiny batches (n_envs observations) once per
environment step — tens of thousands of times per training run.  Serving
those from the accelerator costs a full dispatch + transfer round trip per
step (measured ~50 ms/step through a tunneled TPU vs 6.9 us/sample for
compiled host inference), while the accelerator's strength — the update
phase's histogram/fit work on thousands of samples — is idle during
rollouts anyway.

This module keeps an incrementally-synced host copy of the ensemble
(device -> host transfer of only the NEW trees after each update phase) and
serves predictions from a tiny data-driven C kernel (compiled once at first
use; numpy fallback otherwise).  This mirrors the reference's deployment
split: its C++ ``Predictor::predict_cpu`` (predictor.cpp:122-184) walks
heap trees on the host; ours additionally pre-multiplies leaf values by the
optimizer coefficients -lr_o(t) (optimizer.cpp:110-118, scheduler.h:124-133)
so a prediction is ``bias + sum_t wleaf[t, leaf(x, t), :]``.

Exactness: leaf values are immutable once fit and SGD coefficients depend
only on the tree index, so the mirror reproduces the device predict path's
semantics; float32 summation order differs (tree-major here), giving
~1e-6-level differences, same as the reference's parallel-over-trees
reduction (predictor.cpp:147-165).
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import tempfile
from typing import Optional

import jax
import numpy as np

_C_SRC = r"""
#include <stdint.h>
#include <math.h>

/* Heap-layout greedy/oblivious tree walk + coefficient-weighted leaf sum.
   rel descends the implicit heap: pass-through (non-split) nodes descend
   left, numeric splits go right on x > thr, categorical on code equality
   (node.cpp:77-96 semantics). */
void gbrl_mirror_predict(
    const float *X,            /* [N, F] numeric features */
    const int32_t *Xc,         /* [N, Fc] categorical codes (or NULL) */
    int64_t N, int64_t F, int64_t Fc,
    const int32_t *feat,       /* [T, P] */
    const float *thr,          /* [T, P] */
    const uint8_t *split,      /* [T, P] */
    const uint8_t *isnum,      /* [T, P] */
    const int32_t *code,       /* [T, P] */
    const float *wleaf,        /* [T, L, O] coeff-premultiplied leaf values */
    int64_t T, int64_t D, int64_t O,
    const float *bias,         /* [O] */
    float *out)                /* [N, O] */
{
    int64_t P = (1LL << D) - 1;
    int64_t L = 1LL << D;
    for (int64_t n = 0; n < N; ++n) {
        const float *x = X + n * F;
        const int32_t *xc = Xc ? Xc + n * Fc : 0;
        float *o = out + n * O;
        for (int64_t j = 0; j < O; ++j) o[j] = bias[j];
        for (int64_t t = 0; t < T; ++t) {
            const int32_t *tf = feat + t * P;
            const float *tt = thr + t * P;
            const uint8_t *ts = split + t * P;
            const uint8_t *tn = isnum + t * P;
            const int32_t *tc = code + t * P;
            int64_t rel = 0;
            for (int64_t d = 0; d < D; ++d) {
                int64_t p = (1LL << d) - 1 + rel;
                int go = 0;
                if (ts[p]) {
                    int32_t f = tf[p];
                    if (tn[p]) go = x[f] > tt[p];
                    else       go = xc && xc[f] == tc[p];
                }
                rel = 2 * rel + go;
            }
            const float *w = wleaf + (t * L + rel) * O;
            for (int64_t j = 0; j < O; ++j) o[j] += w[j];
        }
    }
}

/* Mixed SGD/Adam forward: the Adam columns need the per-sample first/second
   moment recurrence over the tree sequence (reference optimizer.cpp:260-283:
   m_t = b1 m + (1-b1) g, v_t = b2 v + (1-b2) g^2, zero-initialized per call,
   theta -= alpha_t m/(sqrt(v)+eps) with alpha_t = lr(t)
   sqrt(1-b2^(t+1))/(1-b1^(t+1)) folded into alpha[t*O+j] on the host side).
   SGD columns keep the coefficient-premultiplied wleaf sum (alpha is zero
   there and wleaf is zero on Adam columns).  One tree walk serves both. */
void gbrl_mirror_predict_adam(
    const float *X, const int32_t *Xc,
    int64_t N, int64_t F, int64_t Fc,
    const int32_t *feat, const float *thr, const uint8_t *split,
    const uint8_t *isnum, const int32_t *code,
    const float *wleaf,        /* [T, L, O] SGD-premultiplied (0 on Adam) */
    const float *rawleaf,      /* [T, L, O] raw leaf values */
    const float *alpha,        /* [T, O] Adam step size (0 on SGD cols) */
    const float *b1, const float *b2, const float *eps,   /* [O] */
    const uint8_t *adam,       /* [O] column mask */
    int64_t T, int64_t D, int64_t O,
    const float *bias, float *out)
{
    int64_t P = (1LL << D) - 1;
    int64_t L = 1LL << D;
    for (int64_t n = 0; n < N; ++n) {
        const float *x = X + n * F;
        const int32_t *xc = Xc ? Xc + n * Fc : 0;
        float *o = out + n * O;
        float m[256], v[256];   /* caller guarantees O <= 256 */
        for (int64_t j = 0; j < O; ++j) { o[j] = bias[j]; m[j] = v[j] = 0.f; }
        for (int64_t t = 0; t < T; ++t) {
            const int32_t *tf = feat + t * P;
            const float *tt = thr + t * P;
            const uint8_t *ts = split + t * P;
            const uint8_t *tn = isnum + t * P;
            const int32_t *tc = code + t * P;
            int64_t rel = 0;
            for (int64_t d = 0; d < D; ++d) {
                int64_t p = (1LL << d) - 1 + rel;
                int go = 0;
                if (ts[p]) {
                    int32_t f = tf[p];
                    if (tn[p]) go = x[f] > tt[p];
                    else       go = xc && xc[f] == tc[p];
                }
                rel = 2 * rel + go;
            }
            const float *w = wleaf + (t * L + rel) * O;
            const float *g = rawleaf + (t * L + rel) * O;
            const float *a = alpha + t * O;
            for (int64_t j = 0; j < O; ++j) {
                if (adam[j]) {
                    float gj = g[j];
                    m[j] = b1[j] * m[j] + (1.f - b1[j]) * gj;
                    v[j] = b2[j] * v[j] + (1.f - b2[j]) * gj * gj;
                    o[j] -= a[j] * m[j] / (sqrtf(v[j]) + eps[j]);
                } else {
                    o[j] += w[j];
                }
            }
        }
    }
}
"""

_lib = None
_lib_failed = False

# Width of the jitted tree-sync window: covers a typical RL update phase's
# new trees (1-70) in one fetch while keeping the per-sync transfer bounded.
_SYNC_WINDOW = 128


@functools.partial(jax.jit, static_argnums=(1,))
def _slice_rows(arrs, W: int, start):
    """Static-width row windows [start, start+W) of each array — ONE
    compiled program regardless of where the window lands (dynamic start,
    static width)."""
    return tuple(jax.lax.dynamic_slice_in_dim(x, start, W, axis=0)
                 for x in arrs)


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        import hashlib
        tag = hashlib.sha1(_C_SRC.encode()).hexdigest()[:12]
        cache = os.path.join(tempfile.gettempdir(), "gbrl_tpu_mirror")
        os.makedirs(cache, exist_ok=True)
        src = os.path.join(cache, f"mirror_{tag}.c")
        so = os.path.join(cache, f"mirror_{tag}.so")
        if not os.path.exists(so):
            with open(src, "w") as f:
                f.write(_C_SRC)
            subprocess.run(
                ["gcc" if _which("gcc") else "g++", "-O2", "-shared", "-fPIC",
                 src, "-o", so, "-lm"], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.gbrl_mirror_predict.restype = None
        lib.gbrl_mirror_predict_adam.restype = None
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def _which(prog: str) -> Optional[str]:
    import shutil
    return shutil.which(prog)


def _host_lr(spec, t: np.ndarray) -> np.ndarray:
    """lr_o(t) for tree indices t: host replica of the scheduler step
    (scheduler.h:124-133, 182-185)."""
    if spec.scheduler == "Linear":
        # EXACT replica of optimizers.scheduler_lr: lr(t) =
        # init + ((t+1)/T)*(stop-init), floored at stop_lr (no cap at T —
        # the floor handles overruns, matching scheduler.h:182-185)
        lr = (spec.init_lr
              + ((t + 1.0) / np.float32(spec.T))
              * (spec.stop_lr - spec.init_lr)).astype(np.float32)
        return np.where(lr < spec.stop_lr, np.float32(spec.stop_lr), lr)
    return np.full_like(t, spec.init_lr)


def _host_sgd_coeff(specs, t0: int, t1: int, output_dim: int) -> np.ndarray:
    """-lr_o(t) on each optimizer's column range for trees [t0, t1):
    host replica of optimizers.sgd_coeff (scheduler.h:124-133, 182-185)."""
    t = np.arange(t0, t1, dtype=np.float32)
    coeff = np.zeros((t1 - t0, output_dim), dtype=np.float32)
    for s in specs:
        lr = _host_lr(s, t)
        stop = s.stop_idx if s.stop_idx else output_dim
        coeff[:, s.start_idx:stop] -= lr[:, None]
    return coeff


class HostMirror:
    """Incrementally-synced host copy of a GBTLearner's ensemble.

    Usage::

        mirror = HostMirror(learner)
        ...
        mirror.sync()            # after each update phase (cheap: new trees)
        preds = mirror.predict(obs)   # [N, O] numpy, microseconds
    """

    def __init__(self, learner):
        self.learner = learner
        self.has_adam = any(s.algo == "Adam" for s in learner.specs)
        cfg = learner.cfg
        self.D = cfg.max_depth
        self.P = (1 << self.D) - 1
        self.L = 1 << self.D
        self.O = cfg.output_dim
        self.n_synced = 0
        # Per-column Adam hyperparameters for the C kernel (columns partition
        # among optimizers, so at most one Adam spec governs each column).
        self.adam_mask = np.zeros(self.O, dtype=np.uint8)
        self.ab1 = np.zeros(self.O, dtype=np.float32)
        self.ab2 = np.zeros(self.O, dtype=np.float32)
        self.aeps = np.zeros(self.O, dtype=np.float32)
        for s in learner.specs:
            if s.algo == "Adam":
                stop = s.stop_idx if s.stop_idx else self.O
                self.adam_mask[s.start_idx:stop] = 1
                self.ab1[s.start_idx:stop] = s.beta_1
                self.ab2[s.start_idx:stop] = s.beta_2
                self.aeps[s.start_idx:stop] = s.eps
        cap = 256
        self._alloc(cap)
        self.bias = np.zeros(self.O, dtype=np.float32)
        self.sync()

    def _alloc(self, cap: int):
        self.cap = cap
        self.feat = np.zeros((cap, self.P), dtype=np.int32)
        self.thr = np.zeros((cap, self.P), dtype=np.float32)
        self.split = np.zeros((cap, self.P), dtype=np.uint8)
        self.isnum = np.ones((cap, self.P), dtype=np.uint8)
        self.code = np.full((cap, self.P), -1, dtype=np.int32)
        self.wleaf = np.zeros((cap, self.L, self.O), dtype=np.float32)
        has_adam = getattr(self, "has_adam", False)
        self.raw_leaf = (np.zeros((cap, self.L, self.O), dtype=np.float32)
                         if has_adam else None)
        self.alpha = (np.zeros((cap, self.O), dtype=np.float32)
                      if has_adam else None)

    def _grow(self, need: int):
        cap = self.cap
        while cap < need:
            cap *= 2
        old = (self.feat, self.thr, self.split, self.isnum, self.code,
               self.wleaf, self.raw_leaf, self.alpha)
        n = self.n_synced
        self._alloc(cap)
        for new, o in zip((self.feat, self.thr, self.split, self.isnum,
                           self.code, self.wleaf, self.raw_leaf, self.alpha),
                          old):
            if new is not None:
                new[:n] = o[:n]

    def sync(self) -> int:
        """Pull trees [n_synced, n_trees) + bias from the device ensemble.
        Returns the number of new trees copied."""
        ens = self.learner.ens
        # host counter / bias version avoid two device fetches per sync
        # (each is a full tunnel round trip on remote TPUs)
        n = getattr(self.learner, "_rl_host_n_trees", None)
        if n is None:
            n = int(ens.n_trees)
        a = self.n_synced
        if n > self.cap:
            self._grow(n)
        bv = getattr(self.learner, "_bias_version", None)
        if bv is None or bv != getattr(self, "_seen_bias_version", -1):
            self.bias = np.asarray(ens.bias,
                                   dtype=np.float32).reshape(self.O)
            self._seen_bias_version = bv
        if n > a:
            # Fetch new trees through a FIXED-width jitted dynamic_slice:
            # naive device-side slicing (ens.feat[a:n]) builds a new gather
            # program per (a, n) pair — measured ~90s of XLA CPU recompiles
            # over a 30-iteration AWR run.  A static window width keeps it
            # to one compiled program, and jax.device_get batches the six
            # transfers into one trip.
            cap = int(ens.feat.shape[0])
            W = min(_SYNC_WINDOW, cap)
            arrs = (ens.feat, ens.thr, ens.is_split, ens.is_numeric,
                    ens.cat_code, ens.leaf_values)
            lv = np.empty((n - a, self.L, self.O), dtype=np.float32)
            a0 = a
            while a0 < n:
                s = min(a0, cap - W)
                feat, thr, is_split, is_numeric, cat_code, lv_w = \
                    jax.device_get(_slice_rows(arrs, W, s))
                lo, hi = a0 - s, min(n - s, W)
                dst = slice(s + lo, s + hi)
                self.feat[dst] = feat[lo:hi, :self.P]
                self.thr[dst] = thr[lo:hi, :self.P]
                self.split[dst] = is_split[lo:hi, :self.P].astype(np.uint8)
                self.isnum[dst] = is_numeric[lo:hi, :self.P].astype(np.uint8)
                self.code[dst] = cat_code[lo:hi, :self.P]
                lv[s + lo - a:s + hi - a] = lv_w[lo:hi, :self.L]
                a0 = s + hi
            sgd_specs = [s for s in self.learner.specs if s.algo == "SGD"]
            coeff = _host_sgd_coeff(sgd_specs, a, n, self.O)
            self.wleaf[a:n] = lv * coeff[:, None, :]
            if self.raw_leaf is not None:
                self.raw_leaf[a:n] = lv
                t = np.arange(a, n, dtype=np.float32)
                for s in self.learner.specs:
                    if s.algo != "Adam":
                        continue
                    lr = _host_lr(s, t)
                    al = (lr * np.sqrt(1.0 - s.beta_2 ** (t + 1))
                          / (1.0 - s.beta_1 ** (t + 1)))
                    stop = s.stop_idx if s.stop_idx else self.O
                    self.alpha[a:n, s.start_idx:stop] = al[:, None]
            self.n_synced = n
        return n - a

    def append_tree(self, tree: dict) -> None:
        """Append ONE already-fetched tree (the dict returned by a fused
        device update, e.g. rl/jit_a2c.py) without touching the device —
        the fused paths return the new tree in the same fetch as their
        stats, so the mirror stays in sync with zero extra round trips."""
        t = self.n_synced
        if t + 1 > self.cap:
            self._grow(t + 1)
        self.feat[t] = np.asarray(tree["feat"])[:self.P]
        self.thr[t] = np.asarray(tree["thr"])[:self.P]
        self.split[t] = np.asarray(tree["is_split"])[:self.P].astype(np.uint8)
        self.isnum[t] = np.asarray(
            tree["is_numeric"])[:self.P].astype(np.uint8)
        self.code[t] = np.asarray(tree["cat_code"])[:self.P]
        lv = np.asarray(tree["leaf_values"])[:self.L]
        sgd_specs = [s for s in self.learner.specs if s.algo == "SGD"]
        coeff = _host_sgd_coeff(sgd_specs, t, t + 1, self.O)
        self.wleaf[t] = lv * coeff[0][None, :]
        if self.raw_leaf is not None:
            self.raw_leaf[t] = lv
            tf = np.asarray([t], dtype=np.float32)
            for s in self.learner.specs:
                if s.algo != "Adam":
                    continue
                lr = _host_lr(s, tf)
                al = (lr * np.sqrt(1.0 - s.beta_2 ** (tf + 1))
                      / (1.0 - s.beta_1 ** (tf + 1)))
                stop = s.stop_idx if s.stop_idx else self.O
                self.alpha[t, s.start_idx:stop] = al[0]
        self.n_synced = t + 1

    # ------------------------------------------------------------------ API
    def predict_range(self, X: np.ndarray, t0: int, t1: int,
                      Xc: Optional[np.ndarray] = None) -> np.ndarray:
        """Bias-free sum of SGD tree updates over trees [t0, t1) — the
        incremental delta on top of a cached prediction (the host replica
        of learners/gbt_learner._predict_delta_jit).  Lets value caches
        over large replays update in O(rows * new_trees) instead of
        re-walking the whole ensemble (SGD columns only: the Adam
        recurrence is not decomposable by tree range)."""
        assert not self.has_adam, "predict_range requires SGD-only columns"
        t0 = max(0, min(int(t0), self.n_synced))
        t1 = max(t0, min(int(t1), self.n_synced))
        X = np.ascontiguousarray(X, dtype=np.float32)
        if X.ndim == 1:
            X = X.reshape(1, -1)
        N, F = X.shape
        T = t1 - t0
        zero_bias = np.zeros(self.O, dtype=np.float32)
        lib = _load_lib()
        if lib is None or T == 0:
            out = np.zeros((N, self.O), dtype=np.float32)
            if T == 0:
                return out
            return self._predict_numpy_range(X, Xc, t0, t1)
        out = np.empty((N, self.O), dtype=np.float32)
        Fc = 0 if Xc is None else Xc.shape[1]
        xc_ptr = None
        if Xc is not None:
            Xc = np.ascontiguousarray(Xc, dtype=np.int32)
            xc_ptr = Xc.ctypes.data_as(ctypes.c_void_p)
        # row slices of C-contiguous arrays stay contiguous
        lib.gbrl_mirror_predict(
            X.ctypes.data_as(ctypes.c_void_p), xc_ptr,
            ctypes.c_int64(N), ctypes.c_int64(F), ctypes.c_int64(Fc),
            self.feat[t0:].ctypes.data_as(ctypes.c_void_p),
            self.thr[t0:].ctypes.data_as(ctypes.c_void_p),
            self.split[t0:].ctypes.data_as(ctypes.c_void_p),
            self.isnum[t0:].ctypes.data_as(ctypes.c_void_p),
            self.code[t0:].ctypes.data_as(ctypes.c_void_p),
            self.wleaf[t0:].ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(T), ctypes.c_int64(self.D),
            ctypes.c_int64(self.O),
            zero_bias.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p))
        return out

    def _predict_numpy_range(self, X, Xc, t0: int, t1: int) -> np.ndarray:
        save = (self.feat, self.thr, self.split, self.isnum, self.code,
                self.wleaf, self.bias, self.n_synced)
        try:
            self.feat, self.thr = self.feat[t0:], self.thr[t0:]
            self.split, self.isnum = self.split[t0:], self.isnum[t0:]
            self.code, self.wleaf = self.code[t0:], self.wleaf[t0:]
            self.bias = np.zeros(self.O, dtype=np.float32)
            self.n_synced = t1 - t0
            return self._predict_numpy(X, Xc)
        finally:
            (self.feat, self.thr, self.split, self.isnum, self.code,
             self.wleaf, self.bias, self.n_synced) = save

    def predict(self, X: np.ndarray, Xc: Optional[np.ndarray] = None
                ) -> np.ndarray:
        """[N, O] predictions for numeric features X (+optional categorical
        codes Xc), served entirely on host."""
        X = np.ascontiguousarray(X, dtype=np.float32)
        if X.ndim == 1:
            X = X.reshape(1, -1)
        N, F = X.shape
        T = self.n_synced
        lib = _load_lib()
        if lib is None or (self.has_adam and self.O > 256):
            return self._predict_numpy(X, Xc)
        out = np.empty((N, self.O), dtype=np.float32)
        Fc = 0 if Xc is None else Xc.shape[1]
        xc_ptr = None
        if Xc is not None:
            Xc = np.ascontiguousarray(Xc, dtype=np.int32)
            xc_ptr = Xc.ctypes.data_as(ctypes.c_void_p)
        tree_args = (
            self.feat.ctypes.data_as(ctypes.c_void_p),
            self.thr.ctypes.data_as(ctypes.c_void_p),
            self.split.ctypes.data_as(ctypes.c_void_p),
            self.isnum.ctypes.data_as(ctypes.c_void_p),
            self.code.ctypes.data_as(ctypes.c_void_p))
        if self.has_adam:
            lib.gbrl_mirror_predict_adam(
                X.ctypes.data_as(ctypes.c_void_p), xc_ptr,
                ctypes.c_int64(N), ctypes.c_int64(F), ctypes.c_int64(Fc),
                *tree_args,
                self.wleaf.ctypes.data_as(ctypes.c_void_p),
                self.raw_leaf.ctypes.data_as(ctypes.c_void_p),
                self.alpha.ctypes.data_as(ctypes.c_void_p),
                self.ab1.ctypes.data_as(ctypes.c_void_p),
                self.ab2.ctypes.data_as(ctypes.c_void_p),
                self.aeps.ctypes.data_as(ctypes.c_void_p),
                self.adam_mask.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int64(T), ctypes.c_int64(self.D),
                ctypes.c_int64(self.O),
                self.bias.ctypes.data_as(ctypes.c_void_p),
                out.ctypes.data_as(ctypes.c_void_p))
            return out
        lib.gbrl_mirror_predict(
            X.ctypes.data_as(ctypes.c_void_p), xc_ptr,
            ctypes.c_int64(N), ctypes.c_int64(F), ctypes.c_int64(Fc),
            *tree_args,
            self.wleaf.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(T), ctypes.c_int64(self.D),
            ctypes.c_int64(self.O),
            self.bias.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p))
        return out

    def _predict_numpy(self, X: np.ndarray, Xc: Optional[np.ndarray]
                       ) -> np.ndarray:
        N = X.shape[0]
        T = self.n_synced
        if T == 0:
            return np.broadcast_to(self.bias, (N, self.O)).copy()
        X = np.ascontiguousarray(X, dtype=np.float32)
        if X.ndim == 1:
            X = X.reshape(1, -1)
        rel = np.zeros((N, T), dtype=np.int64)
        tidx = np.arange(T)
        for d in range(self.D):
            node = (1 << d) - 1 + rel                      # [N, T]
            f = self.feat[tidx[None, :], node]
            s = self.split[tidx[None, :], node].astype(bool)
            isn = self.isnum[tidx[None, :], node].astype(bool)
            thr = self.thr[tidx[None, :], node]
            go = np.take_along_axis(X, np.maximum(f, 0), axis=1) > thr
            if Xc is not None and Xc.shape[1] > 0:
                cc = self.code[tidx[None, :], node]
                goc = np.take_along_axis(Xc, np.maximum(f, 0), axis=1) == cc
                go = np.where(isn, go, goc)
            rel = 2 * rel + (s & go)
        w = self.wleaf[:T]
        out = np.broadcast_to(self.bias, (N, self.O)).copy()
        for tset in range(0, T, 512):
            te = min(tset + 512, T)
            sel = w[tset:te][np.arange(te - tset)[None, :],
                             rel[:, tset:te]]      # [N, C, O]
            out += sel.sum(axis=1)
        if self.has_adam:
            out -= self._adam_delta(rel)
        return out

    def _adam_delta(self, rel: np.ndarray) -> np.ndarray:
        """Accumulated Adam update over each Adam optimizer's columns,
        [N, O] (host replica of optimizers.adam_delta, matching the
        reference recurrence optimizer.cpp:260-283 with
        alpha_t = lr(t) * sqrt(1-b2^(t+1)) / (1-b1^(t+1)) and zero-
        initialized per-call m/v).  Vectorized over samples; sequential
        over trees (A2C-scale ensembles: one tree per rollout)."""
        N, T = rel.shape
        out = np.zeros((N, self.O), dtype=np.float32)
        if T == 0:
            return out
        g_all = self.raw_leaf[:T][np.arange(T)[None, :], rel]  # [N, T, O]
        t = np.arange(T, dtype=np.float32)
        for spec in self.learner.specs:
            if spec.algo != "Adam":
                continue
            lr = _host_lr(spec, t)
            b1, b2, eps = spec.beta_1, spec.beta_2, spec.eps
            alpha = lr * np.sqrt(1.0 - b2 ** (t + 1)) / (1.0 - b1 ** (t + 1))
            stop = spec.stop_idx or self.O
            cols = slice(spec.start_idx, stop)
            g = g_all[:, :, cols]
            m = np.zeros((N, g.shape[2]), dtype=np.float32)
            v = np.zeros_like(m)
            acc = np.zeros_like(m)
            for k in range(T):
                gk = g[:, k]
                m = b1 * m + (1.0 - b1) * gk
                v = b2 * v + (1.0 - b2) * gk * gk
                acc += alpha[k] * m / (np.sqrt(v) + eps)
            out[:, cols] = acc
        return out
