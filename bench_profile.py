"""Component timing for the boost_step pipeline on the default device."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ensemble import init_ensemble
from gbrl_tpu.optimizers import OptimizerSpec
from gbrl_tpu.ops.boosting import boost_step, predict_sgd
from gbrl_tpu.ops.candidates import bucketize, numerical_candidates
from gbrl_tpu.ops.fit import build_tree, _level_histogram

N, F, O = 4096, 16, 3
cfg = TreeConfig(input_dim=F, output_dim=O, policy_dim=O - 1,
                 n_num_features=F, max_depth=4, n_bins=256,
                 grow_policy="greedy", split_score_func="cosine",
                 generator_type="quantile")
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
y = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
fw = jnp.ones(F, dtype=jnp.float32)
specs = (OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=0, stop_idx=O),)
ens = init_ensemble(cfg, capacity=256)


def bench(fn, *args, iters=50, warmup=5, donate=None):
    jfn = jax.jit(fn) if donate is None else jax.jit(fn, donate_argnums=donate)
    for _ in range(warmup):
        out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


# fill ensemble with 128 trees for predict timing
@functools.partial(jax.jit, donate_argnums=(0,))
def one_step(e):
    preds = predict_sgd(cfg, e, X, specs, 0, e.n_trees)
    grads = preds - y
    return boost_step(cfg, e, X, grads, fw)

for _ in range(128):
    ens = one_step(ens)
jax.block_until_ready(ens.feat)

ms_step = bench(lambda e: boost_step(cfg, e, X, g, fw), ens)
ms_pred = bench(lambda e: predict_sgd(cfg, e, X, specs, 0, e.n_trees), ens)
e2 = jax.tree.map(jnp.copy, ens)
for _ in range(5):
    e2 = one_step(e2)
jax.block_until_ready(e2.feat)
t0 = time.perf_counter()
for _ in range(50):
    e2 = one_step(e2)
jax.block_until_ready(e2.feat)
ms_full = (time.perf_counter() - t0) / 50 * 1e3

cand = numerical_candidates(cfg, X)
Xb = bucketize(X, cand)
ms_cand = bench(lambda x: numerical_candidates(cfg, x), X)
ms_buck = bench(lambda x, c: bucketize(x, c), X, cand)
ms_tree = bench(lambda xb, c, gg: build_tree(cfg, xb, c, gg, gg,
                                             jnp.ones(N), fw), Xb, cand, g)

node_rel = jnp.zeros((N,), dtype=jnp.int32)
w1 = jnp.ones(N)
for nn in (1, 2, 4, 8):
    ms_h = bench(lambda xb, nr, gg: _level_histogram(xb, nr, gg, w1, nn, 257),
                 Xb, node_rel, g)
    print(f"histogram n_nodes={nn}: {ms_h:.3f} ms")

print(f"candidates: {ms_cand:.3f} ms")
print(f"bucketize:  {ms_buck:.3f} ms")
print(f"build_tree: {ms_tree:.3f} ms")
print(f"boost_step: {ms_step:.3f} ms (cand+bucketize+tree+write)")
print(f"predict128: {ms_pred:.3f} ms")
print(f"full step:  {ms_full:.3f} ms -> {1000.0 / ms_full:.0f} trees/s")
