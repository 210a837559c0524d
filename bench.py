"""Benchmark: boosting throughput (trees fit per second) on the default
JAX device (TPU under the driver; CPU as fallback).

Config mirrors the reference's RL hot path: one boost_step per iteration
(quantile candidates + greedy cosine tree, depth 4, 256 bins) on a
4096x16 batch with a 3-dim output (2 policy + 1 value), i.e. the
PPO-shared-actor-critic shape.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the reference C++ build's measured
trees-fit/s stored in BASELINE_REF.json (created by bench_reference/run.sh);
0 if not yet measured.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from gbrl_tpu.config import TreeConfig
    from gbrl_tpu.ensemble import init_ensemble
    from gbrl_tpu.optimizers import OptimizerSpec
    from gbrl_tpu.ops.boosting import boost_step, predict_sgd

    N, F, O = 4096, 16, 3
    iters = 100
    warmup = 10
    cfg = TreeConfig(input_dim=F, output_dim=O, policy_dim=O - 1,
                     n_num_features=F, max_depth=4, n_bins=256,
                     grow_policy="greedy", split_score_func="cosine",
                     generator_type="quantile")
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
    fw = jnp.ones(F, dtype=jnp.float32)
    specs = (OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=0, stop_idx=O),)

    cap = warmup + iters + 8
    ens = init_ensemble(cfg, capacity=1 << (cap - 1).bit_length())

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def one_step(ens):
        preds = predict_sgd(cfg, ens, X, specs, 0, ens.n_trees)
        grads = preds - y
        return boost_step(cfg, ens, X, grads, fw)

    for _ in range(warmup):
        ens = one_step(ens)
    jax.block_until_ready(ens.feat)

    t0 = time.perf_counter()
    for _ in range(iters):
        ens = one_step(ens)
    jax.block_until_ready(ens.feat)
    dt = time.perf_counter() - t0
    trees_per_s = iters / dt

    baseline = 0.0
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_REF.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        baseline = ref.get("trees_fit_per_s", 0.0)

    print(json.dumps({
        "metric": "trees-fit/s (greedy cosine d4 b256, N=4096xF16xO3, incl. predict)",
        "value": round(trees_per_s, 3),
        "unit": "trees/s",
        "vs_baseline": round(trees_per_s / baseline, 3) if baseline else 0,
    }))


if __name__ == "__main__":
    main()
