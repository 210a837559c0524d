"""CPU-mesh scaling-efficiency artifact (stand-in for the unmeasurable
real multi-chip number on this 1-chip host).

Measures the per-step wall time of the full sharded supervised train step
(parallel/sharded.sharded_train_step: replicated-ensemble predict ->
MultiRMSE grads -> histogram tree fit with the [nodes, candidates]
histogram all-reduced across devices) at 1/2/4/8 virtual CPU devices with
a FIXED global batch, and decomposes the overhead of running sharded.

What this DOES prove: the sharded program compiles and executes over a
multi-device mesh, and the added cost of distribution (histogram psum,
replicated split selection/tree emission repeated per device, sharded
quantile sort) is bounded -- reported as ``overhead_fraction`` per mesh
size against the 1-device program on the same global batch.

What this does NOT prove: real multi-chip speedup. All virtual devices
share this host's physical cores, so compute time cannot drop with k --
perfect strong scaling on this harness is a FLAT step time, not 1/k.  ICI
bandwidth/latency is also not modeled by the CPU backend's in-process
collectives.  ``t_one_device_shard_ms`` (a 1-device run on an N/k shard)
is included as the uncontended lower bound each device's local compute
would have on separate hardware.

Run:  python examples/scaling_cpu.py        (writes ../SCALING_cpu.json)
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))

import jax

# some environments pin JAX_PLATFORMS via sitecustomize after our env write;
# the config update is authoritative (same pattern as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

N_GLOBAL, F, O = 32768, 16, 3
STEPS, WARMUP = 12, 3
MESHES = (1, 2, 4, 8)


def _cfg():
    from gbrl_tpu.config import TreeConfig
    return TreeConfig(input_dim=F, output_dim=O, policy_dim=O - 1,
                      n_num_features=F, max_depth=4, n_bins=256,
                      grow_policy="greedy", split_score_func="cosine",
                      generator_type="quantile")


def _time_steps(mesh, cfg, specs, X, y, feat_w, capacity):
    """Median per-step wall over STEPS timed sharded_train_step calls."""
    import jax
    from gbrl_tpu.ensemble import init_ensemble
    from gbrl_tpu.parallel.sharded import (replicate, shard_batch,
                                           sharded_train_step)
    ens = replicate(mesh, init_ensemble(cfg, capacity))
    Xs, ys = shard_batch(mesh, X), shard_batch(mesh, y)
    fw = replicate(mesh, feat_w)
    times = []
    for i in range(WARMUP + STEPS):
        t0 = time.perf_counter()
        ens, loss = sharded_train_step(cfg, mesh, ens, Xs, ys, fw, specs)
        float(loss)  # fetch closes the timed region
        if i >= WARMUP:
            times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3), float(loss)


def main():
    import jax
    from gbrl_tpu.optimizers import OptimizerSpec
    from gbrl_tpu.parallel.sharded import make_mesh

    assert len(jax.devices()) >= max(MESHES), jax.devices()
    cfg = _cfg()
    specs = (OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=0,
                           stop_idx=O),)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N_GLOBAL, F)).astype(np.float32)
    y = rng.normal(size=(N_GLOBAL, O)).astype(np.float32)
    feat_w = np.ones(F, dtype=np.float32)
    capacity = 64

    rows, t1 = [], None
    for k in MESHES:
        mesh = make_mesh(k)
        t_ms, loss = _time_steps(mesh, cfg, specs, X, y, feat_w, capacity)
        # uncontended per-shard compute bound: 1 device, N/k rows
        ts_ms, _ = _time_steps(make_mesh(1), cfg, specs, X[:N_GLOBAL // k],
                               y[:N_GLOBAL // k], feat_w, capacity)
        if k == 1:
            t1 = t_ms
        rows.append(dict(
            devices=k, step_ms=round(t_ms, 2),
            t_one_device_shard_ms=round(ts_ms, 2),
            overhead_fraction=round(max(0.0, (t_ms - t1) / t_ms), 4),
            loss=round(loss, 6)))
        print(f"devices={k}: step {t_ms:.1f} ms "
              f"(1-dev shard bound {ts_ms:.1f} ms, "
              f"overhead vs 1-dev global {rows[-1]['overhead_fraction']:.1%})",
              flush=True)

    out = dict(
        description=(
            "Sharded supervised train step (predict + MultiRMSE + histogram "
            "tree fit, ensemble replicated, samples sharded, histograms "
            "all-reduced) on a virtual CPU mesh at fixed global batch "
            f"{N_GLOBAL}x{F}, {O} outputs, greedy cosine depth-4 256-bin. "
            "All devices share one host's cores: ideal strong scaling here "
            "is FLAT step time; overhead_fraction = (t_k - t_1)/t_k bounds "
            "the cost the collectives + per-device replicated tail add. "
            "This does NOT measure real multi-chip speedup (no ICI)."),
        global_batch=N_GLOBAL, features=F, outputs=O,
        steps_timed=STEPS, results=rows)
    path = os.path.join(_HERE, "..", "SCALING_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(path)}", flush=True)


if __name__ == "__main__":
    main()
