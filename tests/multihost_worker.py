"""Worker process for tests/test_multihost.py.

Run as: python multihost_worker.py <out.npz>
with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set and
XLA_FLAGS forcing 4 local CPU devices.  Joins the 2-process 8-device mesh,
runs 6 supervised host_train_steps and 2 host_boost_steps from its OWN data
shard only, and dumps the resulting (replicated) ensemble arrays + losses.
"""
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

from gbrl_tpu.config import TreeConfig  # noqa: E402
from gbrl_tpu.ensemble import init_ensemble  # noqa: E402
from gbrl_tpu.optimizers import OptimizerSpec  # noqa: E402
from gbrl_tpu.parallel import hosts  # noqa: E402


def main(out_path: str) -> None:
    hosts.initialize()
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == 2, f"expected 2 processes, got {nproc}"
    assert len(jax.devices()) == 8, f"expected 8 devices, {len(jax.devices())}"
    mesh = hosts.global_mesh()

    # deterministic global dataset; each host slices its own half
    rng = np.random.default_rng(7)
    N, F, O = 512, 6, 2
    X = rng.normal(size=(N, F)).astype(np.float32)
    W = rng.normal(size=(F, O)).astype(np.float32)
    y = (X @ W).astype(np.float32)
    lo, hi = pid * (N // nproc), (pid + 1) * (N // nproc)

    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=3, n_bins=8, grow_policy="greedy",
                     split_score_func="cosine")
    specs = (OptimizerSpec(algo="SGD", init_lr=0.2, start_idx=0, stop_idx=O),)
    fw = hosts.replicate(mesh, np.ones(F, dtype=np.float32))
    ens = hosts.replicate(mesh, init_ensemble(cfg, capacity=16))

    losses = []
    for _ in range(6):
        ens, loss = hosts.host_train_step(cfg, mesh, ens, X[lo:hi], y[lo:hi],
                                          fw, specs)
        losses.append(float(loss))

    # raw gradient-step path (RL-style): grads fed directly per host
    g = rng.normal(size=(N, O)).astype(np.float32)
    for _ in range(2):
        ens = hosts.host_boost_step(cfg, mesh, ens, X[lo:hi], g[lo:hi], fw)

    # PPO update phase from per-host rollout shards (hosts.host_ppo_update):
    # a deterministic synthetic rollout, global minibatch plan drawn with
    # the same seed on both hosts (the documented contract)
    from gbrl_tpu.rl.jit_update import PPOHyper
    pcfg = TreeConfig(input_dim=F, output_dim=3, n_num_features=F,
                      max_depth=3, n_bins=8, grow_policy="greedy",
                      split_score_func="cosine")
    pspecs = (OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=0, stop_idx=2),
              OptimizerSpec(algo="SGD", init_lr=0.02, start_idx=2,
                            stop_idx=3))
    hp = PPOHyper(n_actions=2, clip_range=0.2, ent_coef=0.01, vf_coef=0.5,
                  normalize_advantage=True, policy_clip=0.0, value_clip=0.0)
    prng = np.random.default_rng(11)          # identical on both hosts
    B, U, mb = 256, 6, 64
    Xr = prng.normal(size=(B, F)).astype(np.float32)
    acts = prng.integers(0, 2, B).astype(np.int32)
    old_logp = np.log(0.5) * np.ones(B, dtype=np.float32)
    adv = prng.normal(size=B).astype(np.float32)
    ret = prng.normal(size=B).astype(np.float32)
    mb_idx = prng.integers(0, B, (U, mb)).astype(np.int32)
    mb_n = np.full(U, mb, dtype=np.int32)
    plo, phi = pid * (B // nproc), (pid + 1) * (B // nproc)
    pens = hosts.replicate(mesh, init_ensemble(pcfg, capacity=8))
    pfw = hosts.replicate(mesh, np.ones(F, dtype=np.float32))
    pens, _ = hosts.host_ppo_update(
        pcfg, hp, mesh, pens, Xr[plo:phi], mb_idx, mb_n, acts[plo:phi],
        old_logp[plo:phi], adv[plo:phi], ret[plo:phi], pspecs, pfw)

    np.savez(out_path,
             feat=np.asarray(ens.feat), thr=np.asarray(ens.thr),
             is_split=np.asarray(ens.is_split),
             leaf_values=np.asarray(ens.leaf_values),
             n_trees=np.asarray(ens.n_trees),
             losses=np.array(losses, dtype=np.float64),
             ppo_feat=np.asarray(pens.feat), ppo_thr=np.asarray(pens.thr),
             ppo_is_split=np.asarray(pens.is_split),
             ppo_leaf_values=np.asarray(pens.leaf_values),
             ppo_n_trees=np.asarray(pens.n_trees))
    hosts.shutdown()


if __name__ == "__main__":
    main(sys.argv[1])
