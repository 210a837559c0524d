"""Sharded PPO update over the 8-virtual-device CPU mesh must produce
bit-identical trees to the single-device jit update loop (conftest sets
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ensemble import init_ensemble
from gbrl_tpu.optimizers import OptimizerSpec
from gbrl_tpu.parallel.sharded import make_mesh, replicate, shard_batch
from gbrl_tpu.parallel.sharded_rl import sharded_ppo_update
from gbrl_tpu.rl.jit_update import PPOHyper, ppo_update_loop


def _setup(B=256, F=6, na=3, depth=3):
    cfg = TreeConfig(input_dim=F, output_dim=na + 1, policy_dim=na,
                     n_num_features=F, max_depth=depth, n_bins=16,
                     grow_policy="greedy", split_score_func="cosine")
    specs = (OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=0,
                           stop_idx=na),
             OptimizerSpec(algo="SGD", init_lr=0.05, start_idx=na,
                           stop_idx=na + 1))
    hp = PPOHyper(n_actions=na, clip_range=0.2, ent_coef=0.01, vf_coef=0.5,
                  normalize_advantage=True, policy_clip=0.0, value_clip=0.0)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(B, F)).astype(np.float32)
    actions = rng.integers(0, na, B).astype(np.int32)
    old_logp = np.full(B, -np.log(na), np.float32)
    adv = rng.normal(size=B).astype(np.float32)
    ret = rng.normal(size=B).astype(np.float32)
    U, mb = 8, 64
    mb_idx = np.stack([rng.permutation(B)[:mb] for _ in range(U)]
                      ).astype(np.int32)
    mb_n = np.full(U, mb, np.int32)
    return cfg, specs, hp, X, actions, old_logp, adv, ret, mb_idx, mb_n


def test_sharded_ppo_update_bit_identical():
    assert jax.device_count() >= 8, "conftest must provide 8 fake devices"
    cfg, specs, hp, X, actions, old_logp, adv, ret, mb_idx, mb_n = _setup()
    fw = jnp.ones(cfg.input_dim, dtype=jnp.float32)

    # single device
    ens1 = init_ensemble(cfg, capacity=16)
    ens1, _ = ppo_update_loop(cfg, hp, mb_idx.shape[0], ens1,
                              jnp.asarray(X), jnp.asarray(mb_idx),
                              jnp.asarray(mb_n), jnp.asarray(actions),
                              jnp.asarray(old_logp), jnp.asarray(adv),
                              jnp.asarray(ret), specs, fw)

    # 8-device mesh, rollout sharded
    mesh = make_mesh(8)
    ens8 = replicate(mesh, init_ensemble(cfg, capacity=16))
    ens8, _ = sharded_ppo_update(
        cfg, hp, mesh, ens8, shard_batch(mesh, jnp.asarray(X)),
        jnp.asarray(mb_idx), jnp.asarray(mb_n),
        shard_batch(mesh, jnp.asarray(actions)),
        shard_batch(mesh, jnp.asarray(old_logp)),
        shard_batch(mesh, jnp.asarray(adv)),
        shard_batch(mesh, jnp.asarray(ret)), specs, fw)

    assert int(ens1.n_trees) == int(ens8.n_trees) == 8
    n = int(ens1.n_trees)
    np.testing.assert_array_equal(np.asarray(ens1.feat)[:n],
                                  np.asarray(ens8.feat)[:n])
    np.testing.assert_array_equal(np.asarray(ens1.is_split)[:n],
                                  np.asarray(ens8.is_split)[:n])
    np.testing.assert_allclose(np.asarray(ens1.thr)[:n],
                               np.asarray(ens8.thr)[:n], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ens1.leaf_values)[:n],
                               np.asarray(ens8.leaf_values)[:n],
                               rtol=1e-5, atol=1e-6)
