"""Multi-chip data-parallel fitting on the 8-device virtual CPU mesh:
the sharded boost step must produce the SAME tree as single-device (the
global histogram makes split selection deterministic), and the full sharded
train step must run end to end."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ensemble import init_ensemble
from gbrl_tpu.optimizers import OptimizerSpec
from gbrl_tpu.ops.boosting import boost_step, predict_sgd
from gbrl_tpu.parallel.sharded import (make_mesh, sharded_boost_step,
                                       sharded_train_step)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    return make_mesh(8)


def test_sharded_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    N, F, O = 128, 6, 2
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=3, n_bins=8, grow_policy="greedy",
                     split_score_func="cosine")
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
    fw = jnp.ones(F, dtype=jnp.float32)

    ens1 = boost_step(cfg, init_ensemble(cfg, capacity=8), X, g, fw)
    ens8 = sharded_boost_step(cfg, mesh, init_ensemble(cfg, capacity=8),
                              X, g, fw)
    np.testing.assert_array_equal(np.asarray(ens1.feat[0]),
                                  np.asarray(ens8.feat[0]))
    np.testing.assert_array_equal(np.asarray(ens1.is_split[0]),
                                  np.asarray(ens8.is_split[0]))
    np.testing.assert_allclose(np.asarray(ens1.leaf_values[0]),
                               np.asarray(ens8.leaf_values[0]),
                               rtol=1e-5, atol=1e-6)


def test_sharded_train_step_runs_and_learns(mesh):
    rng = np.random.default_rng(1)
    N, F, O = 256, 5, 3
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=3, n_bins=16, grow_policy="oblivious",
                     split_score_func="l2")
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    W = rng.normal(size=(F, O)).astype(np.float32)
    y = jnp.asarray(np.asarray(X) @ W)
    fw = jnp.ones(F, dtype=jnp.float32)
    specs = (OptimizerSpec(algo="SGD", init_lr=0.3, start_idx=0, stop_idx=O),)

    ens = init_ensemble(cfg, capacity=32)
    losses = []
    for _ in range(20):
        ens, loss = sharded_train_step(cfg, mesh, ens, X, y, fw, specs)
        losses.append(float(loss))
    assert int(ens.n_trees) == 20
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"
    # predictions from the replicated ensemble match plain predict
    p = predict_sgd(cfg, ens, X, specs, 0, ens.n_trees)
    assert np.isfinite(np.asarray(p)).all()


def test_graft_dryrun():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 5)
    ge.dryrun_multichip(8)
