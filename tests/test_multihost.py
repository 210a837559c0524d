"""Multi-host layer (parallel/hosts.py): two localhost processes x 4 CPU
devices form one 8-device jax.distributed mesh; each worker feeds only its
own data shard, and the resulting replicated ensembles must be identical on
both hosts AND bit-identical to the single-process 8-device mesh run
(SURVEY §2.4's multi-host component — the reference has nothing comparable).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ensemble import init_ensemble
from gbrl_tpu.optimizers import OptimizerSpec
from gbrl_tpu.parallel.sharded import (make_mesh, sharded_boost_step,
                                       sharded_train_step)

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_outputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("multihost")
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = d / f"worker_{pid}.npz"
        outs.append(out)
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(out)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [np.load(o) for o in outs]


def _single_process_reference():
    """The same computation on the in-process 8-device mesh."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    N, F, O = 512, 6, 2
    X = rng.normal(size=(N, F)).astype(np.float32)
    W = rng.normal(size=(F, O)).astype(np.float32)
    y = (X @ W).astype(np.float32)

    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=3, n_bins=8, grow_policy="greedy",
                     split_score_func="cosine")
    specs = (OptimizerSpec(algo="SGD", init_lr=0.2, start_idx=0, stop_idx=O),)
    fw = jnp.ones(F, dtype=jnp.float32)
    ens = init_ensemble(cfg, capacity=16)
    losses = []
    for _ in range(6):
        ens, loss = sharded_train_step(cfg, mesh, ens, jnp.asarray(X),
                                       jnp.asarray(y), fw, specs)
        losses.append(float(loss))
    g = rng.normal(size=(N, O)).astype(np.float32)
    for _ in range(2):
        ens = sharded_boost_step(cfg, mesh, ens, jnp.asarray(X),
                                 jnp.asarray(g), fw)
    return ens, losses


def test_two_hosts_match_each_other(worker_outputs):
    a, b = worker_outputs
    assert int(a["n_trees"]) == int(b["n_trees"]) == 8
    np.testing.assert_array_equal(a["feat"], b["feat"])
    np.testing.assert_array_equal(a["thr"], b["thr"])
    np.testing.assert_array_equal(a["is_split"], b["is_split"])
    np.testing.assert_array_equal(a["leaf_values"], b["leaf_values"])
    np.testing.assert_array_equal(a["losses"], b["losses"])


def test_hosts_match_single_process_mesh(worker_outputs):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    ens, losses = _single_process_reference()
    a = worker_outputs[0]
    np.testing.assert_array_equal(a["feat"], np.asarray(ens.feat))
    np.testing.assert_array_equal(a["is_split"], np.asarray(ens.is_split))
    # same split decisions; leaf sums may differ in f32 summation order
    # between the 2x4 and 1x8 device layouts
    np.testing.assert_allclose(a["thr"], np.asarray(ens.thr),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(a["leaf_values"], np.asarray(ens.leaf_values),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a["losses"], losses, rtol=1e-5, atol=1e-6)


def test_host_ppo_update_bit_identical(worker_outputs):
    """hosts.host_ppo_update from per-host rollout shards: the full PPO
    update phase (6 minibatch trees, 2 optimizers, normalized advantages)
    must leave a bit-identical replicated ensemble on both processes
    (ROADMAP multi-host RL item; the contract documented in
    parallel/hosts.py:host_ppo_update)."""
    a, b = worker_outputs
    assert int(a["ppo_n_trees"]) == int(b["ppo_n_trees"]) == 6
    np.testing.assert_array_equal(a["ppo_feat"], b["ppo_feat"])
    np.testing.assert_array_equal(a["ppo_thr"], b["ppo_thr"])
    np.testing.assert_array_equal(a["ppo_is_split"], b["ppo_is_split"])
    np.testing.assert_array_equal(a["ppo_leaf_values"], b["ppo_leaf_values"])
