"""MultiGBTLearner API contract (mirrors reference tests/test_multi_gbt_learner.py):
fit/step/predict/save/load with same and different per-learner output dims,
model_idx addressing, tensor inputs."""
import numpy as np
import pytest
import torch as th

from gbrl_tpu.learners.multi_gbt_learner import MultiGBTLearner

TREE_STRUCT = {"max_depth": 3, "n_bins": 8, "min_data_in_leaf": 0}


def _opt(out):
    return {"algo": "SGD", "init_lr": 0.1, "scheduler": "Const",
            "start_idx": 0, "stop_idx": out}


def _make(out_dims, n=2):
    learner = MultiGBTLearner(
        input_dim=4, output_dim=out_dims, tree_struct=TREE_STRUCT,
        optimizers=[_opt(o) for o in (out_dims if isinstance(out_dims, list)
                                      else [out_dims] * n)],
        params={}, n_learners=n, device="cpu")
    learner.reset()
    return learner


def test_step_broadcast_and_addressing():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 4)).astype(np.float32)
    learner = _make(2)
    g = [rng.normal(size=(40, 2)).astype(np.float32) for _ in range(2)]
    learner.step(X, g)                      # broadcast
    assert learner.get_num_trees() == (1, 1)
    learner.step(X, g[0], model_idx=0)      # addressed
    assert learner.get_num_trees() == (2, 1)
    assert learner.get_num_trees(model_idx=1) == 1


def test_different_output_dims_and_predict():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(30, 4)).astype(np.float32)
    learner = _make([3, 1])
    learner.set_bias([np.zeros(3), np.ones(1)])
    g = [rng.normal(size=(30, 3)).astype(np.float32),
         rng.normal(size=(30, 1)).astype(np.float32)]
    learner.step(X, g)
    p0, p1 = learner.predict(X, requires_grad=False, tensor=False)
    assert p0.shape == (30, 3)
    assert p1.shape == (30,)            # output_dim 1 -> 1D
    single = learner.predict(X, requires_grad=False, tensor=False,
                             model_idx=1)
    np.testing.assert_allclose(single, p1, rtol=1e-6)


def test_fit_and_1d_targets():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(60, 4)).astype(np.float32)
    y = rng.normal(size=(60,)).astype(np.float32)
    learner = _make([1, 1])
    losses = learner.fit(X, [y, y], 5)
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    assert learner.get_num_trees() == (5, 5)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(30, 4)).astype(np.float32)
    learner = _make([2, 1], n=2)
    g = [rng.normal(size=(30, 2)).astype(np.float32),
         rng.normal(size=(30, 1)).astype(np.float32)]
    learner.step(X, g)
    base = str(tmp_path / "multi")
    learner.save(base)
    import os
    assert os.path.exists(base + ".gbrl_meta")
    loaded = MultiGBTLearner.load(base, device="cpu")
    assert loaded.n_learners == 2
    p = learner.predict(X, requires_grad=False, tensor=False)
    q = loaded.predict(X, requires_grad=False, tensor=False)
    for a, b in zip(p, q):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_tensor_inputs():
    rng = np.random.default_rng(4)
    X = th.tensor(rng.normal(size=(25, 4)), dtype=th.float32)
    learner = _make(1)
    g = [th.tensor(rng.normal(size=(25, 1)), dtype=th.float32)
         for _ in range(2)]
    learner.step(X, g)
    preds = learner.predict(X, requires_grad=True, tensor=True)
    assert all(isinstance(p, th.Tensor) and p.requires_grad for p in preds)
