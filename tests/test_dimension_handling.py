"""Edge-case matrix for input encodings (mirrors reference
tests/test_dimension_handling.py): 1-feature models, single-sample 1D vs 2D
inputs, 1D-vs-2D consistency, torch single-sample paths."""
import numpy as np
import pytest
import torch as th

from gbrl_tpu.models.gbt import GBTModel

TS = {"max_depth": 2, "n_bins": 4, "min_data_in_leaf": 0}


def _model(input_dim, output_dim=1):
    m = GBTModel(tree_struct=TS, input_dim=input_dim, output_dim=output_dim,
                 optimizers={"algo": "SGD", "lr": 0.5, "start_idx": 0,
                             "stop_idx": output_dim}, device="cpu")
    return m


def test_single_feature_column_input():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(30,)).astype(np.float32)      # 1D == 30 samples x 1
    y = (2 * X + 1).astype(np.float32)
    m = _model(1)
    m.set_bias_from_targets(y)
    m.step(X, grads=(np.zeros((30, 1)) + X[:, None]).astype(np.float32))
    p1 = m(X, requires_grad=False, tensor=False)
    p2 = m(X[:, None], requires_grad=False, tensor=False)
    assert p1.shape == (30,)
    np.testing.assert_allclose(p1, p2, rtol=1e-6)


def test_single_sample_1d_is_row():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(20, 5)).astype(np.float32)
    m = _model(5, 2)
    m.step(X, grads=rng.normal(size=(20, 2)).astype(np.float32))
    batch = m(X, requires_grad=False, tensor=False)
    one = m(X[3], requires_grad=False, tensor=False)   # 1D of len input_dim
    assert one.shape == (1, 2)
    np.testing.assert_allclose(one[0], batch[3], rtol=1e-6)


def test_torch_single_sample():
    rng = np.random.default_rng(2)
    X = th.tensor(rng.normal(size=(20, 5)), dtype=th.float32)
    m = _model(5)
    m.step(X, grads=rng.normal(size=(20, 1)).astype(np.float32))
    batch = m(X, requires_grad=False, tensor=False)
    one = m(X[3], requires_grad=False, tensor=False)
    np.testing.assert_allclose(float(one[0]), batch[3], rtol=1e-6)


def test_1d_grads_reshaped():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(20, 3)).astype(np.float32)
    m = _model(3)
    m.step(X, grads=rng.normal(size=(20,)).astype(np.float32))   # 1D grads
    assert m.get_num_trees() == 1


def test_shap_single_sample_dims():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(30, 3)).astype(np.float32)
    m = _model(3)
    m.step(X, grads=rng.normal(size=(30, 1)).astype(np.float32))
    sv2 = m.tree_shap(0, X[:1])
    sv1 = m.tree_shap(0, X[0])
    assert sv1.shape == (1, 3, 1) and sv2.shape == (1, 3, 1)
    np.testing.assert_allclose(sv1, sv2, rtol=1e-6)
