"""API-parity tests for the model layer, mirroring the reference suite's
torch-autograd workflow (test_gbt_single.py: rmse_model loop, copy
equivalence, save->load->continue-training)."""
import os
import tempfile

import numpy as np
import pytest
import torch as th
from sklearn import datasets
from torch.nn.functional import mse_loss

from gbrl_tpu.models.gbt import GBTModel
from gbrl_tpu.models.actor_critic import ActorCritic
from gbrl_tpu.models.actor import ParametricActor, GaussianActor
from gbrl_tpu.models.critic import DiscreteCritic, ContinuousCritic

TREE_STRUCT = {"max_depth": 4, "n_bins": 64, "min_data_in_leaf": 0,
               "par_th": 2, "grow_policy": "greedy"}


@pytest.fixture(scope="module")
def diabetes():
    X, y = datasets.load_diabetes(return_X_y=True, as_frame=False,
                                  scaled=False)
    return (th.tensor(X[:150], dtype=th.float32),
            y[:150].astype(np.float32)[:, None])


def rmse_model(model, X, y, n_epochs):
    y_ = th.tensor(y, dtype=th.float32).squeeze()
    for _ in range(n_epochs):
        y_pred = model(X, requires_grad=True)
        loss = 0.5 * mse_loss(y_pred, y_)
        loss.backward()
        model.step()
    y_pred = model(X)
    return (0.5 * mse_loss(y_pred, y_)).sqrt().item()


def _make_model(out_dim=1, input_dim=10, **overrides):
    params = dict(control_variates=False, split_score_func="Cosine",
                  generator_type="Quantile")
    params.update(overrides.pop("params", {}))
    opt = {"algo": "SGD", "lr": 1.0, "start_idx": 0, "stop_idx": out_dim}
    return GBTModel(tree_struct=dict(TREE_STRUCT, **overrides),
                    input_dim=input_dim, output_dim=out_dim,
                    optimizers=opt, params=params, verbose=0, device="cpu")


def test_torch_loop_converges(diabetes):
    X, y = diabetes
    model = _make_model()
    model.set_bias_from_targets(y)
    loss = rmse_model(model, X, y, 25)
    assert loss < 30
    assert model.get_num_trees() == 25
    assert model.get_iteration() == 25


def test_predict_shapes_and_types(diabetes):
    X, y = diabetes
    model = _make_model()
    model.set_bias_from_targets(y)
    out = model(X, requires_grad=True)
    assert isinstance(out, th.Tensor) and out.requires_grad
    assert out.shape == (len(X),)                 # 1D for output_dim == 1
    out_np = model(X.numpy(), requires_grad=False, tensor=False)
    assert isinstance(out_np, np.ndarray)
    np.testing.assert_allclose(out.detach().numpy(), out_np, rtol=1e-6)
    # single-sample 1D input == row of batch
    one = model(X[0].numpy(), requires_grad=False, tensor=False)
    np.testing.assert_allclose(one[0], out_np[0], rtol=1e-6)


def test_save_load_continue(diabetes, tmp_path):
    X, y = diabetes
    model = _make_model()
    model.set_bias_from_targets(y)
    rmse_model(model, X, y, 5)
    p = str(tmp_path / "m1")
    model.save_learner(p)
    loaded = GBTModel.load_learner(p, device="cpu")
    np.testing.assert_allclose(
        model(X, requires_grad=False, tensor=False),
        loaded(X, requires_grad=False, tensor=False), rtol=1e-6)
    # continue training the loaded model
    rmse_model(loaded, X, y, 3)
    assert loaded.get_num_trees() == 8


def test_copy_equivalence(diabetes):
    X, y = diabetes
    model = _make_model()
    model.set_bias_from_targets(y)
    rmse_model(model, X, y, 4)
    clone = model.copy()
    # incremental prediction caching changes f32 summation order, so
    # equality is to tolerance (the reference tests use np.allclose too,
    # test_gbt_single.py:154-174)
    np.testing.assert_allclose(
        model(X, requires_grad=False, tensor=False),
        clone(X, requires_grad=False, tensor=False), rtol=1e-5, atol=1e-5)
    # training the clone must not affect the original
    rmse_model(clone, X, y, 2)
    assert model.get_num_trees() == 4 and clone.get_num_trees() == 6


def test_fit_api(diabetes):
    X, y = diabetes
    model = _make_model(grow_policy="oblivious",
                        params={"split_score_func": "L2"})
    opt_loss = model.fit(X.numpy(), y, 40, shuffle=True)
    assert model.get_num_trees() == 40
    assert opt_loss < 40


def test_shared_actor_critic(diabetes):
    X, y = diabetes
    out_dim = 5
    y_multi = np.tile(y, (1, out_dim))
    model = ActorCritic(
        tree_struct=TREE_STRUCT, input_dim=10, output_dim=out_dim,
        policy_optimizer={"policy_algo": "SGD", "policy_lr": 1.0,
                          "start_idx": 0, "stop_idx": out_dim - 1},
        value_optimizer={"value_algo": "SGD", "value_lr": 0.1,
                         "start_idx": out_dim - 1, "stop_idx": out_dim},
        shared_tree_struct=True, device="cpu")
    y_ac = th.tensor(y_multi[:, :-1], dtype=th.float32)
    y_v = th.tensor(y_multi[:, -1], dtype=th.float32)
    for _ in range(15):
        theta, value = model(X, requires_grad=True)
        loss_theta = 0.5 * mse_loss(theta, y_ac) * y_ac.shape[1]
        loss_theta.backward()
        loss_value = 0.5 * mse_loss(value, y_v)
        loss_value.backward()
        model.step()
    assert model.get_num_trees() == 15
    theta, value = model(X, requires_grad=False)
    assert theta.shape == (len(X), out_dim - 1)
    assert value.shape == (len(X),)
    pol = model.predict_policy(X, requires_grad=False)
    val = model.predict_values(X, requires_grad=False)
    np.testing.assert_allclose(theta.detach(), pol.detach(), rtol=1e-6)
    np.testing.assert_allclose(value.detach(), val.detach(), rtol=1e-6)


def test_separate_actor_critic(diabetes):
    X, y = diabetes
    out_dim = 4
    model = ActorCritic(
        tree_struct=TREE_STRUCT, input_dim=10, output_dim=out_dim,
        policy_optimizer={"algo": "SGD", "lr": 1.0, "start_idx": 0,
                          "stop_idx": out_dim - 1},
        value_optimizer={"algo": "SGD", "lr": 0.1, "start_idx": out_dim - 1,
                         "stop_idx": out_dim},
        shared_tree_struct=False, device="cpu")
    y_ac = th.tensor(np.tile(y, (1, out_dim - 1)), dtype=th.float32)
    y_v = th.tensor(y[:, 0], dtype=th.float32)
    for _ in range(5):
        theta, value = model(X, requires_grad=True)
        (0.5 * mse_loss(theta, y_ac) * y_ac.shape[1]).backward()
        (0.5 * mse_loss(value.squeeze(), y_v)).backward()
        model.step()
    nt = model.get_num_trees()
    assert nt == (5, 5)


def test_parametric_actor(diabetes):
    X, y = diabetes
    model = ParametricActor(
        tree_struct=TREE_STRUCT, input_dim=10, output_dim=3,
        policy_optimizer={"algo": "SGD", "lr": 0.5, "start_idx": 0,
                          "stop_idx": 3}, device="cpu")
    y3 = th.tensor(np.tile(y, (1, 3)), dtype=th.float32)
    for _ in range(3):
        out = model(X, requires_grad=True)
        (0.5 * mse_loss(out, y3) * 3).backward()
        model.step()
    assert model.get_num_trees() == 3


def test_gaussian_actor(diabetes):
    X, y = diabetes
    model = GaussianActor(
        tree_struct=TREE_STRUCT, input_dim=10, output_dim=4,
        mu_optimizer={"mu_algo": "SGD", "mu_lr": 0.5, "start_idx": 0,
                      "stop_idx": 2},
        std_optimizer={"std_algo": "SGD", "std_lr": 0.05, "start_idx": 2,
                       "stop_idx": 4},
        log_std_init=-1.5, device="cpu")
    mu, log_std = model(X, requires_grad=True)
    assert mu.shape == (len(X), 2) and log_std.shape == (len(X), 2)
    np.testing.assert_allclose(log_std.detach().numpy(), -1.5, rtol=1e-6)
    y2 = th.tensor(np.tile(y, (1, 2)), dtype=th.float32)
    (0.5 * mse_loss(mu, y2)).backward()
    (log_std.sum() / len(X)).backward()
    model.step()
    assert model.get_num_trees() == 1


def test_discrete_critic_target_prefix(diabetes):
    X, y = diabetes
    model = DiscreteCritic(
        tree_struct=TREE_STRUCT, input_dim=10, output_dim=2,
        critic_optimizer={"algo": "SGD", "lr": 1.0, "start_idx": 0,
                          "stop_idx": 2},
        target_update_interval=4, device="cpu")
    y2 = th.tensor(np.tile(y, (1, 2)), dtype=th.float32)
    frozen = None
    for i in range(6):
        q = model(X, requires_grad=True)
        (0.5 * mse_loss(q, y2) * 2).backward()
        model.step()
        if model.get_num_trees() == 4:
            frozen = model.predict_target(X, tensor=False).copy()
    assert model.target_prefix == 4
    # target output must still equal the 4-tree snapshot after 6 trees
    np.testing.assert_allclose(model.predict_target(X, tensor=False), frozen,
                               rtol=1e-6)


def test_actor_critic_save_load(diabetes, tmp_path):
    X, y = diabetes
    out_dim = 3
    model = ActorCritic(
        tree_struct=TREE_STRUCT, input_dim=10, output_dim=out_dim,
        policy_optimizer={"policy_algo": "SGD", "policy_lr": 1.0,
                          "start_idx": 0, "stop_idx": out_dim - 1},
        value_optimizer={"value_algo": "SGD", "value_lr": 0.1,
                         "start_idx": out_dim - 1, "stop_idx": out_dim},
        shared_tree_struct=True, device="cpu")
    y_ac = th.tensor(np.tile(y, (1, out_dim - 1)), dtype=th.float32)
    y_v = th.tensor(y[:, 0], dtype=th.float32)
    for _ in range(3):
        theta, value = model(X, requires_grad=True)
        (0.5 * mse_loss(theta, y_ac) * (out_dim - 1)).backward()
        (0.5 * mse_loss(value, y_v)).backward()
        model.step()
    p = str(tmp_path / "ac_shared")
    model.save_learner(p)
    loaded = ActorCritic.load_learner(p, device="cpu")
    t0, v0 = model(X, requires_grad=False)
    t1, v1 = loaded(X, requires_grad=False)
    np.testing.assert_allclose(t0.detach(), t1.detach(), rtol=1e-6)
    np.testing.assert_allclose(v0.detach(), v1.detach(), rtol=1e-6)
