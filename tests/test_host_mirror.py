"""HostMirror (utils/host_mirror.py): the host-resident rollout predictor
must reproduce the device predict path — same heap walk (node.cpp:77-96),
same -lr_o(t) optimizer coefficients (optimizer.cpp:110-118,
scheduler.h:124-133) — with incremental tree sync."""
import numpy as np
import pytest

from gbrl_tpu.learners.gbt_learner import GBTLearner
from gbrl_tpu.utils.host_mirror import HostMirror, _load_lib


def _make_learner(grow_policy="greedy", out_dim=3, two_opts=True,
                  linear=True):
    if two_opts:
        opts = [dict(algo="SGD", lr=f"lin_0.1" if linear else 0.1,
                     start_idx=0, stop_idx=out_dim - 1, T=40),
                dict(algo="SGD", lr=0.03, start_idx=out_dim - 1,
                     stop_idx=out_dim)]
    else:
        opts = [dict(algo="SGD", lr=0.1, start_idx=0, stop_idx=out_dim)]
    learner = GBTLearner(
        input_dim=6, output_dim=out_dim,
        tree_struct=dict(max_depth=3, n_bins=16, min_data_in_leaf=0,
                         par_th=2, grow_policy=grow_policy),
        optimizers=opts,
        params=dict(split_score_func="cosine", generator_type="Quantile"),
        device="cpu")
    learner.reset()
    learner.set_feature_mapping(np.ones(6, dtype=bool))
    return learner


def _fit_some(learner, rng, n=12):
    X = rng.normal(size=(128, 6)).astype(np.float32)
    for _ in range(n):
        g = rng.normal(size=(128, learner.output_dim)).astype(np.float32)
        learner.step(X, g)
    return X


@pytest.mark.parametrize("grow_policy", ["greedy", "oblivious"])
@pytest.mark.parametrize("two_opts", [False, True])
def test_mirror_matches_device_predict(grow_policy, two_opts):
    rng = np.random.default_rng(3)
    learner = _make_learner(grow_policy=grow_policy, two_opts=two_opts)
    X = _fit_some(learner, rng)
    mirror = HostMirror(learner)
    want = learner.predict(X[:32], requires_grad=False, tensor=False)
    got = mirror.predict(X[:32])
    np.testing.assert_allclose(got, want.reshape(got.shape),
                               rtol=1e-5, atol=1e-5)


def test_mirror_incremental_sync():
    rng = np.random.default_rng(4)
    learner = _make_learner()
    X = _fit_some(learner, rng, n=5)
    mirror = HostMirror(learner)
    assert mirror.n_synced == 5
    # grow the ensemble; mirror serves stale trees until sync
    for _ in range(300):   # crosses the mirror's initial 256-tree capacity
        g = rng.normal(size=(128, 3)).astype(np.float32)
        learner.step(X, g)
    assert mirror.sync() == 300
    want = learner.predict(X[:16], requires_grad=False, tensor=False)
    np.testing.assert_allclose(mirror.predict(X[:16]),
                               want.reshape(16, 3), rtol=1e-4, atol=1e-4)


def test_mirror_numpy_fallback_matches_c():
    rng = np.random.default_rng(5)
    learner = _make_learner(grow_policy="greedy")
    X = _fit_some(learner, rng)
    mirror = HostMirror(learner)
    got_np = mirror._predict_numpy(X[:16].astype(np.float32), None)
    if _load_lib() is not None:
        got_c = mirror.predict(X[:16])
        np.testing.assert_allclose(got_np, got_c, rtol=1e-5, atol=1e-6)
    want = learner.predict(X[:16], requires_grad=False, tensor=False)
    np.testing.assert_allclose(got_np, want.reshape(16, 3),
                               rtol=1e-5, atol=1e-5)


def test_mirror_adam_construction():
    learner = GBTLearner(
        input_dim=4, output_dim=1,
        tree_struct=dict(max_depth=2, n_bins=8, min_data_in_leaf=0,
                         par_th=2, grow_policy="greedy"),
        optimizers=[dict(algo="Adam", lr=0.1, start_idx=0, stop_idx=1)],
        params=dict(split_score_func="cosine", generator_type="Quantile"),
        device="cpu")
    learner.reset()
    m = HostMirror(learner)        # Adam is supported (numpy recurrence)
    assert m.has_adam and m.raw_leaf is not None


def test_mirror_adam_matches_device_predict():
    """Adam predict parity: the host mirror's sequential m/v recurrence must
    match the device's closed-form chunked evaluation
    (optimizers.adam_delta; reference optimizer.cpp:260-283)."""
    rng = np.random.default_rng(9)
    learner = GBTLearner(
        input_dim=6, output_dim=3,
        tree_struct=dict(max_depth=3, n_bins=16, min_data_in_leaf=0,
                         par_th=2, grow_policy="oblivious"),
        optimizers=[dict(algo="Adam", lr=0.05, start_idx=0, stop_idx=2),
                    dict(algo="SGD", lr=0.02, start_idx=2, stop_idx=3)],
        params=dict(split_score_func="cosine", generator_type="Quantile"),
        device="cpu")
    learner.reset()
    learner.set_feature_mapping(np.ones(6, dtype=bool))
    X = _fit_some(learner, rng, n=15)
    mirror = HostMirror(learner)
    want = learner.predict(X[:24], requires_grad=False, tensor=False)
    got = mirror.predict(X[:24])
    np.testing.assert_allclose(got, want.reshape(got.shape),
                               rtol=1e-4, atol=1e-5)
    # The C kernel's inline m/v recurrence must agree with the numpy
    # replica (and transitively with the device path above).
    if _load_lib() is not None:
        got_np = mirror._predict_numpy(X[:24].astype(np.float32), None)
        np.testing.assert_allclose(got, got_np, rtol=1e-5, atol=1e-6)


def test_mirror_adam_incremental_sync_c_kernel():
    """Adam alpha[t] must stay correct across incremental syncs and
    capacity growth (the A2C rollout pattern: sync after every update)."""
    rng = np.random.default_rng(11)
    learner = GBTLearner(
        input_dim=5, output_dim=2,
        tree_struct=dict(max_depth=2, n_bins=8, min_data_in_leaf=0,
                         par_th=2, grow_policy="greedy"),
        optimizers=[dict(algo="Adam", lr="lin_0.08", T=300,
                         start_idx=0, stop_idx=2)],
        params=dict(split_score_func="cosine", generator_type="Quantile"),
        device="cpu")
    learner.reset()
    learner.set_feature_mapping(np.ones(5, dtype=bool))
    X = rng.normal(size=(96, 5)).astype(np.float32)
    mirror = HostMirror(learner)
    for _ in range(6):
        for _ in range(50):   # crosses the 256-tree mirror capacity
            g = rng.normal(size=(96, 2)).astype(np.float32)
            learner.step(X, g)
        mirror.sync()
    want = learner.predict(X[:16], requires_grad=False, tensor=False)
    got = mirror.predict(X[:16])
    np.testing.assert_allclose(got, want.reshape(got.shape),
                               rtol=1e-4, atol=1e-4)


def test_mirror_bias_not_stale_after_fit():
    """fit() writes ens.bias directly (bias=mean(targets)); a mirror that
    already saw a non-None bias version must still pick it up (round-4
    advisor finding: gbt_learner.py fit() skipped the version bump)."""
    rng = np.random.default_rng(7)
    learner = _make_learner(out_dim=1, two_opts=False)
    learner.set_bias(np.array([5.0], np.float32))   # version -> non-None
    mirror = HostMirror(learner)
    assert mirror.bias[0] == 5.0
    X = rng.normal(size=(256, 6)).astype(np.float32)
    y = (X[:, :1] * 2.0 + 1.5).astype(np.float32)
    learner.fit(X, y, 5)
    mirror.sync()
    np.testing.assert_allclose(mirror.bias, np.asarray(learner.get_bias()),
                               rtol=0, atol=0)
    want = learner.predict(X[:16], requires_grad=False, tensor=False)
    got = mirror.predict(X[:16])
    np.testing.assert_allclose(got, want.reshape(got.shape),
                               rtol=1e-4, atol=1e-4)
