"""Predict-cache keying: the default path hashes every byte (exact), so a
pair of large inputs crafted to collide under the O(1MB) strided scheme
(opt-in via GBRL_TPU_FAST_CACHE_KEY_MB) cannot serve stale predictions."""
import numpy as np
import pytest

from gbrl_tpu.learners.gbt_learner import GBTLearner


def _learner():
    lr = GBTLearner(
        input_dim=8, output_dim=1,
        tree_struct=dict(max_depth=3, n_bins=16, min_data_in_leaf=0,
                         par_th=2, grow_policy="oblivious"),
        optimizers=[dict(algo="SGD", init_lr=0.1, start_idx=0, stop_idx=1)],
        params=dict(split_score_func="cosine", generator_type="Quantile"),
        device="cpu")
    lr.reset()
    lr.set_feature_mapping(np.ones(8, dtype=bool))
    return lr


def _crafted_pair():
    """Two distinct >1MB arrays that agree on both stride lattices and on
    every per-row and global sum of the strided key (same-row +-1 edits at
    off-lattice indices, integer-valued so float sums are exact)."""
    N, F = 65536, 8                       # 2 MB of float32 -> step=2, step2=3
    rng = np.random.default_rng(0)
    A = rng.integers(-8, 8, size=(N, F)).astype(np.float32)
    B = A.copy()
    # flat indices 3 and 5: both odd (miss stride-2 lattice) and
    # 3%3=0, 5%3=2 (miss the offset stride-3 lattice); same row (F=8)
    B.flat[3] += 1.0
    B.flat[5] -= 1.0
    assert not np.array_equal(A, B)
    nbytes = A.nbytes
    assert nbytes > (1 << 20)
    step = nbytes >> 20
    assert step == 2
    for idx in (3, 5):
        assert idx % step != 0
        assert (idx - step // 2) % (step + 1) != 0
    assert A[0].sum(dtype=np.float64) == B[0].sum(dtype=np.float64)
    return A, B


def test_crafted_pair_collides_under_strided_scheme(monkeypatch):
    """Sanity: the pair IS a collision for the opt-in strided key —
    otherwise the default-path test below would prove nothing."""
    monkeypatch.setenv("GBRL_TPU_FAST_CACHE_KEY_MB", "1")
    lr = _learner()
    A, B = _crafted_pair()
    _, _, key_a = lr._prepare(A, grow_vocab=False, with_key=True)
    _, _, key_b = lr._prepare(B, grow_vocab=False, with_key=True)
    assert key_a == key_b


def test_default_exact_key_defeats_crafted_collision():
    lr = _learner()
    A, B = _crafted_pair()
    _, _, key_a = lr._prepare(A, grow_vocab=False, with_key=True)
    _, _, key_b = lr._prepare(B, grow_vocab=False, with_key=True)
    assert key_a != key_b

    # end-to-end: warm the cache on A, then predict B — the result must
    # match a cache-free computation, not A's cached predictions
    rng = np.random.default_rng(1)
    for _ in range(3):
        lr.step(A, rng.normal(size=(A.shape[0], 1)).astype(np.float32))
    pa = lr.predict(A, requires_grad=False, tensor=False)
    assert lr._pred_cache is not None
    pb = lr.predict(B, requires_grad=False, tensor=False)
    fresh = _learner()
    # cache-free oracle: same trees, fresh learner state
    fresh.ens = lr.ens
    fresh._rl_host_n_trees = None
    pb_oracle = fresh.predict(B, requires_grad=False, tensor=False)
    np.testing.assert_array_equal(pb, pb_oracle)
    # and the edited rows genuinely route differently somewhere or at
    # least the exact key forced a recompute (pb is not the stale pa
    # object served from cache)
    assert pb is not pa


def test_incremental_cache_still_exact_after_new_trees():
    lr = _learner()
    A, _ = _crafted_pair()
    rng = np.random.default_rng(2)
    for _ in range(2):
        lr.step(A, rng.normal(size=(A.shape[0], 1)).astype(np.float32))
    p1 = lr.predict(A, requires_grad=False, tensor=False)
    for _ in range(2):
        lr.step(A, rng.normal(size=(A.shape[0], 1)).astype(np.float32))
    p2 = lr.predict(A, requires_grad=False, tensor=False)   # cache + delta
    fresh = _learner()
    fresh.ens = lr.ens
    oracle = fresh.predict(A, requires_grad=False, tensor=False)
    np.testing.assert_allclose(p2, oracle, rtol=1e-5, atol=1e-6)
    assert not np.allclose(p1, p2)
