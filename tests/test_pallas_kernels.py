"""Pallas kernels: interpret-mode parity with the XLA reference ops."""
import numpy as np
import jax.numpy as jnp
import pytest

from gbrl_tpu.config import TreeConfig
from gbrl_tpu.ops.candidates import bucketize, numerical_candidates
from gbrl_tpu.ops.pallas_kernels import bucketize_pallas


@pytest.mark.parametrize("n,f,b", [(1000, 7, 33), (512, 3, 8), (100, 1, 4)])
def test_bucketize_pallas_matches_xla(n, f, b):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    cfg = TreeConfig(input_dim=f, output_dim=1, n_num_features=f, n_bins=b)
    cand = numerical_candidates(cfg, X)
    a = bucketize(X, cand)
    out = bucketize_pallas(X, cand, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(out))


@pytest.mark.parametrize("n,f,o,n_nodes,buckets",
                         [(1000, 7, 3, 4, 33), (512, 3, 1, 1, 257),
                          (100, 1, 2, 8, 9)])
def test_level_histogram_pallas_matches_segment_sum(n, f, o, n_nodes, buckets):
    from gbrl_tpu.ops.fit import _node_expand
    from gbrl_tpu.ops.pallas_kernels import level_histogram_pallas

    rng = np.random.default_rng(1)
    Xb = jnp.asarray(rng.integers(0, buckets, size=(n, f)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(n, o)).astype(np.float32))
    sw = jnp.asarray((rng.random(n) > 0.1).astype(np.float32))
    node_rel = jnp.asarray(rng.integers(0, n_nodes, size=(n,)).astype(np.int32))

    nd = _node_expand(node_rel, g, sw, n_nodes)
    got = level_histogram_pallas(Xb, nd, buckets, interpret=True)
    got = np.asarray(got).reshape(f, n_nodes, o + 1, buckets
                                  ).transpose(0, 1, 3, 2)

    # segment-sum reference (the non-TPU path of fit._level_histogram)
    import jax
    ids = (jnp.arange(f, dtype=jnp.int32)[None, :] * n_nodes
           + node_rel[:, None]) * buckets + Xb
    data = jnp.concatenate([g * sw[:, None], sw[:, None]], axis=-1)
    data = jnp.broadcast_to(data[:, None, :], (n, f, o + 1)
                            ).reshape(n * f, o + 1)
    want = jax.ops.segment_sum(data, ids.reshape(-1),
                               num_segments=f * n_nodes * buckets
                               ).reshape(f, n_nodes, buckets, o + 1)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,f,o,depth,t_cap", [(300, 5, 3, 3, 7),
                                               (1000, 16, 2, 4, 130)])
def test_weighted_leaf_sum_pallas_matches_xla(n, f, o, depth, t_cap):
    import jax.numpy as jnp
    from gbrl_tpu.config import TreeConfig
    from gbrl_tpu.ensemble import init_ensemble
    from gbrl_tpu.ops.pallas_kernels import weighted_leaf_sum_pallas
    from gbrl_tpu.ops.predict import weighted_leaf_sum

    rng = np.random.default_rng(2)
    cfg = TreeConfig(input_dim=f, output_dim=o, n_num_features=f,
                     max_depth=depth)
    L = 1 << depth
    IN = L - 1
    cap = 1 << (t_cap - 1).bit_length()
    ens = init_ensemble(cfg, capacity=cap)
    ens = ens.replace(
        feat=jnp.asarray(rng.integers(-1, f, size=(cap, IN)).astype(np.int32)),
        thr=jnp.asarray(rng.normal(size=(cap, IN)).astype(np.float32)),
        is_split=jnp.asarray(rng.random((cap, IN)) > 0.3),
        leaf_values=jnp.asarray(rng.normal(size=(cap, L, o)).astype(np.float32)),
        n_trees=jnp.asarray(t_cap, dtype=jnp.int32))
    X = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    coeff = jnp.asarray(
        (rng.normal(size=(cap, o)) *
         (np.arange(cap) < t_cap)[:, None]).astype(np.float32))
    want = weighted_leaf_sum(cfg, ens, X, coeff)
    w = ens.leaf_values * coeff[:, None, :]
    got = weighted_leaf_sum_pallas(X, ens.feat, ens.thr, ens.is_split, w,
                                   cfg.max_depth, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("policy,score", [("greedy", "cosine"),
                                          ("greedy", "l2"),
                                          ("oblivious", "cosine"),
                                          ("oblivious", "l2")])
def test_fused_level_path_matches_xla(policy, score):
    """The fully-fused Pallas level path (level_histogram_pallas raw +
    level_score_pallas, interpret mode) must produce the identical tree as
    the pure-XLA scoring pipeline, including tie-breaks and leaf values."""
    import jax.numpy as jnp
    from gbrl_tpu.config import TreeConfig
    from gbrl_tpu.ops import fit as fitmod
    from gbrl_tpu.ops.candidates import bucketize, numerical_candidates
    from gbrl_tpu.ops.fit import build_tree

    rng = np.random.default_rng(11)
    N, F, O, B, D = 700, 5, 3, 16, 4
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=D, n_bins=B, grow_policy=policy,
                     split_score_func=score, generator_type="quantile")
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
    w, fw = jnp.ones(N), jnp.ones(F)
    cand = numerical_candidates(cfg, X)
    Xb = bucketize(X, cand)
    t_xla = build_tree(cfg, Xb, cand, g, g, w, fw)
    fitmod._FORCE_FUSED_INTERPRET = True
    try:
        t_fused = build_tree(cfg, Xb, cand, g, g, w, fw)
    finally:
        fitmod._FORCE_FUSED_INTERPRET = False
    np.testing.assert_array_equal(np.asarray(t_xla["feat"]),
                                  np.asarray(t_fused["feat"]))
    np.testing.assert_array_equal(np.asarray(t_xla["is_split"]),
                                  np.asarray(t_fused["is_split"]))
    np.testing.assert_allclose(np.asarray(t_xla["thr"]),
                               np.asarray(t_fused["thr"]))
    np.testing.assert_allclose(np.asarray(t_xla["leaf_values"]),
                               np.asarray(t_fused["leaf_values"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_xla["counts"]),
                               np.asarray(t_fused["counts"]))


@pytest.mark.parametrize("policy,score", [("greedy", "cosine"),
                                          ("greedy", "l2"),
                                          ("oblivious", "cosine"),
                                          ("oblivious", "l2")])
def test_fused_tree_kernel_matches_xla(policy, score):
    """The single-kernel whole-tree path (tree_build_pallas, interpret
    mode) must produce the identical tree as the pure-XLA pipeline —
    structure, thresholds, leaf values, counts — across grow policies and
    scores, including the cross-level no-reuse masks and routing."""
    import jax.numpy as jnp
    from gbrl_tpu.config import TreeConfig
    from gbrl_tpu.ops import fit as fitmod
    from gbrl_tpu.ops.candidates import bucketize, numerical_candidates
    from gbrl_tpu.ops.fit import build_tree

    rng = np.random.default_rng(21)
    N, F, O, B, D = 700, 5, 3, 16, 4
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=D, n_bins=B, grow_policy=policy,
                     split_score_func=score, generator_type="quantile")
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
    w, fw = jnp.ones(N), jnp.ones(F)
    cand = numerical_candidates(cfg, X)
    Xb = bucketize(X, cand)
    t_xla = build_tree(cfg, Xb, cand, g, g, w, fw)
    fitmod._FORCE_FUSED_INTERPRET = True
    fitmod._DISABLE_FUSED_TREE = False
    try:
        t_fused = build_tree(cfg, Xb, cand, g, g, w, fw)
    finally:
        fitmod._FORCE_FUSED_INTERPRET = False
        fitmod._DISABLE_FUSED_TREE = True
    np.testing.assert_array_equal(np.asarray(t_xla["feat"]),
                                  np.asarray(t_fused["feat"]))
    np.testing.assert_array_equal(np.asarray(t_xla["is_split"]),
                                  np.asarray(t_fused["is_split"]))
    np.testing.assert_allclose(np.asarray(t_xla["thr"]),
                               np.asarray(t_fused["thr"]))
    np.testing.assert_allclose(np.asarray(t_xla["leaf_values"]),
                               np.asarray(t_fused["leaf_values"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_xla["counts"]),
                               np.asarray(t_fused["counts"]))
    assert int(t_xla["depth"]) == int(t_fused["depth"])


def test_fused_tree_kernel_min_data_and_weights():
    """min_data_in_leaf, masked sample weights and non-uniform feature
    weights flow through the whole-tree kernel identically to XLA."""
    import jax.numpy as jnp
    from gbrl_tpu.config import TreeConfig
    from gbrl_tpu.ops import fit as fitmod
    from gbrl_tpu.ops.candidates import bucketize, numerical_candidates
    from gbrl_tpu.ops.fit import build_tree

    rng = np.random.default_rng(22)
    N, F, O, B, D = 400, 4, 2, 8, 3
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=D, n_bins=B, grow_policy="greedy",
                     split_score_func="cosine", generator_type="uniform",
                     min_data_in_leaf=20)
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
    w = jnp.asarray((rng.random(N) > 0.2).astype(np.float32))
    fw = jnp.asarray(np.array([1.0, 0.1, 2.0, 0.0], dtype=np.float32))
    cand = numerical_candidates(cfg, X)
    Xb = bucketize(X, cand)
    t_xla = build_tree(cfg, Xb, cand, g, g, w, fw)
    fitmod._FORCE_FUSED_INTERPRET = True
    fitmod._DISABLE_FUSED_TREE = False
    try:
        t_fused = build_tree(cfg, Xb, cand, g, g, w, fw)
    finally:
        fitmod._FORCE_FUSED_INTERPRET = False
        fitmod._DISABLE_FUSED_TREE = True
    np.testing.assert_array_equal(np.asarray(t_xla["feat"]),
                                  np.asarray(t_fused["feat"]))
    np.testing.assert_array_equal(np.asarray(t_xla["is_split"]),
                                  np.asarray(t_fused["is_split"]))
    np.testing.assert_allclose(np.asarray(t_xla["leaf_values"]),
                               np.asarray(t_fused["leaf_values"]),
                               atol=1e-5)


def test_fused_level_path_min_data_and_weights():
    """min_data_in_leaf and non-uniform feature weights flow through the
    fused kernel identically to the XLA path."""
    import jax.numpy as jnp
    from gbrl_tpu.config import TreeConfig
    from gbrl_tpu.ops import fit as fitmod
    from gbrl_tpu.ops.candidates import bucketize, numerical_candidates
    from gbrl_tpu.ops.fit import build_tree

    rng = np.random.default_rng(12)
    N, F, O, B, D = 400, 4, 2, 8, 3
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=D, n_bins=B, grow_policy="greedy",
                     split_score_func="cosine", generator_type="uniform",
                     min_data_in_leaf=20)
    X = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, O)).astype(np.float32))
    w = jnp.asarray((rng.random(N) > 0.2).astype(np.float32))
    fw = jnp.asarray(np.array([1.0, 0.1, 2.0, 0.0], dtype=np.float32))
    cand = numerical_candidates(cfg, X)
    Xb = bucketize(X, cand)
    t_xla = build_tree(cfg, Xb, cand, g, g, w, fw)
    fitmod._FORCE_FUSED_INTERPRET = True
    try:
        t_fused = build_tree(cfg, Xb, cand, g, g, w, fw)
    finally:
        fitmod._FORCE_FUSED_INTERPRET = False
    np.testing.assert_array_equal(np.asarray(t_xla["feat"]),
                                  np.asarray(t_fused["feat"]))
    np.testing.assert_array_equal(np.asarray(t_xla["is_split"]),
                                  np.asarray(t_fused["is_split"]))
    np.testing.assert_allclose(np.asarray(t_xla["leaf_values"]),
                               np.asarray(t_fused["leaf_values"]), atol=1e-5)


@pytest.mark.parametrize("n,f,o,depth,t_fit", [(300, 5, 3, 3, 20),
                                               (700, 16, 2, 4, 40)])
def test_oblivious_leaf_sum_pallas_bitwise(n, f, o, depth, t_fit):
    """The oblivious fast path must be BIT-identical to the general kernel
    on fitted oblivious ensembles, including x == threshold ties (routing
    exactness is what the compiled-reference prediction goldens rely on)."""
    import jax
    import jax.numpy as jnp
    from gbrl_tpu.config import tree_config_from_dicts
    from gbrl_tpu.ensemble import init_ensemble
    from gbrl_tpu.ops.boosting import boost_step
    from gbrl_tpu.ops.pallas_kernels import (oblivious_leaf_sum_pallas,
                                             weighted_leaf_sum_pallas)
    from gbrl_tpu.ops.predict import weighted_leaf_sum
    from gbrl_tpu.optimizers import OptimizerSpec, sgd_coeff

    rng = np.random.default_rng(3)
    cfg = tree_config_from_dicts(
        f, o, dict(max_depth=depth, n_bins=32, min_data_in_leaf=0, par_th=2,
                   grow_policy="oblivious"),
        dict(split_score_func="cosine", generator_type="Quantile"))
    X = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, o)).astype(np.float32))
    fw = jnp.ones(f, dtype=jnp.float32)
    cap = 1 << (2 * t_fit - 1).bit_length()
    ens = init_ensemble(cfg, capacity=cap)
    step = jax.jit(lambda e: boost_step(cfg, e, X, y, fw))
    for _ in range(t_fit):
        ens = step(ens)
    specs = (OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=0,
                           stop_idx=o),)
    coeff = sgd_coeff(specs, cap, o, ens.n_trees, 0, cap)
    w = ens.leaf_values * coeff[:, None, :]

    # inject exact-tie rows: feature values equal to fitted thresholds
    Xe = np.asarray(X).copy()
    thr_np = np.asarray(ens.thr)
    Xe[: n // 4, 0] = thr_np[0, 0]
    Xe[: n // 4, f - 1] = thr_np[min(3, t_fit - 1), 1]
    for XX in (X, jnp.asarray(Xe)):
        gen = np.asarray(weighted_leaf_sum_pallas(
            XX, ens.feat, ens.thr, ens.is_split, w, depth,
            n_trees=ens.n_trees, interpret=True))
        obl = np.asarray(oblivious_leaf_sum_pallas(
            XX, ens.feat, ens.thr, ens.is_split, w, depth,
            n_trees=ens.n_trees, interpret=True))
        np.testing.assert_array_equal(obl, gen)
        # and both track the f32 XLA reference closely
        xla = np.asarray(weighted_leaf_sum(cfg, ens, XX, coeff))
        np.testing.assert_allclose(obl, xla, rtol=2e-3, atol=2e-3)
