"""Cross-implementation SHAP validation against the UNMODIFIED compiled
reference (linear TreeSHAP, shap.cpp).

The reference validates its SHAP against the ``shap`` package at rtol=1e-3
(/root/reference/tests/test_gbt_single.py:226-250); that package is not
installed here, so the compiled reference serves as the cross-library
oracle: models fitted by the reference's own ``fit`` (60 trees, both grow
policies, 1- and 3-output) are imported into this framework and our device
TreeSHAP (ops/shap_device.py) must reproduce the reference's per-feature
attributions.  Local accuracy (sum of SHAP + expected value == prediction)
is already covered by tests/test_shap.py against brute-force exact Shapley.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference/gbrl/src/cpp"
BR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "bench_reference")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.isdir(REF),
    reason="needs g++ and the mounted reference sources")

N, F, MAX_DEPTH = 512, 8, 4


def _reference_poly_vectors(max_depth):
    """The reference's exact poly-vector construction
    (/root/reference/gbrl/common/utils.py:317-372)."""
    from scipy.special import binom
    base_poly = np.polynomial.chebyshev.chebpts2(max_depth).astype(np.float32)
    base_poly = (base_poly + 1) * 0.5 + 2.0          # scaled to [2, 3]
    depth = base_poly.shape[0]
    norm_values = np.zeros((depth + 1, depth))
    for i in range(1, depth + 1):
        norm_weights = binom(i - 1, np.arange(i))
        norm_values[i, :i] = np.linalg.inv(
            np.vander(base_poly[:i]).T).dot(1.0 / norm_weights)
    offset = np.vander(base_poly + 1).T[::-1]
    return (base_poly.astype(np.float32),
            norm_values.astype(np.float32), offset.astype(np.float32))


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shap_golden")
    srcs = [f"{REF}/{f}" for f in (
        "gbrl.cpp", "fitter.cpp", "node.cpp", "predictor.cpp",
        "split_candidate_generator.cpp", "optimizer.cpp", "scheduler.cpp",
        "loss.cpp", "math_ops.cpp", "types.cpp", "utils.cpp", "shap.cpp",
        "data_structs.cpp")]
    for gen in ("make_fit_golden", "make_shap_golden"):
        exe = d / gen
        subprocess.run(["g++", "-O1", "-fopenmp", "-std=c++17", f"-I{REF}",
                        "-I/root/reference/gbrl/include",
                        os.path.join(BR, f"{gen}.cpp"), *srcs,
                        "-o", str(exe)], check=True, capture_output=True)
    subprocess.run([str(d / "make_fit_golden"), str(d)], check=True,
                   capture_output=True)
    base, norm, offset = _reference_poly_vectors(MAX_DEPTH)
    np.savetxt(d / "shap_poly_base.txt", base.reshape(-1))
    np.savetxt(d / "shap_poly_norm.txt", norm.reshape(-1))
    np.savetxt(d / "shap_poly_offset.txt", offset.reshape(-1))
    subprocess.run([str(d / "make_shap_golden"), str(d)], check=True,
                   capture_output=True)
    return d


@pytest.mark.parametrize("tag,out_dim", [("A", 1), ("B", 3)])
def test_shap_matches_reference_binary(golden_dir, tag, out_dim):
    """ref_compat mode reproduces the reference's ensemble_shap outputs on
    models fit by the reference binary (shap.cpp:259-333), including its
    nearest-ancestor handling of repeated path features."""
    from gbrl_tpu.utils.reference_import import load_reference_model

    X = np.loadtxt(golden_dir / "fit_X.txt").astype(np.float32).reshape(N, F)
    ref = np.loadtxt(golden_dir / f"fit_shap_{tag}.txt").reshape(
        N, F, out_dim)
    learner = load_reference_model(
        str(golden_dir / f"fit_{tag}.gbrl_model"), device="cpu")
    ours = learner.shap(X, ref_compat=True)
    assert ours.shape == (N, F, out_dim)
    # the reference's own bar vs the shap package is rtol=1e-3; attributions
    # span ~[-2, 2] here so a small atol absorbs float32 noise near zero
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)


def _brute_force_tree_shap(cfg, ens, tree_idx, X):
    """Exact path-dependent Shapley by subset enumeration over one tree's
    feature set (the semantics of shap.TreeExplainer, the reference's own
    external validation oracle, test_gbt_single.py:226-250)."""
    import itertools
    import math

    D = cfg.max_depth
    L = 1 << D
    counts = np.asarray(ens.counts[tree_idx], dtype=np.float64)
    feat = np.asarray(ens.feat[tree_idx])
    thr = np.asarray(ens.thr[tree_idx])
    spl = np.asarray(ens.is_split[tree_idx])
    lv = np.asarray(ens.leaf_values[tree_idx])
    O = lv.shape[-1]

    def leaf_slots(leaf):
        out = []
        for d in range(D):
            node = (1 << d) - 1 + (leaf >> (D - d))
            direction = (leaf >> (D - 1 - d)) & 1
            child = 2 * node + 1 + direction
            w = counts[child] / counts[node] if counts[node] > 0 else 0.0
            out.append((int(feat[node]), float(thr[node]), direction, w,
                        bool(spl[node])))
        return out

    def v_of(x, S):
        tot = np.zeros(O)
        for leaf in range(L):
            p = 1.0
            for f, t, direc, w, valid in leaf_slots(leaf):
                if not valid:
                    continue
                p *= (1.0 if (x[f] > t) == bool(direc) else 0.0) \
                    if f in S else w
                if p == 0.0:
                    break
            tot += p * lv[leaf]
        return tot

    feats = sorted({int(feat[n]) for n in range(L - 1) if spl[n]})
    k = len(feats)
    phi = np.zeros((X.shape[0], X.shape[1], O))
    for i, x in enumerate(X):
        for j in feats:
            others = [f for f in feats if f != j]
            for rsz in range(len(others) + 1):
                for S in itertools.combinations(others, rsz):
                    w = (math.factorial(len(S))
                         * math.factorial(k - len(S) - 1) / math.factorial(k))
                    phi[i, j] += w * (v_of(x, set(S) | {j}) - v_of(x, set(S)))
    return phi


@pytest.mark.parametrize("tag", ["A", "B"])
def test_shap_exact_on_imported_models(golden_dir, tag):
    """The DEFAULT shap path is exact Shapley — validated by brute-force
    subset enumeration on trees fit by the reference binary (stronger than
    the reference's own single-sample shap-package check).  The reference
    C++ itself deviates from exact Shapley when a feature repeats
    non-adjacently along a path (see ops/shap_refcompat.py docstring), so
    exactness can only be proven against enumeration, not the golden."""
    from gbrl_tpu.utils.reference_import import load_reference_model

    X = np.loadtxt(golden_dir / "fit_X.txt").astype(np.float32).reshape(N, F)
    learner = load_reference_model(
        str(golden_dir / f"fit_{tag}.gbrl_model"), device="cpu")
    Xs = X[:8]
    for tree_idx in (0, int(np.asarray(learner.ens.n_trees)) - 1):
        ours = learner.tree_shap(tree_idx, Xs)
        bf = _brute_force_tree_shap(learner.cfg, learner.ens, tree_idx, Xs)
        np.testing.assert_allclose(ours, bf, rtol=1e-4, atol=1e-5)


def test_shap_device_probability_counts_regression(golden_dir):
    """Regression: ops/shap_device.py must derive cold edge weights as
    counts[child]/counts[parent] even when counts hold path PROBABILITIES
    < 1 (imported reference models) rather than absolute sample counts.
    A div-by-zero guard that floored the divisor at 1.0 silently returned
    the child probability instead of the ratio (fixed round 3)."""
    from gbrl_tpu.utils.reference_import import load_reference_model

    X = np.loadtxt(golden_dir / "fit_X.txt").astype(np.float32).reshape(N, F)
    learner = load_reference_model(
        str(golden_dir / f"fit_A.gbrl_model"), device="cpu")
    base = learner.shap(X[:16])
    # scaling all counts by a common factor leaves every ratio unchanged;
    # SHAP must be invariant
    scaled = learner.ens.replace(counts=learner.ens.counts * 1000.0)
    learner.ens = scaled
    np.testing.assert_allclose(learner.shap(X[:16]), base,
                               rtol=1e-5, atol=1e-6)


def test_tree_shap_single_tree_matches(golden_dir):
    """Per-tree SHAP (tree_shap) for the first tree of config B."""
    from gbrl_tpu.utils.reference_import import load_reference_model

    X = np.loadtxt(golden_dir / "fit_X.txt").astype(np.float32).reshape(N, F)
    learner = load_reference_model(str(golden_dir / "fit_B.gbrl_model"),
                                   device="cpu")
    full = learner.shap(X)
    per_tree = sum(learner.tree_shap(t, X)
                   for t in range(int(np.asarray(learner.ens.n_trees))))
    np.testing.assert_allclose(per_tree, full, rtol=1e-4, atol=1e-4)
