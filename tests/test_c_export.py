"""C-header export: compile the generated header with g++ and verify its
predictions equal the learner's (float exact to 1e-4; fxp to quantization
tolerance)."""
import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from gbrl_tpu.models.gbt import GBTModel

GCC = shutil.which("g++") or shutil.which("cc")

DRIVER = r"""
#include <stdio.h>
#include "{header}"

int main() {{
    {ftype} features[{n_feat}];
    {acct} results[{n_out}];
    int i, j, n;
    scanf("%d", &n);
    for (i = 0; i < n; ++i) {{
        for (j = 0; j < {n_feat}; ++j) {{
            double v; scanf("%lf", &v);
            features[j] = ({ftype})({scale_expr});
        }}
        {model}_predict(results, features);
        for (j = 0; j < {n_out}; ++j)
            printf("%.9g ", (double)results[j] / {unscale});
        printf("\n");
    }}
    return 0;
}}
"""


def _train_model(grow_policy, n_trees=8, O=2):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(80, 5)).astype(np.float32)
    model = GBTModel(tree_struct={"max_depth": 3, "n_bins": 8,
                                  "grow_policy": grow_policy},
                     input_dim=5, output_dim=O,
                     optimizers={"algo": "SGD", "lr": 0.3, "start_idx": 0,
                                 "stop_idx": O}, device="cpu")
    model.set_bias_from_targets(rng.normal(size=(80, O)))
    for _ in range(n_trees):
        g = rng.normal(size=(80, O)).astype(np.float32)
        model.step(X, grads=g)
    return model, X


@pytest.mark.skipif(GCC is None, reason="no C compiler")
@pytest.mark.parametrize("grow_policy", ["greedy", "oblivious"])
@pytest.mark.parametrize("fmt,ftype,acct,scale,tol", [
    ("float", "float", "float", 1, 1e-4),
    ("fxp16", "int", "long long", 1 << 16, 1e-3),
    ("fxp8", "short", "int", 1 << 8, 0.2),
])
def test_c_export_matches_predict(tmp_path, grow_policy, fmt, ftype, acct,
                                  scale, tol):
    model, X = _train_model(grow_policy)
    header = tmp_path / "model.h"
    model.learner.export(str(header), "gbrl_model", export_format=fmt)
    n_feat, n_out = 5, 2
    src = tmp_path / "driver.c"
    src.write_text(DRIVER.format(
        header=header, ftype=ftype, acct=acct, n_feat=n_feat, n_out=n_out,
        model="gbrl_model",
        scale_expr=f"v * {scale}" if scale != 1 else "v",
        unscale=float(scale)))
    exe = tmp_path / "driver"
    subprocess.run([GCC, "-O2", "-o", str(exe), str(src)], check=True)
    # fxp8 features in short: scale inputs down to avoid overflow
    Xq = X[:16] * (0.05 if fmt == "fxp8" else 1.0)
    inp = f"{len(Xq)}\n" + "\n".join(
        " ".join(f"{v:.9e}" for v in row) for row in Xq)
    out = subprocess.run([str(exe)], input=inp.encode(),
                         capture_output=True, check=True)
    got = np.array([[float(v) for v in line.split()]
                    for line in out.stdout.decode().strip().splitlines()])
    want = model(Xq, requires_grad=False, tensor=False)
    if fmt == "float":
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
    else:
        # fixed-point quantization can flip routing for samples within one
        # quantum of a threshold; require the bulk to match
        close = np.abs(got - want) <= tol + tol * np.abs(want)
        assert close.mean() >= 0.85, f"only {close.mean():.0%} within tol"


def _run_driver(tmp_path, header, name, X, n_out, suffix=""):
    src = tmp_path / f"driver{suffix}.c"
    src.write_text(DRIVER.format(
        header=header, ftype="float", acct="float", n_feat=X.shape[1],
        n_out=n_out, model=name, scale_expr="v", unscale=1.0))
    exe = tmp_path / f"driver{suffix}"
    subprocess.run([GCC, "-O2", "-o", str(exe), str(src)], check=True)
    inp = f"{len(X)}\n" + "\n".join(
        " ".join(f"{v:.9e}" for v in row) for row in X)
    out = subprocess.run([str(exe)], input=inp.encode(),
                         capture_output=True, check=True)
    return np.array([[float(v) for v in line.split()]
                     for line in out.stdout.decode().strip().splitlines()])


@pytest.mark.skipif(GCC is None, reason="no C compiler")
def test_c_export_compact_matches_full(tmp_path):
    """COMPACT (per-level tables, types.h:170-174) must predict identically
    to FULL on the same oblivious ensemble."""
    model, X = _train_model("oblivious", n_trees=10)
    full_h, comp_h = tmp_path / "full.h", tmp_path / "comp.h"
    model.learner.export(str(full_h), "m_full", export_type="full")
    model.learner.export(str(comp_h), "m_comp", export_type="compact")
    # compact tables are strictly smaller: D conditions vs 2^D - 1 nodes
    assert comp_h.stat().st_size < full_h.stat().st_size
    got_full = _run_driver(tmp_path, full_h, "m_full", X[:24], 2, "f")
    got_comp = _run_driver(tmp_path, comp_h, "m_comp", X[:24], 2, "c")
    np.testing.assert_array_equal(got_full, got_comp)
    want = model(X[:24], requires_grad=False, tensor=False)
    np.testing.assert_allclose(got_comp, want, rtol=1e-4, atol=1e-4)


def test_c_export_compact_rejects_greedy(tmp_path):
    model, _ = _train_model("greedy", n_trees=2)
    with pytest.raises(ValueError, match="compact"):
        model.learner.export(str(tmp_path / "x.h"), export_type="compact")


CAT_DRIVER = r"""
#include <stdio.h>
#include <string.h>
#include "{header}"

int main() {{
    float features[{n_num}];
    int cat_features[{n_cat}];
    float results[{n_out}];
    char buf[{n_cat}][160];
    int i, j, n;
    scanf("%d", &n);
    for (i = 0; i < n; ++i) {{
        for (j = 0; j < {n_num}; ++j) {{
            double v; scanf("%lf", &v);
            features[j] = (float)v;
        }}
        for (j = 0; j < {n_cat}; ++j) {{
            scanf("%159s", buf[j]);
            cat_features[j] = {model}_cat_code(j, buf[j]);
        }}
        {model}_predict(results, features, cat_features);
        for (j = 0; j < {n_out}; ++j)
            printf("%.9g ", (double)results[j]);
        printf("\n");
    }}
    return 0;
}}
"""


@pytest.mark.skipif(GCC is None, reason="no C compiler")
@pytest.mark.parametrize("grow_policy,export_type", [
    ("greedy", "full"), ("oblivious", "full"), ("oblivious", "compact")])
def test_c_export_categorical(tmp_path, grow_policy, export_type):
    """Mixed numeric/categorical export: the generated header routes
    categorical nodes by vocabulary code (code == split -> right,
    node.cpp:89) and the baked-in <model>_cat_code encoder reproduces the
    learner's CategoryVocab — including unseen values (-1, routes left)."""
    rng = np.random.default_rng(3)
    n = 120
    sqm = rng.uniform(400, 2000, n).round(2).astype(np.float32)
    year = rng.choice(["2006", "2009", "2015", "2018"], n)
    view = rng.choice(["sea", "park", "none"], n)
    X = np.empty((n, 3), dtype=object)
    X[:, 0], X[:, 1], X[:, 2] = sqm, year, view
    y = (sqm * 3 + (view == "sea") * 900
         + rng.normal(0, 40, n)).astype(np.float32)[:, None]
    model = GBTModel(tree_struct={"max_depth": 3, "n_bins": 8,
                                  "grow_policy": grow_policy},
                     input_dim=3, output_dim=1,
                     optimizers={"algo": "SGD", "lr": 0.7, "start_idx": 0,
                                 "stop_idx": 1}, device="cpu")
    model.fit(X, y, 12)
    header = tmp_path / "cat_model.h"
    model.learner.export(str(header), "catm", export_type=export_type)
    text = header.read_text()
    assert "catm_catcode" in text and "catm_cat_code" in text

    src = tmp_path / "driver.c"
    src.write_text(CAT_DRIVER.format(header=header, n_num=1, n_cat=2,
                                     n_out=1, model="catm"))
    exe = tmp_path / "driver"
    subprocess.run([GCC, "-O2", "-o", str(exe), str(src)], check=True)
    Xq = X[:32].copy()
    Xq[0, 2] = "mountain"          # unseen category -> -1, routes left
    inp = f"{len(Xq)}\n" + "\n".join(
        f"{row[0]:.9e} {row[1]} {row[2]}" for row in Xq)
    out = subprocess.run([str(exe)], input=inp.encode(),
                         capture_output=True, check=True)
    got = np.array([[float(v) for v in line.split()]
                    for line in out.stdout.decode().strip().splitlines()])
    want = model(Xq, requires_grad=False, tensor=False).reshape(-1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
