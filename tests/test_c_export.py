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
