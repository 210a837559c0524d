"""Native serving runtime: compiled .so predictions match the learner."""
import shutil

import numpy as np
import pytest

from gbrl_tpu.models.gbt import GBTModel
from gbrl_tpu.utils.c_runtime import CompiledModel


@pytest.mark.skipif(shutil.which("g++") is None and shutil.which("cc") is None,
                    reason="no C compiler")
@pytest.mark.parametrize("grow_policy", ["greedy", "oblivious"])
def test_compiled_runtime_matches(grow_policy):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    m = GBTModel(tree_struct={"max_depth": 3, "n_bins": 8,
                              "grow_policy": grow_policy},
                 input_dim=6, output_dim=3,
                 optimizers={"algo": "SGD", "lr": "lin_0.5", "stop_lr": 0.05,
                             "T": 20, "start_idx": 0, "stop_idx": 3},
                 device="cpu")
    m.set_bias_from_targets(rng.normal(size=(64, 3)))
    for _ in range(12):
        m.step(X, grads=rng.normal(size=(64, 3)).astype(np.float32))
    rt = CompiledModel.from_learner(m.learner)
    got = rt(X)
    want = m(X, requires_grad=False, tensor=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    one = rt(X[0])
    np.testing.assert_allclose(one[0], want[0], rtol=1e-4, atol=1e-5)
