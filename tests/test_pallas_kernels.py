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
