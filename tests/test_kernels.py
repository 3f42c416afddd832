import numpy as np
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.ops.kernels import KernelParams, gram

sklearn = pytest.importorskip("sklearn")
from sklearn.gaussian_process.kernels import RBF, ConstantKernel, WhiteKernel


def _params(c=2.5, l=3.0, n=0.1):
    return KernelParams(jnp.asarray(c), jnp.asarray(l), jnp.asarray(n))


def _sk(c=2.5, l=3.0, n=0.1):
    return ConstantKernel(c, (c, c * 5.0)) * RBF(l) + WhiteKernel(n)


def test_gram_two_arg_matches_sklearn_no_noise():
    """k(X, X) two-arg adds NO white noise (sklearn semantics the
    reference's first-step trick depends on, GPI.py:136-139)."""
    x = np.arange(0, 12, 1.0)[:, None]
    K_sk = _sk()(x, x)
    K = np.asarray(gram(_params(), jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(K, K_sk, rtol=1e-12)


def test_gram_one_arg_adds_noise():
    x = np.arange(0, 12, 1.0)[:, None]
    K_sk = _sk()(x)
    K = np.asarray(gram(_params(), jnp.asarray(x)))
    np.testing.assert_allclose(K, K_sk, rtol=1e-12)
    # diag difference is exactly the noise level
    K2 = np.asarray(gram(_params(), jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(np.diag(K - K2), 0.1 * np.ones(12),
                               rtol=1e-12)


def test_gram_pallas_interpret_matches():
    from jax.experimental.pallas import tpu as pltpu
    from hdpgpc_tpu.ops.pallas.gram import rbf_gram_pallas

    x = jnp.arange(0, 200, 1.0)
    ref = gram(_params(), x[:, None], x[:, None])
    with pltpu.force_tpu_interpret_mode():
        got = rbf_gram_pallas(x, jnp.asarray(2.5), jnp.asarray(3.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)
