import numpy as np
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.ops import linalg


def _rand_spd(T, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((T, T))
    return scale * (A @ A.T / T + np.eye(T))


def test_chol_spd_matches_numpy():
    M = _rand_spd(16, 1)
    L = np.asarray(linalg.chol_spd(jnp.asarray(M), jitter_scale=0.0))
    np.testing.assert_allclose(L @ L.T, M, rtol=1e-10, atol=1e-10)


def test_cho_solve():
    M = _rand_spd(12, 2)
    b = np.random.default_rng(3).standard_normal((12, 3))
    L = linalg.chol_spd(jnp.asarray(M), jitter_scale=0.0)
    x = np.asarray(linalg.cho_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(M @ x, b, rtol=1e-9, atol=1e-9)


def test_gaussian_score_no_logdet():
    """The reference score is -0.5 d'C^-1 d - 0.5*T*log(2pi), WITHOUT
    the log-determinant (GPI_model.py:250-286)."""
    T = 8
    C = _rand_spd(T, 4)
    d = np.random.default_rng(5).standard_normal(T)
    expected = (-0.5 * d @ np.linalg.solve(C, d)
                - 0.5 * T * np.log(2 * np.pi))
    got = float(linalg.gaussian_score(jnp.asarray(d), jnp.asarray(C)))
    assert got == pytest.approx(expected, rel=1e-8)


def test_gaussian_score_shared_cov_batch():
    T, B = 10, 7
    C = _rand_spd(T, 6)
    Y = np.random.default_rng(7).standard_normal((B, T))
    mean = np.random.default_rng(8).standard_normal(T)
    got = np.asarray(linalg.gaussian_score_shared_cov(
        jnp.asarray(Y), jnp.asarray(mean), jnp.asarray(C)))
    for b in range(B):
        d = Y[b] - mean
        exp = -0.5 * d @ np.linalg.solve(C, d) - 0.5 * T * np.log(2 * np.pi)
        assert got[b] == pytest.approx(exp, rel=1e-6)


def test_logdet_spd():
    M = _rand_spd(20, 9, scale=1e-3)
    got = float(linalg.logdet_spd(jnp.asarray(M)))
    assert got == pytest.approx(np.linalg.slogdet(M)[1], rel=1e-8)


def test_inv_spd():
    M = _rand_spd(9, 10, scale=1e4)
    got = np.asarray(linalg.inv_spd(jnp.asarray(M)))
    np.testing.assert_allclose(got @ M, np.eye(9), atol=1e-8)
