import numpy as np
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.models import mniw


def _np_posterior_1step(M0, V0, n0, S0, y1, y2):
    """Independent numpy oracle of the reference's 1-step MNIW update
    (GPI_model.py:1300-1344) with zero covariances."""
    d = M0.shape[0]
    eye = np.eye(d)
    new_n0 = n0 + 1
    V = 0.5 * (V0 + V0.T)
    jitter = 1e-2 * max(np.mean(np.abs(np.diag(S0))), np.finfo(float).eps)
    V_inv = np.linalg.inv(V + jitter * eye)
    exp_f_f_ = y2 @ y2.T
    exp_ff_ = y1 @ y2.T
    S__ = exp_f_f_ + V_inv
    S_ = exp_ff_ + M0 @ V_inv
    part_mean = np.linalg.solve(
        0.5 * (S__ + S__.T) + 1e-8 * eye, S_.T).T
    new_M = ((n0 - 2) * M0 + part_mean) / (new_n0 - 2)
    e = y1 - y2
    new_S = ((n0 - 2) * S0 + e @ e.T) / (new_n0 - 2)
    return new_M, S__, new_n0, new_S


def test_posterior_one_step():
    d = 5
    rng = np.random.default_rng(0)
    M0 = np.eye(d)
    S0 = 0.2 * np.eye(d)
    prior = mniw.make_mniw(jnp.asarray(M0), 5.0, jnp.asarray(S0))
    y1 = rng.standard_normal((d, 1))
    y2 = rng.standard_normal((d, 1))
    zero = jnp.zeros((d, d))
    post = mniw.posterior(prior, 1, jnp.asarray(y1), jnp.asarray(y2),
                          zero, zero, zero)
    Me, Ve, n0e, Se = _np_posterior_1step(M0, np.eye(d), 5.0, S0, y1, y2)
    np.testing.assert_allclose(np.asarray(post.mean), Me, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(post.row_cov), Ve, rtol=1e-8)
    assert float(post.n0) == n0e
    np.testing.assert_allclose(np.asarray(post.scale), Se, rtol=1e-8)


def test_get_scale():
    d = 3
    p = mniw.make_mniw(jnp.eye(d), 5.0, 0.4 * jnp.eye(d))
    np.testing.assert_allclose(np.asarray(mniw.get_scale(p)),
                               0.4 * 5 / 3 * np.eye(d), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(mniw.get_scale(p, final=True)),
                               0.4 * np.eye(d), rtol=1e-12)


def test_log_likelihood_formula():
    d = 4
    rng = np.random.default_rng(1)
    M0 = np.eye(d)
    S0 = 0.3 * np.eye(d)
    p = mniw.make_mniw(jnp.asarray(M0), 5.0, jnp.asarray(S0))
    A = np.eye(d) + 0.1 * rng.standard_normal((d, d))
    Sigma = 0.5 * np.eye(d) + 0.01 * np.diag(rng.random(d))
    got = float(mniw.log_likelihood(p, jnp.asarray(A), jnp.asarray(Sigma)))
    Sj = 0.5 * (Sigma + Sigma.T) + 1e-8 * np.eye(d)
    D = A - M0
    exp = (-0.5 * np.sum((D @ np.eye(d)) * np.linalg.solve(Sj, D))
           - 0.5 * np.trace(np.linalg.solve(Sj, S0)))
    assert got == pytest.approx(exp, rel=1e-8)
