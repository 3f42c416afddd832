"""Matrix-Normal-Inverse-Wishart conjugate updates for LDS parameters.

Functional pytree equivalent of the reference's
``matrix_normal_inv_wishart`` (GPI_model.py:1280-1414):

* posterior(): Bayesian update from (pseudo-)sufficient statistics with
  the reference's jitters (1e-2 relative on the row covariance, 1e-8 on
  the regression Gram) and its special n_k == 1 running-average form
  for mean and scale (GPI_model.py:1332-1336).
* log_likelihood(): the reference's (partial) MNIW log-likelihood used
  in the LDS ELBO term (GPI_model.py:1346-1362) — mean quadratic form
  plus scale trace, no normalisation constants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MNIW(NamedTuple):
    mean: jax.Array     # M      (T, T)  matrix mean
    row_cov: jax.Array  # V      (T, T)  row covariance (regression Gram)
    n0: jax.Array       # scalar dof
    scale: jax.Array    # S      (T, T)


def make_mniw(mean, n0, scale) -> MNIW:
    T = mean.shape[0]
    return MNIW(mean=jnp.asarray(mean),
                row_cov=jnp.eye(T, dtype=mean.dtype),
                n0=jnp.asarray(float(n0)),
                scale=jnp.asarray(scale))


def posterior(prior: MNIW, n_k, y1, y2, cov, cov_, cov_cross,
              sse_matrix=None) -> MNIW:
    """Conjugate update.

    y1: (T, B) current states; y2: (T, B) previous states (regressors);
    cov/cov_/cov_cross: (T, T) summed state covariances. ``n_k`` is the
    (static) pseudo-count; n_k == 1 selects the running-average form.
    """
    dtype = prior.scale.dtype
    d = prior.scale.shape[0]
    eye = jnp.eye(d, dtype=dtype)
    if sse_matrix is None:
        sse_matrix = eye

    new_n0 = prior.n0 + n_k

    V = 0.5 * (prior.row_cov + prior.row_cov.T)
    jitter = 1e-2 * jnp.maximum(jnp.mean(jnp.abs(jnp.diag(prior.scale))),
                                jnp.finfo(dtype).eps)
    L_V = jnp.linalg.cholesky(V + jitter * eye)
    V_inv = jax.scipy.linalg.cho_solve((L_V, True), eye)

    y2p = sse_matrix @ y2
    y1p = sse_matrix @ y1

    exp_f_f_ = y2p @ y2p.T + sse_matrix @ cov_ @ sse_matrix.T
    exp_ff_ = y1p @ y2p.T + sse_matrix @ cov_cross @ sse_matrix.T

    S__ = exp_f_f_ + V_inv
    S_ = exp_ff_ + prior.mean @ V_inv

    L_S = jnp.linalg.cholesky(0.5 * (S__ + S__.T) + 1e-8 * eye)
    part_mean = jax.scipy.linalg.cho_solve((L_S, True), S_.T).T

    if int(n_k) == 1:
        new_mean = ((prior.n0 - 2.0) * prior.mean + part_mean) / (new_n0 - 2.0)
        e = y1p - y2p
        new_scale = ((prior.n0 - 2.0) * prior.scale + e @ e.T) / (new_n0 - 2.0)
    else:
        new_mean = part_mean
        e = y1 - new_mean @ y2
        new_scale = ((prior.n0 - 2.0) * prior.scale + e @ e.T) / (new_n0 - 2.0)

    return MNIW(mean=new_mean, row_cov=S__, n0=new_n0, scale=new_scale)


def log_likelihood(prior: MNIW, M, Sigma, n0=None) -> jax.Array:
    """Partial MNIW log-density of (M, Sigma) under ``prior``
    (GPI_model.py:1346-1362). ``n0`` accepted for signature parity but
    unused, as in the reference."""
    d = M.shape[0]
    eye = jnp.eye(d, dtype=prior.scale.dtype)
    L = jnp.linalg.cholesky(0.5 * (Sigma + Sigma.T) + 1e-8 * eye)
    D = M - prior.mean
    sig_inv_D = jax.scipy.linalg.cho_solve((L, True), D)
    mean_lik = -0.5 * jnp.sum((D @ prior.row_cov) * sig_inv_D)
    sig_inv_scale = jax.scipy.linalg.cho_solve((L, True), prior.scale)
    scale_lik = -0.5 * jnp.trace(sig_inv_scale)
    return mean_lik + scale_lik


def get_scale(p: MNIW, final: bool = False) -> jax.Array:
    """E[Sigma]-style scale (GPI_model.py:1367-1371)."""
    return jnp.where(final, p.scale, p.scale * p.n0 / (p.n0 - 2.0))
