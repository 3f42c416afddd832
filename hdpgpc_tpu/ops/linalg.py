"""Jittered SPD linear algebra and Gaussian scores.

Numerical semantics follow the reference (GPI_model.py:83-113):

* ``chol_spd``: symmetrise, add ``jitter_scale * mean|diag|`` to the
  diagonal, Cholesky.
* Gaussian "squared-error" scores deliberately OMIT the log-determinant
  term — the reference's ``log_sq_error`` (GPI_model.py:250-286) and
  ``_gaussian_score_shared_cov`` (GPI_model.py:92-113) return
  ``-0.5 * mahalanobis - 0.5 * T * log(2*pi)`` only. Cluster competition
  depends on this, so we reproduce it exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)


def precise_jit(fn=None, **jit_kwargs):
    """jax.jit with matmul precision pinned to 'highest' INSIDE the
    traced body. float32 speed mode needs full-precision passes (v5e
    f32 matmuls default to bf16 passes, which destroys the SPD
    structure feeding the Cholesky chains); scoping it per program
    avoids mutating process-global jax config (advisor r1)."""
    import functools

    def wrap(f):
        @functools.wraps(f)
        def inner(*a, **k):
            with jax.default_matmul_precision("highest"):
                return f(*a, **k)
        return jax.jit(inner, **jit_kwargs)

    return wrap(fn) if fn is not None else wrap


def sym(M: jax.Array) -> jax.Array:
    return 0.5 * (M + M.T)


def chol_spd(M: jax.Array, jitter_scale: float = 1e-8) -> jax.Array:
    """Cholesky of an SPD matrix with relative diagonal jitter.

    Mirrors GPI_model._chol_spd (GPI_model.py:83-87).
    """
    M = sym(M)
    eps = jnp.finfo(M.dtype).eps
    diag_mean = jnp.maximum(jnp.mean(jnp.abs(jnp.diag(M))), eps)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return jnp.linalg.cholesky(M + jitter_scale * diag_mean * eye)


def cho_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve (L L^T) X = B given lower Cholesky factor L."""
    Y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, Y, lower=False)


def spd_solve(M: jax.Array, B: jax.Array, jitter_scale: float = 1e-8) -> jax.Array:
    return cho_solve(chol_spd(M, jitter_scale), B)


def gaussian_score(diff: jax.Array, cov: jax.Array) -> jax.Array:
    """Reference log "squared error": -0.5 d' cov^-1 d - 0.5 T log 2pi.

    ``diff``: (T,) or (T, 1). No log-det term (see module docstring).
    """
    d = diff.reshape(-1, 1)
    L = chol_spd(cov)
    alpha = cho_solve(L, d)
    q = d.shape[0]
    return -0.5 * jnp.sum(d * alpha) - 0.5 * q * LOG2PI


def gaussian_score_shared_cov(Y: jax.Array, mean: jax.Array, cov: jax.Array) -> jax.Array:
    """Score a batch of vectors against one Gaussian (no log-det).

    Y: (B, T); mean: (T,); cov: (T, T). Returns (B,).
    Mirrors GPI_model._gaussian_score_shared_cov (GPI_model.py:92-113).
    """
    diff = (Y - mean[None, :]).T          # (T, B)
    L = chol_spd(cov)
    alpha = cho_solve(L, diff)            # (T, B)
    q = diff.shape[0]
    return -0.5 * jnp.sum(diff * alpha, axis=0) - 0.5 * q * LOG2PI


def logdet_spd(M: jax.Array) -> jax.Array:
    """Robust log-determinant via magnitude-rescaled Cholesky.

    Mirrors GPI.log_det (GPI.py:1167-1198): rescale by the order of
    magnitude of the largest diagonal entry before factorising.
    """
    od = jnp.floor(jnp.log10(jnp.maximum(jnp.max(jnp.diag(M)), jnp.finfo(M.dtype).tiny)))
    k = 10.0 ** (-od)
    L = chol_spd(k * M, jitter_scale=0.0)
    return 2.0 * jnp.sum(jnp.log(jnp.diag(L))) - M.shape[0] * jnp.log(k)


def inv_spd(M: jax.Array) -> jax.Array:
    """Robust inverse via magnitude rescaling (GPI.inv_r, GPI.py:1201-1221).

    Cholesky-based: TPU implements f64 Cholesky/triangular solves but
    not f64 LU, so SPD inverses must avoid ``jnp.linalg.solve``.
    """
    od = jnp.floor(jnp.log10(jnp.maximum(jnp.max(jnp.diag(M)), jnp.finfo(M.dtype).tiny)))
    k = 10.0 ** (-od)
    eye = jnp.eye(M.shape[0], dtype=M.dtype)
    L = jnp.linalg.cholesky(k * M)
    return k * jax.scipy.linalg.cho_solve((L, True), eye)


def solve_general(A: jax.Array, B: jax.Array, *,
                  force_qr: bool = False) -> jax.Array:
    """Batched general (non-SPD) solve ``A^{-1} B``.

    XLA's TPU backend implements the LuDecomposition custom op only
    for f32/c64, so ``jnp.linalg.solve`` aborts compilation for
    float64 operands on TPU (hit by the est-limit frozen-tail parallel
    filter's combine in f64 exact mode). Route that case through
    QR + triangular solve (both implemented for TPU f64); everywhere
    else keep the LU solve. ``force_qr`` exists for testing the QR
    branch on hosts without a TPU.
    """
    if force_qr or (A.dtype == jnp.float64
                    and jax.default_backend() == "tpu"):
        Q, R = jnp.linalg.qr(A)
        return jax.scipy.linalg.solve_triangular(
            R, Q.swapaxes(-1, -2) @ B, lower=False)
    return jnp.linalg.solve(A, B)


def solve_spd_t(S: jax.Array, B: jax.Array) -> jax.Array:
    """X = B @ S^{-1} for SPD S, via Cholesky (TPU-safe f64).

    Equivalent to the reference's ``solve(S.T, B.T).T`` right-solves
    (GPI.py:145-146, :297) given symmetry of S.
    """
    S = sym(S)
    L = jnp.linalg.cholesky(S)
    return jax.scipy.linalg.cho_solve((L, True), B.T).T
