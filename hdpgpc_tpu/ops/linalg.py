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
    (GPI.py:145-146, :297) given symmetry of S. With HDPGPC_MP64=1 the
    f64-on-TPU case routes through the mixed-precision solve below
    (emulated f64 Cholesky is the RTS backward scan's per-step cost).
    """
    S = sym(S)
    if S.dtype == jnp.float64 and mp64_active():
        return mp64_spd_solve(S, B.T).T
    L = jnp.linalg.cholesky(S)
    return jax.scipy.linalg.cho_solve((L, True), B.T).T


# ---------------------------------------------------------------------
# Mixed-precision f64 SPD solves for TPU (HDPGPC_MP64)
# ---------------------------------------------------------------------
# v5e has no native f64: XLA emulates every f64 op as multi-pass f32
# ("double-double"), and an emulated f64 Cholesky is ~T sequential
# emulated column steps — the dominant per-step cost of the exact-mode
# refit scans (GPI_model.full_pass_weighted semantics,
# GPI_model.py:377-406). The classic TPU-native answer is mixed
# precision: factor a Jacobi-EQUILIBRATED copy of the matrix in native
# f32 (one MXU-friendly Cholesky), then recover f64 accuracy with
# iterative refinement whose residuals are computed in f64 (one
# emulated matmul per refinement step — cheap next to an emulated
# factorization). Equilibration strips the scale-driven part of the
# condition number (the reference needs magnitude-rescaled Cholesky
# for the same reason, GPI.log_det, GPI.py:1167-1198), so refinement
# contracts at ~u32 * kappa(equilibrated) per step.
#
# Opt-in via HDPGPC_MP64=1 (default off): exact-parity mode stays
# bit-conservative unless the operator enables the speed path. The
# refinement target is well below the 1e-6 relative ELBO parity bar
# and the ~1e-4 structural decision margins the f32 guard polices.

_MP64_ENV = "HDPGPC_MP64"


def mp64_enabled() -> bool:
    import os
    return os.environ.get(_MP64_ENV, "0") in ("1", "force")


def mp64_active() -> bool:
    """True when f64 solves should route mixed-precision HERE: env
    opt-in AND a TPU backend ('force' skips the backend check so the
    CPU test suite can exercise the production code path)."""
    import os
    v = os.environ.get(_MP64_ENV, "0")
    if v == "force":
        return True
    return v == "1" and jax.default_backend() == "tpu"


def mp64_spd_solve(A: jax.Array, B: jax.Array, refine: int = 4,
                   jitter: float = 1e-7) -> jax.Array:
    """X = A^{-1} B for SPD f64 A via f32 factor + f64 refinement.

    Batched over leading dims. The f32 jitter perturbs only the
    PRECONDITIONER; refinement converges to the solution of the exact
    unjittered f64 system at rate ~u32 * kappa(equilibrated) per step
    (machine-precision for kappa_eq <~ 1e6; for pathologically
    conditioned systems the result floors at f32-solve accuracy — i.e.
    never worse than the validated float32 speed mode's solves, which
    is what the per-record validation + decision-margin telemetry
    certify end to end).
    """
    dtype = A.dtype
    T = A.shape[-1]
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = jnp.where(d > 0, jax.lax.rsqrt(jnp.maximum(d, jnp.finfo(
        dtype).tiny)), jnp.ones_like(d))                  # (..., T)
    Ae32 = (A * s[..., :, None] * s[..., None, :]).astype(jnp.float32)
    eye32 = jnp.eye(T, dtype=jnp.float32)
    Ae32 = 0.5 * (Ae32 + Ae32.swapaxes(-1, -2))
    # two-tier jitter: the small one preserves refinement contraction;
    # where f32 rounding still makes the factor NaN (near-singular in
    # f32), fall back to a heavy-jitter factor — refinement then floors
    # at f32-solve accuracy instead of poisoning the scan with NaNs.
    # (jnp.where, not lax.cond: the refit program vmaps clusters and
    # cond would execute both branches anyway; a second f32 Cholesky
    # is cheap.)
    L1 = jnp.linalg.cholesky(Ae32 + jitter * eye32)
    bad = jnp.isnan(L1).any(axis=(-2, -1), keepdims=True)
    L2 = jnp.linalg.cholesky(Ae32 + 1e-4 * eye32)
    L32 = jnp.where(bad, L2, L1)

    def solve_pre(R):
        Re = (R * s[..., :, None]).astype(jnp.float32)
        Z = jax.scipy.linalg.cho_solve((L32, True), Re)
        return Z.astype(dtype) * s[..., :, None]

    X = solve_pre(B)
    for _ in range(refine):
        X = X + solve_pre(B - A @ X)
    return X
