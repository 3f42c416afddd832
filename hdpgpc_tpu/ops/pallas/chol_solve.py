"""Pallas TPU kernel: fused batched SPD factor + solve.

Computes X[i] = spd[i]^{-1} rhs[i] for a small batch of SPD (T, T)
matrices via an in-VMEM blocked Cholesky factorization followed by
blocked forward/backward substitution — one kernel launch for the
whole factor+solve pipeline.

This replaces the XLA lowering of ``jnp.linalg.cholesky`` +
``jax.scipy.linalg.cho_solve`` inside the refit scan's per-member step
(models/gplds.make_forward_step — the TPU-native form of the
reference's per-sample Kalman update, GPI.py:134-150): at T=90 the XLA
ops are several separate latency-bound kernels per scan step; here the
factorization, the four diagonal-block inversions, and both triangular
substitutions stay resident in VMEM. float32 only (the f64
exact-parity mode keeps the XLA lowering).

Algorithm (all shapes padded to Tp=128, block NB=32):
* right-looking blocked Cholesky; the panel factorization is a
  fori_loop of masked rank-1 updates (one-hot row/column extraction —
  no dynamic slicing, VPU-friendly);
* the 4 diagonal blocks are inverted by forward substitution;
* L Y = B and L' X = Y are solved block-row-wise with the
  precomputed inverses (MXU matmuls).

Padding rows/cols carry an identity diagonal so the factorization is
well-defined; RHS padding is zero, so padded output rows are zero.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 32
TP = 128
_NBLK = TP // NB


def _panel_factor(slab, j0):
    """Factor a (TP, NB) panel in place; rows < j0 are zeroed.

    slab holds columns [j0, j0+NB) of the trailing matrix, already
    updated by the finished panels. Returns the L panel (exact zeros
    above the diagonal).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (TP, NB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TP, NB), 1)

    def body(k, slab):
        piv_row = j0 + k
        # one-hot extractions (no dynamic slicing on the lane axis)
        colv = jnp.sum(jnp.where(cols == k, slab, 0.0), axis=1,
                       keepdims=True)                       # (TP, 1)
        rowv = jnp.sum(jnp.where(rows == piv_row, slab, 0.0), axis=0,
                       keepdims=True)                       # (1, NB)
        piv = jnp.sum(jnp.where((rows == piv_row) & (cols == k),
                                slab, 0.0))
        dinv = jax.lax.rsqrt(piv)
        lcol = jnp.where(rows[:, :1] >= piv_row, colv * dinv, 0.0)
        mult = jnp.where(cols[:1, :] > k, rowv * dinv, 0.0)  # (1, NB)
        slab = slab - lcol @ mult                 # rank-1 trailing update
        # write the finished column k
        slab = jnp.where(cols == k, lcol, slab)
        return slab

    return jax.lax.fori_loop(0, NB, body, slab)


def _inv_lower(Lb):
    """Inverse of a (NB, NB) lower-triangular block by forward subst."""
    r = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 1)
    X = jnp.zeros((NB, NB), Lb.dtype)

    def body(k, X):
        lrow = jnp.sum(jnp.where(r == k, Lb, 0.0), axis=0,
                       keepdims=True)                       # (1, NB)
        piv = jnp.sum(jnp.where((r == k) & (c == k), Lb, 0.0))
        lrow_strict = jnp.where(c[:1, :] < k, lrow, 0.0)
        ek = jnp.where(c[:1, :] == k, 1.0, 0.0).astype(Lb.dtype)
        newrow = (ek - lrow_strict @ X) / piv               # (1, NB)
        return jnp.where(r == k, newrow, X)

    return jax.lax.fori_loop(0, NB, body, X)


def _chol_solve_kernel(a_ref, b_ref, x_ref):
    A = a_ref[0]                                            # (TP, TP)
    B = b_ref[0]
    dtype = A.dtype

    # ---- blocked Cholesky (python-unrolled over the 4 panels) ----
    L = jnp.zeros((TP, TP), dtype)
    for j in range(_NBLK):
        j0 = j * NB
        slab = A[:, j0:j0 + NB]
        if j > 0:
            # only columns < j0 of L are nonzero, so the full matmul
            # equals the partial trailing update (MXU)
            slab = slab - L @ L[j0:j0 + NB, :].T
        slab = _panel_factor(slab, j0)
        L = L.at[:, j0:j0 + NB].set(slab)

    # ---- invert the diagonal blocks ----
    invD = [_inv_lower(L[j * NB:(j + 1) * NB, j * NB:(j + 1) * NB])
            for j in range(_NBLK)]

    # ---- forward substitution: L Y = B ----
    Y = jnp.zeros((TP, TP), dtype)
    for j in range(_NBLK):
        j0 = j * NB
        Rj = B[j0:j0 + NB, :] - L[j0:j0 + NB, :] @ Y
        Y = Y.at[j0:j0 + NB, :].set(invD[j] @ Rj)

    # ---- backward substitution: L' X = Y ----
    X = jnp.zeros((TP, TP), dtype)
    for j in reversed(range(_NBLK)):
        j0 = j * NB
        Rj = Y[j0:j0 + NB, :] - L[:, j0:j0 + NB].T @ X
        X = X.at[j0:j0 + NB, :].set(invD[j].T @ Rj)

    x_ref[0] = X


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_spd_solve(spd: jax.Array, rhs: jax.Array,
                    interpret: bool | None = None) -> jax.Array:
    """X[i] = spd[i]^{-1} rhs[i] for spd, rhs of shape (n, T, T), T <= 128.

    spd must be symmetric positive definite (jitter applied by the
    caller, matching the XLA path). float32. interpret=None resolves to
    compiled on TPU, interpreter elsewhere (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, T, _ = spd.shape
    pad = TP - T
    eyep = jnp.zeros((TP, TP), spd.dtype).at[T:, T:].set(jnp.eye(
        pad, dtype=spd.dtype)) if pad else jnp.zeros((TP, TP), spd.dtype)
    A = jnp.pad(spd, ((0, 0), (0, pad), (0, pad))) + eyep
    B = jnp.pad(rhs, ((0, 0), (0, pad), (0, pad)))
    X = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((n, TP, TP), spd.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, TP, TP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP, TP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TP, TP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A, B)
    return X[:, :T, :T]


@functools.lru_cache(None)
def pallas_solves_enabled() -> bool:
    """Use the fused kernel on the f32 refit path: TPU backend only
    (CPU keeps the XLA lowering), overridable via HDPGPC_PALLAS_SOLVES.

    On TPU the decision is self-validating: the kernel is compiled and
    numerically smoke-tested against the XLA solve once per process,
    and any Mosaic/runtime failure silently falls back to the XLA
    lowering (a production sweep must never die on a kernel-gate
    regression)."""
    env = os.environ.get("HDPGPC_PALLAS_SOLVES")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        if jax.default_backend() != "tpu":
            return False
        import numpy as _np
        rng = _np.random.default_rng(0)
        M = rng.standard_normal((2, 90, 90)).astype(_np.float32)
        spd = M @ M.transpose(0, 2, 1) + 5.0 * _np.eye(90, dtype=_np.float32)
        rhs = rng.standard_normal((2, 90, 90)).astype(_np.float32)
        X = _np.asarray(fused_spd_solve(jnp.asarray(spd), jnp.asarray(rhs),
                                        interpret=False))
        ref = _np.stack([_np.linalg.solve(spd[i].astype(_np.float64),
                                          rhs[i].astype(_np.float64))
                         for i in range(2)])
        ok = bool(_np.max(_np.abs(X - ref) / (_np.abs(ref) + 1e-3)) < 5e-3)
        if not ok:
            import sys as _sys
            print("hdpgpc_tpu: pallas chol_solve smoke test FAILED "
                  "numerically; falling back to XLA solves",
                  file=_sys.stderr)
        return ok
    except Exception as e:  # Mosaic compile / runtime failure
        import sys as _sys
        print(f"hdpgpc_tpu: pallas chol_solve unavailable ({e!r}); "
              "falling back to XLA solves", file=_sys.stderr)
        return False
