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


def _mm(a, b):
    """f32 matmul. The MXU's DEFAULT precision is bfloat16: a bare
    ``@`` inside the kernel silently truncates every rank-1 update and
    substitution to ~8 mantissa bits (measured: L error 1.8e-2 vs the
    2e-6 of the identical algorithm at f32) — precision=HIGHEST runs
    the 3-pass bf16 decomposition, recovering full f32."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)



def _panel_factor(slab, j0):
    """Factor a (TP, NB) panel in place; rows < j0 are zeroed.

    slab holds columns [j0, j0+NB) of the trailing matrix, already
    updated by the finished panels. Returns the L panel (exact zeros
    above the diagonal).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (TP, NB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TP, NB), 1)

    # NOTE: python-unrolled over the NB pivots, NOT fori_loop/scan: any
    # structured loop on this Mosaic toolchain carries 64-bit scalars
    # (fori_loop's i64 index forces i64->i32 conversions that recurse
    # in _convert_helper; lax.scan's internal counter trips the layout
    # check `bitwidth_ <= 32`). Unrolled, every index is a constant and
    # the one-hot masks fold to constant vectors.
    for k in range(NB):
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
        # rank-1 trailing update as a BROADCAST MULTIPLY: (TP,1)*(1,NB)
        # runs on the VPU at exact f32 — an MXU matmul here would need
        # the 3-pass HIGHEST mode for the same accuracy at more cost
        slab = slab - lcol * mult
        # write the finished column k
        slab = jnp.where(cols == k, lcol, slab)
    return slab


def _inv_lower(Lb):
    """Inverse of a (NB, NB) lower-triangular block by forward subst."""
    r = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 1)
    X = jnp.zeros((NB, NB), Lb.dtype)

    for k in range(NB):             # python-unrolled (see _panel_factor)
        lrow = jnp.sum(jnp.where(r == k, Lb, 0.0), axis=0,
                       keepdims=True)                       # (1, NB)
        piv = jnp.sum(jnp.where((r == k) & (c == k), Lb, 0.0))
        lrow_strict = jnp.where(c[:1, :] < k, lrow, 0.0)
        # both branches must be typed: where(cond, 1.0, 0.0) builds an
        # f64 vector under jax_enable_x64, which Mosaic's vector-layout
        # pass rejects (bitwidth <= 32)
        ek = (c[:1, :] == k).astype(Lb.dtype)
        newrow = (ek - _mm(lrow_strict, X)) / piv           # (1, NB)
        X = jnp.where(r == k, newrow, X)
    return X


def _panel_factor_b(slab, j0):
    """Batched `_panel_factor`: slab (B, TP, NB), all B matrices share
    the serial pivot chain — one rank-1 update per pivot updates every
    matrix in the batch, so the kernel's critical path is NB pivots per
    panel instead of B * NB (the grid=(n,) form re-ran the whole chain
    per matrix)."""
    B = slab.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, TP, NB), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, TP, NB), 2)
    for k in range(NB):                 # python-unrolled (Mosaic: see
        piv_row = j0 + k                # _panel_factor note)
        colv = jnp.sum(jnp.where(cols == k, slab, 0.0), axis=2,
                       keepdims=True)                     # (B, TP, 1)
        rowv = jnp.sum(jnp.where(rows == piv_row, slab, 0.0), axis=1,
                       keepdims=True)                     # (B, 1, NB)
        # pivot as a (B, 1, 1) via two single-axis masked reductions
        # (a multi-axis reduce's reshape trips Mosaic layout inference)
        piv = jnp.sum(jnp.where(rows[:, :, :1] == piv_row, colv, 0.0),
                      axis=1, keepdims=True)              # (B, 1, 1)
        dinv = jax.lax.rsqrt(piv)                         # (B, 1, 1)
        lcol = jnp.where(rows[:, :, :1] >= piv_row, colv * dinv, 0.0)
        mult = jnp.where(cols[:, :1, :] > k, rowv * dinv, 0.0)
        slab = slab - lcol * mult       # VPU broadcast rank-1, batched
        slab = jnp.where(cols == k, lcol, slab)
    return slab


def _inv_lower_b(Lb):
    """Batched `_inv_lower`: (B, NB, NB) lower-triangular inverses."""
    B = Lb.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (B, NB, NB), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (B, NB, NB), 2)
    X = jnp.zeros((B, NB, NB), Lb.dtype)
    for k in range(NB):
        lrow = jnp.sum(jnp.where(r == k, Lb, 0.0), axis=1,
                       keepdims=True)                     # (B, 1, NB)
        piv = jnp.sum(jnp.where(c[:, :1, :] == k, lrow, 0.0), axis=2,
                      keepdims=True)                      # (B, 1, 1)
        lrow_strict = jnp.where(c[:, :1, :] < k, lrow, 0.0)
        ek = (c[:, :1, :] == k).astype(Lb.dtype)
        newrow = (ek - _mm(lrow_strict, X)) / piv         # (B, 1, NB)
        X = jnp.where(r == k, newrow, X)
    return X


def _chol_solve_kernel_batched(a_ref, b_ref, x_ref):
    """Whole-batch fused factor+solve: ONE kernel instance factors all
    B SPD systems together (batch-vectorized pivot chain), then runs
    both substitutions as batched MXU matmuls. Same numerics as
    `_chol_solve_kernel`, ~B-fold shorter serial critical path."""
    A = a_ref[...]                                        # (B, TP, TP)
    Bm = b_ref[...]

    panels = []                                  # (B, TP, NB) L panels
    for j in range(_NBLK):
        j0 = j * NB
        slab = A[:, :, j0:j0 + NB]
        if j > 0:
            Ldone = jnp.concatenate(panels, axis=2)       # (B, TP, j0)
            slab = slab - _mm(Ldone,
                              Ldone[:, j0:j0 + NB, :].swapaxes(1, 2))
        panels.append(_panel_factor_b(slab, j0))
    L = jnp.concatenate(panels, axis=2)                   # (B, TP, TP)

    # keep invD as a python list of (B, NB, NB) blocks — a stacked 4D
    # array would need Mosaic 4D vector layouts
    invD = [_inv_lower_b(panels[j][:, j * NB:(j + 1) * NB, :])
            for j in range(_NBLK)]

    yrows = []
    for j in range(_NBLK):
        j0 = j * NB
        Rj = Bm[:, j0:j0 + NB, :]
        if j > 0:
            Ydone = jnp.concatenate(yrows, axis=1)        # (B, j0, TP)
            Rj = Rj - _mm(L[:, j0:j0 + NB, :j0], Ydone)
        yrows.append(_mm(invD[j], Rj))

    xrows: list = [None] * _NBLK
    for j in reversed(range(_NBLK)):
        j0 = j * NB
        j1 = j0 + NB
        Rj = yrows[j]
        if j < _NBLK - 1:
            Xdone = jnp.concatenate(xrows[j + 1:], axis=1)
            Rj = Rj - _mm(L[:, j1:, j0:j1].swapaxes(1, 2), Xdone)
        xrows[j] = _mm(invD[j].swapaxes(1, 2), Rj)

    x_ref[...] = jnp.concatenate(xrows, axis=1)


def _chol_solve_kernel(a_ref, b_ref, x_ref):
    # NOTE: no ``.at[].set`` anywhere — Mosaic's lowering of scatter /
    # masked-write into a full tile is unsupported on this toolchain
    # (NotImplementedError / lowering recursion); every partial result
    # is kept as a list of static blocks and concatenated.
    A = a_ref[0]                                            # (TP, TP)
    B = b_ref[0]

    # ---- blocked Cholesky (python-unrolled over the 4 panels) ----
    panels = []                                   # (TP, NB) L panels
    for j in range(_NBLK):
        j0 = j * NB
        slab = A[:, j0:j0 + NB]
        if j > 0:
            # trailing update with the finished panels (MXU)
            Ldone = jnp.concatenate(panels, axis=1)        # (TP, j0)
            slab = slab - _mm(Ldone, Ldone[j0:j0 + NB, :].T)
        panels.append(_panel_factor(slab, j0))
    L = jnp.concatenate(panels, axis=1)                    # (TP, TP)

    # ---- invert the diagonal blocks ----
    invD = [_inv_lower(panels[j][j * NB:(j + 1) * NB, :])
            for j in range(_NBLK)]

    # ---- forward substitution: L Y = B (block rows in order) ----
    yrows = []
    for j in range(_NBLK):
        j0 = j * NB
        Rj = B[j0:j0 + NB, :]
        if j > 0:
            Ydone = jnp.concatenate(yrows, axis=0)         # (j0, TP)
            Rj = Rj - _mm(L[j0:j0 + NB, :j0], Ydone)
        yrows.append(_mm(invD[j], Rj))

    # ---- backward substitution: L' X = Y (block rows in reverse) ----
    xrows: list = [None] * _NBLK
    for j in reversed(range(_NBLK)):
        j0 = j * NB
        j1 = j0 + NB
        Rj = yrows[j]
        if j < _NBLK - 1:
            Xdone = jnp.concatenate(xrows[j + 1:], axis=0)  # (TP-j1, TP)
            Rj = Rj - _mm(L[j1:, j0:j1].T, Xdone)
        xrows[j] = _mm(invD[j].T, Rj)

    x_ref[0] = jnp.concatenate(xrows, axis=0)


# Largest batch the single-instance kernel keeps in VMEM (~192 KiB per
# matrix triple at TP=128; 32 * 192 KiB = 6 MiB, comfortably inside the
# ~16 MiB/core budget with margin for Mosaic temporaries).
_BATCHED_MAX_N = 32


@functools.partial(jax.jit, static_argnames=("interpret", "batched"))
def fused_spd_solve(spd: jax.Array, rhs: jax.Array,
                    interpret: bool | None = None,
                    batched: bool = True) -> jax.Array:
    """X[i] = spd[i]^{-1} rhs[i] for spd, rhs of shape (n, T, T), T <= 128.

    spd must be symmetric positive definite (jitter applied by the
    caller, matching the XLA path). float32. interpret=None resolves to
    compiled on TPU, interpreter elsewhere (CPU tests).

    batched=True (default) runs ONE kernel instance that factors the
    whole batch together — the pivot chain is vectorized across the
    batch, so the serial critical path does not grow with n (VMEM
    bound: ~n * 3 * TP*TP*4 bytes; fine for the refit step's n <= 8).
    batched=False keeps the original grid=(n,) per-matrix form.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, T, _ = spd.shape
    # VMEM guard: the batched form holds ~3 (n, TP, TP) f32 slabs in
    # VMEM (~n * 3 * 128*128*4 B = n * 192 KiB). The import-time probe
    # only validates small n, so a large caller batch would hit a
    # Mosaic VMEM/compile failure at the production call site instead
    # of tripping the fallback — route those to the grid=(n,) form.
    if batched and n > _BATCHED_MAX_N:
        batched = False
    pad = TP - T
    eyep = jnp.zeros((TP, TP), spd.dtype).at[T:, T:].set(jnp.eye(
        pad, dtype=spd.dtype)) if pad else jnp.zeros((TP, TP), spd.dtype)
    A = jnp.pad(spd, ((0, 0), (0, pad), (0, pad))) + eyep
    B = jnp.pad(rhs, ((0, 0), (0, pad), (0, pad)))
    if batched:
        # explicit i32 index map: a defaulted BlockSpec synthesizes i64
        # zero indices under jax_enable_x64, and when the caller vmaps
        # this function (the refit program batches clusters) Mosaic
        # rejects the generated index-map function ("failed to legalize
        # 'func.return' (i32, i64, i64, i64)") — same class as the
        # grid-form note below.
        imap3 = lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        X = pl.pallas_call(
            _chol_solve_kernel_batched,
            out_shape=jax.ShapeDtypeStruct((n, TP, TP), spd.dtype),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((n, TP, TP), imap3, memory_space=pltpu.VMEM),
                pl.BlockSpec((n, TP, TP), imap3, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, TP, TP), imap3,
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(A, B)
        return X[:, :T, :T]
    # NOTE: the literal 0s in the index map MUST be i32: under
    # jax_enable_x64 a bare Python 0 traces as i64 and Mosaic rejects
    # the index-map function ("failed to legalize 'func.return'
    # (i32, i64, i64)").
    imap = lambda i: (i, jnp.int32(0), jnp.int32(0))
    X = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((n, TP, TP), spd.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, TP, TP), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP, TP), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TP, TP), imap,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A, B)
    return X[:, :T, :T]


_PROBE_RESULT: bool | None = None


def _probe_cache_clear() -> None:
    global _PROBE_RESULT
    _PROBE_RESULT = None


def pallas_solves_enabled() -> bool:
    """Use the fused kernel on the f32 refit path: TPU backend only
    (CPU keeps the XLA lowering), overridable via HDPGPC_PALLAS_SOLVES.

    On TPU the decision is self-validating: the kernel is compiled and
    numerically smoke-tested against the XLA solve once per process,
    and any Mosaic/runtime failure silently falls back to the XLA
    lowering (a production sweep must never die on a kernel-gate
    regression).

    The probe runs device computation, so it must execute in a CLEAN
    trace context: called for the first time inside jit tracing (e.g.
    from a scan body), the probe's own jitted call would be staged into
    the outer trace and its output would be a tracer. In that case we
    return False for the current trace WITHOUT caching, so a later
    eager call (program builders probe eagerly) still enables the
    kernel."""
    global _PROBE_RESULT
    env = os.environ.get("HDPGPC_PALLAS_SOLVES")
    if env is not None:
        return env not in ("0", "false", "")
    if _PROBE_RESULT is not None:
        return _PROBE_RESULT
    from jax._src import core as _jcore
    if not _jcore.trace_state_clean():
        return False
    try:
        if jax.default_backend() != "tpu":
            _PROBE_RESULT = False
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
        if ok:
            # profitability check: enable only if the kernel actually
            # beats the XLA cholesky+cho_solve lowering at a refit-like
            # batch. Measured over 200 iterations inside ONE jitted
            # scan: at the old 20 iterations the whole program ran in
            # ~one tunnel round-trip (~27 ms), so the "timing" was pure
            # dispatch latency and the gate's verdict was noise
            # (measured len=20: 3.0 vs 2.0 ms/iter; len=200: 0.34 vs
            # 0.36 — opposite conclusions). 200 iterations puts kernel
            # time an order of magnitude above dispatch.
            import time as _time
            s4 = jnp.asarray(_np.tile(spd, (2, 1, 1)))
            r4 = jnp.asarray(_np.tile(rhs, (2, 1, 1)))
            _LEN = 200

            def _many(fn):
                def body(c, _):
                    return c + 1.0, fn(s4 + 0.0 * c, r4)[0, 0, 0]
                return jax.jit(lambda: jax.lax.scan(
                    body, jnp.float32(0), None, length=_LEN)[1])

            def _t(fn):
                prog = _many(fn)
                prog().block_until_ready()
                best = float("inf")
                for _ in range(3):
                    t0 = _time.time()
                    prog().block_until_ready()
                    best = min(best, _time.time() - t0)
                return best

            t_pl = _t(lambda a, b: fused_spd_solve(a, b, interpret=False))
            t_xla = _t(lambda a, b: jax.scipy.linalg.cho_solve(
                (jnp.linalg.cholesky(a), True), b))
            ok = t_pl < t_xla
            ms = 1e3 / _LEN
            if not ok:
                import sys as _sys
                print(f"hdpgpc_tpu: pallas chol_solve correct but slower "
                      f"than XLA here ({t_pl * ms:.3f} vs {t_xla * ms:.3f} "
                      "ms/iter); using XLA solves", file=_sys.stderr)
        _PROBE_RESULT = ok
        return ok
    except Exception as e:  # Mosaic compile / runtime failure
        import sys as _sys
        print(f"hdpgpc_tpu: pallas chol_solve unavailable ({e!r}); "
              "falling back to XLA solves", file=_sys.stderr)
        _PROBE_RESULT = False
        return False


pallas_solves_enabled.cache_clear = _probe_cache_clear  # lru_cache-compat
