"""Pallas TPU kernel: fused RBF Gram matrix construction.

Computes K[i, j] = c * exp(-0.5 * (x[i] - x[j])^2 / l^2) tiled onto the
VPU, avoiding the (T, T, D) broadcast intermediate of the naive XLA
lowering. Replaces the reference's sklearn kernel evaluation
(GPI_HDP.py:159-166) on the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _gram_kernel(x_row_ref, x_col_ref, scale_ref, out_ref):
    # x_row: (TILE, 1) slice of x for this row block; x_col: (1, T) full x.
    c = scale_ref[0, 0]
    inv_l2 = scale_ref[0, 1]
    d = x_row_ref[:] - x_col_ref[:]          # (TILE, T) broadcast
    out_ref[:] = c * jnp.exp(-0.5 * d * d * inv_l2)


@functools.partial(jax.jit, static_argnames=("tile",))
def rbf_gram_pallas(x: jax.Array, outputscale, lengthscale, tile: int = 256) -> jax.Array:
    """RBF Gram of a 1-D input grid x (T,) -> (T, T)."""
    T = x.shape[0]
    Tp = _round_up(T, 128)
    xp = jnp.zeros((Tp,), dtype=x.dtype).at[:T].set(x)
    tile = min(tile, Tp)
    scale = jnp.array([[outputscale, 1.0 / (lengthscale**2)]], dtype=x.dtype)

    # i32 constants in the index maps: under jax_enable_x64 a bare
    # Python 0 traces as i64 and Mosaic rejects the index-map function
    # ("failed to legalize 'func.return'"). The cast must be built
    # INSIDE each lambda — index maps may not capture tracers.
    out = pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((Tp, Tp), x.dtype),
        grid=(Tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp), lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile, Tp), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
    )(xp.reshape(Tp, 1), xp.reshape(1, Tp), scale)
    return out[:T, :T]
