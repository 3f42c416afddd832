"""GP covariance (Gram) construction: Constant * RBF + White.

The reference builds sklearn kernels
``ConstantKernel(c) * RBF(l) + WhiteKernel(n)`` (GPI_HDP.py:159-166).
sklearn semantics we preserve:

* two-argument evaluation ``k(X, Y)`` does NOT add white noise, even
  when ``X is Y`` — this is what makes the reference's "first step"
  detection and its ``cov_f = k(x) - k(x, x) = n*I`` trick work
  (GPI.py:136-139).
* one-argument evaluation ``k(X)`` adds ``n`` on the diagonal.

A Pallas TPU kernel computes the fused squared-distance/exponential
Gram for large T; for small T or on CPU the XLA path is used.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KernelParams(NamedTuple):
    """theta of Constant(c) * RBF(lengthscale) + White(noise)."""

    outputscale: jax.Array   # c   (constant_value)
    lengthscale: jax.Array   # l
    noise: jax.Array         # n   (noise_level, a variance)


def rbf_gram(x1: jax.Array, x2: jax.Array, outputscale, lengthscale) -> jax.Array:
    """c * exp(-0.5 |x1 - x2|^2 / l^2); x1 (T1, D) or (T1,), x2 (T2, D)."""
    a = jnp.atleast_2d(x1.reshape(x1.shape[0], -1))
    b = jnp.atleast_2d(x2.reshape(x2.shape[0], -1))
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return outputscale * jnp.exp(-0.5 * d2 / (lengthscale**2))


def gram(params: KernelParams, x1: jax.Array, x2: jax.Array | None = None,
         include_noise: bool | None = None) -> jax.Array:
    """Evaluate the kernel.

    ``include_noise=None`` follows sklearn: noise added iff called
    one-argument (x2 is None).
    """
    if x2 is None:
        x2 = x1
        if include_noise is None:
            include_noise = True
    elif include_noise is None:
        include_noise = False
    K = rbf_gram(x1, x2, params.outputscale, params.lengthscale)
    if include_noise:
        K = K + params.noise * jnp.eye(K.shape[0], dtype=K.dtype)
    return K


def gram_tpu(params: KernelParams, x: jax.Array, include_noise: bool = False) -> jax.Array:
    """Square Gram K(x, x) via the Pallas TPU kernel when profitable.

    Falls back to the XLA path off-TPU or for tiny T.
    """
    T = x.shape[0]
    # Pallas TPU custom-calls don't survive XLA's X64 rewrite pass —
    # f64 inputs crash the worker. Only dispatch for native dtypes.
    if (jax.default_backend() not in ("tpu", "axon") or T < 128
            or x.dtype not in (jnp.float32, jnp.bfloat16)):
        return gram(params, x, x, include_noise=include_noise)
    from hdpgpc_tpu.ops.pallas.gram import rbf_gram_pallas

    K = rbf_gram_pallas(x.reshape(-1), params.outputscale, params.lengthscale)
    if include_noise:
        K = K + params.noise * jnp.eye(T, dtype=K.dtype)
    return K
