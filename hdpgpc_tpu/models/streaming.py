"""Long-horizon streaming inference (the 1M-beat stress configuration).

The reference bounds online cost with caches and an estimation_limit
that freezes LDS parameters (SURVEY.md §5 "long-context"); past that
point each cluster is a FIXED linear-Gaussian system and the per-beat
work is embarrassingly parallelisable over the beat axis. This module
exploits that: beats stream in chunks, each chunk is classified with
one jitted program that

1. scores every beat against every (frozen) cluster in parallel,
2. runs the HMM forward pass over the chunk as a lax.scan carrying the
   filter message across chunk boundaries (exact, streaming),
3. updates each cluster's GP posterior over its assigned beats with an
   associative-scan Kalman filter (ops/kalman.parallel_filter) under a
   hard-assignment gating approximation.

State between chunks is O(K * T^2) — independent of stream length, so
a 1M-beat stream runs in constant memory with K=64 clusters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hdpgpc_tpu.ops.linalg import precise_jit
import numpy as np

from hdpgpc_tpu.ops import linalg
from hdpgpc_tpu.ops.kalman import parallel_filter_masked
from hdpgpc_tpu.ops.kernels import KernelParams, gram


class StreamState(NamedTuple):
    """Frozen-parameter streaming state for K clusters."""

    f: jax.Array           # (K, T, 1) cluster posterior means
    P: jax.Array           # (K, T, T) posterior covariances
    A: jax.Array           # (K, T, T) frozen LDS params
    Gamma: jax.Array
    C: jax.Array
    Sigma: jax.Array
    counts: jax.Array      # (K,) assigned-beat counts
    fmsg: jax.Array        # (K,) HMM forward message (normalised)
    trans_log_pi: jax.Array  # (K, K)


def init_stream_state(templates: jax.Array, ini_gamma: float,
                      ini_sigma: float, trans_log_pi=None) -> StreamState:
    """templates: (K, T) initial cluster means (e.g. from an offline
    warm-up segment)."""
    K, T = templates.shape
    eye = jnp.eye(T, dtype=templates.dtype)
    f = templates[..., None]
    P = jnp.broadcast_to(ini_sigma * eye, (K, T, T))
    A = jnp.broadcast_to(eye, (K, T, T))
    Gamma = jnp.broadcast_to(ini_gamma * eye, (K, T, T))
    C = jnp.broadcast_to(eye, (K, T, T))
    Sigma = jnp.broadcast_to(ini_sigma * eye, (K, T, T))
    if trans_log_pi is None:
        trans_log_pi = jnp.log(jnp.full((K, K), 1.0 / K,
                                        dtype=templates.dtype))
    return StreamState(f, P, A, Gamma, C, Sigma,
                       jnp.zeros((K,), templates.dtype),
                       jnp.full((K,), 1.0 / K, templates.dtype),
                       trans_log_pi)


def build_stream_step(T: int, K: int):
    """One jitted chunk step: (state, Y (B, T)) -> (state', labels (B,))."""

    @precise_jit
    def step(state: StreamState, Y: jax.Array, mask: jax.Array
             ) -> Tuple[StreamState, jax.Array]:
        """mask: (B,) 1.0 for real beats, 0.0 for padding (padding
        neither advances the HMM message nor updates any cluster)."""
        B = Y.shape[0]
        dtype = Y.dtype

        # --- batched emission scores vs every cluster (no log-det,
        # reference scoring semantics) ---
        means = (state.C @ state.f)[..., 0]               # (K, T)
        Ls = jax.vmap(linalg.chol_spd)(state.Sigma)       # (K, T, T)

        def score_cluster(mean_k, L_k):
            d = (Y - mean_k[None]).T                      # (T, B)
            s = jax.scipy.linalg.solve_triangular(L_k, d, lower=True)
            return -0.5 * jnp.sum(s * s, axis=0) - 0.5 * T * linalg.LOG2PI

        logq = jax.vmap(score_cluster)(means, Ls).T       # (B, K)

        # --- streaming HMM forward pass over the chunk ---
        PiT = jnp.exp(state.trans_log_pi
                      - jnp.max(state.trans_log_pi, axis=1,
                                keepdims=True)).T
        PiT = jnp.where(PiT < 1e-6, PiT + 1e-4, PiT)

        def fwd(fm, inp):
            lq, mk = inp
            ev = jnp.exp(lq - jnp.max(lq))
            fm2 = (PiT @ fm) * ev
            fm2 = fm2 / jnp.sum(fm2)
            fm2 = jnp.where(mk > 0.5, fm2, fm)
            return fm2, fm2

        fmsg_last, fms = jax.lax.scan(fwd, state.fmsg, (logq, mask))
        labels = jnp.argmax(fms, axis=1)                  # (B,)

        # --- per-cluster posterior update over assigned beats ---
        onehot = jax.nn.one_hot(labels, K, dtype=dtype) * mask[:, None]

        def update_cluster(k, f_k, P_k):
            # gated associative-scan filter (ops/kalman): O(log B)
            # depth of batched matmul rounds instead of a B-length
            # sequential scan; beats with w=0 contribute identity
            # elements (no prediction, no update).
            w = onehot[:, k]
            fs, Ps = parallel_filter_masked(
                Y[:, :, None], w, state.A[k], state.Gamma[k],
                state.C[k], state.Sigma[k], f_k, P_k)
            return fs[-1], Ps[-1]

        f_new, P_new = jax.vmap(update_cluster, in_axes=(0, 0, 0))(
            jnp.arange(K), state.f, state.P)
        counts = state.counts + jnp.sum(onehot, axis=0)
        return state._replace(f=f_new, P=P_new, counts=counts,
                              fmsg=fmsg_last), labels

    return step


def stream_classify(state: StreamState, Y: np.ndarray, chunk: int = 4096):
    """Stream a long beat tensor through chunked jitted steps.

    Y: (N, T). Returns (state, labels (N,)). N is processed in
    fixed-size chunks (last chunk zero-padded; padding labels dropped).
    """
    K = state.f.shape[0]
    T = state.f.shape[1]
    step = build_stream_step(T, K)
    N = Y.shape[0]
    # compute in the state's dtype (f32 on TPU is the native speed
    # regime; a f64 Y would silently promote the whole chunk step)
    Y = np.asarray(Y, dtype=np.dtype(str(state.f.dtype)))
    labels = np.empty(N, np.int64)
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        block = Y[s:e]
        if block.shape[0] < chunk:
            block = np.pad(block, ((0, chunk - block.shape[0]), (0, 0)),
                           mode="edge")
        mask = np.zeros(chunk); mask[: e - s] = 1.0
        state, lab = step(state, jnp.asarray(block), jnp.asarray(mask))
        labels[s:e] = np.asarray(lab)[: e - s]
    return state, labels
