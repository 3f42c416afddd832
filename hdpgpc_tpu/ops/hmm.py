"""HMM message passing over the beat sequence.

Mirrors the reference's forward/backward/coupled-pair computations on
log evidence (GPI_HDP.py:3546-3699), including its exact numerical
flooring constants:

* forward: PiTMat[PiTMat < 1e-6] += 1e-4, pi[pi < 1e-10] += 1e-4
  (GPI_HDP.py:3584-3585)
* backward: PiMat[PiMat < 1e-5] += 1e-4 and row normalisation by the
  sum over all-but-last entries (GPI_HDP.py:3643-3646)
* responsibilities are HARD one-hot argmax assignments
  (``_safe_exp``, GPI_HDP.py:338-350), not softmax.

All functions are jittable with static K (recompiled per cluster
count, which changes rarely).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hdpgpc_tpu.ops.linalg import precise_jit


def row_normalize_log(logw: jax.Array, axis: int = 1):
    """Subtract the row max (reference LogLik, GPI_HDP.py:632-661)."""
    c = jnp.max(logw, axis=axis, keepdims=True)
    return logw - c, jnp.squeeze(c, axis=axis)


def _safe_exp_rows(x: jax.Array) -> jax.Array:
    """exp(x - rowmax) with NaN -> tiny (reference local safe_exp)."""
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    return jnp.nan_to_num(e, nan=1e-8)


def hard_resp(logresp: jax.Array) -> jax.Array:
    """Hard one-hot row argmax (reference _safe_exp 2-D, GPI_HDP.py:338-343)."""
    idx = jnp.argmax(logresp, axis=-1)
    return jax.nn.one_hot(idx, logresp.shape[-1], dtype=logresp.dtype)


def hard_resp_pair(logrespPair: jax.Array) -> jax.Array:
    """Hard one-hot over flattened (K, K) per row (GPI_HDP.py:344-350)."""
    N, K, _ = logrespPair.shape
    flat = logrespPair.reshape(N, K * K)
    idx = jnp.argmax(flat, axis=-1)
    return jax.nn.one_hot(idx, K * K, dtype=logrespPair.dtype).reshape(N, K, K)


def _norm_compose(a, b):
    """Normalised matrix composition for associative message scans.

    ``b`` is the later element; the product is renormalised by its total
    mass, which cancels in every downstream use (the messages are only
    ever consumed after per-step normalisation) but keeps the entries
    O(1) over thousands of compositions."""
    c = b @ a
    s = jnp.sum(c, axis=(-2, -1), keepdims=True)
    return c / jnp.where(s == 0, 1.0, s)


def forward(start_log_pi, trans_log_pi, log_q):
    """Normalised forward filtering.

    start_log_pi: (K,) log start distribution; trans_log_pi: (K, K) log
    transition matrix; log_q: (N, K) row-normalised log evidence.
    Returns fmsg (N, K) and margPrObs (N,).

    TPU-native design: the reference's sequential recursion
    (GPI_HDP.forward, GPI_HDP.py:3546-3610) is latency-bound on TPU
    (N tiny steps). Because every step renormalises, the filtered
    message is scale-invariant in the prefix product, so it is computed
    here with ``lax.associative_scan`` over transition-evidence matrices
    M_t = diag(q_t) @ Pi^T in log2(N) batched-matmul rounds — same
    values as the sequential recursion up to float rounding.
    """
    pi = jnp.exp(start_log_pi)
    pi = jnp.where(pi < 1e-10, pi + 1e-4, pi)
    PiT = _safe_exp_rows(trans_log_pi.T)
    PiT = jnp.where(PiT < 1e-6, PiT + 1e-4, PiT)
    q = _safe_exp_rows(log_q)
    N = q.shape[0]

    a1 = pi * q[0]
    marg1 = jnp.sum(a1)
    f1 = a1 / marg1
    if N == 1:
        return f1[None], marg1[None]

    M = q[1:, :, None] * PiT[None]              # (N-1, K, K) = diag(q_t) PiT
    C = jax.lax.associative_scan(_norm_compose, M)
    alpha = C @ f1                               # (N-1, K), any per-t scale
    ssum = jnp.sum(alpha, axis=1, keepdims=True)
    fmsg = jnp.concatenate([f1[None], alpha / ssum], axis=0)
    # marg_t = sum((PiT f_{t-1}) * q_t) on the NORMALISED previous message
    # (the reference divides by marg at each step, GPI_HDP.py:3595-3601)
    marg_rest = jnp.sum(jnp.einsum("tij,tj->ti", M, fmsg[:-1]), axis=1)
    marg = jnp.concatenate([marg1[None], marg_rest], axis=0)
    return fmsg, marg


def forward_seq(start_log_pi, trans_log_pi, log_q):
    """Sequential reference recursion (property-test oracle for
    ``forward``; GPI_HDP.py:3546-3610 literally)."""
    pi = jnp.exp(start_log_pi)
    pi = jnp.where(pi < 1e-10, pi + 1e-4, pi)
    PiT = _safe_exp_rows(trans_log_pi.T)
    PiT = jnp.where(PiT < 1e-6, PiT + 1e-4, PiT)
    q = _safe_exp_rows(log_q)

    def step(carry, q_t):
        f_prev, is_first = carry
        f = jnp.where(is_first, pi * q_t, (PiT @ f_prev) * q_t)
        marg = jnp.sum(f)
        f = f / marg
        return (f, jnp.zeros_like(is_first)), (f, marg)

    init = (jnp.zeros(q.shape[1], dtype=q.dtype), jnp.asarray(True))
    (_, _), (fmsg, marg) = jax.lax.scan(step, init, q)
    return fmsg, marg


def forward_incremental(fmsg_prev, trans_log_pi, log_q_last):
    """Append one forward step to a cached fmsg (GPI_HDP.py:3586-3594)."""
    PiT = _safe_exp_rows(trans_log_pi.T)
    PiT = jnp.where(PiT < 1e-6, PiT + 1e-4, PiT)
    q_last = jnp.nan_to_num(jnp.exp(log_q_last - jnp.max(log_q_last)), nan=1e-8)
    f = (PiT @ fmsg_prev) * q_last
    marg = jnp.sum(f)
    return f / marg, marg


def backward(trans_log_pi, log_q):
    """Backward messages with the reference's quirky normalisation.

    bmsg[t] = PiMat @ (bmsg[t+1] * q[t+1]), then divided by the sum of
    its entries EXCLUDING the last column (GPI_HDP.py:3644-3646).

    Computed by ``lax.associative_scan`` over B_t = PiMat @ diag(q_{t+1})
    (suffix products, log2(N) rounds): the per-step normalisation is
    scale-invariant, so normalising only the final suffix-product
    messages reproduces the sequential recursion exactly (up to float
    rounding).
    """
    PiMat = _safe_exp_rows(trans_log_pi)
    PiMat = jnp.where(PiMat < 1e-5, PiMat + 1e-4, PiMat)
    q = _safe_exp_rows(log_q)
    N, K = q.shape
    b_last = jnp.ones(K, dtype=q.dtype)
    if N == 1:
        return b_last[None]

    B = PiMat[None] * q[1:, None, :]             # (N-1, K, K) = PiMat diag(q)
    C = jax.lax.associative_scan(_norm_compose, B, reverse=True)
    b = jnp.sum(C, axis=2)                        # C_t @ ones
    b = b / jnp.sum(b[:, :-1], axis=1, keepdims=True)
    return jnp.concatenate([b, b_last[None]], axis=0)


def backward_seq(trans_log_pi, log_q):
    """Sequential reference recursion (property-test oracle for
    ``backward``; GPI_HDP.py:3612-3649 literally)."""
    PiMat = _safe_exp_rows(trans_log_pi)
    PiMat = jnp.where(PiMat < 1e-5, PiMat + 1e-4, PiMat)
    q = _safe_exp_rows(log_q)

    def step(b_next, q_next):
        b = PiMat @ (b_next * q_next)
        b = b / jnp.sum(b[:-1])
        return b, b

    K = q.shape[1]
    b_last = jnp.ones(K, dtype=q.dtype)
    _, bs = jax.lax.scan(step, b_last, q[1:], reverse=True)
    return jnp.concatenate([bs, b_last[None]], axis=0)


def coupled_pair_log(alpha, beta, trans_log_pi, log_q):
    """log respPair (N, K, K) — reference coupled_state_coef
    (GPI_HDP.py:3651-3699)."""
    PiMat = _safe_exp_rows(trans_log_pi)
    bmsgSoftEv = _safe_exp_rows(log_q) * beta
    N, K = alpha.shape
    respPair = jnp.zeros((N, K, K), dtype=alpha.dtype)
    rp = alpha[:-1][:, :, None] * bmsgSoftEv[1:][:, None, :]
    respPair = respPair.at[1:].set(rp)
    respPair = respPair * PiMat[None, :, :]
    den = jnp.sum(respPair, axis=(1, 2))[:, None, None]
    den = jnp.where(den == 0, 1e-10, den)
    return jnp.log(respPair / den)


@precise_jit
def fb_hard_packed(packed):
    """fb_hard on a single packed upload: row 0 = start_log_pi, rows
    [1, Kp] = trans_log_pi, rows [Kp+1, ...) = log_q. On the tunnelled
    TPU every host->device transfer costs a full round trip; packing
    the three arrays (values unchanged) cuts the per-call transfer
    count to one."""
    Kp = packed.shape[1]
    return fb_hard(packed[0], packed[1:Kp + 1], packed[Kp + 1:])


def _fb_messages(start_log_pi, trans_log_pi, log_q):
    """Shared FB core: returns (logresp, logrespPair)."""
    q_norm, _ = row_normalize_log(log_q, axis=1)
    alpha, marg = forward(start_log_pi, trans_log_pi, q_norm)
    beta = backward(trans_log_pi, q_norm)
    logresp, _ = row_normalize_log(jnp.log(alpha * beta), axis=1)
    lrp = coupled_pair_log(alpha, beta, trans_log_pi, q_norm)
    # The reference wraps the pair tensor in LogLik(axis=1), but its
    # isinf early-return (GPI_HDP.py:647-648) ALWAYS fires — row 0 of
    # coupled_state_coef is log(0) = -inf — so the tensor used is the
    # raw globally-normalised log respPair, and the hard one-hot is its
    # flat argmax (the true transition pair). Reproduce that exactly,
    # with the conditional kept for safety.
    c = jnp.max(lrp, axis=1, keepdims=True)
    any_inf = jnp.any(jnp.isinf(c))
    logrespPair = jnp.where(any_inf, lrp, lrp - c)
    return logresp, logrespPair


@precise_jit
def fb_hard(start_log_pi, trans_log_pi, log_q):
    """Full pipeline: normalise q -> FB -> hard resp and respPair.

    Returns (resp, logresp, respPair, logrespPair), matching the
    reference's variational_local_terms output contract.
    """
    logresp, logrespPair = _fb_messages(start_log_pi, trans_log_pi, log_q)
    return hard_resp(logresp), logresp, hard_resp_pair(logrespPair), logrespPair


@precise_jit
def fb_hard_packed_idx(packed):
    """Hard-decision-only FB on a packed upload: returns per-row argmax
    indices ``(idx (N,) int32, pair_idx (N,) int32)`` instead of dense
    one-hots. The offline sweep consumes ONLY the hard argmaxes, and the
    dense (N, K, K) pair tensor dominates the device->host fetch on a
    tunnelled TPU (~1.3 MB/call at N=2272, K=8 vs 18 KB of indices).
    The host reconstructs the identical one-hots (argmax tie-breaking is
    the same first-max rule on both sides of the transfer)."""
    Kp = packed.shape[1]
    logresp, logrespPair = _fb_messages(packed[0], packed[1:Kp + 1],
                                        packed[Kp + 1:])
    N = logresp.shape[0]
    idx = jnp.argmax(logresp, axis=-1).astype(jnp.int32)
    pidx = jnp.argmax(logrespPair.reshape(N, Kp * Kp),
                      axis=-1).astype(jnp.int32)
    return idx, pidx


def posterior_log_marginals(log_alpha, log_beta):
    """Per-step posterior state log-marginals h (compute_h,
    GPI_HDP.py:3824-3862).

    ``h[t, i] = log_alpha[t, i] + log_beta[t, i] - logsumexp_i(...)``.
    The reference loops t and i with pairwise ``logaddexp``; this is the
    same reduction vectorised. Note the reference's *default* call path
    (``alpha=self.forward()``) is broken legacy code — ``forward``
    returns a ``(fmsg, marg)`` tuple of probability-domain messages,
    which ``compute_h`` would crash on / misinterpret as log-domain —
    so this port takes explicit log-domain messages, the only
    well-defined contract.
    """
    s = log_alpha + log_beta
    return s - jax.scipy.special.logsumexp(s, axis=1, keepdims=True)


def normalize_log_quirk(x: "jnp.ndarray") -> "jnp.ndarray":
    """The reference's heuristic log-row normaliser (normalize_log,
    GPI_HDP.py:4066-4083) — NOT logsumexp: it rescales |x| by its max,
    flips it into [0, 1] weights, floors exact zeros at 1e-50, and
    returns log of the weight simplex. Reproduced literally (host
    numpy; tiny K-vector)."""
    import numpy as np
    x = np.asarray(x, dtype=np.float64).ravel()
    bound = 1e-50
    if np.max(x) == -np.inf:
        return np.repeat(np.log(bound), x.size)
    if not np.isclose(np.max(x), 0):
        aux = np.abs(x) / np.max(np.abs(x))
        aux = -aux + np.ones(aux.size)
        aux = np.array([bound if a == 0 else a for a in aux])
        return np.log(aux / np.sum(aux))
    out = np.repeat(np.log(bound), x.size)
    out[int(np.argmax(x))] = 0.0
    return out


def baum_welch(log_alpha, log_beta, log_psi):
    """Classic Baum-Welch (Rabiner) HMM re-estimation from log messages
    (GPI_HDP.baum_welch, GPI_HDP.py:3864-3931).

    ``log_psi`` is the (T, K, K) log pair-posterior from
    :func:`coupled_pair_log` (row 0 is -inf padding, as in the
    reference's coupled_state_coef). Returns ``(log_pi, log_trans)``:

    * ``log_pi = h[0]`` — the first posterior state log-marginal;
    * ``log_trans[i, j] = logsumexp_t psi[t, i, j] -
      logsumexp_{t, j} psi[t, i, j]`` over ``t in [0, T-1)`` — the
      reference's exact summation range, which (because psi row 0 is
      -inf and rows are (t-1 -> t) pairs) covers transitions
      0->1 .. T-3->T-2, dropping the final one: a reference quirk kept
      for parity;
    * each row then passes through the reference's heuristic
      :func:`normalize_log_quirk` (GPI_HDP.py:3925-3927).
    """
    import numpy as np
    h = posterior_log_marginals(log_alpha, log_beta)
    log_pi = np.asarray(h[0])
    psi = np.asarray(log_psi)[:-1]                  # t in range(T-1)
    with np.errstate(divide="ignore"):
        num = jax.scipy.special.logsumexp(psi, axis=0)      # (K, K)
        den = jax.scipy.special.logsumexp(psi, axis=(0, 2))  # (K,)
    trans = np.asarray(num) - np.asarray(den)[:, None]
    trans = np.where(np.isneginf(np.asarray(num)), -np.inf, trans)
    trans = np.stack([normalize_log_quirk(row) for row in trans])
    return log_pi, trans


def entropy_terms(resp, respPair, eps=1e-30):
    """H[q] nonlinear ELBO terms (GPI_HDP.py:2682-2700)."""
    Hstart = -jnp.sum(resp * jnp.log(resp + eps), axis=0)
    sigma = respPair / (jnp.sum(respPair, axis=2, keepdims=True) + eps) + eps
    Htable = -jnp.sum(respPair * jnp.log(sigma), axis=0)
    return jnp.sum(Htable) + jnp.sum(Hstart)
