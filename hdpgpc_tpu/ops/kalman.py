"""Kalman filter / RTS smoother primitives for the iterative GP.

Semantics mirror the reference's IterativeGaussianProcess
(GPI.py:72-151 ``posterior``, :240-300 ``backward``), specialised to
the shared-grid path used by every test config (x_train == x_basis =>
the GP cross-covariance projection K_cov is the identity):

* prediction: m = A f,  P = A P A' + Gamma
* FIRST step special case (cov_prior == K): P = K, predicted obs = 0,
  innovation covariance = white-noise * I / h   (GPI.py:136-139)
* gain solved right-to-left: K = P C' (C P C' + R)^-1 (GPI.py:145-146)
* Joseph-form covariance update (GPI.py:149-150)

and an associative-scan parallel filter/smoother for fixed parameters
(used by the long-horizon streaming path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hdpgpc_tpu.ops import linalg


class LDSParams(NamedTuple):
    A: jax.Array       # (T, T)
    Gamma: jax.Array   # (T, T)
    C: jax.Array       # (T, T)
    Sigma: jax.Array   # (T, T)


def kalman_step(f, P, y, params: LDSParams, first: bool | jax.Array,
                noise_first, h=1.0):
    """One filter update on the shared grid.

    f: (T, 1) prior (smoothed-last) mean; P: (T, T); y: (T, 1).
    ``first``: traced bool — use the GP-prior special case.
    ``noise_first``: scalar white-noise variance for the first step.
    Returns (f_post, P_post).
    """
    A, Gamma, C, Sigma = params
    T = f.shape[0]
    eye = jnp.eye(T, dtype=f.dtype)

    m = A @ f
    P_pred = jnp.where(first, P, A @ P @ A.T + Gamma)
    y_pred = jnp.where(first, jnp.zeros_like(m), C @ m)
    R = jnp.where(first, (noise_first / h) * eye, Sigma / h)

    S = C @ P_pred @ C.T + R
    # K = P C' S^{-1} via Cholesky (TPU has no f64 LU; GPI.py:145-146).
    K = linalg.solve_spd_t(S, P_pred @ C.T)
    f_post = m + K @ (y - y_pred)
    IKC = eye - K @ C
    P_post = IKC @ P_pred @ IKC.T + K @ R @ K.T
    return f_post, P_post


def rts_pair(f_prev, P_prev, f_cur, P_cur, A, Gamma):
    """One RTS smoothing step: condition (f_prev, P_prev) on (f_cur, P_cur).

    Mirrors GPI.backward_notrange (GPI.py:272-300): J solved via
    linear solve, not explicit inverse.
    """
    P_pred = A @ P_prev @ A.T + Gamma
    J = linalg.solve_spd_t(P_pred, P_prev @ A.T)
    f_sm = f_prev + J @ (f_cur - A @ f_prev)
    P_sm = P_prev + J @ (P_cur - P_pred) @ J.T
    return f_sm, P_sm


def rts_smooth(A_seq, Gamma_seq, means, covs):
    """Full RTS backward pass with per-step parameters.

    means: (N, T, 1) filtered means for steps 1..N (prior excluded);
    A_seq/Gamma_seq: (N, T, T) aligned so that smoothing step t uses
    A_seq[t] (reference backward uses A_prior[t], GPI.py:263-269).
    Returns smoothed (N, T, 1), (N, T, T). Sequential lax.scan.
    """

    def step(carry, inp):
        f_next, P_next = carry
        f_t, P_t, A_t, G_t = inp
        f_sm, P_sm = rts_pair(f_t, P_t, f_next, P_next, A_t, G_t)
        return (f_sm, P_sm), (f_sm, P_sm)

    # Scan from N-2 down to 0; element t consumes smoothed t+1.
    init = (means[-1], covs[-1])
    xs = (means[:-1], covs[:-1], A_seq[:-1], Gamma_seq[:-1])
    (_, _), (f_sms, P_sms) = jax.lax.scan(step, init, xs, reverse=True)
    f_out = jnp.concatenate([f_sms, means[-1:]], axis=0)
    P_out = jnp.concatenate([P_sms, covs[-1:]], axis=0)
    return f_out, P_out


# ---------------------------------------------------------------------------
# Associative-scan parallel filter/smoother (fixed parameters).
#
# Standard parallel Kalman elements (Sarkka & Garcia-Fernandez 2021):
# each observation contributes an affine-Gaussian map represented by
# (A, b, C, eta, J); composition is associative, so lax.associative_scan
# computes all filtered states in O(log N) depth. Used for the
# long-horizon (1M-beat) streaming configuration where LDS parameters
# are frozen (estimation_limit reached).
# ---------------------------------------------------------------------------


def _filter_element(y, F, Q, H, R, m0=None, P0=None):
    """Build one associative filtering element for observation y (T, 1)."""
    T = y.shape[0]
    eye = jnp.eye(T, dtype=y.dtype)
    if m0 is not None:
        # First element: exact filter update from the prior.
        m_pred = m0
        P_pred = P0
        S = H @ P_pred @ H.T + R
        K = linalg.solve_spd_t(S, P_pred @ H.T)
        A = jnp.zeros((T, T), dtype=y.dtype)
        b = m_pred + K @ (y - H @ m_pred)
        C = P_pred - K @ S @ K.T
        eta = jnp.zeros((T, 1), dtype=y.dtype)
        J = jnp.zeros((T, T), dtype=y.dtype)
        return A, b, C, eta, J
    S = H @ Q @ H.T + R
    K = linalg.solve_spd_t(S, Q @ H.T)
    A = (eye - K @ H) @ F
    b = K @ y
    C = (eye - K @ H) @ Q
    L_S = jnp.linalg.cholesky(0.5 * (S + S.T))
    Sinv_y = jax.scipy.linalg.cho_solve((L_S, True), y)
    Sinv_H = jax.scipy.linalg.cho_solve((L_S, True), H)
    eta = F.T @ H.T @ Sinv_y
    J = F.T @ H.T @ Sinv_H @ F
    return A, b, C, eta, J


def _combine(elem_l, elem_r):
    """Associative composition of two filtering elements."""
    A1, b1, C1, eta1, J1 = elem_l
    A2, b2, C2, eta2, J2 = elem_r
    T = A1.shape[-1]
    eye = jnp.eye(T, dtype=A1.dtype)
    # M = A2 (I + C1 J2)^{-1};  N = A1' (I + J2 C1)^{-1}
    I_C1J2 = eye + C1 @ J2
    I_J2C1 = eye + J2 @ C1
    M = linalg.solve_general(
        I_C1J2.swapaxes(-1, -2), A2.swapaxes(-1, -2)).swapaxes(-1, -2)
    # N = A1' (I + J2 C1)^{-1}  =  [ (I + J2 C1)^{-T} A1 ]'
    Nt = linalg.solve_general(I_J2C1.swapaxes(-1, -2), A1)
    A = M @ A1
    b = M @ (b1 + C1 @ eta2) + b2
    C = M @ C1 @ A2.swapaxes(-1, -2) + C2
    eta = Nt.swapaxes(-1, -2) @ (eta2 - J2 @ b1) + eta1
    J = Nt.swapaxes(-1, -2) @ J2 @ A1 + J1
    return A, b, C, eta, J


def parallel_filter(ys, F, Q, H, R, m0, P0):
    """Associative-scan Kalman filter with FIXED params.

    ys: (N, T, 1). Returns filtered means (N, T, 1) and covs (N, T, T).
    Matches the sequential filter to numerical precision; property-tested
    against ``kalman_step`` in tests/test_kalman.py.

    This is the public generic form of the shared associative elements
    (``_filter_element`` + ``_combine``); the production paths consume
    specialisations of the same elements: ``parallel_filter_masked``
    (streaming classifier, models/streaming.py) and the steady-state
    frozen-tail forms in models/gplds (``_tail_filter``/``_tail_steady``,
    the est-limit hybrid refit). Its property test doubles as the oracle
    for those elements.
    """
    N = ys.shape[0]
    first = _filter_element(ys[0], F, Q, H, R, m0=m0, P0=P0)
    rest = jax.vmap(lambda y: _filter_element(y, F, Q, H, R))(ys[1:])
    elems = jax.tree.map(
        lambda f0, r: jnp.concatenate([f0[None], r], axis=0), first, rest)
    A, b, C, eta, J = jax.lax.associative_scan(_combine, elems)
    return b, C


def parallel_filter_masked(ys, h, F, Q, H, R, m0, P0):
    """Associative-scan Kalman filter with a per-step update mask.

    ys: (N, T, 1); h: (N,) in {0, 1}. A step with h=0 contributes the
    IDENTITY element — the state neither predicts nor updates (the
    gated-update semantics of the streaming classifier's per-cluster
    posterior, models/streaming.py). h=1 steps are standard filter
    updates with fixed (F, Q, H, R). The prior (m0, P0) enters as a
    constant leading element, so the returned sequences are the exact
    gated filtered states; element [-1] is the chunk carry.

    Exactness: identity and filter steps are both affine-Gaussian maps,
    so the (A, b, C, eta, J) composition stays associative; equality
    with the sequential gated scan is property-tested in
    tests/test_kalman.py.
    """
    N, T = ys.shape[0], ys.shape[1]
    dtype = ys.dtype

    def masked_element(y, hk):
        A, b, C, eta, J = _filter_element(y, F, Q, H, R)
        keep = hk > 0.5
        eye = jnp.eye(T, dtype=dtype)
        A = jnp.where(keep, A, eye)
        b = jnp.where(keep, b, jnp.zeros((T, 1), dtype))
        C = jnp.where(keep, C, jnp.zeros((T, T), dtype))
        eta = jnp.where(keep, eta, jnp.zeros((T, 1), dtype))
        J = jnp.where(keep, J, jnp.zeros((T, T), dtype))
        return A, b, C, eta, J

    elems = jax.vmap(masked_element)(ys, h)
    # constant leading element mapping anything to the prior
    prior = (jnp.zeros((T, T), dtype), m0, P0,
             jnp.zeros((T, 1), dtype), jnp.zeros((T, T), dtype))
    elems = jax.tree.map(
        lambda p, e: jnp.concatenate([p[None], e], axis=0), prior, elems)
    A, b, C, eta, J = jax.lax.associative_scan(_combine, elems)
    # drop the prior slot: position i is the state after step i
    return b[1:], C[1:]


def parallel_smooth(F, Q, means, covs):
    """Associative-scan RTS smoother with FIXED params.

    means/covs: filtered (N, T, 1)/(N, T, T). Returns smoothed arrays.
    Public generic form; the production est-limit hybrid uses the
    anchored specialisation ``models/gplds._tail_smooth`` (same
    recursion, anchor elements for padding slots).
    """

    def element(f, P):
        P_pred = F @ P @ F.T + Q
        E = linalg.solve_spd_t(P_pred, P @ F.T)
        g = f - E @ F @ f
        L = P - E @ P_pred @ E.T
        return E, g, L

    E, g, L = jax.vmap(element)(means[:-1], covs[:-1])
    T = means.shape[1]
    E_last = jnp.zeros((1, T, T), dtype=means.dtype)
    g_last = means[-1:]
    L_last = covs[-1:]
    E = jnp.concatenate([E, E_last], axis=0)
    g = jnp.concatenate([g, g_last], axis=0)
    L = jnp.concatenate([L, L_last], axis=0)

    def combine_rev(a, b):
        # reverse=True reverses the sequence before a prefix scan, so fn
        # receives a = already-combined LATER suffix, b = the EARLIER
        # element; composition applies b's affine map to a.
        E_a, g_a, L_a = a
        E_b, g_b, L_b = b
        return (E_b @ E_a, E_b @ g_a + g_b,
                E_b @ L_a @ E_b.swapaxes(-1, -2) + L_b)

    Es, gs, Ls = jax.lax.associative_scan(combine_rev, (E, g, L), reverse=True)
    return gs, Ls
