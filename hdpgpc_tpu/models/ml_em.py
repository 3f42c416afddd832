"""Maximum-likelihood EM updates for LDS parameters (non-Bayesian path).

Equivalent of the reference's ML machinery (used when
bayesian_params=False): the closed-form M-step from smoothed moments
(GPI.new_params_LDS, GPI.py:302-455), the joint LDS log-likelihood that
gates acceptance (GPI.log_likelihood, GPI.py:879-974), and the
iterate-until-convergence wrapper with divergence guards
(GPI_model.new_params, GPI_model.py:747-861) plus the reestimation
cadence of new_params_weighted (GPI_model.py:874-887).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hdpgpc_tpu.ops import linalg
from hdpgpc_tpu.ops.linalg import precise_jit
from hdpgpc_tpu.ops.kalman import rts_smooth


class EMStats(NamedTuple):
    exp_tt: jax.Array      # (N, T, T)  E[f_t f_t']
    exp_t_t1: jax.Array    # (N-1, T, T) E[f_{t+1} f_t']
    exp_t1_t: jax.Array    # (N-1, T, T) E[f_t f_{t+1}']


def _moments(A, Gamma, means, covs) -> EMStats:
    """Smoothed second moments (GPI.py:329-346)."""
    def per_t(P):
        P_pred = A @ P @ A.T + Gamma
        J = linalg.solve_spd_t(P_pred, P @ A.T)
        return J

    J = jax.vmap(per_t)(covs)
    exp_tt = covs + means @ means.swapaxes(-1, -2)
    exp_t_t1 = covs[1:] @ J[:-1].swapaxes(-1, -2) \
        + means[1:] @ means[:-1].swapaxes(-1, -2)
    exp_t1_t = J[:-1] @ covs[1:] + means[:-1] @ means[1:].swapaxes(-1, -2)
    return EMStats(exp_tt, exp_t_t1, exp_t1_t)


@precise_jit
def m_step_dynamic(A, Gamma, C, Sigma, ys, means, covs):
    """One closed-form M-step (GPI.py:390-450 'dynamic').

    ys/means: (N, T, 1); covs: (N, T, T). Returns (A', Gamma', C',
    Sigma') with the reference's symmetrisation and 1e-8 jitters on
    near-singular accumulators.
    """
    T = A.shape[0]
    N = ys.shape[0]
    eye = jnp.eye(T, dtype=A.dtype)
    st = _moments(A, Gamma, means, covs)

    A1 = jnp.sum(st.exp_t_t1, axis=0)
    A2 = jnp.sum(st.exp_tt[:-1], axis=0)
    C1 = jnp.sum(ys @ means.swapaxes(-1, -2), axis=0)
    C2 = jnp.sum(st.exp_tt, axis=0)

    # The reference jitters only when det ~ 0 (GPI.py:406-414); a
    # constant 1e-8 jitter is numerically equivalent and avoids the LU
    # determinant, which TPU lacks in f64.
    A2 = A2 + 1e-8 * eye
    C2 = C2 + 1e-8 * eye
    # right-division solves via Cholesky of the (SPD) Gram accumulators
    A_new = linalg.solve_spd_t(A2, A1)
    C_new = linalg.solve_spd_t(C2, C1)

    G_acc = jnp.sum(
        st.exp_tt[1:]
        - A_new[None] @ st.exp_t1_t
        - st.exp_t_t1 @ A_new.T[None]
        + A_new[None] @ st.exp_tt[:-1] @ A_new.T[None], axis=0)
    Gamma_new = G_acc / jnp.maximum(N - 1, 1)
    Gamma_new = linalg.sym(Gamma_new) + 1e-8 * eye

    S_acc = jnp.sum(
        ys @ ys.swapaxes(-1, -2)
        - C_new[None] @ means @ ys.swapaxes(-1, -2)
        - ys @ means.swapaxes(-1, -2) @ C_new.T[None]
        + C_new[None] @ st.exp_tt @ C_new.T[None], axis=0)
    Sigma_new = linalg.sym(S_acc / N) + 1e-8 * eye
    return A_new, Gamma_new, C_new, Sigma_new


@precise_jit
def m_step_static(ys, means, covs):
    """Static model: only Sigma re-estimated (GPI.py:369-388)."""
    T = means.shape[1]
    N = ys.shape[0]
    exp_tt = covs + means @ means.swapaxes(-1, -2)
    S_acc = jnp.sum(ys @ ys.swapaxes(-1, -2)
                    - means @ ys.swapaxes(-1, -2)
                    - ys @ means.swapaxes(-1, -2) + exp_tt, axis=0)
    eye = jnp.eye(T, dtype=ys.dtype)
    return linalg.sym(S_acc / N) + 1e-8 * eye


@precise_jit
def joint_log_likelihood(A, Gamma, C, Sigma, ys, means, covs):
    """Joint LDS log-likelihood over latent transitions + emissions
    (GPI.log_likelihood, GPI.py:879-974 with t0=0 term dropped —
    the constant GP marginal does not affect the EM accept test)."""
    T = means.shape[1]
    N = ys.shape[0]
    exp_tt = covs + means @ means.swapaxes(-1, -2)

    detG = linalg.logdet_spd(Gamma)
    Ginv = linalg.inv_spd(Gamma)
    m_next = means[1:]
    m_prev = means[:-1]
    s1 = (-jnp.einsum("nij,jk,nik->", m_next, Ginv, m_next)
          + 2.0 * jnp.einsum("nij,jk,kl,nil->", m_next, Ginv, C, m_prev)
          - jnp.einsum("ji,jk,kl,nli->", C, Ginv, C,
                       jnp.sum(exp_tt[:-1], axis=0)[None])
          - (N - 1) * detG)
    s1 = 0.5 * (s1 - (N - 1) * T * jnp.log(2.0 * jnp.pi))

    detS = linalg.logdet_spd(Sigma)
    Sinv = linalg.inv_spd(Sigma)
    s2 = (-jnp.einsum("nij,jk,nik->", ys, Sinv, ys)
          + 2.0 * jnp.einsum("nij,jk,kl,nil->", ys, Sinv, C, means)
          - jnp.einsum("ji,jk,kl,nli->", C, Sinv, C,
                       jnp.sum(exp_tt, axis=0)[None])
          - N * detS)
    s2 = 0.5 * (s2 - N * T * jnp.log(2.0 * jnp.pi))
    return s1 + s2


def ml_update(A, Gamma, C, Sigma, ys, means, covs, model_type="dynamic",
              max_trials: int = 6, verbose: bool = False
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Iterated EM with the reference's divergence guards
    (GPI_model.new_params, GPI_model.py:784-833): accept only
    non-decreasing, finite likelihood; re-smooth between iterations."""
    ys = jnp.asarray(ys)
    means = jnp.asarray(means)
    covs = jnp.asarray(covs)
    A_b, G_b, C_b, S_b = map(jnp.asarray, (A, Gamma, C, Sigma))
    lik_best = joint_log_likelihood(A_b, G_b, C_b, S_b, ys, means, covs)
    A_c, G_c, C_c, S_c = A_b, G_b, C_b, S_b
    for _ in range(max_trials):
        if model_type == "static":
            S_n = m_step_static(ys, means, covs)
            A_n, G_n, C_n = A_c, G_c, C_c
        else:
            A_n, G_n, C_n, S_n = m_step_dynamic(A_c, G_c, C_c, S_c, ys,
                                                means, covs)
        N = means.shape[0]
        A_seq = jnp.broadcast_to(A_n, (N,) + A_n.shape)
        G_seq = jnp.broadcast_to(G_n, (N,) + G_n.shape)
        means, covs = rts_smooth(A_seq, G_seq, means, covs)
        lik = joint_log_likelihood(A_n, G_n, C_n, S_n, ys, means, covs)
        if not bool(jnp.isfinite(lik)):
            if verbose:
                print("Divergence detected, using previous.")
            break
        if float(lik) < float(lik_best):
            if verbose:
                print("Divergence detected, using previous.")
            break
        lik_best = lik
        A_b, G_b, C_b, S_b = A_n, G_n, C_n, S_n
        A_c, G_c, C_c, S_c = A_n, G_n, C_n, S_n
        if bool(jnp.isclose(lik, lik_best, rtol=0.01)):
            break
    return (np.asarray(A_b), np.asarray(G_b), np.asarray(C_b),
            np.asarray(S_b))


# ---------------------------------------------------------------------------
# Masked (fixed-shape) variants: operate on member-gathered, tail-padded
# slot buffers (w[t] in {0,1}, contiguous ones at the front), so the EM
# programs compile once per scan bucket instead of once per member count.
# ---------------------------------------------------------------------------

@precise_jit
def m_step_dynamic_masked(A, Gamma, C, Sigma, ys, means, covs, w):
    """Masked closed-form M-step. ``w``: (N,) 0/1 slot validity,
    contiguous ones at the front (member-gathered order), so the valid
    transition pairs are exactly the slots with w[t+1] == 1."""
    T = A.shape[0]
    eye = jnp.eye(T, dtype=A.dtype)
    n = jnp.sum(w)
    w3 = w[:, None, None]
    wp = w[1:, None, None]                      # pair weights

    st = _moments(A, Gamma, means, covs)
    A1 = jnp.sum(wp * st.exp_t_t1, axis=0)
    A2 = jnp.sum(wp * st.exp_tt[:-1], axis=0)
    C1 = jnp.sum(w3 * (ys @ means.swapaxes(-1, -2)), axis=0)
    C2 = jnp.sum(w3 * st.exp_tt, axis=0)

    A2 = A2 + 1e-8 * eye
    C2 = C2 + 1e-8 * eye
    A_new = linalg.solve_spd_t(A2, A1)
    C_new = linalg.solve_spd_t(C2, C1)

    G_acc = jnp.sum(wp * (
        st.exp_tt[1:]
        - A_new[None] @ st.exp_t1_t
        - st.exp_t_t1 @ A_new.T[None]
        + A_new[None] @ st.exp_tt[:-1] @ A_new.T[None]), axis=0)
    Gamma_new = G_acc / jnp.maximum(n - 1, 1)
    Gamma_new = linalg.sym(Gamma_new) + 1e-8 * eye

    S_acc = jnp.sum(w3 * (
        ys @ ys.swapaxes(-1, -2)
        - C_new[None] @ means @ ys.swapaxes(-1, -2)
        - ys @ means.swapaxes(-1, -2) @ C_new.T[None]
        + C_new[None] @ st.exp_tt @ C_new.T[None]), axis=0)
    Sigma_new = linalg.sym(S_acc / jnp.maximum(n, 1)) + 1e-8 * eye
    return A_new, Gamma_new, C_new, Sigma_new


@precise_jit
def joint_log_likelihood_masked(A, Gamma, C, Sigma, ys, means, covs, w):
    """Masked joint LDS log-likelihood (transition + emission terms)."""
    T = means.shape[1]
    n = jnp.sum(w)
    exp_tt = covs + means @ means.swapaxes(-1, -2)
    wp = w[1:]

    detG = linalg.logdet_spd(Gamma)
    Ginv = linalg.inv_spd(Gamma)
    m_next = means[1:]
    m_prev = means[:-1]
    s1 = (-jnp.einsum("n,nij,jk,nik->", wp, m_next, Ginv, m_next)
          + 2.0 * jnp.einsum("n,nij,jk,kl,nil->", wp, m_next, Ginv, C,
                             m_prev)
          - jnp.einsum("ji,jk,kl,li->", C, Ginv, C,
                       jnp.sum(wp[:, None, None] * exp_tt[:-1], axis=0))
          - (n - 1) * detG)
    s1 = 0.5 * (s1 - (n - 1) * T * jnp.log(2.0 * jnp.pi))

    detS = linalg.logdet_spd(Sigma)
    Sinv = linalg.inv_spd(Sigma)
    s2 = (-jnp.einsum("n,nij,jk,nik->", w, ys, Sinv, ys)
          + 2.0 * jnp.einsum("n,nij,jk,kl,nil->", w, ys, Sinv, C, means)
          - jnp.einsum("ji,jk,kl,li->", C, Sinv, C,
                       jnp.sum(w[:, None, None] * exp_tt, axis=0))
          - n * detS)
    s2 = 0.5 * (s2 - n * T * jnp.log(2.0 * jnp.pi))
    return s1 + s2


@precise_jit
def masked_rts(A, Gamma, means, covs, w):
    """RTS smoother over member-gathered slots; padded tail slots
    (w == 0) are pass-throughs, so the backward recursion starts at the
    last REAL member."""
    def backward_step(carry, inp):
        f_next, P_next, started = carry
        wt, f_t, P_t = inp
        P_pred = A @ P_t @ A.T + Gamma
        J = linalg.solve_spd_t(P_pred, P_t @ A.T)
        f_sm = f_t + J @ (f_next - A @ f_t)
        P_sm = P_t + J @ (P_next - P_pred) @ J.T
        f_out = jnp.where(started, f_sm, f_t)
        P_out = jnp.where(started, P_sm, P_t)
        member = wt > 0.5
        carry_new = (jnp.where(member, f_out, f_next),
                     jnp.where(member, P_out, P_next),
                     started | member)
        return carry_new, (f_out, P_out)

    T = means.shape[1]
    init = (jnp.zeros((T, 1), means.dtype), jnp.zeros((T, T), means.dtype),
            jnp.asarray(False))
    _, (f_sm, P_sm) = jax.lax.scan(backward_step, init, (w, means, covs),
                                   reverse=True)
    return f_sm, P_sm


def ml_update_masked(A, Gamma, C, Sigma, ys, means, covs, w,
                     model_type="dynamic", max_trials: int = 6,
                     verbose: bool = False):
    """Masked, fixed-shape version of ``ml_update`` (compile once per
    bucket). Same accept/guard semantics (GPI_model.py:784-833)."""
    ys = jnp.asarray(ys)
    means = jnp.asarray(means)
    covs = jnp.asarray(covs)
    w = jnp.asarray(w)
    A_b, G_b, C_b, S_b = map(jnp.asarray, (A, Gamma, C, Sigma))
    lik_best = joint_log_likelihood_masked(A_b, G_b, C_b, S_b, ys, means,
                                           covs, w)
    A_c, G_c, C_c, S_c = A_b, G_b, C_b, S_b
    for _ in range(max_trials):
        if model_type == "static":
            S_n = m_step_static(ys, means, covs)
            A_n, G_n, C_n = A_c, G_c, C_c
        else:
            A_n, G_n, C_n, S_n = m_step_dynamic_masked(
                A_c, G_c, C_c, S_c, ys, means, covs, w)
        means, covs = masked_rts(A_n, G_n, means, covs, w)
        lik = joint_log_likelihood_masked(A_n, G_n, C_n, S_n, ys, means,
                                          covs, w)
        if not bool(jnp.isfinite(lik)):
            if verbose:
                print("Divergence detected, using previous.")
            break
        if float(lik) < float(lik_best):
            if verbose:
                print("Divergence detected, using previous.")
            break
        lik_best = lik
        A_b, G_b, C_b, S_b = A_n, G_n, C_n, S_n
        A_c, G_c, C_c, S_c = A_n, G_n, C_n, S_n
        if bool(jnp.isclose(lik, lik_best, rtol=0.01)):
            break
    return (np.asarray(A_b), np.asarray(G_b), np.asarray(C_b),
            np.asarray(S_b))


def reestimate_cadence(n_included: int, min_samples: int = 1,
                       max_samples: int = 6, div_samples: int = 15) -> bool:
    """new_params_weighted cadence: refit in the early window or every
    div_samples (10 past 500 samples) (GPI_model.py:874-887)."""
    if n_included > 500:
        div_samples = 10
    return (min_samples < n_included < max_samples
            or (n_included % div_samples == 0 and n_included != 0))
