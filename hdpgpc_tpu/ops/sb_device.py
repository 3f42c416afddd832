"""Device-side (jax) HDP stick-breaking math with DYNAMIC live-cluster
count M on fixed-size padded arrays.

These are masked ports of the host numpy implementations in
ops/stick_breaking.py (themselves following the reference's bnpy-derived
formulas, OptimizerRhoOmega.py / GPI_HDP.py:2651-2750): every function
takes a traced scalar ``M`` and operates on arrays padded to a static
``Kp`` (max clusters + 1), masking inactive entries so jit compiles
once per Kp instead of once per cluster count.

Used by the fused online streaming engine (models/stream_online.py),
where the whole per-beat decision — including the reference's
elbo_Linears accounting (GPI_HDP.py:1025-1074) — runs in-program.

Conventions: rho/omega live in (Kp,) arrays with entries >= M_rho
inactive; counts live in (Kp+1,) / (Kp+1, Kp+1) arrays with entries
>= M inactive (the +1 row/col is the reference's inactive-state
padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

digamma = jax.scipy.special.digamma
gammaln = jax.scipy.special.gammaln


def arange_mask(Kp: int, M, dtype=None):
    """(Kp,) mask of entries < M (traced M)."""
    m = jnp.arange(Kp) < M
    return m if dtype is None else m.astype(dtype)


def create_init_rho_dyn(Kp: int, M, dtype=jnp.float64) -> jax.Array:
    """create_initrho (GPI_HDP.py:377-381) for traced M on (Kp,)
    arrays; entries >= M are zero."""
    Mf = M.astype(dtype) if hasattr(M, "astype") else jnp.asarray(M, dtype)
    rem = jnp.minimum(0.1, 1.0 / (Mf * Mf))
    idx = jnp.arange(Kp, dtype=dtype)
    rho = (1.0 - rem) / (Mf + (-1.0 + rem) * idx)
    return jnp.where(arange_mask(Kp, M), rho, 0.0)


def rho_to_beta_masked(rho: jax.Array, M) -> jax.Array:
    """E[beta] in the 'K+1' form on a (Kp+1,) array: beta_i for i < M,
    the leftover stick at index M, zeros beyond (rho_to_beta,
    GPI_HDP.py:431-439)."""
    Kp = rho.shape[0]
    dtype = rho.dtype
    act = arange_mask(Kp, M, dtype)
    one_minus = jnp.cumprod(1.0 - rho * act)          # prod_{j<=i}(1-rho_j)
    prev = jnp.concatenate([jnp.ones((1,), dtype), one_minus[:-1]])
    beta = rho * prev * act                           # (Kp,)
    leftover = jnp.prod(1.0 - rho * act)
    beta_full = jnp.zeros((Kp + 1,), dtype)
    beta_full = beta_full.at[:Kp].set(beta)
    # place the leftover at index M
    idxs = jnp.arange(Kp + 1)
    beta_full = jnp.where(idxs == M, leftover, beta_full)
    return beta_full


def calc_theta_full_masked(rho, M, trans_counts, start_counts,
                           trans_alpha, start_alpha, kappa):
    """_calcThetaFull (GPI_HDP.py:400-422) at size M+1 with rho of live
    size M (the 'K+1' Ebeta branch). trans_counts/start_counts:
    (Kp+1, Kp+1) / (Kp+1,) with live entries < M. Returns padded
    (trans_theta, start_theta) whose entries beyond M+1 are the bare
    alphaEbeta (== 0 there since Ebeta is 0 past M)."""
    Kp = rho.shape[0]
    dtype = rho.dtype
    Ebeta = rho_to_beta_masked(rho, M)                # (Kp+1,)
    alphaEbeta = trans_alpha * Ebeta
    tt = jnp.broadcast_to(alphaEbeta[None, :], (Kp + 1, Kp + 1))
    liveM = arange_mask(Kp + 1, M, dtype)
    live2 = liveM[:, None] * liveM[None, :]
    eyeK = jnp.eye(Kp + 1, dtype=dtype)
    tt = tt + (trans_counts + kappa * eyeK) * live2
    st = start_alpha * Ebeta + start_counts * liveM
    return tt, st


def c_dir_rows_masked(theta, M1, dtype=None):
    """c_Dir over the first M1 rows x M1 cols of a padded matrix
    (GPI_HDP.py:2732-2750 matrix form)."""
    Kp1 = theta.shape[0]
    act = arange_mask(Kp1, M1, theta.dtype)
    th = jnp.where(act[None, :] * act[:, None] > 0, theta, 1.0)
    rowsum = jnp.sum(theta * act[None, :], axis=1)
    rs = jnp.where(act > 0, gammaln(jnp.maximum(rowsum, 1e-300)), 0.0)
    return jnp.sum(rs) - jnp.sum(gammaln(jnp.maximum(th, 1e-300))
                                 * act[None, :] * act[:, None])


def c_dir_vec_masked(theta, M1):
    act = arange_mask(theta.shape[0], M1, theta.dtype)
    th = jnp.where(act > 0, theta, 1.0)
    s = jnp.sum(theta * act)
    return gammaln(jnp.maximum(s, 1e-300)) \
        - jnp.sum(gammaln(jnp.maximum(th, 1e-300)) * act)


def _c_beta_masked(a1, a0, act):
    t = gammaln(jnp.maximum(a1 + a0, 1e-300)) \
        - gammaln(jnp.maximum(a1, 1e-300)) \
        - gammaln(jnp.maximum(a0, 1e-300))
    return jnp.sum(t * act)


def l_top_masked(rho, omega, M, trans_alpha, start_alpha, kappa, gamma):
    """L_top (GPI_HDP.py:2702-2730) with live size M (kappa > 0 branch
    and kappa == 0 branch both ported)."""
    Kp = rho.shape[0]
    dtype = rho.dtype
    act = arange_mask(Kp, M, dtype)
    Mf = jnp.asarray(M, dtype)
    rho_s = jnp.where(act > 0, rho, 0.5)
    om_s = jnp.where(act > 0, omega, 2.0)
    eta1 = rho_s * om_s
    eta0 = (1.0 - rho_s) * om_s
    dig_om = digamma(om_s)
    ElogU = digamma(eta1) - dig_om
    Elog1mU = digamma(eta0) - dig_om

    diff_cBeta = Mf * (gammaln(1.0 + gamma) - gammaln(gamma)) \
        - _c_beta_masked(eta1, eta0, act)
    tAlpha = Mf * Mf * jnp.log(trans_alpha) + Mf * jnp.log(start_alpha)
    # kvec(M) = M + 1 - (1..M)
    kv = (Mf + 1.0) - (jnp.arange(Kp, dtype=dtype) + 1.0)
    if_kappa = kappa > 0
    coefU_k = Mf + 1.0 + eta1
    coef1mU_k = Mf * kv + 1.9 + gamma - eta0
    # sum of E[beta] in the 'K' form (leftover stick excluded)
    sumEbeta = jnp.sum(rho_s * jnp.concatenate(
        [jnp.ones((1,), dtype),
         jnp.cumprod(1.0 - rho_s * act)[:-1]]) * act)
    kp_safe = jnp.maximum(kappa, 1e-300)
    tBeta_k = sumEbeta * (jnp.log(trans_alpha + kappa) - jnp.log(kp_safe))
    tKappa_k = Mf * (jnp.log(kp_safe) - jnp.log(trans_alpha + kappa))
    coefU_0 = (Mf + 1.0) + 1.0 - eta1
    coef1mU_0 = (Mf + 1.0) * kv + gamma - eta0
    coefU = jnp.where(if_kappa, coefU_k, coefU_0)
    coef1mU = jnp.where(if_kappa, coef1mU_k, coef1mU_0)
    tBeta = jnp.where(if_kappa, tBeta_k, 0.0)
    tKappa = jnp.where(if_kappa, tKappa_k, 0.0)
    return (tAlpha + tKappa + tBeta + diff_cBeta
            + jnp.sum(coefU * ElogU * act)
            + jnp.sum(coef1mU * Elog1mU * act))


def elbo_linear_terms_masked(rho, omega, M, M_rho, trans_alpha,
                             start_alpha, kappa, gamma,
                             trans_theta, start_theta,
                             start_counts, trans_counts):
    """calcELBO_LinearTerms (GPI_HDP.py:2651-2680) on padded arrays.

    M: live cluster count (counts live in entries < M; thetas live in
    entries < M+1). M_rho: live rho size used for L_top (== M after the
    expand_globals_tmp padding the caller performs).
    """
    Kp = rho.shape[0]
    dtype = rho.dtype
    M1 = M + 1
    Ltop = l_top_masked(rho, omega, M_rho, trans_alpha, start_alpha,
                        kappa, gamma)
    LdiffcDir = -c_dir_rows_masked(trans_theta, M1) \
        - c_dir_vec_masked(start_theta, M1)
    Ebeta = rho_to_beta_masked(rho, M_rho)            # (Kp+1,)
    actM1 = arange_mask(Kp + 1, M1, dtype)
    st_safe = jnp.where(actM1 > 0, start_theta, 1.0)
    dig_st = digamma(st_safe)
    dig_st_sum = digamma(jnp.maximum(
        jnp.sum(start_theta * actM1), 1e-300))
    LstartSlack = jnp.sum(
        (start_counts + start_alpha * Ebeta - start_theta)
        * (dig_st - dig_st_sum) * actM1)
    # K = tc.shape[0] == M+1 live rows
    eyeK = jnp.eye(Kp + 1, dtype=dtype)
    aEbK = trans_alpha * jnp.broadcast_to(Ebeta[None, :],
                                          (Kp + 1, Kp + 1)) + kappa * eyeK
    live2 = actM1[:, None] * actM1[None, :]
    tt_safe = jnp.where(live2 > 0, trans_theta, 1.0)
    digammaSum = digamma(jnp.maximum(
        jnp.sum(trans_theta * actM1[None, :], axis=1), 1e-300))
    tc_adj = trans_counts + aEbK
    LtransSlack = jnp.sum((tc_adj - trans_theta)
                          * (digamma(tt_safe) - digammaSum[:, None])
                          * live2)
    return Ltop + LdiffcDir + LstartSlack + LtransSlack


def elbo_linears_online(rho, omega, M, M_rho, trans_alpha, start_alpha,
                        kappa, gamma, start_counts, trans_counts):
    """elbo_Linears for the online one_sample path (GPI_HDP.py:1025-1074
    with one_sample=True): expand rho/omega to size M when M_rho < M
    (expand_globals_tmp semantics: pad with create_initrho(M) tail /
    (1+gamma)), recompute theta via _calcThetaFull at M+1, then the
    linear terms. counts: (Kp+1,...) padded, live < M."""
    Kp = rho.shape[0]
    dtype = rho.dtype
    need = M_rho != M
    rho_init = create_init_rho_dyn(Kp, M, dtype)
    idx = jnp.arange(Kp)
    rho_exp = jnp.where(idx < M_rho, rho, rho_init)
    rho_exp = jnp.where(arange_mask(Kp, M), rho_exp, 0.0)
    om_exp = jnp.where(idx < M_rho, omega, 1.0 + gamma)
    rho_ = jnp.where(need, rho_exp, rho)
    omega_ = jnp.where(need, om_exp, omega)
    tt, st = calc_theta_full_masked(rho_, M, trans_counts, start_counts,
                                    trans_alpha, start_alpha, kappa)
    return elbo_linear_terms_masked(rho_, omega_, M, M, trans_alpha,
                                    start_alpha, kappa, gamma, tt, st,
                                    start_counts, trans_counts)
