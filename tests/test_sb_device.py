"""Masked device ports of the HDP stick-breaking math must match the
host numpy implementations (ops/stick_breaking.py) for every live
cluster count M on fixed padded arrays."""

import numpy as np
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.ops import sb_device as sbd
from hdpgpc_tpu.ops import stick_breaking as sb

KP = 9
HYP = dict(trans_alpha=5.0, start_alpha=5.0, kappa=100.0, gamma=5.0)


def _pad(a, n):
    out = np.zeros(n)
    out[: a.shape[0]] = a
    return out


def _rand_counts(rng, M):
    tc = rng.uniform(0, 50, (M, M))
    sc = rng.uniform(0, 3, M)
    tc_p = np.zeros((KP + 1, KP + 1))
    tc_p[:M, :M] = tc
    sc_p = np.zeros(KP + 1)
    sc_p[:M] = sc
    return tc, sc, tc_p, sc_p


@pytest.mark.parametrize("M", [2, 3, 5, 8])
def test_create_init_rho(M):
    got = np.asarray(sbd.create_init_rho_dyn(KP, jnp.asarray(M)))
    want = sb.create_init_rho(M)
    np.testing.assert_allclose(got[:M], want, rtol=1e-12)
    assert np.all(got[M:] == 0.0)


@pytest.mark.parametrize("M", [1, 2, 4, 7])
def test_rho_to_beta(M):
    rng = np.random.default_rng(M)
    rho = rng.uniform(0.05, 0.9, M)
    got = np.asarray(sbd.rho_to_beta_masked(jnp.asarray(_pad(rho, KP)),
                                            jnp.asarray(M)))
    want = sb.rho_to_beta(rho, return_size="K+1")
    np.testing.assert_allclose(got[: M + 1], want, rtol=1e-12)
    assert np.all(got[M + 1:] == 0.0)


@pytest.mark.parametrize("M", [2, 4, 7])
def test_calc_theta_full(M):
    rng = np.random.default_rng(M + 10)
    rho = rng.uniform(0.05, 0.9, M)
    tc, sc, tc_p, sc_p = _rand_counts(rng, M)
    glob = sb.HDPGlobals(rho, np.ones(M), np.zeros((M, M)), np.zeros(M),
                         HYP["gamma"], HYP["trans_alpha"],
                         HYP["start_alpha"], HYP["kappa"])
    tt_w, st_w = sb.calc_theta_full(glob, tc, sc, M=M + 1, rho=rho)
    tt_g, st_g = sbd.calc_theta_full_masked(
        jnp.asarray(_pad(rho, KP)), jnp.asarray(M), jnp.asarray(tc_p),
        jnp.asarray(sc_p), HYP["trans_alpha"], HYP["start_alpha"],
        HYP["kappa"])
    np.testing.assert_allclose(np.asarray(tt_g)[: M + 1, : M + 1], tt_w,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(st_g)[: M + 1], st_w, rtol=1e-10)


@pytest.mark.parametrize("M", [2, 4, 7])
@pytest.mark.parametrize("kappa", [100.0, 0.0])
def test_l_top(M, kappa):
    rng = np.random.default_rng(M + 20)
    rho = rng.uniform(0.05, 0.9, M)
    omega = rng.uniform(0.5, 30.0, M)
    want = sb.l_top(rho, omega, HYP["trans_alpha"], HYP["start_alpha"],
                    kappa, HYP["gamma"])
    got = float(sbd.l_top_masked(
        jnp.asarray(_pad(rho, KP)), jnp.asarray(_pad(omega, KP)),
        jnp.asarray(M), HYP["trans_alpha"], HYP["start_alpha"], kappa,
        HYP["gamma"]))
    np.testing.assert_allclose(got, want, rtol=1e-10)


@pytest.mark.parametrize("M", [2, 3, 5])
@pytest.mark.parametrize("m_rho_delta", [0, 1])
def test_elbo_linears_online(M, m_rho_delta):
    """Full one_sample elbo_Linears: device port vs host, including the
    expand_globals_tmp path (M_rho < M)."""
    rng = np.random.default_rng(M * 3 + m_rho_delta)
    M_rho = M - m_rho_delta
    rho = rng.uniform(0.05, 0.9, M_rho)
    omega = rng.uniform(0.5, 30.0, M_rho)
    tc, sc, tc_p, sc_p = _rand_counts(rng, M)
    # host path: resp/respPair whose counts match tc/sc
    glob = sb.HDPGlobals(rho, omega, np.zeros((M_rho, M_rho)),
                         np.zeros(M_rho), HYP["gamma"],
                         HYP["trans_alpha"], HYP["start_alpha"],
                         HYP["kappa"])
    # emulate elbo_linears internals directly with counts
    start_counts = np.hstack([sc, 0.0])
    trans_counts = np.zeros((M + 1, M + 1))
    trans_counts[:M, :M] = tc
    if M_rho == M:
        rho_, omega_ = rho.copy(), omega.copy()
    else:
        rho_, omega_, _, _ = sb.expand_globals_tmp(
            glob, M, trans_counts.copy(), start_counts.copy())
    tt_, st_ = sb.calc_theta_full(glob, trans_counts.copy(),
                                  start_counts.copy(), M + 1, rho=rho_)
    want = sb.elbo_linear_terms(rho_, omega_, HYP["trans_alpha"],
                                HYP["start_alpha"], HYP["kappa"],
                                HYP["gamma"], tt_, st_, start_counts,
                                trans_counts)
    got = float(sbd.elbo_linears_online(
        jnp.asarray(_pad(rho, KP)), jnp.asarray(_pad(omega, KP)),
        jnp.asarray(M), jnp.asarray(M_rho), HYP["trans_alpha"],
        HYP["start_alpha"], HYP["kappa"], HYP["gamma"],
        jnp.asarray(sc_p), jnp.asarray(tc_p)))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-7)
