import numpy as np
import pytest

from hdpgpc_tpu.ops import stick_breaking as sb


def test_rho_beta_roundtrip():
    rho = np.array([0.4, 0.3, 0.6])
    beta = sb.rho_to_beta(rho)
    assert beta.shape == (4,)
    assert beta.sum() == pytest.approx(1.0)
    rho2 = sb.beta_to_rho(beta, 3)
    np.testing.assert_allclose(rho2, rho, rtol=1e-12)


def test_create_init_rho_near_uniform_beta():
    K = 5
    beta = sb.rho_to_beta(sb.create_init_rho(K), "K+1")
    # E[beta_k] approx (1 - rem) / K for active sticks
    np.testing.assert_allclose(beta[:K], beta[0], rtol=1e-9)


def test_optimizer_prior_recovery():
    """With nDoc=0 the optimum sets q(u) to its Beta(1, gamma) prior."""
    K, gamma = 3, 2.0
    rho, omega, _ = sb.find_optimum_rho_omega(
        sum_log_pi=np.zeros(K + 1), start_alpha_log_pi=np.zeros(K + 1),
        n_doc=0, gamma=gamma, alpha=1.0)
    np.testing.assert_allclose(rho, 1.0 / (1.0 + gamma) * np.ones(K),
                               rtol=1e-3)
    np.testing.assert_allclose(omega, (1.0 + gamma) * np.ones(K), rtol=1e-3)


def test_optimizer_gradient_is_consistent():
    rng = np.random.default_rng(0)
    K = 4
    rho = rng.uniform(0.2, 0.8, K)
    omega = rng.uniform(2.0, 6.0, K)
    slp = -rng.random(K + 1) * 3
    salp = -rng.random(K + 1)
    f0, g = sb._neg_elbo_and_grad(rho, omega, slp, salp, 5, 1.0, 1.0, 0.0)
    eps = 1e-6
    num = np.zeros(2 * K)
    for i in range(K):
        r = rho.copy(); r[i] += eps
        num[i] = (sb._neg_elbo_and_grad(r, omega, slp, salp, 5, 1.0, 1.0,
                                        0.0, want_grad=False) - f0) / eps
        o = omega.copy(); o[i] += eps
        num[K + i] = (sb._neg_elbo_and_grad(rho, o, slp, salp, 5, 1.0, 1.0,
                                            0.0, want_grad=False) - f0) / eps
    np.testing.assert_allclose(g, num, rtol=1e-3, atol=1e-4)


def test_theta_updates_shapes_and_counts():
    glob = sb.init_globals(2, gamma=1.0, trans_alpha=1.0, start_alpha=0.1,
                           kappa=0.0)
    assert glob.trans_theta.shape == (3, 3)
    counts = np.array([[5.0, 1.0], [2.0, 7.0]])
    tt, st = sb.calc_theta_full(glob, counts, np.array([1.0, 0.0]), M=3)
    assert tt.shape == (3, 3)
    # counts only enter the leading (M-1, M-1) block
    assert tt[0, 0] > tt[0, 2]


def test_optimise_globals_runs():
    glob = sb.init_globals(3, 1.0, 1.0, 0.1, 0.0)
    counts = np.diag([10.0, 6.0, 2.0]) + 0.5
    tt, st = sb.calc_theta_full(glob, counts, np.array([1.0, 0, 0]), M=4)
    glob = sb.HDPGlobals(glob.rho, glob.omega, tt, st, 1.0, 1.0, 0.1, 0.0)
    out = sb.optimise_globals(glob, M=4)
    assert out.rho.shape == (3,)
    assert np.all(out.rho > 0) and np.all(out.rho < 1)
    assert np.all(out.omega > 0)


def test_elbo_linears_finite():
    glob = sb.init_globals(2, 1.0, 1.0, 0.1, 0.0)
    N = 12
    rng = np.random.default_rng(1)
    z = rng.integers(0, 2, N)
    resp = np.eye(2)[z]
    respPair = np.zeros((N, 2, 2))
    respPair[np.arange(1, N), z[:-1], z[1:]] = 1.0
    val = sb.elbo_linears(glob, resp, respPair)
    assert np.isfinite(val)
    # post mode is only ever used with resp one column wider than the
    # globals (birth candidates, GPI_HDP.py:1203-1207)
    resp3 = np.zeros((N, 3)); resp3[:, :2] = resp
    respPair3 = np.zeros((N, 3, 3)); respPair3[:, :2, :2] = respPair
    val_post = sb.elbo_linears(glob, resp3, respPair3, post=True)
    assert np.isfinite(val_post)
