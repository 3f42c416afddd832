"""End-to-end offline sweep on synthetic beats.

Mirrors the reference's test_offline.py driver (SURVEY.md §3.1) on a
small synthetic problem: the sweep should discover the generating
clusters and produce low classification error.
"""

import numpy as np
import pytest

from hdpgpc_tpu.data.loader import default_x_basis, synthetic_beats
from hdpgpc_tpu.data.priors import compute_estimators_lds


def _build_model(T, std, std_dif, bound_sigma, bound_gamma, **kw):
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    x_basis = default_x_basis(T)
    defaults = dict(
        n_outputs=1, ini_lengthscale=3.0, bound_lengthscale=(1.0, 20.0),
        ini_gamma=std_dif, ini_sigma=std, ini_outputscale=10.0,
        bound_sigma=bound_sigma, bound_gamma=bound_gamma,
        verbose=False, hmm_switch=True, max_models=100,
        bayesian_params=True, reestimate_initial_params=True,
        n_explore_steps=3, free_deg_MNIV=5,
        kernel_fit_fast=True)
    defaults.update(kw)
    defaults.pop("kernel_fit_fast", None)
    m = HDPGPC(x_basis, **defaults)
    # Small kernel-fit budget for test speed (same algorithm).
    object.__setattr__(m.cfg.gp, "__dict__", None) if False else None
    return m


@pytest.mark.slow
def test_offline_sweep_recovers_clusters():
    T, N, K = 24, 60, 3
    y, z = synthetic_beats(N, T=T, n_clusters=K, noise=0.03, seed=0)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    model = _build_model(T, std, std_dif, bs, bg)
    # shrink the kernel-fit budget for test wall-time
    import dataclasses
    model.cfg = dataclasses.replace(
        model.cfg, gp=dataclasses.replace(model.cfg.gp,
                                          kernel_fit_iters=300))
    x_trains = np.tile(np.arange(T, dtype=np.float64), (N, 1))
    model.include_batch(x_trains, y, with_warp=False)

    # every sample assigned; discovered clusters align with truth
    labels = model.resp_assigned[-1]
    assert labels.shape == (N,)
    # purity: majority-truth per discovered cluster
    err = 0
    for m in np.unique(labels):
        idx = np.flatnonzero(labels == m)
        true = z[idx]
        maj = np.bincount(true).argmax()
        err += int(np.sum(true != maj))
    assert err / N < 0.15, f"clustering error {err}/{N}"
    # ELBO history recorded
    assert len(model.train_elbo) >= 1
    assert np.isfinite(model.train_elbo).all()


@pytest.mark.slow
def test_offline_sweep_ml_em_path():
    """bayesian_params=False routes refits through the masked ML-EM
    (GPI_model.new_params / new_params_weighted, GPI_model.py:747-887):
    the sweep must converge and recover the generating clusters."""
    T, N, K = 24, 60, 3
    y, z = synthetic_beats(N, T=T, n_clusters=K, noise=0.03, seed=0)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    model = _build_model(T, std, std_dif, bs, bg, bayesian_params=False)
    import dataclasses
    model.cfg = dataclasses.replace(
        model.cfg, gp=dataclasses.replace(model.cfg.gp,
                                          kernel_fit_iters=300))
    x_trains = np.tile(np.arange(T, dtype=np.float64), (N, 1))
    model.include_batch(x_trains, y, with_warp=False)

    labels = model.resp_assigned[-1]
    err = 0
    for m in np.unique(labels):
        idx = np.flatnonzero(labels == m)
        true = z[idx]
        maj = np.bincount(true).argmax()
        err += int(np.sum(true != maj))
    assert err / N < 0.15, f"ML-EM clustering error {err}/{N}"
    assert np.isfinite(model.train_elbo).all()
    # Dispatch observable: the ML path never touches the MNIW conjugate
    # posteriors (n0 stays at the free_deg prior), whereas a Bayesian
    # refit advances n0 by one per member. (Whether the EM moves A away
    # from identity depends on its accept guard — the reference's quirky
    # likelihood, GPI.py:947-950 with C in the transition term, often
    # rejects the first M-step; both behaviours are valid here.)
    for cl in model.clusters[0]:
        if cl.members.size > 1:
            n0 = float(np.asarray(cl.state.mniw_int.n0))
            assert n0 == pytest.approx(5.0), \
                f"MNIW posterior advanced (n0={n0}): Bayesian path ran"


def test_reduce_num_outputs_drops_low_variance_lead():
    """GPI_HDP.reduce_num_outputs (GPI_HDP.py:703-714): variance of
    per-beat sums ranks leads; ratio=0.5 on 2 leads keeps the one with
    the larger variance and shrinks the per-lead cluster banks."""
    rng = np.random.default_rng(0)
    N, T = 12, 90
    strong = np.sin(np.linspace(0, 6, T))[None] * (
        1.0 + 0.5 * rng.standard_normal((N, 1)))
    weak = 0.01 * rng.standard_normal((N, T))
    y = np.stack([weak, strong], axis=2)                  # lead 1 wins
    std, std_dif, bs, bg = compute_estimators_lds(y)
    m = _build_model(T, std, std_dif, bs, bg, n_outputs=2,
                     reduce_outputs=True, reduce_outputs_ratio=0.5)
    y_red = m.reduce_num_outputs(y)
    assert y_red.shape == (N, T, 1)
    assert m.n_outputs == 1 and len(m.clusters) == 1
    np.testing.assert_array_equal(y_red[:, :, 0], strong)


def test_compute_joint_xy_q_matches_independent_when_rho_zero():
    """With rho_xy = 0 the joint two-lead score factorises into the sum
    of per-lead Gaussian scores (up to the shared jitter); scores must
    rank a matching beat above a mismatched one."""
    rng = np.random.default_rng(1)
    N, T = 6, 90
    base = np.sin(np.linspace(0, 6, T))
    y = np.stack([base[None] + 0.05 * rng.standard_normal((N, T)),
                  base[None] * 0.5 + 0.05 * rng.standard_normal((N, T))],
                 axis=2)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    m = _build_model(T, std, std_dif, bs, bg, n_outputs=2)
    q0 = m.compute_joint_xy_q(y)                          # rho default 0
    assert q0.shape == (N, m.M)
    assert np.isfinite(q0).all()
    # correlated variant shifts the score but stays finite and ordered
    q_rho = m.compute_joint_xy_q(y, rho_xy=np.full(m.M, 0.5))
    assert np.isfinite(q_rho).all()
    far = y + 50.0
    q_far = m.compute_joint_xy_q(far)
    assert (q_far < q0).all()


@pytest.mark.slow
def test_f32_fragility_guard_records_margins():
    """The f32 speed-mode guard must record a finite narrowest decision
    margin over a sweep and flag fragility exactly when that margin
    sits below config.f32_guard_tol (VERDICT r3 ask #2: a documented
    per-record divergence guard)."""
    import dataclasses

    T, N, K = 24, 50, 2
    y, z = synthetic_beats(N, T=T, n_clusters=K, noise=0.03, seed=1)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    model = _build_model(T, std, std_dif, bs, bg,
                         compute_dtype="float32")
    model.cfg = dataclasses.replace(
        model.cfg, gp=dataclasses.replace(model.cfg.gp,
                                          kernel_fit_iters=200))
    x_trains = np.tile(np.arange(T, dtype=np.float64), (N, 1))
    model.include_batch(x_trains, y, with_warp=False)
    # a real sweep exercises birth accept/reject comparisons: the
    # narrowest non-tie margin must have been recorded
    assert np.isfinite(model.f32_min_rel_margin)
    assert model.f32_min_rel_margin > 0.0
    # the flag is exactly the threshold comparison (same model state)
    tol_above = model.f32_min_rel_margin * 2.0
    tol_below = model.f32_min_rel_margin * 0.5
    model.cfg = dataclasses.replace(model.cfg, f32_guard_tol=tol_above)
    assert model.f32_fragile
    model.cfg = dataclasses.replace(model.cfg, f32_guard_tol=tol_below)
    assert not model.f32_fragile


def test_f32_guard_ignores_exact_ties():
    """lhs == rhs (bitwise-identical candidate trajectories) must not
    count as a fragile margin."""
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    m = HDPGPC(default_x_basis(8), n_outputs=1)
    assert m._dec(1.0, 1.0) is False
    assert m.f32_min_rel_margin == float("inf")
    m._dec(1.0, 1.0 + 1e-9)
    assert np.isclose(m.f32_min_rel_margin, 1e-9 / 1.0, rtol=1e-2)


@pytest.mark.slow
def test_f32_guard_fallback_f64_reruns_batch():
    """on_fragile='fallback_f64' (VERDICT r4 ask #2): when the f32
    fragility guard fires at the end of include_batch, the batch is
    automatically re-run in float64 exact mode on a fresh model and the
    result adopted — the caller ends up holding exact-mode clustering,
    with the f32 telemetry preserved on model.f32_fallback. Mirrors the
    reference's failure-fallback idiom (OptimizerRhoOmega.py:59-95)."""
    import dataclasses

    import jax.numpy as jnp

    T, N, K = 24, 50, 2
    y, z = synthetic_beats(N, T=T, n_clusters=K, noise=0.03, seed=1)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    model = _build_model(T, std, std_dif, bs, bg,
                         compute_dtype="float32")
    # force the guard: every real (non-tie) decision margin is < 1.0 rel
    model.cfg = dataclasses.replace(
        model.cfg, f32_guard_tol=1.0, on_fragile="fallback_f64",
        gp=dataclasses.replace(model.cfg.gp, kernel_fit_iters=200))
    x_trains = np.tile(np.arange(T, dtype=np.float64), (N, 1))
    model.include_batch(x_trains, y, with_warp=False)
    # the adopted state is the f64 exact re-run
    assert model.dtype == jnp.float64
    assert model.cfg.compute_dtype == "float64"
    assert not model.f32_fragile            # f64 mode never flags
    # f32 telemetry survives the adoption
    assert model.f32_fallback is not None
    assert model.f32_fallback["from_dtype"] == "float32"
    assert 0.0 < model.f32_fallback["min_rel_margin"] < 1.0
    # the f64 result is a usable clustering of the full batch
    labels = model.resp_assigned[-1]
    assert labels.shape == (N,)
    assert model.T_count == N
    # fallback kernel-fit budget is the live config's, not the f32 cap
    assert model.cfg.gp.kernel_fit_iters == 200


def test_f32_guard_on_fragile_raise():
    """on_fragile='raise' turns the guard warning into a hard error."""
    import dataclasses

    from hdpgpc_tpu.models.hdpgpc import HDPGPC

    T, N, K = 24, 40, 2
    y, z = synthetic_beats(N, T=T, n_clusters=K, noise=0.03, seed=2)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    model = _build_model(T, std, std_dif, bs, bg,
                         compute_dtype="float32")
    model.cfg = dataclasses.replace(
        model.cfg, f32_guard_tol=1.0, on_fragile="raise",
        gp=dataclasses.replace(model.cfg.gp, kernel_fit_iters=100))
    x_trains = np.tile(np.arange(T, dtype=np.float64), (N, 1))
    with pytest.raises(FloatingPointError, match="FRAGILE"):
        model.include_batch(x_trains, y, with_warp=False)


@pytest.mark.slow
def test_mp64_mixed_precision_f64_sweep_matches_exact():
    """HDPGPC_MP64 (mixed-precision f64 solves, the f64-on-TPU speed
    path): a full offline f64 sweep run with the mixed-precision
    programs must reproduce the exact-f64 sweep's partition and ELBO
    trajectory within the 1e-6 relative parity bar (BASELINE
    correctness bar). 'force' engages the path on the CPU test host."""
    import os

    T, N, K = 24, 50, 2
    y, z = synthetic_beats(N, T=T, n_clusters=K, noise=0.03, seed=4)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    x_trains = np.tile(np.arange(T, dtype=np.float64), (N, 1))

    def run():
        import dataclasses
        m = _build_model(T, std, std_dif, bs, bg)
        m.cfg = dataclasses.replace(
            m.cfg, gp=dataclasses.replace(m.cfg.gp,
                                          kernel_fit_iters=200))
        m.include_batch(x_trains, y, with_warp=False)
        return m

    assert os.environ.get("HDPGPC_MP64", "0") == "0"
    m_exact = run()
    os.environ["HDPGPC_MP64"] = "force"
    try:
        m_mp = run()
    finally:
        os.environ["HDPGPC_MP64"] = "0"
    np.testing.assert_array_equal(m_mp.resp_assigned[-1],
                                  m_exact.resp_assigned[-1])
    assert m_mp.M == m_exact.M
    assert len(m_mp.train_elbo) == len(m_exact.train_elbo)
    for a, b in zip(m_mp.train_elbo, m_exact.train_elbo):
        assert abs(a - b) / max(abs(b), 1.0) < 1e-6, (a, b)
