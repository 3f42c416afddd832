import numpy as np
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.warp.monotone import (build_batch_warp, make_warp_prior,
                                      warp_prior_score)


def test_warp_prior_score_matches_gaussian():
    T = 16
    x = jnp.arange(T, dtype=jnp.float64)
    prior = make_warp_prior(x, noise_warp=0.05, bound_noise_warp=(1e-6, 1e2))
    w = np.random.default_rng(0).standard_normal((3, T)) * 0.1
    got = np.asarray(warp_prior_score(prior, jnp.asarray(w)))
    L = np.asarray(prior.L)
    K = L @ L.T
    for b in range(3):
        quad = w[b] @ np.linalg.solve(K, w[b])
        exp = -0.5 * (quad + np.linalg.slogdet(K)[1]
                      + T * np.log(2 * np.pi))
        assert got[b] == pytest.approx(exp, rel=1e-8)


def test_batch_warp_monotone_and_aligns():
    """Warping a shifted bump toward a template must stay monotone and
    reduce the SSE to the template."""
    T = 32
    x = jnp.arange(T, dtype=jnp.float64)
    t = np.arange(T) / T
    template = np.exp(-0.5 * ((t - 0.5) / 0.08) ** 2)
    shifted = np.exp(-0.5 * ((t - 0.58) / 0.08) ** 2)
    prior = make_warp_prior(x, 0.05, (1e-6, 1e2))
    warp = build_batch_warp(T, n_ctrl=8, train_iter=150)
    res = warp(x, jnp.asarray(shifted[None]), jnp.asarray(template),
               prior, jnp.asarray(3.0), jnp.asarray(1.0),
               jnp.asarray(0.02))
    g = np.asarray(res.x_warp[0]) + np.arange(T)
    assert np.all(np.diff(g) > 0), "warp grid must be strictly monotone"
    sse0 = np.sum((shifted - template) ** 2)
    ssew = np.sum((np.asarray(res.y_warp[0]) - template) ** 2)
    assert ssew < 0.35 * sse0, f"warp should align: {ssew} vs {sse0}"
    assert np.isfinite(float(res.lik[0]))


def _tiny_warp_model(T=24, N=16, seed=5):
    import dataclasses
    from hdpgpc_tpu.data.loader import default_x_basis, synthetic_beats
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    y, z = synthetic_beats(N, T=T, n_clusters=2, noise=0.03, seed=seed)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    m = HDPGPC(default_x_basis(T), n_outputs=1, ini_gamma=std_dif,
               ini_sigma=std, ini_outputscale=10.0, bound_sigma=bs,
               bound_gamma=bg, max_models=100)
    m.cfg = dataclasses.replace(
        m.cfg, gp=dataclasses.replace(m.cfg.gp, kernel_fit_iters=200),
        warp=dataclasses.replace(m.cfg.warp, train_iter_online=40))
    return m, y, z


@pytest.mark.slow
@pytest.mark.parametrize("method", ["standard", "greedy", "greedy_bound"])
def test_online_warp_strategies(method):
    """Each compute_warp_y strategy (GPI_HDP.py:3153-3322) must drive an
    online warp run to completion with finite scores."""
    import dataclasses
    m, y, z = _tiny_warp_model()
    m.cfg = dataclasses.replace(
        m.cfg, warp=dataclasses.replace(m.cfg.warp, method=method))
    m.warp = True
    x = np.arange(24, dtype=np.float64)
    for i in range(10):
        m.include_sample(x, y[i], with_warp=True)
    assert m.T_count == 10
    assert np.isfinite(m.q_last).any()


@pytest.mark.slow
def test_compute_warp_actual_state():
    """Post-hoc warp of all assigned beats (GPI_HDP.py:949-1023):
    warped outputs differ from inputs for assigned beats, warps are
    monotone, and rescoring fills q/q_lat."""
    m, y, z = _tiny_warp_model()
    x = np.arange(24, dtype=np.float64)
    for i in range(12):
        m.include_sample(x, y[i], with_warp=False)
    N, T = 12, 24
    xs = np.tile(x, (N, 1))
    q = np.zeros((N, m.M, 1))
    q_lat = np.zeros((N, m.M, 1))
    q2, ql2, done, y_w = m.compute_warp_actual_state(xs, y[:12], q, q_lat)
    assert done
    assert y_w.shape == (N, T, 1)
    assigned = sorted(set(int(i) for cl in m.clusters[0]
                          for i in cl.members))
    assert assigned, "no beats assigned"
    for cl in m.clusters[0]:
        for j in cl.members:
            g = m.x_w[j, :, 0] + np.arange(T)
            assert np.all(np.diff(g) > 0), "warp grid must be monotone"
    assert np.isfinite(q2[assigned]).all()
    assert np.isfinite(ql2[assigned]).all()
