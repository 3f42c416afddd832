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
