"""GP observation/resampling API surface (GPI.pred_dist /
pred_latent_dist, GPI.py:457-562)."""

import numpy as np
import jax.numpy as jnp

from hdpgpc_tpu.models import gplds
from hdpgpc_tpu.ops.kernels import KernelParams


def _state(T=20):
    theta = KernelParams(jnp.asarray(2.0), jnp.asarray(3.0),
                         jnp.asarray(0.05))
    st = gplds.init_cluster_state(jnp.arange(T, dtype=jnp.float64), theta,
                                  0.01, 0.1, 5.0)
    # a latent mean that is smooth on the kernel's lengthscale — the GP
    # projection smooths rough functions by construction
    t = np.arange(T) / T
    f = jnp.asarray(np.sin(2 * np.pi * t)[:, None])
    return st._replace(f_last=f, f_sm_last=f), T


def test_observe_latent_shared_grid_identity():
    st, T = _state()
    x = jnp.arange(T, dtype=jnp.float64)
    f_star, cov = gplds.observe_latent(st, x, x)
    np.testing.assert_array_equal(np.asarray(f_star),
                                  np.asarray(st.f_sm_last))
    np.testing.assert_array_equal(np.asarray(cov),
                                  np.asarray(st.P_sm_last))


def test_observe_latent_subgrid_interpolates():
    st, T = _state()
    x = jnp.arange(T, dtype=jnp.float64)
    x_sub = x[::2]
    f_star, cov = gplds.observe_latent(st, x_sub, x)
    f_star = np.asarray(f_star)
    # the projection at training points reproduces the latent mean up to
    # the 1e-4 jitter smoothing
    np.testing.assert_allclose(f_star[:, 0],
                               np.asarray(st.f_sm_last)[::2, 0], atol=5e-3)
    cov = np.asarray(cov)
    assert cov.shape == (T // 2, T // 2)
    np.testing.assert_allclose(cov, cov.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(0.5 * (cov + cov.T)) > -1e-8)
