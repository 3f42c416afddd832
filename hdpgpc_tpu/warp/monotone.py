"""Monotone time-warp alignment, batched and jitted.

TPU-native equivalent of the reference's AMTGP-style warping system
(amtgp_warping_system.py):

* a warp g(t) is parameterised by ``n_ctrl`` unconstrained control
  values, linearly interpolated to T points, passed through softplus to
  positive increments, cumulatively summed and renormalised to
  [x_min, x_max] (amtgp:328-357, :665-683) — monotone by construction;
* the MAP objective is 0.5 * SSE / noise + lam_s * ||D2 w||^2 +
  lam_a * ||w||^2, with (lam_s, lam_a) mapped from the GP kernel theta
  (amtgp:367-397, :456-488);
* optimisation is Adam with a FIXED iteration count (the reference has
  no early stop in the warp loop), so the whole batched optimisation
  compiles to one XLA program (lax.fori_loop over optax updates);
* the warp-prior scorer is the full GP log-density of the warp offsets
  under an RBF + noise prior on the normalised grid, with a cached
  Cholesky (WarpPriorAMTGP, amtgp:106-264).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hdpgpc_tpu.ops.linalg import precise_jit
import optax


class WarpResult(NamedTuple):
    x_warp: jax.Array    # (B, T) warp offsets g - x
    y_warp: jax.Array    # (B, T) warped target signals
    lik: jax.Array       # (B,) GP-prior log density of the warps
    lik_data: jax.Array  # (B,) MAP data log-lik of warped y under the
    #                      template: -0.5(sse/n + T log 2πn) - penalties
    #                      (compute_warp's lik_warp, amtgp:495-507)


class WarpPrior(NamedTuple):
    """Precomputed warp-prior factorisation for one grid."""
    L: jax.Array        # (T, T) Cholesky of the prior covariance
    logdet: jax.Array


def make_warp_prior(x: jax.Array, noise_warp: float,
                    bound_noise_warp: Tuple[float, float],
                    rho: float = 1.0, omega: float = 1.0,
                    jitter: float = 1e-6) -> WarpPrior:
    """K = omega^2 exp(-0.5 (dx/rho)^2) + (noise + jitter) I on the
    x-grid normalised to [0, 1] (amtgp:160-173)."""
    x = x.reshape(-1)
    lo, hi = bound_noise_warp
    n = jnp.clip(jnp.asarray(noise_warp, x.dtype), lo, hi)
    xr = x - x[0]
    rng = jnp.abs(xr[-1] - xr[0]) + 1e-12
    xu = xr / rng
    dx = xu[:, None] - xu[None, :]
    K = (omega * omega) * jnp.exp(-0.5 * (dx * dx) / (rho * rho))
    K = K + (n + jitter) * jnp.eye(x.shape[0], dtype=x.dtype)
    L = jnp.linalg.cholesky(K)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
    return WarpPrior(L=L, logdet=logdet)


@precise_jit
def warp_prior_score(prior: WarpPrior, x_warp: jax.Array) -> jax.Array:
    """Full GP log density of warp offsets (B, T) -> (B,)
    (WarpPriorAMTGP.log_sq_error_batch, amtgp:224-264)."""
    W = jnp.atleast_2d(x_warp)
    T = W.shape[1]
    alpha = jax.scipy.linalg.cho_solve((prior.L, True), W.T)   # (T, B)
    quad = jnp.sum(W.T * alpha, axis=0)
    const = T * math.log(2.0 * math.pi)
    return -0.5 * (quad + prior.logdet + const)


def _theta_to_lambdas(theta_rho, theta_omega, lam_s_base, lam_a_base):
    lam_s = lam_s_base / (theta_rho * theta_rho + 1e-12)
    lam_a = lam_a_base / (theta_omega * theta_omega + 1e-12)
    return lam_s, lam_a


def _interp_ctrl_to_T(u_ctrl: jax.Array, T: int) -> jax.Array:
    """Linear interpolation of (B, n_ctrl) control values onto T points
    (F.interpolate(mode='linear', align_corners=True) semantics)."""
    B, n_ctrl = u_ctrl.shape
    pos = jnp.linspace(0.0, n_ctrl - 1.0, T)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_ctrl - 2)
    w = pos - i0
    return (1.0 - w)[None, :] * u_ctrl[:, i0] + w[None, :] * u_ctrl[:, i0 + 1]


def _interp_signal(x: jax.Array, Y: jax.Array, Xq: jax.Array) -> jax.Array:
    """Batched linear interpolation: x (T,), Y (B, T), Xq (B, T) -> (B, T)
    (amtgp lin_interp_batch, :639-663)."""
    Xq = jnp.clip(Xq, x[0], x[-1])
    idx_hi = jnp.clip(jnp.searchsorted(x, Xq, side="left"), 1, x.shape[0] - 1)
    idx_lo = idx_hi - 1
    x_lo = x[idx_lo]
    x_hi = x[idx_hi]
    y_lo = jnp.take_along_axis(Y, idx_lo, axis=1)
    y_hi = jnp.take_along_axis(Y, idx_hi, axis=1)
    t = (Xq - x_lo) / (x_hi - x_lo + 1e-12)
    return (1.0 - t) * y_lo + t * y_hi


def build_batch_warp(T: int, n_ctrl: int = 8, lr: float = 5e-2,
                     lam_s_base: float = 200.0, lam_a_base: float = 1e-3,
                     train_iter: int = 50):
    """Build the jitted batched warp optimiser for beat length T.

    Returns warp(x (T,), Y_target (B, T), y_model (T,), prior: WarpPrior,
                 theta_rho, theta_omega, noise) -> WarpResult.
    """
    n_ctrl = max(4, min(n_ctrl, T))

    def monotone_grid(u_ctrl, x):
        uT = _interp_ctrl_to_T(u_ctrl, T)
        inc = jax.nn.softplus(uT) + 1e-6
        g_raw = jnp.cumsum(inc, axis=1)
        x_min, x_max = x[0], x[-1]
        g = (g_raw - g_raw[:, :1]) / (g_raw[:, -1:] - g_raw[:, :1] + 1e-12)
        g = x_min + (x_max - x_min) * g
        return g, g - x[None, :]

    @functools.partial(precise_jit, static_argnames=())
    def warp(x, Y_target, y_model, prior: WarpPrior, theta_rho, theta_omega,
             noise):
        # ``noise`` is the already-reduced-and-clamped scalar n: the
        # reference reduces diag(cov) -> scalar BEFORE the optimiser
        # (noise[0] online via _safe_noise amtgp:44-57; mean() batch via
        # amtgp:611-617), both clamped into bound_noise_warp — callers
        # replicate that reduction.
        B = Y_target.shape[0]
        dtype = Y_target.dtype
        lam_s, lam_a = _theta_to_lambdas(theta_rho, theta_omega,
                                         lam_s_base, lam_a_base)
        n = jnp.maximum(jnp.asarray(noise, dtype).reshape(()), 1e-12)

        def loss_fn(u_ctrl):
            g, xw = monotone_grid(u_ctrl, x)
            Yw = _interp_signal(x, Y_target, g)
            resid = Yw - y_model[None, :]
            sse = jnp.sum(resid * resid, axis=1)
            d2 = xw[:, :-2] - 2.0 * xw[:, 1:-1] + xw[:, 2:]
            sp = jnp.sum(d2 * d2, axis=1)
            ap = jnp.sum(xw * xw, axis=1)
            per = 0.5 * sse / (n + 1e-12) + lam_s * sp + lam_a * ap
            return jnp.mean(per)

        opt = optax.adam(lr)
        u0 = jnp.zeros((B, n_ctrl), dtype)
        state0 = (u0, opt.init(u0))

        def step(_, st):
            u, os = st
            g = jax.grad(loss_fn)(u)
            upd, os = opt.update(g, os)
            return (optax.apply_updates(u, upd), os)

        u_fin, _ = jax.lax.fori_loop(0, train_iter, step, state0)
        g, xw = monotone_grid(u_fin, x)
        Yw = _interp_signal(x, Y_target, g)
        lik = warp_prior_score(prior, xw)
        # MAP data log-lik of the final warp (amtgp:495-507, bayesian
        # branch: penalties enter as log-priors)
        resid = Yw - y_model[None, :]
        sse = jnp.sum(resid * resid, axis=1)
        T_eff = Yw.shape[1]
        ll = -0.5 * (sse / (n + 1e-12)
                     + T_eff * jnp.log(2.0 * math.pi * (n + 1e-12)))
        d2 = xw[:, :-2] - 2.0 * xw[:, 1:-1] + xw[:, 2:]
        ll = ll - (lam_s * jnp.sum(d2 * d2, axis=1)
                   + lam_a * jnp.sum(xw * xw, axis=1))
        return WarpResult(x_warp=xw, y_warp=Yw, lik=lik, lik_data=ll)

    return warp
