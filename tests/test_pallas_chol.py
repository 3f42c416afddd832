"""Fused Pallas SPD factor+solve kernel vs the XLA lowering.

The kernel (ops/pallas/chol_solve.py) replaces jnp.linalg.cholesky +
cho_solve inside the refit scan step (models/gplds.make_forward_step)
on the f32 TPU path; here it runs in interpreter mode on the CPU test
mesh and is compared against the XLA cholesky/cho_solve lowering and
an f64 direct solve.
"""

import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np
import pytest

from hdpgpc_tpu.ops.pallas.chol_solve import TP, fused_spd_solve

# Interpreter-mode Pallas is minutes-slow on the 1-core CI host; these
# run in the `pallas` tier (`pytest -m pallas`) instead of the quick
# default tier. Coverage is unchanged — the tier is exercised whenever
# kernels change (and the kernel self-validates at import on real TPU).
pytestmark = [pytest.mark.pallas, pytest.mark.slow]


def _spd_batch(rng, n, T, cond=5.0):
    M = rng.standard_normal((n, T, T)).astype(np.float32)
    return M @ M.transpose(0, 2, 1) + cond * np.eye(T, dtype=np.float32)


@pytest.mark.parametrize("T", [90, 128, 64])
def test_matches_xla_cho_solve(T):
    rng = np.random.default_rng(0)
    spd = _spd_batch(rng, 2, T)
    rhs = rng.standard_normal((2, T, T)).astype(np.float32)
    X = np.asarray(fused_spd_solve(jnp.asarray(spd), jnp.asarray(rhs),
                                   interpret=True))
    L = jnp.linalg.cholesky(jnp.asarray(spd))
    X_xla = np.asarray(jnp.stack([
        jsl.cho_solve((L[i], True), jnp.asarray(rhs[i])) for i in range(2)]))
    # both are f32 algorithms; compare each against the f64 truth
    truth = np.stack([np.linalg.solve(spd[i].astype(np.float64),
                                      rhs[i].astype(np.float64))
                      for i in range(2)])
    err_pl = np.max(np.abs(X - truth) / (np.abs(truth) + 1e-3))
    err_xla = np.max(np.abs(X_xla - truth) / (np.abs(truth) + 1e-3))
    assert err_pl < 2e-3, err_pl
    # the kernel should be in the same accuracy class as the XLA path
    assert err_pl < max(10 * err_xla, 5e-4), (err_pl, err_xla)


def test_kalman_shapes_scale():
    """The exact shapes the refit scan feeds: (2, 90, 90) with the
    Kalman-magnitude scales (covariances ~1e-2..1e2)."""
    rng = np.random.default_rng(1)
    T = 90
    spd = _spd_batch(rng, 2, T, cond=0.05) * 37.0
    rhs = (rng.standard_normal((2, T, T)) * 12.0).astype(np.float32)
    X = np.asarray(fused_spd_solve(jnp.asarray(spd), jnp.asarray(rhs),
                                   interpret=True))
    truth = np.stack([np.linalg.solve(spd[i].astype(np.float64),
                                      rhs[i].astype(np.float64))
                      for i in range(2)])
    assert np.max(np.abs(X - truth) / (np.abs(truth) + 1e-2)) < 5e-3
    assert TP == 128


def test_padding_identity_rows():
    """Padded rows must not leak into the T x T solution block."""
    rng = np.random.default_rng(2)
    T = 40
    spd = _spd_batch(rng, 1, T)
    rhs = rng.standard_normal((1, T, T)).astype(np.float32)
    X = np.asarray(fused_spd_solve(jnp.asarray(spd), jnp.asarray(rhs),
                                   interpret=True))
    truth = np.linalg.solve(spd[0].astype(np.float64),
                            rhs[0].astype(np.float64))
    assert np.max(np.abs(X[0] - truth) / (np.abs(truth) + 1e-3)) < 2e-3


def test_refit_path_with_fused_kernel_matches_xla():
    """End-to-end: a tiny f32 cluster refit with the fused kernel forced
    on (interpreter mode on CPU) matches the XLA-lowering refit."""
    import os

    import jax.numpy as jnp

    from hdpgpc_tpu.models import gplds
    from hdpgpc_tpu.ops.kernels import KernelParams
    from hdpgpc_tpu.ops.pallas import chol_solve

    T, N = 90, 5
    theta = KernelParams(jnp.asarray(1.0, jnp.float32),
                         jnp.asarray(1.2, jnp.float32),
                         jnp.asarray(0.05, jnp.float32))
    rng = np.random.default_rng(3)
    Y = jnp.asarray(np.sin(np.linspace(0, 6, T))[None]
                    + 0.1 * rng.standard_normal((N, T)), jnp.float32)
    resp = jnp.ones((N,), jnp.float32)

    def run():
        st = gplds.init_cluster_state(
            jnp.arange(T, dtype=jnp.float32), theta, 0.01, 0.25, 5.0,
            dtype=jnp.float32)
        refit = gplds.build_refit(T)
        res = refit(Y, resp, st)
        return np.asarray(res.q), np.asarray(res.state.f_last)

    old = os.environ.get("HDPGPC_PALLAS_SOLVES")
    try:
        os.environ["HDPGPC_PALLAS_SOLVES"] = "0"
        chol_solve.pallas_solves_enabled.cache_clear()
        q_xla, f_xla = run()
        os.environ["HDPGPC_PALLAS_SOLVES"] = "1"
        chol_solve.pallas_solves_enabled.cache_clear()
        q_pl, f_pl = run()
    finally:
        if old is None:
            os.environ.pop("HDPGPC_PALLAS_SOLVES", None)
        else:
            os.environ["HDPGPC_PALLAS_SOLVES"] = old
        chol_solve.pallas_solves_enabled.cache_clear()
    np.testing.assert_allclose(q_pl, q_xla, rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(f_pl, f_xla, rtol=2e-2, atol=1e-3)


def test_batched_vmem_guard_routes_large_batches():
    """ADVICE r4: the single-instance batched form holds the whole
    (n, TP, TP) batch in VMEM, so n past _BATCHED_MAX_N must route to
    the grid=(n,) per-matrix form instead of hitting a Mosaic
    VMEM/compile failure at the production call site. Numerics are
    identical either way — verified here at a guard-crossing batch."""
    from hdpgpc_tpu.ops.pallas.chol_solve import _BATCHED_MAX_N

    T = 16
    n = _BATCHED_MAX_N + 4
    rng = np.random.default_rng(3)
    A = rng.standard_normal((n, T, T)).astype(np.float32)
    spd = A @ A.swapaxes(-1, -2) + 3.0 * np.eye(T, dtype=np.float32)
    rhs = rng.standard_normal((n, T, T)).astype(np.float32)
    # batched=True with n over the guard silently uses the grid form
    x_guarded = np.asarray(fused_spd_solve(
        jnp.asarray(spd), jnp.asarray(rhs), interpret=True, batched=True))
    x_grid = np.asarray(fused_spd_solve(
        jnp.asarray(spd), jnp.asarray(rhs), interpret=True, batched=False))
    np.testing.assert_allclose(x_guarded, x_grid, rtol=0, atol=0)
    ref = np.stack([np.linalg.solve(spd[i], rhs[i]) for i in range(n)])
    np.testing.assert_allclose(x_guarded, ref, rtol=2e-2, atol=2e-3)
