"""Hybrid (sequential head + associative-scan frozen tail) refit must
match the all-sequential refit exactly under estimation-limit semantics
(GPI_model.py:974,1092: parameters freeze once N >= estimation_limit).

The hybrid is the est-limit speed path (VERDICT r2 item 1b): slots past
the limit are fixed-parameter Kalman filtering, computed here by the
parallel filter/smoother instead of an O(N) sequential scan.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.models import gplds
from hdpgpc_tpu.ops.kernels import KernelParams


def _mk_state(T, dtype=jnp.float64):
    theta = KernelParams(jnp.asarray(1.5), jnp.asarray(2.0),
                         jnp.asarray(0.05))
    return gplds.init_cluster_state(
        jnp.arange(T, dtype=jnp.float64), theta, 0.02, 0.1, 5.0,
        dtype=dtype)


def _mk_data(N, T, seed=0):
    rng = np.random.default_rng(seed)
    base = np.sin(np.linspace(0, 2 * np.pi, T))
    Y = base[None, :] + 0.1 * rng.standard_normal((N, T))
    return Y


@pytest.mark.parametrize("est_limit,n_members", [(6, 30), (6, 6), (6, 3),
                                                 (6, 7), (1, 12)])
def test_hybrid_matches_sequential(est_limit, n_members):
    T, N = 12, 40
    Y = _mk_data(N, T)
    resp = np.zeros(N)
    # scatter members through the sequence (gathering is order-stable)
    idx = np.linspace(0, N - 1, n_members).astype(int)
    resp[idx] = 1.0
    st = _mk_state(T)
    seqp = gplds.build_refit(T, est_limit=est_limit, hybrid=False)
    hybp = gplds.build_refit(T, est_limit=est_limit, hybrid=True)
    Yj = jnp.asarray(Y)
    rj = jnp.asarray(resp)
    rs = seqp(Yj, rj, st)
    rh = hybp(Yj, rj, st)
    np.testing.assert_allclose(np.asarray(rh.q), np.asarray(rs.q),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(rh.q_lat), np.asarray(rs.q_lat),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(rh.snr), np.asarray(rs.snr),
                               rtol=1e-6, atol=1e-8)
    assert int(rh.state.n) == int(rs.state.n)
    for name in rs.state._fields:
        a, b = getattr(rh.state, name), getattr(rs.state, name)
        if name in ("mniw_int", "mniw_obs"):
            for f2 in a._fields:
                np.testing.assert_allclose(
                    np.asarray(getattr(a, f2)), np.asarray(getattr(b, f2)),
                    rtol=1e-8, atol=1e-10, err_msg=f"{name}.{f2}")
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-8, err_msg=name)


def test_hybrid_bucketed_matches_sequential():
    T, N = 10, 64
    Y = _mk_data(N, T, seed=3)
    resp = np.zeros(N)
    resp[: 20] = 1.0
    st = _mk_state(T)
    seqp = gplds.build_refit(T, est_limit=8, bucket=32, hybrid=False)
    hybp = gplds.build_refit(T, est_limit=8, bucket=32, hybrid=True)
    rs = seqp(jnp.asarray(Y), jnp.asarray(resp), st)
    rh = hybp(jnp.asarray(Y), jnp.asarray(resp), st)
    np.testing.assert_allclose(np.asarray(rh.q), np.asarray(rs.q),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(rh.q_lat), np.asarray(rs.q_lat),
                               rtol=1e-8, atol=1e-8)


def test_steady_tail_f32_close_to_sequential():
    """float32 speed-mode tail (warm-up + steady-state LTI scan) must
    track the exact sequential refit to within f32 noise on a realistic
    member run (the Riccati recursion converges well inside the 64-step
    warm-up)."""
    import jax.numpy as jnp
    T, N = 16, 400
    Y = _mk_data(N, T, seed=7).astype(np.float32)
    resp = np.zeros(N, np.float32)
    resp[:360] = 1.0
    st = _mk_state(T, dtype=jnp.float32)
    seqp = gplds.build_refit(T, est_limit=50, hybrid=False)
    hybp = gplds.build_refit(T, est_limit=50, hybrid=True)
    rs = seqp(jnp.asarray(Y), jnp.asarray(resp), st)
    rh = hybp(jnp.asarray(Y), jnp.asarray(resp), st)
    qs, qh = np.asarray(rs.q), np.asarray(rh.q)
    # scores are O(10-100); absolute agreement well under score
    # competition margins
    np.testing.assert_allclose(qh, qs, rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(rh.q_lat), np.asarray(rs.q_lat),
                               rtol=2e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(rh.state.f_sm_last),
                               np.asarray(rs.state.f_sm_last),
                               rtol=1e-3, atol=1e-3)
    assert int(rh.state.n) == int(rs.state.n)


def test_hybrid_continuation_state():
    """n_before > 0: freezing happens even earlier; tail stays exact."""
    T, N = 10, 30
    Y = _mk_data(N, T, seed=5)
    resp1 = np.zeros(N)
    resp1[:4] = 1.0
    st = _mk_state(T)
    seqp = gplds.build_refit(T, est_limit=6, hybrid=False)
    hybp = gplds.build_refit(T, est_limit=6, hybrid=True)
    st1 = seqp(jnp.asarray(Y), jnp.asarray(resp1), st).state
    resp2 = np.zeros(N)
    resp2[10:25] = 1.0
    rs = seqp(jnp.asarray(Y), jnp.asarray(resp2), st1)
    rh = hybp(jnp.asarray(Y), jnp.asarray(resp2), st1)
    np.testing.assert_allclose(np.asarray(rh.state.f_sm_last),
                               np.asarray(rs.state.f_sm_last),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(rh.q), np.asarray(rs.q),
                               rtol=1e-8, atol=1e-8)
    assert int(rh.state.n) == int(rs.state.n)
