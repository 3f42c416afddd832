import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.ops.kalman import (LDSParams, kalman_step, parallel_filter,
                                   parallel_smooth, rts_pair, rts_smooth)


def _sys(T=6, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(T) + 0.05 * rng.standard_normal((T, T))
    G = 0.1 * np.eye(T)
    C = np.eye(T) + 0.01 * rng.standard_normal((T, T))
    S = 0.2 * np.eye(T)
    return A, G, C, S


def _np_kalman(f, P, y, A, G, C, S):
    m = A @ f
    Pp = A @ P @ A.T + G
    Sm = C @ Pp @ C.T + S
    K = Pp @ C.T @ np.linalg.inv(Sm)
    f2 = m + K @ (y - C @ m)
    IKC = np.eye(f.shape[0]) - K @ C
    P2 = IKC @ Pp @ IKC.T + K @ S @ K.T
    return f2, P2


def test_kalman_step_matches_closed_form():
    T = 6
    A, G, C, S = _sys(T)
    rng = np.random.default_rng(1)
    f = rng.standard_normal((T, 1))
    P = 0.5 * np.eye(T)
    y = rng.standard_normal((T, 1))
    fe, Pe = _np_kalman(f, P, y, A, G, C, S)
    fg, Pg = kalman_step(jnp.asarray(f), jnp.asarray(P), jnp.asarray(y),
                         LDSParams(*map(jnp.asarray, (A, G, C, S))),
                         first=jnp.asarray(False), noise_first=0.3)
    np.testing.assert_allclose(np.asarray(fg), fe, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Pg), Pe, rtol=1e-9, atol=1e-10)


def test_kalman_first_step_special_case():
    """First step: P stays at the prior K, predicted obs is zero,
    innovation covariance = noise * I (GPI.py:136-150)."""
    T = 5
    A, G, C, S = _sys(T, 2)
    rng = np.random.default_rng(3)
    K0 = np.eye(T) * 2.0
    y = rng.standard_normal((T, 1))
    noise = 0.3
    # closed form: K = K0 C'(C K0 C' + n I)^-1; f = K y
    Sm = C @ K0 @ C.T + noise * np.eye(T)
    Kg = K0 @ C.T @ np.linalg.inv(Sm)
    fe = Kg @ y
    IKC = np.eye(T) - Kg @ C
    Pe = IKC @ K0 @ IKC.T + noise * Kg @ Kg.T
    fg, Pg = kalman_step(jnp.zeros((T, 1)), jnp.asarray(K0), jnp.asarray(y),
                         LDSParams(*map(jnp.asarray, (A, G, C, S))),
                         first=jnp.asarray(True), noise_first=noise)
    np.testing.assert_allclose(np.asarray(fg), fe, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Pg), Pe, rtol=1e-9, atol=1e-10)


def test_rts_smooth_matches_pairwise_recursion():
    T, N = 4, 9
    A, G, C, S = _sys(T, 4)
    rng = np.random.default_rng(5)
    means = rng.standard_normal((N, T, 1))
    covs = np.stack([0.3 * np.eye(T)] * N) + 0.01 * np.stack(
        [np.diag(rng.random(T)) for _ in range(N)])
    A_seq = np.stack([A] * N)
    G_seq = np.stack([G] * N)
    f_sm, P_sm = rts_smooth(jnp.asarray(A_seq), jnp.asarray(G_seq),
                            jnp.asarray(means), jnp.asarray(covs))
    # numpy reference recursion
    f_np = means.copy()
    P_np = covs.copy()
    for t in range(N - 2, -1, -1):
        Pp = A @ P_np[t] @ A.T + G
        J = P_np[t] @ A.T @ np.linalg.inv(Pp)
        f_np[t] = f_np[t] + J @ (f_np[t + 1] - A @ f_np[t])
        P_np[t] = P_np[t] + J @ (P_np[t + 1] - Pp) @ J.T
    np.testing.assert_allclose(np.asarray(f_sm), f_np, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(P_sm), P_np, rtol=1e-8, atol=1e-9)


def test_parallel_filter_matches_sequential():
    T, N = 4, 12
    A, G, C, S = _sys(T, 6)
    rng = np.random.default_rng(7)
    ys = rng.standard_normal((N, T, 1))
    m0 = np.zeros((T, 1))
    P0 = 2.0 * np.eye(T)
    # sequential numpy filter
    f, P = m0, P0
    seq_f, seq_P = [], []
    for t in range(N):
        if t == 0:
            Sm = C @ P0 @ C.T + S
            K = P0 @ C.T @ np.linalg.inv(Sm)
            f = m0 + K @ (ys[0] - C @ m0)
            P = P0 - K @ Sm @ K.T
        else:
            f, P = _np_kalman(f, P, ys[t], A, G, C, S)
        seq_f.append(f)
        seq_P.append(P)
    fp, Pp = parallel_filter(jnp.asarray(ys), *map(jnp.asarray, (A, G, C, S)),
                             jnp.asarray(m0), jnp.asarray(P0))
    np.testing.assert_allclose(np.asarray(fp), np.stack(seq_f),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Pp), np.stack(seq_P),
                               rtol=1e-7, atol=1e-8)


def test_parallel_smooth_matches_sequential():
    T, N = 4, 10
    A, G, C, S = _sys(T, 8)
    rng = np.random.default_rng(9)
    means = rng.standard_normal((N, T, 1))
    covs = np.stack([0.4 * np.eye(T) + 0.01 * np.diag(rng.random(T))
                     for _ in range(N)])
    f_seq, P_seq = rts_smooth(
        jnp.asarray(np.stack([A] * N)), jnp.asarray(np.stack([G] * N)),
        jnp.asarray(means), jnp.asarray(covs))
    f_par, P_par = parallel_smooth(jnp.asarray(A), jnp.asarray(G),
                                   jnp.asarray(means), jnp.asarray(covs))
    np.testing.assert_allclose(np.asarray(f_par), np.asarray(f_seq),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(P_par), np.asarray(P_seq),
                               rtol=1e-7, atol=1e-8)


def test_parallel_filter_masked_matches_gated_sequential():
    """parallel_filter_masked == the gated sequential filter (h=0 steps
    are identities: no prediction, no update) — the per-cluster update
    semantics of models/streaming.build_stream_step."""
    from hdpgpc_tpu.ops.kalman import parallel_filter_masked

    T, N = 5, 17
    A, G, C, S = _sys(T, 7)
    rng = np.random.default_rng(11)
    ys = rng.standard_normal((N, T, 1))
    h = (rng.random(N) > 0.4).astype(np.float64)
    h[0] = 0.0  # leading masked step must hold the prior
    m0 = rng.standard_normal((T, 1))
    P0 = np.eye(T) * 0.5

    f, P = m0.copy(), P0.copy()
    seq_f, seq_P = [], []
    for t in range(N):
        if h[t] > 0.5:
            f, P = _np_kalman(f, P, ys[t], A, G, C, S)
        seq_f.append(f.copy())
        seq_P.append(P.copy())

    fs, Ps = parallel_filter_masked(
        jnp.asarray(ys), jnp.asarray(h), *map(jnp.asarray, (A, G, C, S)),
        jnp.asarray(m0), jnp.asarray(P0))
    np.testing.assert_allclose(np.asarray(fs), np.stack(seq_f),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Ps), np.stack(seq_P),
                               rtol=1e-8, atol=1e-9)


def test_solve_general_qr_branch_matches_lu():
    """ops/linalg.solve_general: the QR branch (used for f64 on TPU,
    where XLA implements LuDecomposition only for f32/c64 — hit by the
    est-limit frozen-tail parallel filter in f64 exact mode) must match
    the LU solve on general batched non-SPD systems."""
    from hdpgpc_tpu.ops import linalg

    rng = np.random.default_rng(3)
    A = rng.standard_normal((4, 12, 12)) + 4.0 * np.eye(12)
    B = rng.standard_normal((4, 12, 7))
    ref = np.linalg.solve(A, B)
    for force in (False, True):
        x = linalg.solve_general(jnp.asarray(A), jnp.asarray(B),
                                 force_qr=force)
        np.testing.assert_allclose(np.asarray(x), ref,
                                   rtol=1e-9, atol=1e-10)
