import numpy as np
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.ops import linalg


def _rand_spd(T, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((T, T))
    return scale * (A @ A.T / T + np.eye(T))


def test_chol_spd_matches_numpy():
    M = _rand_spd(16, 1)
    L = np.asarray(linalg.chol_spd(jnp.asarray(M), jitter_scale=0.0))
    np.testing.assert_allclose(L @ L.T, M, rtol=1e-10, atol=1e-10)


def test_cho_solve():
    M = _rand_spd(12, 2)
    b = np.random.default_rng(3).standard_normal((12, 3))
    L = linalg.chol_spd(jnp.asarray(M), jitter_scale=0.0)
    x = np.asarray(linalg.cho_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(M @ x, b, rtol=1e-9, atol=1e-9)


def test_gaussian_score_no_logdet():
    """The reference score is -0.5 d'C^-1 d - 0.5*T*log(2pi), WITHOUT
    the log-determinant (GPI_model.py:250-286)."""
    T = 8
    C = _rand_spd(T, 4)
    d = np.random.default_rng(5).standard_normal(T)
    expected = (-0.5 * d @ np.linalg.solve(C, d)
                - 0.5 * T * np.log(2 * np.pi))
    got = float(linalg.gaussian_score(jnp.asarray(d), jnp.asarray(C)))
    assert got == pytest.approx(expected, rel=1e-8)


def test_gaussian_score_shared_cov_batch():
    T, B = 10, 7
    C = _rand_spd(T, 6)
    Y = np.random.default_rng(7).standard_normal((B, T))
    mean = np.random.default_rng(8).standard_normal(T)
    got = np.asarray(linalg.gaussian_score_shared_cov(
        jnp.asarray(Y), jnp.asarray(mean), jnp.asarray(C)))
    for b in range(B):
        d = Y[b] - mean
        exp = -0.5 * d @ np.linalg.solve(C, d) - 0.5 * T * np.log(2 * np.pi)
        assert got[b] == pytest.approx(exp, rel=1e-6)


def test_logdet_spd():
    M = _rand_spd(20, 9, scale=1e-3)
    got = float(linalg.logdet_spd(jnp.asarray(M)))
    assert got == pytest.approx(np.linalg.slogdet(M)[1], rel=1e-8)


def test_inv_spd():
    M = _rand_spd(9, 10, scale=1e4)
    got = np.asarray(linalg.inv_spd(jnp.asarray(M)))
    np.testing.assert_allclose(got @ M, np.eye(9), atol=1e-8)


def test_mp64_spd_solve_matches_f64_on_ill_conditioned():
    """Mixed-precision f64 SPD solve (HDPGPC_MP64 path): f32 factor of
    the Jacobi-equilibrated matrix + f64 iterative refinement must
    reproduce the exact f64 solution well below the 1e-6 ELBO parity
    bar even when the matrix's raw condition number exceeds f32 range
    (scale-disparate diagonals — the regime GPI.log_det's magnitude
    rescaling exists for, GPI.py:1167-1198)."""
    import numpy as np

    from hdpgpc_tpu.ops.linalg import mp64_spd_solve

    rng = np.random.default_rng(0)
    T = 90
    Q, _ = np.linalg.qr(rng.standard_normal((T, T)))
    # intrinsic kappa 1e6 (the refit scan's realistic regime: posterior
    # covariances with noise floors), PLUS a 1e4 scale disparity that
    # equilibration must strip (raw kappa ~ 1e14)
    ev = np.logspace(-6, 0, T)
    A = (Q * ev) @ Q.T
    A = 0.5 * (A + A.T)
    s = np.logspace(-2, 2, T)
    A = A * s[:, None] * s[None, :]
    B = rng.standard_normal((T, 3))
    X = np.asarray(mp64_spd_solve(jnp.asarray(A, jnp.float64),
                                  jnp.asarray(B, jnp.float64)))
    ref = np.linalg.solve(A, B)
    rel = np.linalg.norm(X - ref) / np.linalg.norm(ref)
    assert rel < 1e-8, f"mixed-precision solve rel err {rel:.2e}"
    # f32-floor property: even on a pathological system (equilibrated
    # kappa ~ 1e10) the refined answer is never WORSE than the plain
    # f32 solve the validated float32 speed mode uses
    ev_bad = np.logspace(-10, 0, T)
    Abad = (Q * ev_bad) @ Q.T
    Abad = 0.5 * (Abad + Abad.T) + 1e-10 * np.eye(T)
    refb = np.linalg.solve(Abad, B)
    Xmp = np.asarray(mp64_spd_solve(jnp.asarray(Abad), jnp.asarray(B)))
    L32 = np.linalg.cholesky((Abad + 1e-7 * np.eye(T)).astype(np.float32))
    import scipy.linalg as sl
    Xf32 = sl.cho_solve((L32.astype(np.float64), True), B)
    err_mp = np.linalg.norm(Xmp - refb)
    err_f32 = np.linalg.norm(Xf32 - refb)
    assert err_mp <= err_f32 * 1.5, (err_mp, err_f32)

    # batched form (the refit scan uses (4, T, T))
    Ab = np.stack([A + np.eye(T), A + 2 * np.eye(T)])
    Bb = rng.standard_normal((2, T, T))
    Xb = np.asarray(mp64_spd_solve(jnp.asarray(Ab, jnp.float64),
                                   jnp.asarray(Bb, jnp.float64)))
    refb = np.linalg.solve(Ab, Bb)
    relb = np.linalg.norm(Xb - refb) / np.linalg.norm(refb)
    assert relb < 1e-10, f"batched rel err {relb:.2e}"
