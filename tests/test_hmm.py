import numpy as np
import jax.numpy as jnp
import pytest

from hdpgpc_tpu.ops import hmm


def _np_forward(start_log_pi, trans_log_pi, log_q):
    """Literal numpy re-statement of the reference forward
    (GPI_HDP.py:3563-3610) used as the oracle."""
    def safe_exp(x):
        e = np.exp(x - np.max(x, axis=1, keepdims=True))
        return np.nan_to_num(e, nan=1e-8)

    pi = np.exp(start_log_pi)
    pi = np.where(pi < 1e-10, pi + 1e-4, pi)
    PiT = safe_exp(trans_log_pi.T)
    PiT = np.where(PiT < 1e-6, PiT + 1e-4, PiT)
    q = safe_exp(log_q)
    T, K = q.shape
    f = np.zeros((T, K))
    marg = np.zeros(T)
    for t in range(T):
        f[t] = pi * q[0] if t == 0 else (PiT @ f[t - 1]) * q[t]
        marg[t] = f[t].sum()
        f[t] /= marg[t]
    return f, marg


def _np_backward(trans_log_pi, log_q):
    def safe_exp(x):
        e = np.exp(x - np.max(x, axis=1, keepdims=True))
        return np.nan_to_num(e, nan=1e-8)

    PiM = safe_exp(trans_log_pi)
    PiM = np.where(PiM < 1e-5, PiM + 1e-4, PiM)
    q = safe_exp(log_q)
    T, K = q.shape
    b = np.ones((T, K))
    for t in range(T - 2, -1, -1):
        b[t] = PiM @ (b[t + 1] * q[t + 1])
        b[t] /= b[t][:-1].sum()
    return b


def _rand_inputs(T=20, K=4, seed=0):
    rng = np.random.default_rng(seed)
    log_q = rng.standard_normal((T, K)) * 3
    A = rng.random((K, K)) + 0.1
    trans_log_pi = np.log(A / A.sum(1, keepdims=True))
    p = rng.random(K) + 0.1
    start_log_pi = np.log(p / p.sum())
    return start_log_pi, trans_log_pi, log_q


def test_forward_matches_reference_recursion():
    s, t, q = _rand_inputs()
    fe, me = _np_forward(s, t, q)
    fg, mg = hmm.forward(jnp.asarray(s), jnp.asarray(t), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(fg), fe, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(mg), me, rtol=1e-10)


def test_backward_matches_reference_recursion():
    s, t, q = _rand_inputs(seed=1)
    be = _np_backward(t, q)
    bg = hmm.backward(jnp.asarray(t), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(bg), be, rtol=1e-10)


def test_forward_assoc_matches_sequential_long():
    # the associative-scan forward must reproduce the sequential scan
    # on long sequences (the production path for N ~ thousands)
    s, t, q = _rand_inputs(T=1500, K=5, seed=7)
    fa, ma = hmm.forward(jnp.asarray(s), jnp.asarray(t), jnp.asarray(q))
    fs, ms = hmm.forward_seq(jnp.asarray(s), jnp.asarray(t), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fs), rtol=2e-8,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(ma), np.asarray(ms), rtol=2e-8)


def test_backward_assoc_matches_sequential_long():
    s, t, q = _rand_inputs(T=1500, K=5, seed=8)
    ba = hmm.backward(jnp.asarray(t), jnp.asarray(q))
    bs = hmm.backward_seq(jnp.asarray(t), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(ba), np.asarray(bs), rtol=2e-8,
                               atol=1e-12)


def test_forward_backward_single_step():
    s, t, q = _rand_inputs(T=1, K=4, seed=9)
    f, m = hmm.forward(jnp.asarray(s), jnp.asarray(t), jnp.asarray(q))
    assert f.shape == (1, 4) and m.shape == (1,)
    b = hmm.backward(jnp.asarray(t), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(b), np.ones((1, 4)))


def test_hard_resp_one_hot():
    x = jnp.asarray([[0.1, 0.9, 0.3], [2.0, -1.0, 0.5]])
    r = np.asarray(hmm.hard_resp(x))
    np.testing.assert_array_equal(r, [[0, 1, 0], [1, 0, 0]])


def test_hard_resp_pair_global_argmax():
    x = np.zeros((2, 3, 3))
    x[0, 1, 2] = 5.0
    x[1, 0, 0] = 2.0
    r = np.asarray(hmm.hard_resp_pair(jnp.asarray(x)))
    assert r[0, 1, 2] == 1.0 and r[0].sum() == 1.0
    assert r[1, 0, 0] == 1.0 and r[1].sum() == 1.0


def test_fb_hard_consistent_assignments():
    s, t, q = _rand_inputs(T=30, K=3, seed=2)
    resp, logresp, respPair, _ = hmm.fb_hard(
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(q))
    resp = np.asarray(resp)
    assert resp.shape == (30, 3)
    np.testing.assert_allclose(resp.sum(1), 1.0)
    # strong evidence should dominate the assignment most of the time
    agree = (resp.argmax(1) == np.asarray(q).argmax(1)).mean()
    assert agree > 0.7


def test_forward_incremental_matches_full():
    s, t, q = _rand_inputs(T=15, K=4, seed=3)
    qn = q - q.max(axis=1, keepdims=True)
    f_full, m_full = hmm.forward(jnp.asarray(s), jnp.asarray(t),
                                 jnp.asarray(qn))
    f_inc, m_inc = hmm.forward_incremental(
        f_full[-2], jnp.asarray(t), jnp.asarray(qn[-1]))
    np.testing.assert_allclose(np.asarray(f_inc), np.asarray(f_full[-1]),
                               rtol=1e-10)
    np.testing.assert_allclose(float(m_inc), float(m_full[-1]), rtol=1e-10)


def _np_baum_welch(log_alpha, log_beta, log_psi):
    """Independent numpy oracle for the reference's baum_welch math
    (GPI_HDP.py:3864-3931): pairwise logaddexp loops over t/i/j,
    exactly the reference's summation structure."""
    T, K = log_alpha.shape
    h = np.zeros((T, K))
    for t in range(T):
        den = -np.inf
        for i in range(K):
            den = np.logaddexp(den, log_alpha[t, i] + log_beta[t, i])
        h[t] = log_alpha[t] + log_beta[t] - den
    pi_ = h[0]
    trans = np.zeros((K, K))
    for i in range(K):
        den = -np.inf
        for t in range(T - 1):
            for j in range(K):
                den = np.logaddexp(den, log_psi[t][i, j])
        for j in range(K):
            num = -np.inf
            for t in range(T - 1):
                num = np.logaddexp(num, log_psi[t][i, j])
            trans[i, j] = -np.inf if num == -np.inf else num - den
        trans[i] = hmm.normalize_log_quirk(trans[i])
    return pi_, trans


def test_baum_welch_matches_reference_loops():
    s, t, q = _rand_inputs(T=25, K=4, seed=11)
    qn = q - q.max(axis=1, keepdims=True)
    alpha, _ = hmm.forward(jnp.asarray(s), jnp.asarray(t), jnp.asarray(qn))
    beta = hmm.backward(jnp.asarray(t), jnp.asarray(qn))
    la = np.log(np.asarray(alpha))
    lb = np.log(np.asarray(beta))
    lpsi = np.asarray(hmm.coupled_pair_log(alpha, beta, jnp.asarray(t),
                                           jnp.asarray(qn)))
    pi_o, tr_o = _np_baum_welch(la, lb, lpsi)
    pi_g, tr_g = hmm.baum_welch(jnp.asarray(la), jnp.asarray(lb),
                                jnp.asarray(lpsi))
    np.testing.assert_allclose(np.asarray(pi_g), pi_o, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(tr_g), tr_o, rtol=1e-10)
    # re-estimated rows are normalised distributions in the quirk's sense
    assert np.all(np.isfinite(np.exp(tr_g).sum(axis=1)))


def test_normalize_log_quirk_cases():
    # all -inf row -> uniform log(1e-50)
    out = hmm.normalize_log_quirk(np.array([-np.inf, -np.inf]))
    np.testing.assert_allclose(out, np.log(1e-50))
    # max == 0 row -> one-hot at argmax in log space
    out = hmm.normalize_log_quirk(np.array([0.0, -3.0, -1.0]))
    assert out[0] == 0.0 and np.all(out[1:] == np.log(1e-50))
    # generic row -> proper simplex of flipped-|x| weights
    x = np.array([-1.0, -2.0, -4.0])
    out = hmm.normalize_log_quirk(x)
    w = np.exp(out)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
    assert w[0] > w[1] > w[2]


def test_entropy_nonnegative():
    rng = np.random.default_rng(4)
    N, K = 25, 3
    resp = np.eye(K)[rng.integers(0, K, N)]
    respPair = np.zeros((N, K, K))
    idx = rng.integers(0, K, (N, 2))
    respPair[np.arange(N), idx[:, 0], idx[:, 1]] = 1.0
    H = float(hmm.entropy_terms(jnp.asarray(resp), jnp.asarray(respPair)))
    assert H >= -1e-8


def test_fb_hard_packed_idx_matches_dense():
    """The index-only FB fetch must reconstruct the exact dense one-hots
    (the offline sweep's _fb_hard path rides it)."""
    s, t, q = _rand_inputs(T=40, K=3, seed=7)
    K, Kp = 3, 4
    packed = np.full((40 + Kp + 1, Kp), -np.inf)
    packed[0, :K] = s
    packed[1:K + 1, :K] = t
    packed[Kp + 1:, :K] = q
    resp, _, respPair, _ = hmm.fb_hard_packed(jnp.asarray(packed))
    idx, pidx = hmm.fb_hard_packed_idx(jnp.asarray(packed))
    idx, pidx = np.asarray(idx), np.asarray(pidx)
    resp_r = np.zeros((40, K))
    resp_r[np.arange(40), np.minimum(idx, K - 1)] = 1.0
    pair_r = np.zeros((40, K, K))
    pair_r[np.arange(40), np.minimum(pidx // Kp, K - 1),
           np.minimum(pidx % Kp, K - 1)] = 1.0
    np.testing.assert_array_equal(resp_r, np.asarray(resp)[:, :K])
    np.testing.assert_array_equal(pair_r, np.asarray(respPair)[:, :K, :K])
