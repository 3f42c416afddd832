"""Per-cluster GP-LDS emission model as fused compiled scans.

This replaces the reference's GPI_model object (GPI_model.py:16-1278):
lists-of-tensors histories, per-sample Python loops and deepcopies
become ONE jitted program per cluster refit:

    refit = forward lax.scan (Kalman step + tail-pair RTS smoothing +
                              1-step MNIW conjugate update per member)
          -> reverse lax.scan (full RTS smoother)
          -> fused emission scoring (compute_sq_err_all parity)
          -> fused latent scoring  (compute_q_lat_all parity)

The O(N * T^2) history arrays live only inside the jit (XLA
transients); the state carried between calls is a compact fixed-shape
:class:`ClusterState` holding exactly what the algorithm reads later
(last three smoothed / last two filtered states, first smoothed state,
current + previous LDS params, MNIW posteriors) — a superset of what
the reference's own ``keep_last_all`` compaction keeps
(GPI_HDP.py:460-466).

Reference semantics preserved (see SURVEY.md §2 quirks):

* scores omit the log-determinant (GPI_model.py:92-113, :250-286);
* members score against their own post-inclusion filtered state;
  non-members score against the state *before* the preceding member's
  inclusion (compute_sq_err_all index arithmetic, GPI_model.py:494-533);
* the first member's score covariance is inflated by
  1e-2 * mean(diag(Sigma0)) (GPI_model.py:272, :528-529);
* 1-step MNIW updates zero the state covariances (GPI_model.py:996-998)
  and anneal scales by +Gamma0/N^2, +Sigma0/N^2 (GPI_model.py:1083-1091);
* the first member performs no MNIW update but still appends params, so
  Gamma -> 2*Gamma0, Sigma -> 2*Sigma0 after sample one;
* parameters freeze once N >= estimation_limit (GPI_model.py:974,1092);
* the first member's latent score reuses its own smoothed state with
  the LATEST params (GPI_model.py:288-297);
* the offline pass pair-smooths before each MNIW update
  (GPI_model.full_pass_weighted, :397-399) while the online commit does
  NOT (GPI_HDP.py:2185-2197 calls bayesian_new_params directly) —
  controlled here by ``pair_smooth``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hdpgpc_tpu.models import mniw as mniw_ops
from hdpgpc_tpu.models.mniw import MNIW
from hdpgpc_tpu.ops import linalg
from hdpgpc_tpu.ops.linalg import precise_jit
from hdpgpc_tpu.ops.kalman import LDSParams, kalman_step, rts_pair
from hdpgpc_tpu.ops.kernels import KernelParams, gram, gram_tpu

LOG2PI = linalg.LOG2PI


class ClusterState(NamedTuple):
    """Compact per-(cluster, lead) state summary (all fixed shapes)."""

    theta: KernelParams          # fitted kernel hyperparameters
    K0: jax.Array                # (T, T) kernel gram on the basis (no noise)
    A_def: jax.Array             # (T, T) default LDS params (post-kernel-fit)
    Gamma_def: jax.Array
    C_def: jax.Array
    Sigma_def: jax.Array
    n: jax.Array                 # int32 member count
    f_last: jax.Array            # (T, 1) filtered mean, last member
    P_last: jax.Array            # (T, T)
    f_prev: jax.Array            # filtered, second-to-last member
    P_prev: jax.Array
    f_sm_last: jax.Array         # smoothed: last three members + first
    P_sm_last: jax.Array
    f_sm_prev: jax.Array
    P_sm_prev: jax.Array
    f_sm_prev2: jax.Array
    P_sm_prev2: jax.Array
    f_sm_first: jax.Array
    P_sm_first: jax.Array
    A: jax.Array                 # (T, T) current LDS params
    Gamma: jax.Array
    C: jax.Array
    Sigma: jax.Array
    A_prev: jax.Array            # params after the second-to-last member
    Gamma_prev: jax.Array
    mniw_int: MNIW               # internal (A, Gamma) posterior
    mniw_obs: MNIW               # observation (C, Sigma) posterior


def init_cluster_state(x_basis: jax.Array, theta: KernelParams,
                       ini_gamma, ini_sigma, free_deg: float,
                       dtype=jnp.float64) -> ClusterState:
    """Fresh cluster with GPR_dynamic initial conditions
    (GPI_model.py:191-205, :115-175)."""
    T = x_basis.shape[0]
    eye = jnp.eye(T, dtype=dtype)
    theta = KernelParams(*[jnp.asarray(v, dtype) for v in theta])
    # gram_tpu self-gates: Pallas kernel for T >= 128 native-dtype on
    # TPU (the long-series / ocean-spectra configs), XLA otherwise
    K0 = gram_tpu(theta, x_basis.astype(dtype),
                  include_noise=False).astype(dtype)
    A0, C0 = eye, eye
    G0 = jnp.asarray(ini_gamma, dtype) * eye
    S0 = jnp.asarray(ini_sigma, dtype) * eye
    z = jnp.zeros((T, 1), dtype=dtype)
    return ClusterState(
        theta=theta, K0=K0, A_def=A0, Gamma_def=G0, C_def=C0, Sigma_def=S0,
        n=jnp.asarray(0, jnp.int32),
        f_last=z, P_last=K0, f_prev=z, P_prev=K0,
        f_sm_last=z, P_sm_last=K0, f_sm_prev=z, P_sm_prev=K0,
        f_sm_prev2=z, P_sm_prev2=K0, f_sm_first=z, P_sm_first=K0,
        A=A0, Gamma=G0, C=C0, Sigma=S0, A_prev=A0, Gamma_prev=G0,
        mniw_int=mniw_ops.make_mniw(A0, free_deg, G0),
        mniw_obs=mniw_ops.make_mniw(C0, free_deg, S0),
    )


@jax.jit
def reinit_cluster_state(st: ClusterState, free_deg: float) -> ClusterState:
    """reinit_GP + reinit_LDS(save_last=False): reset the dynamics to
    the (post-kernel-fit) defaults, keep the fitted kernel
    (GPI_model.py:408-457). Plays the role of the reference's
    deepcopy-then-reinit idiom before every refit. Jitted: ONE dispatch
    instead of ~20 eager ops on the latency-bound orchestration path."""
    z = jnp.zeros_like(st.f_last)
    eye = jnp.eye(st.A_def.shape[0], dtype=st.A_def.dtype)
    return st._replace(
        n=jnp.asarray(0, jnp.int32),
        f_last=z, P_last=st.K0, f_prev=z, P_prev=st.K0,
        f_sm_last=z, P_sm_last=st.K0, f_sm_prev=z, P_sm_prev=st.K0,
        f_sm_prev2=z, P_sm_prev2=st.K0, f_sm_first=z, P_sm_first=st.K0,
        A=st.A_def, Gamma=st.Gamma_def, C=st.C_def, Sigma=st.Sigma_def,
        A_prev=st.A_def, Gamma_prev=st.Gamma_def,
        mniw_int=MNIW(st.A_def, eye, jnp.asarray(free_deg), st.Gamma_def),
        mniw_obs=MNIW(st.C_def, eye, jnp.asarray(free_deg), st.Sigma_def),
    )


def apply_kernel_fit(st: ClusterState, x_basis, theta: KernelParams
                     ) -> ClusterState:
    """Post-kernel-fit state rewrite (GPI_model.fit_kernel_params,
    GPI_model.py:207-241): Sigma <- ini_sigma*I — NOTE the reference
    discards the fitted noise here (``noise = alph_`` overwrites it at
    GPI_model.py:215-216; the fitted noise survives only inside the
    kernel, i.e. in the first-step innovation covariance) — also as the
    new default; Gamma <- mean(diag(Gamma))*I, A = C = I, zero mean,
    cov = new gram; MNIW anchors re-set."""
    T = st.A.shape[0]
    dtype = st.A.dtype
    eye = jnp.eye(T, dtype=dtype)
    theta = KernelParams(*[jnp.asarray(v, dtype) for v in theta])
    K0 = gram_tpu(theta, jnp.asarray(x_basis).astype(dtype),
                  include_noise=False).astype(dtype)
    S = st.Sigma[0, 0] * eye
    G = jnp.mean(jnp.diag(st.Gamma)) * eye
    z = jnp.zeros((T, 1), dtype=dtype)
    return st._replace(
        theta=theta, K0=K0,
        Sigma_def=S, A=eye, C=eye, Gamma=G, Sigma=S, A_prev=eye,
        Gamma_prev=G,
        f_last=z, P_last=K0, f_prev=z, P_prev=K0,
        f_sm_last=z, P_sm_last=K0, f_sm_prev=z, P_sm_prev=K0,
        f_sm_prev2=z, P_sm_prev2=K0, f_sm_first=z, P_sm_first=K0,
        mniw_int=st.mniw_int._replace(mean=eye, scale=G),
        mniw_obs=st.mniw_obs._replace(mean=eye, scale=S),
    )


def _rel_jit(M: jax.Array, scale: float) -> jax.Array:
    """Relative diagonal jitter (batched): scale * mean|diag|."""
    d = jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1)),
                             axis=-1), jnp.finfo(M.dtype).eps)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return M + scale * d[..., None, None] * eye


def _tail_filter(Y_t, member_t, f_H, P_H, A, G, C, S):
    """Fixed-parameter parallel Kalman filter over the frozen tail.

    Past the estimation limit the LDS parameters are frozen
    (GPI_model.py:974,1092), so the remaining member updates are a
    standard Kalman filter — associative-scannable in O(log N) depth
    (Sarkka & Garcia-Fernandez 2021). All steady steps share
    (A_e, C_e, J) elements; only b and eta depend on y, so they are two
    batched matmuls. Padding slots compose as identity elements.

    Y_t: (Bt, T) gathered tail slots; member_t: (Bt,) bool;
    (f_H, P_H): head-end filtered state. Returns filtered means
    (Bt, T, 1) and covariances (Bt, T, T); padding slots carry the last
    member's state forward (identity composition).
    """
    Bt, T = Y_t.shape
    dtype = Y_t.dtype
    eye = jnp.eye(T, dtype=dtype)
    f32 = dtype == jnp.float32
    jit = (lambda M: _rel_jit(M, 1e-5)) if f32 else (lambda M: M)

    # ---- shared steady-state element pieces ----
    S_in = jit(0.5 * ((C @ G @ C.T + S) + (C @ G @ C.T + S).T))
    L_S = jnp.linalg.cholesky(S_in)
    K = jax.scipy.linalg.cho_solve((L_S, True), (G @ C.T).T).T  # G C' S^-1
    IKH = eye - K @ C
    A_e = IKH @ A
    C_e = IKH @ G
    Sinv_H = jax.scipy.linalg.cho_solve((L_S, True), C)         # S^-1 C
    J_sh = A.T @ C.T @ Sinv_H @ A
    Vs = (Sinv_H @ A).T                                          # A'C'S^-1
    b_all = Y_t @ K.T                                            # (Bt, T)
    eta_all = Y_t @ Vs.T

    # ---- first tail element: exact update from the head-end prior ----
    m0 = A @ f_H
    P0 = A @ P_H @ A.T + G
    S0 = jit(0.5 * ((C @ P0 @ C.T + S) + (C @ P0 @ C.T + S).T))
    L0 = jnp.linalg.cholesky(S0)
    K0 = jax.scipy.linalg.cho_solve((L0, True), (P0 @ C.T).T).T
    b0 = m0 + K0 @ (Y_t[0][:, None] - C @ m0)
    C0 = P0 - K0 @ S0 @ K0.T

    mem = member_t[:, None, None]
    z_T1 = jnp.zeros((T, 1), dtype=dtype)
    A_el = jnp.where(mem, jnp.broadcast_to(A_e, (Bt, T, T)), eye)
    A_el = A_el.at[0].set(jnp.where(member_t[0], jnp.zeros((T, T), dtype),
                                    eye))
    b_el = jnp.where(mem, b_all[..., None], z_T1)
    b_el = b_el.at[0].set(jnp.where(member_t[0], b0, z_T1))
    C_el = jnp.where(mem, jnp.broadcast_to(C_e, (Bt, T, T)),
                     jnp.zeros((T, T), dtype))
    C_el = C_el.at[0].set(jnp.where(member_t[0], C0,
                                    jnp.zeros((T, T), dtype)))
    eta_el = jnp.where(mem, eta_all[..., None], z_T1)
    eta_el = eta_el.at[0].set(z_T1)
    J_el = jnp.where(mem, jnp.broadcast_to(J_sh, (Bt, T, T)),
                     jnp.zeros((T, T), dtype))
    J_el = J_el.at[0].set(jnp.zeros((T, T), dtype))

    def combine(el, er):
        A1, b1, C1, eta1, J1 = el
        A2, b2, C2, eta2, J2 = er
        I_ = jnp.eye(T, dtype=dtype)
        I_C1J2 = I_ + C1 @ J2
        I_J2C1 = I_ + J2 @ C1
        # linalg.solve_general: TPU implements LU only for f32/c64, so
        # the f64 exact mode routes through QR here (same crash class
        # as ops/kalman._combine)
        M = linalg.solve_general(I_C1J2.swapaxes(-1, -2),
                                 A2.swapaxes(-1, -2)).swapaxes(-1, -2)
        Nt = linalg.solve_general(I_J2C1.swapaxes(-1, -2), A1)
        return (M @ A1,
                M @ (b1 + C1 @ eta2) + b2,
                M @ C1 @ A2.swapaxes(-1, -2) + C2,
                Nt.swapaxes(-1, -2) @ (eta2 - J2 @ b1) + eta1,
                Nt.swapaxes(-1, -2) @ J2 @ A1 + J1)

    _, b, Cc, _, _ = jax.lax.associative_scan(
        combine, (A_el, b_el, C_el, eta_el, J_el))
    return b, 0.5 * (Cc + Cc.swapaxes(-1, -2))


def _tail_steady(Y_t, member_t, f_H, P_H, A, G, C, S, anchor,
                 warm: int = 64):
    """float32 speed-mode tail: warm-up + steady-state (LTI) Kalman.

    With frozen parameters the filter's covariance recursion converges
    to its Riccati fixed point within a few dozen steps; past that the
    filter is the LTI recursion f' = (I-KC)A f + K y whose associative
    composition is matmul-only — each combine level is ONE batched
    (T, T) matmul instead of the LU solves of the exact parallel filter
    (those measure ~30 ms/level on v5e vs ~0.1 ms for the matmul).

    Exactness: slots [0, warm) are sequential (exact); slots >= warm
    use the converged gain (error below f32 rounding once P has
    converged). The smoothed covariance depends only on the distance to
    the anchor under a constant gain, so it is a table gather; the
    warm-up region is re-smoothed exactly by a short sequential pass.

    Returns (f_filt, P_filt, f_sm, P_sm) for the Bt tail slots.
    """
    Bt, T = Y_t.shape
    dtype = Y_t.dtype
    eye = jnp.eye(T, dtype=dtype)
    W = min(warm, Bt)

    def jit32(M):
        return _rel_jit(0.5 * (M + M.swapaxes(-1, -2)), 1e-5)

    # ---- sequential warm-up (exact fixed-param steps) ----
    def wstep(carry, inp):
        f, P = carry
        y, mflag = inp
        m = A @ f
        P_pred = A @ P @ A.T + G
        S_in = jit32(C @ P_pred @ C.T + S)
        L = jnp.linalg.cholesky(S_in)
        K = jax.scipy.linalg.cho_solve((L, True), (P_pred @ C.T).T).T
        f_up = m + K @ (y[:, None] - C @ m)
        IKC = eye - K @ C
        P_up = IKC @ P_pred @ IKC.T + K @ S @ K.T
        f_n = jnp.where(mflag, f_up, f)
        P_n = jnp.where(mflag, P_up, P)
        return (f_n, P_n), (f_n, P_n)

    (f_W, P_W), (f_warm, P_warm) = jax.lax.scan(
        wstep, (f_H, P_H), (Y_t[:W], member_t[:W]))

    # ---- converged gain / steady covariances ----
    P_pred_ss = A @ P_W @ A.T + G
    S_ss = jit32(C @ P_pred_ss @ C.T + S)
    L_ss = jnp.linalg.cholesky(S_ss)
    K_ss = jax.scipy.linalg.cho_solve((L_ss, True), (P_pred_ss @ C.T).T).T
    IKC = eye - K_ss @ C
    P_ss = IKC @ P_pred_ss @ IKC.T + K_ss @ S @ K_ss.T
    M_mem = IKC @ A

    # ---- LTI associative scan over slots [W, Bt) ----
    Br = Bt - W
    if Br > 0:
        memr = member_t[W:]
        Ms = jnp.where(memr[:, None, None],
                       jnp.broadcast_to(M_mem, (Br, T, T)), eye)
        bs = jnp.where(memr[:, None], Y_t[W:] @ K_ss.T,
                       jnp.zeros((Br, T), dtype))[..., None]
        Mc, bc = jax.lax.associative_scan(
            lambda l, r: (r[0] @ l[0], r[0] @ l[1] + r[1]), (Ms, bs))
        f_rest = Mc @ f_W + bc
        f_filt = jnp.concatenate([f_warm, f_rest])
        P_filt = jnp.concatenate(
            [P_warm, jnp.broadcast_to(P_ss, (Br, T, T))])
    else:
        f_filt, P_filt = f_warm, P_warm

    # ---- smoothed means: reverse affine scan with anchor cut ----
    P_pred2 = jit32(A @ P_ss @ A.T + G)
    L2 = jnp.linalg.cholesky(P_pred2)
    E = jax.scipy.linalg.cho_solve((L2, True), (P_ss @ A.T).T).T
    anc = anchor[:, None, None]
    Ems = jnp.where(anc, jnp.zeros((T, T), dtype),
                    jnp.broadcast_to(E, (Bt, T, T)))
    vs = jnp.where(anc, f_filt, f_filt - E @ (A @ f_filt))
    _, f_sm = jax.lax.associative_scan(
        lambda a, b: (b[0] @ a[0], b[0] @ a[1] + b[1]), (Ems, vs),
        reverse=True)

    # ---- smoothed covariance: distance-to-anchor table ----
    W2 = 48
    def tstep(P_sm_d, _):
        P_n = P_ss + E @ (P_sm_d - P_pred2) @ E.T
        return P_n, P_n
    _, table_rest = jax.lax.scan(tstep, P_ss, None, length=W2 - 1)
    table = jnp.concatenate([P_ss[None], table_rest])
    # distance of slot i from the anchor slot (anchor = first True)
    anchor_pos = jnp.argmax(anchor)          # first anchored slot
    d = jnp.clip(anchor_pos - jnp.arange(Bt), 0, W2 - 1)
    P_sm = table[d]

    # ---- exact re-smooth of the warm-up region ----
    # started0: a member run extends beyond the warm-up (no anchor yet)
    started0 = jnp.logical_not(jnp.any(anchor[:W]))
    f_after = f_sm[W] if W < Bt else f_W
    P_after = P_sm[W] if W < Bt else P_W
    init = (jnp.where(started0, f_after, f_W),
            jnp.where(started0, P_after, P_W),
            started0)

    def bstep(carry, inp):
        f_next, P_next, started = carry
        mflag, f_t, P_t = inp
        f_smp, P_smp = rts_pair(f_t, P_t, f_next, P_next, A, G)
        f_s = jnp.where(started, f_smp, f_t)
        P_s = jnp.where(started, P_smp, P_t)
        return (jnp.where(mflag, f_s, f_next),
                jnp.where(mflag, P_s, P_next),
                started | mflag), (f_s, P_s)

    _, (f_sm_w, P_sm_w) = jax.lax.scan(
        bstep, init, (member_t[:W], f_warm, P_warm), reverse=True)
    f_sm = jnp.concatenate([f_sm_w, f_sm[W:]])
    P_sm = jnp.concatenate([P_sm_w, P_sm[W:]])
    return f_filt, P_filt, f_sm, P_sm


def _tail_smooth(f_filt_t, P_filt_t, A, G, anchor):
    """Fixed-parameter parallel RTS smoother over the frozen tail.

    ``anchor``: (Bt,) bool — True at the LAST member slot and at every
    padding slot after it; the anchor element (E=0, g=f, L=P) cuts the
    recursion so smoothed == filtered there, exactly like the
    sequential backward pass's ``started`` flag.
    """
    Bt, T = f_filt_t.shape[0], f_filt_t.shape[1]
    dtype = f_filt_t.dtype
    f32 = dtype == jnp.float32
    P_pred = A @ P_filt_t @ A.T + G                        # (Bt, T, T)
    P_sym = 0.5 * (P_pred + P_pred.swapaxes(-1, -2))
    P_sym = _rel_jit(P_sym, 1e-5 if f32 else 1e-12)
    L = jnp.linalg.cholesky(P_sym)
    # E = P A' P_pred^-1  (batched right-solve)
    E = jax.scipy.linalg.cho_solve(
        (L, True), (P_filt_t @ A.T).swapaxes(-1, -2)).swapaxes(-1, -2)
    g = f_filt_t - E @ (A @ f_filt_t)
    Lm = P_filt_t - E @ P_pred @ E.swapaxes(-1, -2)
    anc = anchor[:, None, None]
    E = jnp.where(anc, jnp.zeros_like(E), E)
    g = jnp.where(anc, f_filt_t, g)
    Lm = jnp.where(anc, P_filt_t, Lm)

    def combine_rev(a, b):
        E_a, g_a, L_a = a
        E_b, g_b, L_b = b
        return (E_b @ E_a, E_b @ g_a + g_b,
                E_b @ L_a @ E_b.swapaxes(-1, -2) + L_b)

    gs, Ls = jax.lax.associative_scan(
        combine_rev, (E, g, Lm), reverse=True)[1:]
    return gs, 0.5 * (Ls + Ls.swapaxes(-1, -2))


def make_forward_step(T, limit, annealing, dynamic, update_params,
                      pair_smooth, full_backward):
    """One member-append step of the refit scan (Kalman update +
    tail-pair smoothing + 1-step MNIW conjugate update), shared between
    the batch refit programs and the fused online streaming engine.

    ``carry`` = (f, P, f_prevF, P_prevF, A, G, C, S, mniw2, n, noise0,
    G0diag, S0diag) with mniw2 the internal/observation posteriors
    stacked on a leading dim of 2; ``inp`` = (y (T,), h in {0,1}).
    """
    from hdpgpc_tpu.ops.pallas.chol_solve import (fused_spd_solve,
                                                  pallas_solves_enabled)
    # Probe at BUILD time (clean trace context): probing lazily inside
    # the scan body would stage the probe's device computation into the
    # outer trace and permanently disable the kernel.
    pallas_ok = T <= 128 and pallas_solves_enabled()
    # f64 mixed-precision solves (HDPGPC_MP64=1, TPU only; =force for
    # CPU tests): build-time gate like pallas_ok.
    mp64_ok = linalg.mp64_active()

    def forward_step(carry, inp):
        (f, P, f_prevF, P_prevF, A, G, C, S, mniw, n,
         noise0, G0diag, S0diag) = carry
        # mniw: stacked internal/observation posteriors, leading dim 2.
        y, h = inp
        dtype = f.dtype
        eye = jnp.eye(T, dtype=dtype)
        member = h > 0.99
        first = n == 0
        N_new = n + 1
        N_newf = N_new.astype(dtype)

        # --- Kalman update + tail-pair smoothing with a SHARED predicted
        # covariance and one batched Cholesky for {S_innov, P_pred}
        # (equivalent to GPI.py:134-150 + backward_notrange; the RTS pair
        # uses the same P_pred = A P A' + Gamma).
        m = A @ f
        P_pred_dyn = A @ P @ A.T + G
        P_pred_kal = jnp.where(first, P, P_pred_dyn)
        y_pred = jnp.where(first, jnp.zeros_like(m), C @ m)
        R = jnp.where(first, noise0 * eye, S)
        S_innov = C @ P_pred_kal @ C.T + R
        stacked = jnp.stack([
            0.5 * (S_innov + S_innov.T), 0.5 * (P_pred_dyn + P_pred_dyn.T)])
        if dtype == jnp.float32:
            # float32 speed mode: TPU cholesky NaNs on near-singular
            # inputs that CPU/f64 tolerate; add a relative jitter.
            dmean = jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(
                stacked, axis1=1, axis2=2)), axis=1), 1e-30)
            stacked = stacked + (1e-5 * dmean)[:, None, None] * eye
        rhs_list = [C @ P_pred_kal, A @ P]
        if update_params and dynamic:
            # --- fold the MNIW row-covariance inversions into the SAME
            # batched factor+solve: V_int/V_obs are carry state (no data
            # dependency on this step's Kalman result), so one (4, T, T)
            # Cholesky group replaces two separate chol+solve kernel
            # chains — the scan step is launch-latency-bound, not FLOPs-
            # bound. Jitters are per-matrix exactly as the split form.
            hp = jnp.float64 if dtype == jnp.float64 else jnp.float32
            Vm = mniw.row_cov.astype(hp)                   # (2, T, T)
            eye_h = eye.astype(hp)
            jit2 = 1e-2 * jnp.maximum(
                jnp.mean(jnp.abs(jnp.diagonal(mniw.scale, axis1=1, axis2=2)),
                         axis=1), jnp.finfo(dtype).eps).astype(hp)  # (2,)
            if dtype == jnp.float32:
                vj = jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(
                    Vm, axis1=1, axis2=2)), axis=1), 1e-30)
                jit2 = jit2 + 1e-5 * vj
            V_sym = (0.5 * (Vm + Vm.swapaxes(-1, -2))
                     + jit2[:, None, None] * eye_h)
            stacked = jnp.concatenate([stacked, V_sym.astype(dtype)])
            rhs_list += [eye, eye]
        use_pallas = dtype == jnp.float32 and pallas_ok
        rhs = jnp.stack(rhs_list)
        if use_pallas:
            # fused Pallas factor+solve: one kernel for all SPD systems
            # (S_innov^{-1} C P_pred_kal -> K', P_pred^{-1} A P -> J',
            # V_int^{-1}, V_obs^{-1})
            X = fused_spd_solve(stacked, rhs)
            K = X[0].T
        elif dtype == jnp.float64 and mp64_ok:
            # f64-on-TPU speed path (HDPGPC_MP64=1): the emulated f64
            # batched Cholesky is the scan step's dominant cost; the
            # equilibrated f32 factor + f64 iterative refinement
            # reproduces the f64 solves to ~1e-12 rel (ops/linalg).
            X = linalg.mp64_spd_solve(stacked, rhs)
            K = X[0].T
        else:
            facs = jnp.linalg.cholesky(stacked)
            X = jax.scipy.linalg.cho_solve((facs, True), rhs)
            # K = P_pred C' S^{-1}
            K = X[0].T
        f_up = m + K @ (y[:, None] - y_pred)
        IKC = eye - K @ C
        P_up = IKC @ P_pred_kal @ IKC.T + K @ R @ K.T

        if pair_smooth:
            # J = P A' P_pred^{-1}
            J = X[1].T
            f_smp_up = f + J @ (f_up - A @ f)
            P_smp_up = P + J @ (P_up - P_pred_dyn) @ J.T
            has_pair = n >= 1
            f_smp = jnp.where(has_pair, f_smp_up, f)
            P_smp = jnp.where(has_pair, P_smp_up, P)
        else:
            f_smp, P_smp = f, P
        f_reg = f_smp if pair_smooth else f

        if update_params and dynamic:
            # --- both MNIW 1-step updates in ONE batched pass (leading
            # dim 2 = {internal, observation}); math of
            # GPI_model.matrix_normal_inv_wishart.posterior with zeroed
            # covariances (GPI_model.py:1300-1344, n_k == 1 form).
            # The row-covariance recursion (rank-1 accumulation + tiny
            # inverse) is intrinsically ill-conditioned, so its solves
            # run in an f64 island even in float32 speed mode.
            Y1 = jnp.stack([f_up, y[:, None]]).astype(hp)  # (2, T, 1)
            Y2 = jnp.stack([f_reg, f_up]).astype(hp)
            # V_int^{-1}/V_obs^{-1} from the merged factor+solve above
            V_inv = X[2:4].astype(hp)
            S__h = Y2 @ Y2.swapaxes(-1, -2) + V_inv
            S_x = Y1 @ Y2.swapaxes(-1, -2) + mniw.mean.astype(hp) @ V_inv
            S__sym = 0.5 * (S__h + S__h.swapaxes(-1, -2))
            if dtype == jnp.float32:
                sj = jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(
                    S__sym, axis1=1, axis2=2)), axis=1), 1e-30)
                S__sym = S__sym + (1e-9 * sj)[:, None, None] * eye_h
            if dtype == jnp.float64 and mp64_ok:
                # second emulated-f64 Cholesky of the step; same
                # mixed-precision route (equilibration handles the
                # scale growth of the S__ accumulation)
                part = linalg.mp64_spd_solve(
                    S__sym + 1e-8 * eye_h,
                    S_x.swapaxes(-1, -2)).swapaxes(-1, -2).astype(dtype)
            else:
                L_S2 = jnp.linalg.cholesky(S__sym + 1e-8 * eye_h)
                part = jax.scipy.linalg.cho_solve(
                    (L_S2, True), S_x.swapaxes(-1, -2)).swapaxes(-1, -2) \
                    .astype(dtype)
            S__ = S__h                     # row_cov stays f64 in the carry
            Y1 = Y1.astype(dtype)
            Y2 = Y2.astype(dtype)
            n0 = mniw.n0                                   # (2,)
            new_n0 = n0 + 1.0
            c0 = ((n0 - 2.0) / (new_n0 - 2.0))[:, None, None]
            c1 = (1.0 / (new_n0 - 2.0))[:, None, None]
            mean_up = c0 * mniw.mean + c1 * part
            e = Y1 - Y2
            scale_up = c0 * mniw.scale + c1 * (e @ e.swapaxes(-1, -2))
            mniw_up = MNIW(mean_up, S__, new_n0, scale_up)

            do_mniw = member & (n >= 1) & (N_newf < limit)
            mniw_new = jax.tree.map(
                lambda a, b: jnp.where(do_mniw, a, b), mniw_up, mniw)

            post_scale = mniw_new.scale * (
                mniw_new.n0 / (mniw_new.n0 - 2.0))[:, None, None]
            GS_base = jnp.where(n >= 1, post_scale,
                                jnp.stack([G, S]))
            if annealing:
                anneal = jnp.stack([G0diag, S0diag])[:, None, None] \
                    / N_newf**2 * eye
                GS_base = GS_base + anneal
            do_append = member & (N_newf < limit)
            A_out = jnp.where(do_append, mniw_new.mean[0], A)
            C_out = jnp.where(do_append, mniw_new.mean[1], C)
            G_out = jnp.where(do_append, GS_base[0], G)
            S_out = jnp.where(do_append, GS_base[1], S)
            mniw_out = jax.tree.map(lambda a, b: jnp.where(member, a, b),
                                    mniw_new, mniw)
        else:
            A_out, G_out, C_out, S_out = A, G, C, S
            mniw_out = mniw

        f_next = jnp.where(member, f_up, f)
        P_next = jnp.where(member, P_up, P)
        f_prevF_next = jnp.where(member, f, f_prevF)
        P_prevF_next = jnp.where(member, P, P_prevF)
        n_out = jnp.where(member, N_new, n)

        score_mean = (C_out @ f_next)[:, 0]

        new_carry = (f_next, P_next, f_prevF_next, P_prevF_next,
                     A_out, G_out, C_out, S_out, mniw_out,
                     n_out, noise0, G0diag, S0diag)
        if not full_backward:
            # online builds need the previous-state estimates for the
            # compact-summary gather points: pair-smoothed when
            # pair_smooth, else the UNTOUCHED pre-update carry (the
            # reference's no-pair-smoothing commit leaves f_star_sm of
            # earlier members as-is, GPI_HDP.py:2185-2197 — emitting the
            # member's own filtered state here corrupted f_sm_prev /
            # f_sm_first on the online commit chain)
            emit = (member, f_next, P_next, A_out, G_out, S_out,
                    score_mean, f_smp, P_smp)
        else:
            emit = (member, f_next, P_next, A_out, G_out, S_out,
                    score_mean)
        return new_carry, emit

    return forward_step


class RefitResult(NamedTuple):
    q: jax.Array        # (N,) emission scores (compute_sq_err_all parity)
    q_lat: jax.Array    # (N,) latent scores (compute_q_lat_all parity)
    snr: jax.Array      # (N,) SNR of each beat vs the closest smoothed
    #                     state (GPI_HDP.compute_snr, GPI_HDP.py:732-748)
    state: ClusterState
    lds: jax.Array      # scalar lds_param_elbo of the refit state (0.0
    #                     unless build_refit(free_deg=...) was given) —
    #                     rides the same packed fetch so compute_q_elbo
    #                     needs no separate device round-trip


def build_refit(T: int, est_limit: Optional[int] = None,
                annealing: bool = True, dynamic: bool = True,
                update_params: bool = True, pair_smooth: bool = True,
                full_backward: bool = True, bucket: Optional[int] = None,
                emit_smoothed: bool = False, hybrid: bool = True,
                free_deg: Optional[float] = None):
    """Build the jitted refit program for (static) beat length T.

    Returns ``refit(Y, resp, state) -> RefitResult`` with Y: (N, T) and
    resp: (N,) hard responsibilities in {0, 1}.  With
    ``emit_smoothed=True`` it returns ``(RefitResult, (Y_s, f_sm, P_sm,
    m_s))`` — the member-gathered beats and smoothed sequences in slot
    order (the ML-EM path consumes these; GPI.new_params_LDS operates on
    smoothed moments, GPI.py:302-455).

    Variants (all static):
    * ``update_params=False``: the q_simple path — include members with
      NO Bayesian update, score everything (GPI_HDP.py:1284-1297).
    * ``pair_smooth=False``: online-commit semantics (no backwards_pair
      before the MNIW update, GPI_HDP.py:2185-2197).
    * ``full_backward=False``: skip the final full RTS pass (online
      steps never run it).

    Scoring outputs are parity-exact only for fresh-state refits
    (state.n == 0); continuation calls (online appends) use the state
    summary and tail primitives instead.

    ``bucket``: static scan length over GATHERED members (members are
    argsort-gathered to the front in time order, padding slots at the
    tail are pass-throughs). The Kalman/MNIW/RTS scans then cost
    O(bucket) instead of O(N) — a birth-seed scoring pass over one
    member runs a 1-ish-length scan rather than an N-length one. The
    caller must guarantee bucket >= number of members. bucket=None
    scans over all N.
    """
    limit = jnp.inf if est_limit is None else float(est_limit)
    # Hybrid head/tail split: past the estimation limit every parameter
    # update is a no-op (N_new < limit fails), so slots >= est_limit are
    # fixed-parameter filtering — swapped for the associative-scan
    # filter/smoother (O(log N) depth instead of O(N) sequential steps).
    E_int = None if est_limit is None else max(int(est_limit), 1)
    hybrid_ok = (hybrid and E_int is not None and dynamic and update_params
                 and full_backward)

    forward_step = make_forward_step(T, limit, annealing, dynamic,
                                     update_params, pair_smooth,
                                     full_backward)

    def backward_step(carry, inp):
        f_next_sm, P_next_sm, started = carry
        member, f_t, P_t, A_t, G_t = inp
        f_sm_pair, P_sm_pair = rts_pair(f_t, P_t, f_next_sm, P_next_sm,
                                        A_t, G_t)
        f_sm = jnp.where(started, f_sm_pair, f_t)
        P_sm = jnp.where(started, P_sm_pair, P_t)
        new_carry = (jnp.where(member, f_sm, f_next_sm),
                     jnp.where(member, P_sm, P_next_sm),
                     started | member)
        return new_carry, (f_sm, P_sm)

    def _refit_core(Y, resp, state: ClusterState):
        N = Y.shape[0]
        dtype = Y.dtype
        n_before = state.n
        noise0 = state.theta.noise
        G0diag = jnp.mean(jnp.diag(state.Gamma_def))
        S0diag = jnp.mean(jnp.diag(state.Sigma_def))

        member_full = resp > 0.99
        B = N if bucket is None else min(bucket, N)
        # gather members to the front, preserving time order
        perm = jnp.argsort(jnp.logical_not(member_full), stable=True)
        midx = perm[:B]                                   # (B,) times
        Y_s = Y[midx]
        m_s = member_full[midx].astype(Y.dtype)

        mniw0 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                             state.mniw_int, state.mniw_obs)
        if Y.dtype == jnp.float64:
            mniw0 = mniw0._replace(
                row_cov=mniw0.row_cov.astype(jnp.float64))
        carry0 = (state.f_last, state.P_last, state.f_prev, state.P_prev,
                  state.A, state.Gamma, state.C, state.Sigma,
                  mniw0, state.n, noise0, G0diag, S0diag)
        # f32 speed mode: short frozen tails are cheaper as part of the
        # sequential scan than as the exact parallel filter (whose
        # batched LU combines are slow on TPU); only split when the
        # steady-state tail can engage.
        take_hybrid = hybrid_ok and B > E_int and (dtype != jnp.float32
                                                   or B - E_int >= 128)
        if take_hybrid:
            # ---- hybrid: sequential head (parameter updates live) +
            # parallel frozen tail. Exact: by slot E_int every
            # do_mniw/do_append condition is False (N_new >= limit), so
            # the tail is a fixed-parameter Kalman filter.
            Hh = E_int
            Bt = B - Hh
            carryF, emitsH = jax.lax.scan(forward_step, carry0,
                                          (Y_s[:Hh], m_s[:Hh]))
            (f_lastF, P_lastF, f_prevF, P_prevF, A_f, G_f, C_f, S_f,
             mniw_f, n_head, *_aux) = carryF
            (member_h, f_filt_h, P_filt_h, A_seq_h, G_seq_h, S_seq_h,
             score_mean_h) = emitsH
            member_t = m_s[Hh:] > 0.5
            mb_all = jnp.sum(member_full.astype(jnp.int32))
            anchor = (Hh + jnp.arange(Bt)) >= (mb_all - 1)
            if dtype == jnp.float32 and Bt >= 128:
                # speed mode: warm-up + steady-state LTI tail (matmul-
                # only associative combines; see _tail_steady)
                f_filt_t, P_filt_t, f_sm_t, P_sm_t = _tail_steady(
                    Y_s[Hh:], member_t, f_lastF, P_lastF,
                    A_f, G_f, C_f, S_f, anchor)
            else:
                f_filt_t, P_filt_t = _tail_filter(
                    Y_s[Hh:], member_t, f_lastF, P_lastF,
                    A_f, G_f, C_f, S_f)
                f_sm_t, P_sm_t = _tail_smooth(f_filt_t, P_filt_t,
                                              A_f, G_f, anchor)
            # head backward, seeded by the first tail slot's smoothed
            # state when the member run crosses the boundary
            has_tail = mb_all > Hh
            carryB0 = (jnp.where(has_tail, f_sm_t[0], f_lastF),
                       jnp.where(has_tail, P_sm_t[0], P_lastF),
                       has_tail)
            _, (f_sm_h, P_sm_h) = jax.lax.scan(
                backward_step, carryB0,
                (member_h, f_filt_h, P_filt_h, A_seq_h, G_seq_h),
                reverse=True)
            member = jnp.concatenate([member_h, member_t])
            f_filt = jnp.concatenate([f_filt_h, f_filt_t])
            P_filt = jnp.concatenate([P_filt_h, P_filt_t])
            A_seq = jnp.concatenate(
                [A_seq_h, jnp.broadcast_to(A_f, (Bt,) + A_f.shape)])
            G_seq = jnp.concatenate(
                [G_seq_h, jnp.broadcast_to(G_f, (Bt,) + G_f.shape)])
            S_seq = jnp.concatenate(
                [S_seq_h, jnp.broadcast_to(S_f, (Bt,) + S_f.shape)])
            score_mean = jnp.concatenate(
                [score_mean_h, (f_filt_t.squeeze(-1)) @ C_f.T])
            f_sm = jnp.concatenate([f_sm_h, f_sm_t])
            P_sm = jnp.concatenate([P_sm_h, P_sm_t])
            f_smp, P_smp = f_filt, P_filt
            n_f = n_head + jnp.sum(member_t.astype(jnp.int32))
            idxp = jnp.clip(mb_all - 2, 0, B - 1)
            f_prevF = jnp.where(mb_all > Hh, f_filt[idxp], f_prevF)
            P_prevF = jnp.where(mb_all > Hh, P_filt[idxp], P_prevF)
            m_int_f = jax.tree.map(lambda a: a[0], mniw_f)
            m_obs_f = jax.tree.map(lambda a: a[1], mniw_f)
        else:
            carryF, emits = jax.lax.scan(forward_step, carry0, (Y_s, m_s))
            if not full_backward:
                (member, f_filt, P_filt, A_seq, G_seq, S_seq, score_mean,
                 f_smp, P_smp) = emits
            else:
                (member, f_filt, P_filt, A_seq, G_seq, S_seq,
                 score_mean) = emits
                f_smp, P_smp = f_filt, P_filt
            (f_lastF, P_lastF, f_prevF, P_prevF, A_f, G_f, C_f, S_f,
             mniw_f, n_f, *_aux) = carryF
            m_int_f = jax.tree.map(lambda a: a[0], mniw_f)
            m_obs_f = jax.tree.map(lambda a: a[1], mniw_f)

            # ---- full RTS backward pass over members ----
            if dynamic and full_backward:
                carryB0 = (f_lastF, P_lastF, jnp.asarray(False))
                _, (f_sm, P_sm) = jax.lax.scan(
                    backward_step, carryB0,
                    (member, f_filt, P_filt, A_seq, G_seq), reverse=True)
            else:
                f_sm, P_sm = f_filt, P_filt

        # ---- emission scores (compute_sq_err_all parity) ----
        # emissions are per member SLOT (gathered order); samples map to
        # slots via the member-position arithmetic of GPI_model.py:494-533
        memberi = member_full.astype(jnp.int32)
        pos = jnp.cumsum(memberi) - 1                    # member pos per t
        n_members = jnp.sum(memberi)
        slot_self = jnp.clip(pos, 0, B - 1)
        slot_nonmember = jnp.clip(jnp.maximum(pos, 1) - 1, 0, B - 1)
        gather_slot = jnp.where(member_full, slot_self, slot_nonmember)

        eye = jnp.eye(T, dtype=dtype)
        first_member = member_full & (pos == 0)

        # Per-SLOT factorization, per-sample gather: samples sharing a
        # slot share the covariance, and past the estimation limit every
        # tail slot carries the SAME frozen S_f — so only
        # De = min(B, est_limit + 1) distinct matrices exist. Factor
        # those once (identical input => identical factor, so scores are
        # unchanged vs the old per-sample form), then each sample only
        # pays a gathered triangular solve. This was the refit program's
        # fixed cost: N per-sample Choleskys per call regardless of
        # member count.
        De = B if E_int is None else min(B, E_int + 1)
        Sd = S_seq[:De]
        Sd = 0.5 * (Sd + Sd.swapaxes(-1, -2))
        # extra factor slot [De]: the first-member variant of slot 0
        # (score jitter 1e-2*S0diag, GPI_model first-sample semantics)
        S0v = Sd[0] + (1e-2 * S0diag) * eye
        Sd = jnp.concatenate([Sd, S0v[None]])
        dm = jnp.maximum(
            jnp.mean(jnp.abs(jnp.diagonal(Sd, axis1=1, axis2=2)), axis=1),
            jnp.finfo(dtype).eps)
        L_slots = jnp.linalg.cholesky(
            Sd + (1e-8 * dm)[:, None, None] * eye)       # (De+1, T, T)
        fac_idx = jnp.where(first_member, De,
                            jnp.minimum(gather_slot, De - 1))

        # Chunked so the gathered factors stay ~CHUNK*T^2 regardless of N
        CHUNK = 256
        n_pad = (-N) % CHUNK
        idx_p = jnp.pad(fac_idx, (0, n_pad))
        slot_p = jnp.pad(gather_slot, (0, n_pad))
        Y_p = jnp.pad(Y, ((0, n_pad), (0, 0)))
        mean_all = score_mean  # (B, T)

        def score_chunk(args):
            fi, sl, Yc = args
            Lg = L_slots[fi]
            diff = (Yc - mean_all[sl])[..., None]
            sol = jax.scipy.linalg.solve_triangular(Lg, diff, lower=True)
            return -0.5 * jnp.sum(sol[..., 0] ** 2, axis=1) \
                - 0.5 * T * LOG2PI

        nc = (N + n_pad) // CHUNK
        q = jax.lax.map(score_chunk,
                        (idx_p.reshape(nc, CHUNK),
                         slot_p.reshape(nc, CHUNK),
                         Y_p.reshape(nc, CHUNK, T))).reshape(-1)[:N]
        q = jnp.where(n_members > 0, q, jnp.zeros_like(q))

        # ---- latent scores (compute_q_lat_all parity), per slot then
        # scattered back to time ----
        member_s = m_s > 0.5
        if dynamic:
            slots = jnp.arange(B)
            prev_slot = jnp.clip(slots - 1, 0, B - 1)
            lat_cur = f_sm                                # (B, T, 1)
            lat_prev = f_sm[prev_slot]
            cov_prev = P_sm[prev_slot]
            A_j, G_j = A_seq, G_seq
            is_first = (slots == 0)[:, None, None]
            lat_prev = jnp.where(is_first, f_sm, lat_prev)
            cov_prev = jnp.where(is_first, P_sm, cov_prev)
            A_j = jnp.where(is_first, A_f[None], A_j)
            G_j = jnp.where(is_first, G_f[None], G_j)

            # Deduped per-slot factors (same structure as the emission
            # scoring above): slot 0 uses the FINAL (A_f, G_f) and every
            # slot past the estimation limit carries the frozen pair, so
            # only De distinct (A, G) exist. Factor/cho_solve those once;
            # each slot then pays a gathered triangular solve + matmul.
            Gd = jnp.concatenate([G_f[None], G_seq[1:De]])  # (De, T, T)
            Ad = jnp.concatenate([A_f[None], A_seq[1:De]])
            Gd = 0.5 * (Gd + Gd.swapaxes(-1, -2))
            gd = jnp.maximum(
                jnp.mean(jnp.abs(jnp.diagonal(Gd, axis1=1, axis2=2)),
                         axis=1), jnp.finfo(dtype).eps)
            L2d = jnp.linalg.cholesky(
                Gd + (1e-8 * gd)[:, None, None] * eye)
            GAd = jax.vmap(lambda L, Bm: jax.scipy.linalg.cho_solve(
                (L, True), Bm))(L2d, Ad)
            idx_lat = jnp.where(slots == 0, 0,
                                jnp.minimum(slots, De - 1))

            def lat_chunk(args):
                il, rc, Pc = args
                s2 = jax.scipy.linalg.solve_triangular(L2d[il], rc,
                                                       lower=True)
                mh = jnp.sum(s2[..., 0] ** 2, axis=1)
                tr = jnp.sum(Ad[il] * (GAd[il] @ Pc), axis=(1, 2))
                return -0.5 * (mh + tr) - 0.5 * T * LOG2PI

            resid = lat_cur - A_j @ lat_prev
            LCH = 256
            b_pad = (-B) % LCH
            nb = (B + b_pad) // LCH

            def padt(a):
                return jnp.pad(a, ((0, b_pad),) + ((0, 0),) * (a.ndim - 1))

            q_lat_slot = jax.lax.map(
                lat_chunk,
                (padt(idx_lat).reshape(nb, LCH),
                 padt(resid).reshape(nb, LCH, T, 1),
                 padt(cov_prev).reshape(nb, LCH, T, T))).reshape(-1)[:B]
            q_lat_slot = jnp.where(member_s & (n_members > 0), q_lat_slot,
                                   jnp.zeros_like(q_lat_slot))
            q_lat = jnp.zeros((N,), dtype=dtype).at[midx].set(
                q_lat_slot, mode="drop")
        else:
            q_lat = jnp.zeros((N,), dtype=dtype)

        # ---- SNR vs closest smoothed state (GPI_HDP.compute_snr) ----
        j_idx = jnp.clip(jnp.maximum(pos, 1), 1, jnp.maximum(n_members, 1))
        snr_slot = jnp.clip(j_idx - 1, 0, B - 1)
        f_tgt = f_sm[snr_slot][..., 0]                   # (N, T)
        num = jnp.sum(f_tgt**2, axis=1)
        den = jnp.sum((f_tgt - Y) ** 2, axis=1)
        snr = 10.0 * (jnp.log10(jnp.maximum(num, 1e-300))
                      - jnp.log10(jnp.maximum(den, 1e-300)))

        # ---- compact state summary ----
        mb = n_members
        idx_last = jnp.clip(mb - 1, 0, B - 1)
        idx_prev = jnp.clip(mb - 2, 0, B - 1)
        idx_prev2 = jnp.clip(mb - 3, 0, B - 1)
        idx0 = 0

        def sel3(cond_pairs, default):
            out = default
            for cond, val in reversed(cond_pairs):
                out = jnp.where(cond, val, out)
            return out

        f_sm_prev_new = sel3(
            [(mb >= 2, f_sm[idx_prev]),
             ((mb == 1) & (n_before >= 1), f_smp[idx_last])],
            state.f_sm_prev)
        P_sm_prev_new = sel3(
            [(mb >= 2, P_sm[idx_prev]),
             ((mb == 1) & (n_before >= 1), P_smp[idx_last])],
            state.P_sm_prev)
        f_sm_prev2_new = sel3(
            [(mb >= 3, f_sm[idx_prev2]),
             ((mb == 2) & (n_before >= 1), f_smp[idx_prev]),
             (mb == 1, state.f_sm_prev)],
            state.f_sm_prev2)
        P_sm_prev2_new = sel3(
            [(mb >= 3, P_sm[idx_prev2]),
             ((mb == 2) & (n_before >= 1), P_smp[idx_prev]),
             (mb == 1, state.P_sm_prev)],
            state.P_sm_prev2)
        f_sm_first_new = sel3(
            [((n_before == 0) & (mb >= 1), f_sm[idx0]),
             ((n_before == 1) & (mb >= 1), f_smp[idx0])],
            state.f_sm_first)
        P_sm_first_new = sel3(
            [((n_before == 0) & (mb >= 1), P_sm[idx0]),
             ((n_before == 1) & (mb >= 1), P_smp[idx0])],
            state.P_sm_first)
        A_prev_new = sel3(
            [(mb >= 2, A_seq[idx_prev]), (mb == 1, state.A)], state.A_prev)
        G_prev_new = sel3(
            [(mb >= 2, G_seq[idx_prev]), (mb == 1, state.Gamma)],
            state.Gamma_prev)

        has = mb > 0
        has2 = n_f > 1

        def pick(arr, idx, default, cond=has):
            return jnp.where(cond, arr[idx], default)

        new_state = state._replace(
            n=n_f,
            f_last=pick(f_filt, idx_last, state.f_last),
            P_last=pick(P_filt, idx_last, state.P_last),
            f_prev=jnp.where(has & has2, f_prevF, state.f_prev),
            P_prev=jnp.where(has & has2, P_prevF, state.P_prev),
            f_sm_last=pick(f_sm, idx_last, state.f_sm_last),
            P_sm_last=pick(P_sm, idx_last, state.P_sm_last),
            f_sm_prev=f_sm_prev_new, P_sm_prev=P_sm_prev_new,
            f_sm_prev2=f_sm_prev2_new, P_sm_prev2=P_sm_prev2_new,
            f_sm_first=f_sm_first_new, P_sm_first=P_sm_first_new,
            A=A_f, Gamma=G_f, C=C_f, Sigma=S_f,
            A_prev=A_prev_new, Gamma_prev=G_prev_new,
            mniw_int=m_int_f, mniw_obs=m_obs_f,
        )
        if free_deg is not None:
            lds_val = lds_param_elbo(new_state, float(free_deg))
        else:
            lds_val = jnp.zeros((), dtype)
        result = RefitResult(q=q, q_lat=q_lat, snr=snr, state=new_state,
                             lds=lds_val)
        if emit_smoothed:
            return result, (Y_s, f_sm, P_sm, m_s)
        return result

    @precise_jit
    def refit(Y, resp, state: ClusterState):
        return _refit_core(Y, resp, state)

    return refit


@precise_jit
def lds_param_elbo(state: ClusterState, free_deg) -> jax.Array:
    """return_LDS_param_likelihood parity (GPI_model.py:459-486):
    MNIW log-density of the current (A, Gamma) and (C, Sigma) under
    fresh priors anchored at the defaults, scaled by /T * 100 (the
    reference's arbitrary scaling, :486). Gamma term dropped when the
    default Gamma is all-zero (static model)."""
    T = state.A.shape[0]
    eye = jnp.eye(T, dtype=state.A.dtype)
    int_prior = MNIW(state.A_def, eye, free_deg, state.Gamma_def)
    obs_prior = MNIW(state.C_def, eye, free_deg, state.Sigma_def)
    lik_AG = mniw_ops.log_likelihood(int_prior, state.A, state.Gamma)
    lik_AG = jnp.where(jnp.any(state.Gamma_def != 0.0), lik_AG, 0.0)
    lik_CS = mniw_ops.log_likelihood(obs_prior, state.C, state.Sigma)
    return (lik_AG + lik_CS) / T * 100.0


# ---------------------------------------------------------------------------
# Online single-sample primitives (include_sample support)
# ---------------------------------------------------------------------------

@precise_jit
def log_sq_error_last(state: ClusterState, y: jax.Array) -> jax.Array:
    """Score a new beat against the cluster's last state
    (GPI_model.log_sq_error with i=-1: mean = C f_last, cov = Sigma)."""
    mean = (state.C @ state.f_last)[:, 0]
    return linalg.gaussian_score(y - mean, state.Sigma)


@precise_jit
def estimate_new(state: ClusterState, y: jax.Array) -> jax.Array:
    """Score assuming the beat were included (GPI_HDP.estimate_new,
    GPI_HDP.py:2830-2842): posterior update with current params, then
    score against the posterior mean; first-member inflation when the
    cluster would have exactly one member."""
    first = state.n == 0
    f_up, _ = kalman_step(state.f_last, state.P_last, y[:, None],
                          LDSParams(state.A, state.Gamma, state.C,
                                    state.Sigma),
                          first, noise_first=state.theta.noise, h=1.0)
    mean = (state.C @ f_up)[:, 0]
    eye = jnp.eye(mean.shape[0], dtype=mean.dtype)
    infl = 1e-2 * jnp.mean(jnp.diag(state.Sigma_def))
    # Inflation iff the cluster currently has exactly one member
    # (reference: ``len(gpmodel.indexes) == 1``, GPI_HDP.py:2836).
    cov = state.Sigma + jnp.where(state.n == 1, infl, 0.0) * eye
    return linalg.gaussian_score(y - mean, cov)


def q_lat_tail(state: ClusterState, h_ini: float = 1.0):
    """Latent-score patch values for (first, second-to-last, last)
    members from the compact summary (log_lat_error semantics,
    GPI_model.py:288-323). The caller scatters them at those members'
    time indices — the only q_lat entries an online step can change."""

    def score(lat_cur, lat_prev, cov_prev, A_, G_):
        resid = lat_cur - A_ @ lat_prev
        L = linalg.chol_spd(G_)
        sol = jax.scipy.linalg.solve_triangular(L, resid, lower=True)
        mahal = jnp.sum(sol**2)
        Ginv_A = linalg.cho_solve(L, A_)
        trace = jnp.sum(A_ * (Ginv_A @ cov_prev))
        q = resid.shape[0]
        return -0.5 * (mahal + trace) - 0.5 * q * LOG2PI

    val_first = score(state.f_sm_first, state.f_sm_first, state.P_sm_first,
                      state.A, state.Gamma * h_ini)
    val_prev = score(state.f_sm_prev, state.f_sm_prev2, state.P_sm_prev2,
                     state.A_prev, state.Gamma_prev)
    val_last = score(state.f_sm_last, state.f_sm_prev, state.P_sm_prev,
                     state.A, state.Gamma)
    return val_first, val_prev, val_last


# ---------------------------------------------------------------------------
# GP observation / resampling APIs (IterativeGaussianProcess surface)
# ---------------------------------------------------------------------------

def observe(state: ClusterState, x_post: jax.Array, x_basis: jax.Array,
            use_smoothed: bool = False):
    """Resample the emission distribution at arbitrary inputs x_post via
    the GP projection K(x*, X) K(X, X)^-1 (GPI.pred_dist,
    GPI.py:457-503). On the shared grid this reduces to
    (C f, Sigma)."""
    from hdpgpc_tpu.ops.kernels import gram
    f = state.f_sm_last if use_smoothed else state.f_last
    mean = state.C @ f
    x_post = x_post.reshape(-1)
    x_basis = x_basis.reshape(-1)
    if x_post.shape[0] == x_basis.shape[0]:
        same = jnp.all(x_post == x_basis)
    else:
        same = jnp.asarray(False)
    K_XX = gram(state.theta, x_basis[:, None], x_basis[:, None])
    K_XXs = gram(state.theta, x_basis[:, None], x_post[:, None])
    K_XsXs = gram(state.theta, x_post[:, None], include_noise=True)
    jitter = 1e-4 * jnp.maximum(
        jnp.mean(jnp.abs(jnp.diag(state.Sigma))),
        jnp.finfo(mean.dtype).eps)
    L = jnp.linalg.cholesky(
        0.5 * (K_XX + K_XX.T) + jitter * jnp.eye(K_XX.shape[0],
                                                 dtype=mean.dtype))
    K_solve = jax.scipy.linalg.cho_solve((L, True), K_XXs)
    f_star = K_solve.T @ mean
    cov_f = K_XsXs - K_XXs.T @ K_solve \
        + K_solve.T @ state.Sigma @ K_solve
    cov_f = 0.5 * (cov_f + cov_f.T) \
        + 1e-6 * jnp.eye(cov_f.shape[0], dtype=mean.dtype)
    if x_post.shape[0] == x_basis.shape[0]:
        f_star = jnp.where(same, mean, f_star)
        cov_f = jnp.where(same, state.Sigma, cov_f)
    return f_star, cov_f


def observe_latent(state: ClusterState, x_post: jax.Array,
                   x_basis: jax.Array, use_smoothed: bool = True):
    """Resample the LATENT state distribution at arbitrary inputs
    (GPI.pred_latent_dist, GPI.py:505-562): project the latent mean and
    covariance through the GP cross-covariance with the reference's
    fixed 1e-4 kernel jitter. On the shared grid returns the stored
    latent moments unchanged."""
    from hdpgpc_tpu.ops.kernels import gram
    f = state.f_sm_last if use_smoothed else state.f_last
    P = state.P_sm_last if use_smoothed else state.P_last
    x_post = x_post.reshape(-1)
    x_basis = x_basis.reshape(-1)
    if x_post.shape[0] == x_basis.shape[0]:
        same = jnp.all(x_post == x_basis)
    else:
        same = jnp.asarray(False)
    K_XX = gram(state.theta, x_basis[:, None], x_basis[:, None])
    K_XXs = gram(state.theta, x_basis[:, None], x_post[:, None])
    K_XsX = K_XXs.T
    K_XsXs = gram(state.theta, x_post[:, None], x_post[:, None])
    eye = jnp.eye(K_XX.shape[0], dtype=f.dtype)
    L = jnp.linalg.cholesky(K_XX + 1e-4 * eye)
    sol_delta = jax.scipy.linalg.cho_solve((L, True), f)
    f_star = K_XsX @ sol_delta
    sol_K = jax.scipy.linalg.cho_solve((L, True), K_XXs)
    term_data = K_XsX @ sol_K
    sol_middle = jax.scipy.linalg.cho_solve((L, True), P @ sol_K)
    term_prior = K_XsX @ sol_middle
    cov_f = K_XsXs - term_data + term_prior
    if x_post.shape[0] == x_basis.shape[0]:
        f_star = jnp.where(same, f, f_star)
        cov_f = jnp.where(same, P, cov_f)
    return f_star, cov_f


def sample_observations(state: ClusterState, key, n_samples: int = 1):
    """Draw beats from the cluster's current observation distribution
    y ~ N(C f_sm, C P_sm C' + Sigma) (GPI.sample_y, GPI.py:564-608 /
    GPI_model.sample_last, :953-961)."""
    mean = (state.C @ state.f_sm_last)[:, 0]
    cov = state.C @ state.P_sm_last @ state.C.T + state.Sigma
    cov = 0.5 * (cov + cov.T)
    L = linalg.chol_spd(cov)
    z = jax.random.normal(key, (n_samples, mean.shape[0]), mean.dtype)
    return mean[None, :] + z @ L.T


def kl_divergence(state_a: ClusterState, state_b: ClusterState) -> jax.Array:
    """Symmetric KL between two clusters' observation distributions
    (GPI.KL_divergence, GPI.py:1058-1094)."""
    def moments(st):
        mu = (st.C @ st.f_sm_last)[:, 0]
        cov = st.C @ st.P_sm_last @ st.C.T + st.Sigma
        return mu, 0.5 * (cov + cov.T)

    mu1, c1 = moments(state_a)
    mu2, c2 = moments(state_b)
    ic1 = linalg.inv_spd(c1)
    ic2 = linalg.inv_spd(c2)
    tr = (jnp.trace(ic2 @ c1 + ic1 @ c2) - 2 * c1.shape[0]) / 4.0
    d = mu1 - mu2
    first = jnp.dot(d, (ic1 + ic2) @ d) / 4.0
    return first + tr
