"""Fused on-device online streaming VI engine.

TPU-native re-architecture of the cached online step
(GPI_HDP.include_sample_fast, GPI_HDP.py:2312-2629): the reference (and
the host-orchestrated ``HDPGPC.include_sample_fast``) performs one
host-driven decision per beat; on a tunnelled TPU every device
round-trip costs ~30 ms, capping throughput near 15 beats/s regardless
of compute. This engine runs the ENTIRE per-beat decision in-program —
scoring, birth/absorb candidate evaluation, the one-sample ELBO
accounting (device ports of elbo_Linears, ops/sb_device.py), the
commit, popularity reorder, and the deterministic part of the HDP
global update — as a ``lax.scan`` over a chunk of beats on a
preallocated K-slot cluster bank (births scatter into free slots, so
shapes stay static). The host only refines rho/omega (the scipy
L-BFGS-B step the reference runs per beat, OptimizerRhoOmega.py) at
chunk boundaries and collects the per-beat assignments.

With chunk_size=1 the rho/omega cadence matches the reference exactly
(refined between every pair of beats); larger chunks amortise the
round-trip + L-BFGS over many beats (documented divergence: rho/omega
are reinitialised deterministically in-program each beat, as the
reference does, but the L-BFGS refinement lags by up to chunk_size
beats). Partition parity against the host fast path is asserted in
tests/test_stream_engine.py.

Scope: single lead, warp off, bayesian dynamics, hmm_switch=True — the
flagship online configuration (tests/test_online.py in the reference).
Other configurations use HDPGPC.include_sample_fast.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hdpgpc_tpu.models import gplds
from hdpgpc_tpu.models.gplds import ClusterState, make_forward_step
from hdpgpc_tpu.ops import sb_device as sbd
from hdpgpc_tpu.ops import stick_breaking as sb
from hdpgpc_tpu.ops.linalg import precise_jit
from hdpgpc_tpu.models.kernel_fit import _nll


class StreamState(NamedTuple):
    """Device-resident carry of the streaming engine (all fixed shapes;
    K = preallocated cluster slots)."""

    states: ClusterState     # stacked (K, ...)
    fitted: jax.Array        # (K,) bool — kernel hyperparams fitted
    n: jax.Array             # (K,) int32 member counts
    last_t: jax.Array        # (K,) int32 time of last member (-1)
    qlat_last: jax.Array     # (K,) cached q_lat value at the last member
    lds: jax.Array           # (K,) memoised lds_param_elbo per cluster
    q_sel_sum: jax.Array     # scalar: sum of selected q cache entries
    qlat_sel_sum: jax.Array  # scalar: sum of selected q_lat entries
    prev_state: jax.Array    # int32 slot assigned at beat t-1
    start_counts: jax.Array  # (K+1,)
    trans_counts: jax.Array  # (K+1, K+1)
    rho: jax.Array           # (K,)
    omega: jax.Array         # (K,)
    M_rho: jax.Array         # int32 live rho size
    M: jax.Array             # int32 live clusters
    t: jax.Array             # int32 beats processed
    slot_uid: jax.Array      # (K,) int32 stable cluster identity
    uid_next: jax.Array      # int32


class StepOut(NamedTuple):
    uid: jax.Array           # stable id of the chosen cluster
    slot: jax.Array          # slot index AFTER the reorder
    birth: jax.Array         # bool
    M: jax.Array             # live clusters after the step


def _append_state(st: ClusterState, y, fwd, dtype) -> ClusterState:
    """Append ONE beat to a cluster state via the shared refit step
    (make_forward_step) + the single-member compact-summary update
    (gplds.build_refit summary rules specialised to mb == 1,
    full_backward=False)."""
    mniw0 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                         st.mniw_int, st.mniw_obs)
    if dtype == jnp.float64:
        mniw0 = mniw0._replace(row_cov=mniw0.row_cov.astype(jnp.float64))
    G0diag = jnp.mean(jnp.diag(st.Gamma_def))
    S0diag = jnp.mean(jnp.diag(st.Sigma_def))
    carry0 = (st.f_last, st.P_last, st.f_prev, st.P_prev,
              st.A, st.Gamma, st.C, st.Sigma, mniw0, st.n,
              st.theta.noise, G0diag, S0diag)
    one = jnp.asarray(1.0, dtype)
    new_carry, emit = fwd(carry0, (y, one))
    (_member, f_n, P_n, _A, _G, _S, _sm, f_smp, P_smp) = emit
    (f_c, P_c, f_prevF, P_prevF, A_f, G_f, C_f, S_f,
     mniw_f, n_f, *_aux) = new_carry
    n_before = st.n
    m_int = jax.tree.map(lambda a: a[0], mniw_f)
    m_obs = jax.tree.map(lambda a: a[1], mniw_f)
    has2 = n_f > 1
    return st._replace(
        n=n_f,
        f_last=f_n, P_last=P_n,
        f_prev=jnp.where(has2, f_prevF, st.f_prev),
        P_prev=jnp.where(has2, P_prevF, st.P_prev),
        f_sm_last=f_n, P_sm_last=P_n,
        f_sm_prev=jnp.where(n_before >= 1, f_smp, st.f_sm_prev),
        P_sm_prev=jnp.where(n_before >= 1, P_smp, st.P_sm_prev),
        f_sm_prev2=st.f_sm_prev, P_sm_prev2=st.P_sm_prev,
        f_sm_first=jnp.where(n_before == 0, f_n,
                             jnp.where(n_before == 1, f_smp,
                                       st.f_sm_first)),
        P_sm_first=jnp.where(n_before == 0, P_n,
                             jnp.where(n_before == 1, P_smp,
                                       st.P_sm_first)),
        A=A_f, Gamma=G_f, C=C_f, Sigma=S_f,
        A_prev=st.A, Gamma_prev=st.Gamma,
        mniw_int=m_int, mniw_obs=m_obs,
    )


def _fit_kernel_while(x, y, n_lb, n_ub, max_iters: int, lr: float):
    """In-program exact-GP kernel fit: the same Adam update sequence and
    plateau rule as models/kernel_fit._fit (GPI.fit_torch semantics),
    expressed as one lax.while_loop so a birth beat can fit its kernel
    without leaving the device."""
    dtype = x.dtype
    opt = optax.adam(lr)
    fixed = {"n_lb": n_lb, "n_ub": n_ub}
    grad_fn = jax.value_and_grad(lambda t: _nll({**fixed, **t}, x, y))
    tp0 = {"raw_s": jnp.zeros((), dtype), "raw_l": jnp.zeros((), dtype),
           "raw_n": jnp.zeros((), dtype), "c": jnp.zeros((), dtype)}
    os0 = opt.init(tp0)
    buf0 = jnp.zeros((11,), dtype)

    def cond(state):
        i, tp, os_, buf, done = state
        return (~done) & (i < max_iters)

    def body(state):
        i, tp, os_, buf, _ = state
        loss, g = grad_fn(tp)
        updates, os_ = opt.update(g, os_)
        tp = optax.apply_updates(tp, updates)
        buf = jnp.roll(buf, -1).at[-1].set(loss)
        plateau = (i > 1000) & (jnp.abs(jnp.sum(buf[1:] - buf[:-1])) < 1e-4)
        return (i + 1, tp, os_, buf, plateau)

    init = (jnp.asarray(0, jnp.int32), tp0, os0, buf0, jnp.asarray(False))
    _, tp, _, _, _ = jax.lax.while_loop(cond, body, init)
    s = jax.nn.softplus(tp["raw_s"])
    n = n_lb + (n_ub - n_lb) * jax.nn.sigmoid(tp["raw_n"])
    return s, n


def build_stream_step(T: int, K: int, *, est_limit, annealing: bool,
                      free_deg: float, trans_alpha: float,
                      start_alpha: float, kappa: float, gamma: float,
                      pin_lengthscale: float, fit_iters: int,
                      fit_lr: float, max_models: int, dtype,
                      x_basis, bound_lo, bound_hi):
    """Build the per-beat step function (scanned over a chunk)."""
    limit = jnp.inf if est_limit is None else float(est_limit)
    x_basis = jnp.asarray(x_basis, dtype)
    bound_lo = jnp.asarray(bound_lo, dtype)
    bound_hi = jnp.asarray(bound_hi, dtype)
    fwd_abs = make_forward_step(T, limit, annealing, True, True, True,
                                False)
    fwd_birth = make_forward_step(T, limit, annealing, True, False, False,
                                  False)
    fwd_commit = make_forward_step(T, limit, annealing, True, True, False,
                                   False)
    NEG = jnp.asarray(-1e30, dtype)
    cap = min(K, max_models) if max_models is not None else K

    def lds_of(st):
        return gplds.lds_param_elbo(st, float(free_deg))

    HDT = jnp.float64   # accounting dtype (counts, ELBO terms, sums)

    def step(carry: StreamState, y):
        t = carry.t
        M = carry.M
        act = jnp.arange(K) < M
        states = carry.states

        # ---- 1. scores vs every cluster's last state ----
        scores = jax.vmap(gplds.log_sq_error_last,
                          in_axes=(0, None))(states, y)
        scores = jnp.where(act, scores, NEG)
        m_best = jnp.argmax(scores)

        # ---- 2. candidate evaluation (absorb x K, birth) ----
        ests = jax.vmap(gplds.estimate_new, in_axes=(0, None))(states, y)
        cand_states = jax.vmap(
            lambda s: _append_state(s, y, fwd_abs, dtype))(states)
        tails = jax.vmap(lambda s: jnp.stack(
            gplds.q_lat_tail(s, 1.0)))(cand_states)      # (K, 3)
        lds_cand = jax.vmap(lds_of)(cand_states)

        q_ord = jnp.argsort(-jnp.where(act, scores, -jnp.inf),
                            stable=True)
        m_template = q_ord[jnp.maximum(M - 1, 0)]
        btempl = gplds.reinit_cluster_state(
            jax.tree.map(lambda a: a[m_template], states),
            float(free_deg))
        est_b = gplds.estimate_new(btempl, y)
        b_state = _append_state(btempl, y, fwd_birth, dtype)
        vf_b, _vp_b, _vl_b = gplds.q_lat_tail(b_state, 0.5)
        lds_b = lds_of(b_state)

        # ---- 3. one-sample ELBO totals (device elbo_Linears ports) ----
        rho, omega, M_rho = carry.rho, carry.omega, carry.M_rho
        n_all = carry.n.astype(HDT)
        tot_n = jnp.sum(n_all)
        base_lds = jnp.sum(jnp.where(carry.n > 0, carry.lds * n_all, 0.0)
                           ) / jnp.maximum(tot_n, 1e-300)
        base_lin = sbd.elbo_linears_online(
            rho, omega, M, M_rho, trans_alpha, start_alpha, kappa, gamma,
            carry.start_counts, carry.trans_counts)
        base_total = carry.q_sel_sum + carry.qlat_sel_sum \
            + base_lin + base_lds

        # gate: does the birth slot win the emission argmax?
        gate = (est_b > jnp.max(jnp.where(act, scores, NEG))) & (t > 0) \
            & (M < cap)

        # birth candidate total
        eK1 = jnp.arange(K + 1)
        tc_b = carry.trans_counts + (
            (eK1[:, None] == carry.prev_state)
            & (eK1[None, :] == M)).astype(HDT)
        lin_b = sbd.elbo_linears_online(
            rho, omega, M + 1, M_rho, trans_alpha, start_alpha, kappa,
            gamma, carry.start_counts, tc_b)
        lds_tot_b = (jnp.sum(jnp.where(carry.n > 0, carry.lds * n_all,
                                       0.0)) + lds_b) / (tot_n + 1.0)
        birth_total = (carry.q_sel_sum + est_b) \
            + (carry.qlat_sel_sum + vf_b * 5.0) + lin_b + lds_tot_b \
            - base_total

        # absorb candidate totals (vectorised over slots)
        vf_c, vp_c, vl_c = tails[:, 0], tails[:, 1], tails[:, 2]
        patch_t_val = jnp.where(carry.n >= 1, vl_c, vf_c)
        prev_newval = jnp.where(carry.n >= 2, vp_c, vf_c)
        patched_prev = carry.last_t == (t - 1)
        qlat_m = carry.qlat_sel_sum + patch_t_val + jnp.where(
            patched_prev, prev_newval - carry.qlat_last, 0.0)
        q_m = carry.q_sel_sum + ests

        def lin_for(mm):
            tc_m = carry.trans_counts + (
                (eK1[:, None] == carry.prev_state)
                & (eK1[None, :] == mm)).astype(HDT)
            return sbd.elbo_linears_online(
                rho, omega, M, M_rho, trans_alpha, start_alpha, kappa,
                gamma, carry.start_counts, tc_m)

        lin_m = jax.vmap(lin_for)(jnp.arange(K))
        sum_lds_n = jnp.sum(jnp.where(carry.n > 0, carry.lds * n_all, 0.0))
        lds_tot_m = (sum_lds_n - carry.lds * n_all
                     + lds_cand * (n_all + 1.0)) / (tot_n + 1.0)
        absorb_total = q_m + qlat_m + lin_m + lds_tot_m - base_total

        # ---- 4. decision: first absorb candidate (in q-order) that
        # beats the birth total; else birth (GPI_HDP.py:2484-2541) ----
        wins = (absorb_total > birth_total)[q_ord] \
            & (jnp.arange(K) < M)
        any_win = jnp.any(wins)
        first_win = q_ord[jnp.argmax(wins)]
        chosen_abs = jnp.where(gate & any_win, first_win, m_best)
        do_birth = gate & jnp.logical_not(any_win)
        chosen = jnp.where(do_birth, M, chosen_abs)

        # ---- 5. commit (GPI_HDP._include_one semantics) ----
        # absorb -> include into the CURRENT state (pair_smooth=False);
        # birth -> slot M still holds a pristine default cluster (slots
        # are never freed), so the same gather covers both. A first-ever
        # member triggers the in-program kernel hyperparameter fit.
        slot = jnp.where(do_birth, M, chosen_abs)
        src = jax.tree.map(lambda a: a[slot], states)
        need_fit = jnp.logical_not(carry.fitted[slot]) \
            & (carry.n[slot] == 0)

        def with_fit(s):
            s_fit, n_fit = _fit_kernel_while(
                x_basis, y, bound_lo, bound_hi, fit_iters, fit_lr)
            theta = s.theta._replace(
                outputscale=s_fit.astype(s.theta.outputscale.dtype),
                lengthscale=jnp.asarray(
                    pin_lengthscale, s.theta.lengthscale.dtype),
                noise=n_fit.astype(s.theta.noise.dtype))
            return gplds.apply_kernel_fit(s, x_basis, theta)

        src = jax.lax.cond(need_fit, with_fit, lambda s: s, src)
        committed = _append_state(src, y, fwd_commit, dtype)
        lds_new = lds_of(committed)

        states2 = jax.tree.map(
            lambda a, b: a.at[slot].set(b.astype(a.dtype)), states,
            committed)
        n2 = carry.n.at[slot].add(1)
        fitted2 = carry.fitted.at[slot].set(True)
        last_t2 = carry.last_t.at[slot].set(t)
        lds2 = carry.lds.at[slot].set(lds_new)

        # cache bookkeeping (selected sums + per-cluster last values)
        q_add = jnp.where(do_birth, est_b,
                          jnp.where(gate & any_win, ests[chosen_abs],
                                    scores[chosen_abs]))
        qlat_add = jnp.where(
            do_birth, vf_b * 5.0,
            jnp.where(gate & any_win,
                      patch_t_val[chosen_abs] + jnp.where(
                          patched_prev[chosen_abs],
                          prev_newval[chosen_abs]
                          - carry.qlat_last[chosen_abs], 0.0),
                      0.0))
        qlat_last2 = carry.qlat_last.at[slot].set(
            jnp.where(do_birth, vf_b * 5.0,
                      jnp.where(gate & any_win, patch_t_val[chosen_abs],
                                0.0)))
        q_sum2 = carry.q_sel_sum + q_add
        qlat_sum2 = carry.qlat_sel_sum + qlat_add

        # counts
        is_first_beat = t == 0
        start2 = carry.start_counts + jnp.where(
            is_first_beat, (eK1 == slot).astype(HDT), 0.0)
        trans2 = carry.trans_counts + (
            (eK1[:, None] == jnp.where(is_first_beat, slot,
                                       carry.prev_state))
            & (eK1[None, :] == slot)).astype(HDT)
        M2 = jnp.where(do_birth, M + 1, M)
        uid_chosen = jnp.where(do_birth, carry.uid_next,
                               carry.slot_uid[slot])
        slot_uid2 = carry.slot_uid.at[slot].set(uid_chosen)
        uid_next2 = jnp.where(do_birth, carry.uid_next + 1,
                              carry.uid_next)

        # ---- 6. popularity reorder (GPI_HDP.reorder) ----
        act2 = jnp.arange(K) < M2
        key = jnp.where(act2, -n2, K + 1 + jnp.arange(K))
        perm = jnp.argsort(key, stable=True)
        inv = jnp.argsort(perm, stable=True)
        states3 = jax.tree.map(lambda a: a[perm], states2)
        permK1 = jnp.concatenate([perm, jnp.asarray([K])])
        start3 = start2[permK1]
        trans3 = trans2[permK1][:, permK1]
        prev3 = inv[slot].astype(jnp.int32)

        # ---- 7. deterministic HDP reinit (the L-BFGS refinement runs
        # on the host at chunk boundaries; GPI_HDP.py:2113-2141) ----
        big = M2 > 2
        rho2 = jnp.where(big, sbd.create_init_rho_dyn(K, M2 - 1, HDT),
                         carry.rho)
        omega2 = jnp.where(big, jnp.where(jnp.arange(K) < M2 - 1,
                                          jnp.asarray(1.0 + gamma, HDT),
                                          jnp.asarray(0.0, HDT)),
                           carry.omega)
        M_rho2 = jnp.where(big, M2 - 1, carry.M_rho)

        new_carry = StreamState(
            states=states3, fitted=fitted2[perm], n=n2[perm],
            last_t=last_t2[perm], qlat_last=qlat_last2[perm],
            lds=lds2[perm], q_sel_sum=q_sum2, qlat_sel_sum=qlat_sum2,
            prev_state=prev3, start_counts=start3, trans_counts=trans3,
            rho=rho2, omega=omega2, M_rho=M_rho2, M=M2, t=t + 1,
            slot_uid=slot_uid2[perm], uid_next=uid_next2)
        return new_carry, StepOut(uid=uid_chosen, slot=prev3,
                                  birth=do_birth, M=M2)

    return step


class OnlineStreamEngine:
    """Chunked host driver around the fused per-beat step.

    Parameters
    ----------
    model : HDPGPC
        Source of configuration and default cluster construction.
    K : int
        Preallocated cluster slots (max clusters).
    chunk : int
        Beats per device call. 1 reproduces the reference's per-beat
        rho/omega L-BFGS cadence exactly; larger values amortise the
        host round-trip (documented cadence divergence).
    """

    def __init__(self, model, K: int = 16, chunk: int = 16):
        assert model.n_outputs == 1, "stream engine: single lead only"
        assert model.cfg.bayesian_params
        self.model = model
        self.K = K
        self.chunk = chunk
        self.dtype = model.dtype
        self._chunk_fn = None
        self.carry = None
        self.uids: list = []
        self.births: list = []

    def _build(self):
        """Build the step closure + initial carry from the model's
        CURRENT defaults (deferred so the f32 amplitude normalisation,
        which rescales the priors, can run on first data)."""
        model = self.model
        g = model.cfg.gp
        h = model.cfg.hdp
        T = model.Tb
        K = self.K
        self._x_basis = jnp.asarray(model.x_basis, self.dtype)
        self._blo = jnp.asarray(model._def_bound_sigma[0], self.dtype)
        self._bhi = jnp.asarray(model._def_bound_sigma[1], self.dtype)
        mm = model.cfg.max_models
        self.step = build_stream_step(
            T, K, est_limit=g.estimation_limit, annealing=g.annealing,
            free_deg=float(g.free_deg_mniw), trans_alpha=h.trans_alpha,
            start_alpha=h.start_alpha, kappa=h.kappa, gamma=h.gamma,
            pin_lengthscale=g.kernel_fit_pin_lengthscale,
            fit_iters=g.kernel_fit_iters, fit_lr=g.kernel_fit_lr,
            max_models=mm if mm is not None else K, dtype=self.dtype,
            x_basis=self._x_basis, bound_lo=self._blo,
            bound_hi=self._bhi)

        def chunk_fn(carry, Y_chunk):
            return jax.lax.scan(self.step, carry, Y_chunk)

        self._chunk_fn = precise_jit(chunk_fn)
        self.carry = self._init_carry()

    def _init_carry(self) -> StreamState:
        m = self.model
        K = self.K
        base = m._new_cluster().state
        states = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (K,) + a.shape), base)
        # densify (broadcast arrays are fine under jit, but scatters
        # need concrete buffers)
        states = jax.tree.map(jnp.array, states)
        dt = self.dtype
        M0 = m.M
        rho0 = np.zeros(K)
        om0 = np.zeros(K)
        g0 = m.glob
        rho0[: g0.rho.shape[0]] = g0.rho
        om0[: g0.omega.shape[0]] = g0.omega
        hdt = jnp.float64
        return StreamState(
            states=states,
            fitted=jnp.zeros((K,), bool),
            n=jnp.zeros((K,), jnp.int32),
            last_t=jnp.full((K,), -1, jnp.int32),
            qlat_last=jnp.zeros((K,), hdt),
            lds=jnp.zeros((K,), hdt),
            q_sel_sum=jnp.zeros((), hdt),
            qlat_sel_sum=jnp.zeros((), hdt),
            prev_state=jnp.zeros((), jnp.int32),
            start_counts=jnp.zeros((K + 1,), hdt),
            trans_counts=jnp.zeros((K + 1, K + 1), hdt),
            rho=jnp.asarray(rho0, hdt), omega=jnp.asarray(om0, hdt),
            M_rho=jnp.asarray(g0.rho.shape[0], jnp.int32),
            M=jnp.asarray(M0, jnp.int32),
            t=jnp.zeros((), jnp.int32),
            slot_uid=jnp.arange(K, dtype=jnp.int32),
            uid_next=jnp.asarray(M0, jnp.int32))

    def _host_hdp_refresh(self):
        """reinit_globals + 4 x (theta update, rho/omega L-BFGS) — the
        reference's per-beat global update (GPI_HDP.py:2113-2141) run at
        the chunk boundary on fetched counts."""
        c = self.carry
        M, start_c, trans_c = jax.device_get(
            (c.M, c.start_counts, c.trans_counts))
        M = int(M)
        if M < 2:
            return
        sc = np.asarray(start_c[:M], np.float64)
        tc = np.asarray(trans_c[:M, :M], np.float64)
        glob = self.model.glob
        if M > 2:
            glob = sb.reinit_globals(glob, M - 1, tc, sc)
        for _ in range(4):
            tt, st = sb.calc_theta_full(glob, tc, sc, M)
            glob = sb.HDPGlobals(glob.rho, glob.omega, tt, st, glob.gamma,
                                 glob.trans_alpha, glob.start_alpha,
                                 glob.kappa)
            glob = sb.optimise_globals(glob, M=M + 1)
        self.model.glob = glob
        K = self.K
        rho_p = np.zeros(K)
        om_p = np.zeros(K)
        rho_p[: glob.rho.shape[0]] = glob.rho
        om_p[: glob.omega.shape[0]] = glob.omega
        self.carry = self.carry._replace(
            rho=jnp.asarray(rho_p, jnp.float64),
            omega=jnp.asarray(om_p, jnp.float64),
            M_rho=jnp.asarray(glob.rho.shape[0], jnp.int32))

    def run(self, Y: np.ndarray, hdp_refresh: bool = True) -> np.ndarray:
        """Stream a batch of beats; returns stable cluster ids (N,)."""
        Y = np.asarray(Y, np.float64)
        if Y.ndim == 3:
            Y = Y[:, :, 0]
        if self.dtype == jnp.float32:
            Y = self.model._maybe_normalise_f32(Y[:, :, None])[:, :, 0]
        elif self.model._y_scale != 1.0:
            Y = Y / self.model._y_scale
        if self._chunk_fn is None:
            self._build()
        N = Y.shape[0]
        out_uids = np.zeros(N, np.int64)
        out_birth = np.zeros(N, bool)
        i = 0
        # Per-beat outputs are only consumed AFTER the stream: keep the
        # device buffers and fetch them in one transfer at the end, so
        # the only per-chunk synchronisation is the HDP refresh's count
        # fetch (each blocking fetch costs a full tunnel round-trip —
        # this halves the per-chunk round-trips; with hdp_refresh=False
        # chunks pipeline with no host sync at all). Decision semantics
        # are untouched: uids/births are pure outputs.
        pending = []
        while i < N:
            B = min(self.chunk, N - i)
            Yj = jnp.asarray(Y[i:i + B], self.dtype)
            self.carry, outs = self._chunk_fn(self.carry, Yj)
            pending.append((i, B, outs))
            i += B
            if hdp_refresh:
                self._host_hdp_refresh()
        fetched = jax.device_get([(o.uid, o.birth) for _i, _b, o in pending])
        for (i0, B, _o), (uids, births) in zip(pending, fetched):
            out_uids[i0:i0 + B] = uids[:B]
            out_birth[i0:i0 + B] = births[:B]
        self.uids.extend(out_uids.tolist())
        self.births.extend(out_birth.tolist())
        return out_uids

    def labels(self) -> np.ndarray:
        """Per-beat labels renumbered by final slot order (matching the
        host path's resp_assigned[-1] convention)."""
        c = self.carry
        slot_uid, M = jax.device_get((c.slot_uid, c.M))
        uid_to_slot = {int(u): s for s, u in enumerate(slot_uid[:int(M)])}
        return np.asarray([uid_to_slot.get(int(u), -1) for u in self.uids])
