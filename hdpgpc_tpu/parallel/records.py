"""Multi-record scale-out over a device mesh.

The reference has NO distributed execution (SURVEY.md §2: the scale-out
axes are embarrassingly parallel). The natural mesh layout for HDP-GPC
is data parallelism over RECORDS (patients): each record's VI state is
independent, so a 48-record MIT-BIH sweep shards the (R, N, T) beat
tensor over the mesh's 'records' axis with no cross-record collectives
except metric reductions (psum).

``sharded_vi_step`` is one fixed-assignment VI iteration — vmapped
refit of K clusters per record + HMM FB + ELBO pieces — jitted over the
mesh. It is the multi-chip "training step" validated by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hdpgpc_tpu.models import gplds
from hdpgpc_tpu.ops import hmm as hmm_ops
from hdpgpc_tpu.ops.kernels import KernelParams


def make_mesh(n_devices: int | None = None, axis: str = "records") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_records(mesh: Mesh, arr: jax.Array, axis: str = "records"):
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def rho_to_beta_device(rho: jax.Array) -> jax.Array:
    """E[beta] with the leftover stick appended (stick_breaking
    rho_to_beta, 'K+1' form) — jnp version for in-program HDP updates."""
    one_minus = jnp.concatenate([jnp.ones((1,), rho.dtype),
                                 jnp.cumprod(1.0 - rho)])
    beta = jnp.concatenate([rho, jnp.ones((1,), rho.dtype)]) * one_minus
    return beta


def theta_from_counts_device(rho, trans_counts, start_counts,
                             trans_alpha, start_alpha, kappa):
    """Device-side _calcThetaFull (GPI_HDP.py:400-422) at M = K + 1:
    posterior Dirichlet parameters from transition/start counts."""
    K = rho.shape[0]
    M = K + 1
    Ebeta = rho_to_beta_device(rho)                   # (K+1,)
    alphaEbeta = trans_alpha * Ebeta
    tt = jnp.broadcast_to(alphaEbeta[None, :], (M, M))
    pad_tc = jnp.zeros((M, M), rho.dtype).at[:K, :K].set(trans_counts)
    pad_eye = jnp.zeros((M, M), rho.dtype).at[:K, :K].set(
        kappa * jnp.eye(K, dtype=rho.dtype))
    tt = tt + pad_tc + pad_eye
    st = start_alpha * Ebeta
    st = st.at[:K].add(start_counts)
    return tt, st


def log_pis_from_theta_device(trans_theta, start_theta, K: int):
    """E[log pi] via digamma with the digamma-of-row-sum denominator
    (compute_trans_A, GPI_HDP.py:3527-3535)."""
    dg = jax.scipy.special.digamma
    den_t = dg(jnp.sum(trans_theta[:K, :K + 1], axis=1))
    trans_log_pi = dg(trans_theta[:K, :K]) - den_t[:, None]
    den_s = dg(jnp.sum(start_theta[:K + 1]))
    start_log_pi = dg(start_theta[:K]) - den_s
    return trans_log_pi, start_log_pi


def build_sharded_vi_step(T: int, K: int, mesh: Mesh,
                          est_limit=None, annealing: bool = True,
                          hdp_update: bool = False,
                          trans_alpha: float = 1.0, start_alpha: float = 0.1,
                          kappa: float = 0.0):
    """Build one jitted multi-record VI iteration.

    Inputs (per call):
      Y:     (R, N, T)   beats, sharded over 'records'
      resp:  (R, N, K)   hard responsibilities, sharded over 'records'
      states: ClusterState pytree with leading (R, K) axes, sharded on R
      start_log_pi: (R, K), trans_log_pi: (R, K, K)
        (with ``hdp_update=True`` these inputs are instead rho: (R, K)
        stick-breaking point estimates and prev respPair: (R, N, K, K) —
        the transition structure is recomputed on-device from counts via
        the HDP theta update, GPI_HDP.py:890-908)

    Returns (q (R, N, K), q_lat, resp', respPair', elbo (scalar, psum
    over records), states').

    Births and the rho/omega L-BFGS refinement are host-side, per
    record, between step calls (they are data-dependent control flow and
    a tiny K-dimensional problem respectively; SURVEY.md §2).
    """
    refit = gplds.build_refit(T, est_limit=est_limit, annealing=annealing)

    def per_record(Y_r, resp_r, states_r, start_r, trans_r):
        # vmap the refit over the K clusters of this record.
        def one_cluster(state_k, resp_k):
            st = gplds.reinit_cluster_state(state_k, free_deg=5.0)
            res = refit(Y_r, resp_k, st)
            return res.q, res.q_lat, res.state

        q, q_lat, states2 = jax.vmap(one_cluster, in_axes=(0, 1))(
            states_r, resp_r)
        q = q.T                       # (N, K)
        q_lat = q_lat.T
        if hdp_update:
            # start_r = rho (K,), trans_r = respPair (N, K, K)
            trans_counts = jnp.sum(trans_r, axis=0)
            start_counts = resp_r[0]
            tt, st_theta = theta_from_counts_device(
                start_r, trans_counts, start_counts,
                jnp.asarray(trans_alpha, q.dtype),
                jnp.asarray(start_alpha, q.dtype),
                jnp.asarray(kappa, q.dtype))
            trans_lp, start_lp = log_pis_from_theta_device(tt, st_theta, K)
        else:
            start_lp, trans_lp = start_r, trans_r
        resp2, logresp, respPair2, _ = hmm_ops.fb_hard(start_lp, trans_lp, q)
        elbo_r = (jnp.sum(q * resp2) + jnp.sum(q_lat * resp2)
                  + hmm_ops.entropy_terms(resp2, respPair2))
        return q, q_lat, resp2, respPair2, elbo_r, states2

    vstep = jax.vmap(per_record)

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, P("records")),
                      NamedSharding(mesh, P("records")),
                      jax.tree.map(lambda _: NamedSharding(mesh, P("records")),
                                   _state_proto(T, K)),
                      NamedSharding(mesh, P("records")),
                      NamedSharding(mesh, P("records"))),
        out_shardings=(NamedSharding(mesh, P("records")),
                       NamedSharding(mesh, P("records")),
                       NamedSharding(mesh, P("records")),
                       NamedSharding(mesh, P("records")),
                       NamedSharding(mesh, P()),
                       jax.tree.map(lambda _: NamedSharding(mesh, P("records")),
                                    _state_proto(T, K))))
    def step(Y, resp, states, start_log_pi, trans_log_pi):
        q, q_lat, resp2, respPair2, elbo_r, states2 = vstep(
            Y, resp, states, start_log_pi, trans_log_pi)
        return q, q_lat, resp2, respPair2, jnp.sum(elbo_r), states2

    return step


def _state_proto(T: int, K: int):
    theta = KernelParams(jnp.asarray(1.0), jnp.asarray(3.0),
                         jnp.asarray(0.1))
    st = gplds.init_cluster_state(jnp.arange(T, dtype=jnp.float64), theta,
                                  0.01, 0.25, 5.0)
    return st


def init_record_states(R: int, K: int, T: int,
                       theta: KernelParams | None = None,
                       ini_gamma: float = 0.01, ini_sigma: float = 0.25):
    """(R, K)-batched fresh cluster states."""
    if theta is None:
        theta = KernelParams(jnp.asarray(1.0), jnp.asarray(3.0),
                             jnp.asarray(ini_sigma))
    st = gplds.init_cluster_state(jnp.arange(T, dtype=jnp.float64), theta,
                                  ini_gamma, ini_sigma, 5.0)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (R, K) + x.shape), st)


def sharded_vi_step(Y, resp, states, start_log_pi, trans_log_pi, mesh):
    """Convenience wrapper building + running one sharded step."""
    R, N, T = Y.shape
    K = resp.shape[2]
    step = build_sharded_vi_step(T, K, mesh)
    return step(Y, resp, states, start_log_pi, trans_log_pi)
