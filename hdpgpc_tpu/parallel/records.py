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


def build_sharded_vi_step(T: int, K: int, mesh: Mesh,
                          est_limit=None, annealing: bool = True):
    """Build one jitted multi-record VI iteration.

    Inputs (per call):
      Y:     (R, N, T)   beats, sharded over 'records'
      resp:  (R, N, K)   hard responsibilities, sharded over 'records'
      states: ClusterState pytree with leading (R, K) axes, sharded on R
      start_log_pi: (R, K), trans_log_pi: (R, K, K)

    Returns (q (R, N, K), q_lat, resp', respPair', elbo (scalar, psum
    over records), states').
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
        resp2, logresp, respPair2, _ = hmm_ops.fb_hard(start_r, trans_r, q)
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
