import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_dryrun_multichip_8():
    """The full multi-record sharded VI step on the 8-device CPU mesh."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """Record-sharded step == per-record local computation."""
    from hdpgpc_tpu.parallel.records import (build_sharded_vi_step,
                                             init_record_states, make_mesh,
                                             shard_records)
    R, N, T, K = 4, 10, 12, 2
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.standard_normal((R, N, T)))
    z = rng.integers(0, K, (R, N))
    resp = jnp.asarray(np.eye(K)[z])
    states = init_record_states(R, K, T)
    start = jnp.log(jnp.ones((R, K)) / K)
    trans = jnp.log(jnp.ones((R, K, K)) / K)

    mesh = make_mesh(4)
    Ys = shard_records(mesh, Y)
    resps = shard_records(mesh, resp)
    states_s = jax.tree.map(lambda x: shard_records(mesh, x), states)
    starts = shard_records(mesh, start)
    transs = shard_records(mesh, trans)
    step = build_sharded_vi_step(T, K, mesh)
    q_s, _, resp2_s, _, elbo_s, _ = step(Ys, resps, states_s, starts, transs)

    # single-device reference: same vmapped computation, no sharding
    mesh1 = make_mesh(1)
    step1 = build_sharded_vi_step(T, K, mesh1)
    q_1, _, resp2_1, _, elbo_1, _ = step1(
        Y, resp, states, start, trans)
    np.testing.assert_allclose(np.asarray(q_s), np.asarray(q_1),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(float(elbo_s), float(elbo_1), rtol=1e-8)


def test_streaming_classifier():
    from hdpgpc_tpu.data.loader import synthetic_beats
    from hdpgpc_tpu.models.streaming import (init_stream_state,
                                             stream_classify)
    T, K = 24, 3
    y, z = synthetic_beats(800, T=T, n_clusters=K, noise=0.05, seed=2)
    tmpl = np.stack([y[:100][z[:100] == k][:, :, 0].mean(0)
                     for k in range(K)])
    st = init_stream_state(jnp.asarray(tmpl), ini_gamma=0.001,
                           ini_sigma=0.05)
    st2, labels = stream_classify(st, y[:, :, 0], chunk=256)
    acc = float(np.mean(labels == z))
    assert acc > 0.95, f"streaming accuracy {acc}"
    assert float(jnp.sum(st2.counts)) == 800.0
