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


def test_sharded_step_with_hdp_update_matches_host_theta():
    """hdp_update=True recomputes the transition structure on-device
    from counts (theta update, GPI_HDP.py:400-422 + compute_trans_A,
    :3527-3535); must equal the host stick-breaking computation."""
    from hdpgpc_tpu.ops import stick_breaking as sb
    from hdpgpc_tpu.parallel.records import (build_sharded_vi_step,
                                             init_record_states, make_mesh,
                                             shard_records)
    R, N, T, K = 4, 10, 12, 3
    rng = np.random.default_rng(3)
    Y = jnp.asarray(rng.standard_normal((R, N, T)))
    z = rng.integers(0, K, (R, N))
    resp = jnp.asarray(np.eye(K)[z])
    respPair = np.zeros((R, N, K, K))
    respPair[:, np.arange(1, N)[None, :], z[:, :-1], z[:, 1:]] = 1.0
    states = init_record_states(R, K, T)
    rho = jnp.asarray(np.tile(sb.create_init_rho(K), (R, 1)))

    mesh = make_mesh(4)
    h = dict(trans_alpha=1.0, start_alpha=0.1, kappa=0.0)
    step = build_sharded_vi_step(T, K, mesh, hdp_update=True, **h)
    args = [shard_records(mesh, a) for a in
            (Y, resp, jnp.asarray(respPair))]
    states_s = jax.tree.map(lambda x: shard_records(mesh, x), states)
    rho_s = shard_records(mesh, rho)
    q_s, _, resp2_s, _, elbo_s, _ = step(args[0], args[1], states_s,
                                         rho_s, args[2])
    assert np.isfinite(float(elbo_s))

    # host-side theta for record 0 must match the device computation:
    # run the fixed-pi step with host-derived log pis and compare resp
    glob = sb.init_globals(K, 1.0, 1.0, 0.1, 0.0)
    tc = respPair[0].sum(axis=0)
    sc = np.asarray(resp[0][0])
    tt, st_theta = sb.calc_theta_full(glob, tc, sc, M=K + 1)
    trans_lp = sb.trans_log_pi_from_theta(tt, K, log_sum_exp_form=False)
    start_lp = sb.start_log_pi_from_theta(st_theta, K,
                                          log_sum_exp_form=False)
    mesh1 = make_mesh(1)
    step1 = build_sharded_vi_step(T, K, mesh1)
    q_1, _, resp2_1, _, _, _ = step1(
        Y[:1], resp[:1], jax.tree.map(lambda x: x[:1], states),
        jnp.asarray(start_lp)[None], jnp.asarray(trans_lp)[None])
    np.testing.assert_allclose(np.asarray(q_s)[0], np.asarray(q_1)[0],
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(resp2_s)[0],
                                  np.asarray(resp2_1)[0])


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


@pytest.mark.slow
def test_all_records_mesh_equals_sequential():
    """BASELINE config 4 equality: examples/run_all_records.py's mesh
    mode (one record per device, thread-pinned via jax.default_device)
    must produce exactly the sequential mode's outputs — same per-record
    algorithm, same seeds, so (clusters, error) match per record."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "run_all_records", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples", "run_all_records.py"))
    rar = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rar)

    import jax

    recs = ["100", "119"]
    beats = 100
    seq = [rar._sweep_record(r, beats, "balanced") for r in recs]
    devs = jax.devices()
    mesh = [rar._sweep_record(r, beats, "balanced",
                              device=devs[i % len(devs)])
            for i, r in enumerate(recs)]
    for s, m in zip(seq, mesh):
        assert s[:5] == m[:5], (s, m)   # (rec, N, M, err, tot) equal
