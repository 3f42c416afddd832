"""Long-horizon streaming stress: 1M synthetic beats, K=64 clusters
(BASELINE.json config 5).

Two modes:

* default (fixed-K classification): frozen-parameter streaming
  classifier (models/streaming.py) — all 64 morphologies known up
  front, measures pure classification throughput at constant memory.
* ``--grow`` (growth stress): full online VI via the fused streaming
  engine (models/stream_online.OnlineStreamEngine) — the stream starts
  with ONE morphology and introduces a new one every
  ``beats/n_clusters`` beats; clusters are BORN on device into
  preallocated slots up to K=64, LDS parameter updates freeze past the
  estimation limit (GPI_HDP.py:90 semantics), and memory stays
  constant (the carry is a fixed K-slot bank). Reports beats/s, final
  cluster count, and majority-mapped accuracy.

Usage: python examples/run_stress_stream.py [--beats 1000000] [--k 64]
           [--grow]
"""

import argparse
import time

import numpy as np


def synthetic_growth_stream(n, T, n_clusters, seed, start_beat,
                            interval):
    """Synthetic beats where cluster c only appears after beat
    c * interval — a growth schedule (new morphology every interval
    beats). Deterministic given (seed, start_beat)."""
    z_rng = np.random.default_rng(seed)
    z = z_rng.integers(0, n_clusters, size=n)
    # remap each beat's cluster into the currently-available set
    avail = 1 + (start_beat + np.arange(n)) // interval
    avail = np.minimum(avail, n_clusters)
    z = z % avail
    tmpl = growth_templates(T, n_clusters)
    noise_rng = np.random.default_rng(seed + 1)
    y = tmpl[z] + 0.03 * noise_rng.standard_normal((n, T))
    return y.astype(np.float64), z


def growth_templates(T, n_clusters):
    """Fixed bank of smoothed-random morphologies (unit curves scaled to
    distinct amplitudes). Near-orthogonal in R^T, so every new morphology
    is far from every committed cluster — the regime in which the
    reference's birth rule (GPI_HDP.py:2464-2541: pristine-template
    emission gate + one-sample ELBO comparison incl. the x5 latent term)
    actually prefers birth over absorption. Low-separation banks (e.g.
    overlapping Gaussian bumps) make the same rule absorb — that is
    faithful algorithm behaviour, not an engine property, so the stress
    uses a bank the algorithm segregates."""
    g = np.exp(-0.5 * ((np.arange(-6, 7)) / 2.0) ** 2)
    g /= g.sum()
    raw = np.random.default_rng(0).standard_normal((n_clusters, T + 12))
    sm = np.stack([np.convolve(r, g, mode="same")[6:6 + T] for r in raw])
    sm /= np.linalg.norm(sm, axis=1, keepdims=True)
    amps = np.random.default_rng(1).uniform(2.4, 6.0, n_clusters)
    return sm * amps[:, None] * np.sqrt(T) / 3.0


def run_grow(args):
    from hdpgpc_tpu.data.loader import default_x_basis
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    from hdpgpc_tpu.models.stream_online import OnlineStreamEngine

    K, T = args.k, args.t
    interval = max(args.beats // K, 1)
    warm, _ = synthetic_growth_stream(256, T, K, seed=7, start_beat=0,
                                      interval=interval)
    std = float(np.std(warm))
    std_dif = float(np.std(np.diff(warm, axis=0)))
    bs = (std * 0.05, std * 0.2)
    bg = (std_dif * 0.05, std_dif * 0.2)
    model = HDPGPC(default_x_basis(T), n_outputs=1, ini_lengthscale=3.0,
                   bound_lengthscale=(1.0, 20.0), ini_gamma=std_dif,
                   ini_sigma=std, ini_outputscale=4.0, bound_sigma=bs,
                   bound_gamma=bg, verbose=False, hmm_switch=True,
                   max_models=K, bayesian_params=True,
                   estimation_limit=100, free_deg_MNIV=5,
                   compute_dtype="float32")
    eng = OnlineStreamEngine(model, K=K, chunk=args.chunk)

    def _log(obj):
        if args.log:
            import json
            with open(args.log, "a") as f:
                f.write(json.dumps(obj) + "\n")

    def _peak_rss_mb():
        import resource
        return round(resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)

    block = 65536
    done = 0
    z_all = []
    t0 = None
    t_start = time.time()
    while done < args.beats:
        n = min(block, args.beats - done)
        y, z = synthetic_growth_stream(n, T, K, seed=100 + done,
                                       start_beat=done,
                                       interval=interval)
        # refresh rho/omega on the host once per block (1000+ clusters
        # of history between refreshes is the documented cadence
        # divergence; in-program reinit still runs every beat)
        eng.run(y, hdp_refresh=True)
        z_all.append(z)
        if t0 is None:
            # exclude first-block compile from steady-state throughput
            # (single-block runs keep it and report compile-inclusive)
            t0 = time.time()
            done0 = n if args.beats > block else 0
            if done0 == 0:
                t0 = t_start
        done += n
        if done % (block * 4) < block:
            dt = max(time.time() - t0, 1e-9)
            M = int(np.asarray(eng.carry.M))
            print(f"{done}/{args.beats} beats  "
                  f"{(done - done0) / dt:.0f} beats/s  M={M}",
                  flush=True)
            # checkpoint line: a dropped tunnel still leaves a
            # committable partial artifact
            _log({"beats": done, "of": args.beats, "K": K, "M": M,
                  "beats_per_sec": round((done - done0) / dt, 1),
                  "peak_rss_mb": _peak_rss_mb()})
    dt = max(time.time() - t0, 1e-9)
    z_all = np.concatenate(z_all)
    uids = np.asarray(eng.uids)
    M = int(np.asarray(eng.carry.M))
    # majority mapping uid -> true cluster
    correct = 0
    for u in np.unique(uids):
        idx = np.flatnonzero(uids == u)
        _v, c = np.unique(z_all[idx], return_counts=True)
        correct += int(c.max())
    acc = correct / max(done, 1)
    bps = (done - done0) / dt
    print(f"GROWTH STRESS DONE: {done} beats, K_slots={K}, "
          f"clusters_born={M}, {bps:.0f} beats/s, acc={acc:.4f}, "
          f"{dt / 60:.1f} min (steady-state, first block excluded), "
          f"peak_rss={_peak_rss_mb()} MB")
    _log({"event": "done", "beats": done, "K": K, "clusters_born": M,
          "beats_per_sec": round(bps, 1), "accuracy": round(acc, 4),
          "minutes": round(dt / 60, 1), "peak_rss_mb": _peak_rss_mb()})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beats", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--t", type=int, default=90)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--grow", action="store_true",
                    help="full online VI with on-device births up to K")
    ap.add_argument("--log", default=None,
                    help="(--grow) append JSON progress/result lines here")
    args = ap.parse_args()

    if args.grow:
        args.chunk = min(args.chunk, 1024)
        return run_grow(args)

    import jax
    import jax.numpy as jnp
    from hdpgpc_tpu.data.loader import synthetic_beats
    from hdpgpc_tpu.models.streaming import (init_stream_state,
                                             stream_classify)

    K, T = args.k, args.t
    # the chunk-step's masked associative-scan filter materialises
    # (K, B, T, T) combine elements — at K=64/T=90 a B=8192 chunk is
    # a ~240 GB allocation. Cap B so the peak stays inside a v5e's
    # 16 GB HBM (B=256: ~3.7 GB across the scan's live buffers).
    args.chunk = min(args.chunk, 256)
    warm, z_warm = synthetic_beats(50 * K, T=T, n_clusters=K, noise=0.05,
                                   seed=0)
    tmpl = np.stack([warm[z_warm == k][:, :, 0].mean(0) for k in range(K)])
    # frozen-parameter classification is the f32 speed regime on TPU
    # (native MXU dtype; scores are well-separated so label decisions
    # are dtype-stable); CPU keeps f64
    dt = np.float32 if jax.default_backend() == "tpu" else np.float64
    st = init_stream_state(jnp.asarray(tmpl.astype(dt)), ini_gamma=0.001,
                           ini_sigma=0.05)

    # stream in blocks, regenerating data on the fly (constant memory)
    block = 65536
    done = 0
    correct = 0
    t0 = time.time()
    while done < args.beats:
        n = min(block, args.beats - done)
        y, z = synthetic_beats(n, T=T, n_clusters=K, noise=0.05,
                               seed=1 + done)
        st, labels = stream_classify(st, y[:, :, 0], chunk=args.chunk)
        correct += int(np.sum(labels == z))
        done += n
        if done % (block * 4) < block:
            dt = time.time() - t0
            print(f"{done}/{args.beats} beats  {done / dt:.0f} beats/s  "
                  f"acc={correct / done:.4f}", flush=True)
    dt = time.time() - t0
    print(f"STRESS DONE: {args.beats} beats, K={K}, {args.beats / dt:.0f} "
          f"beats/s, acc={correct / args.beats:.4f}, {dt / 60:.1f} min")


if __name__ == "__main__":
    main()
