"""Benchmark: offline VI sweep + online streaming on MIT-BIH record 100
(reference test_offline.py / test_online.py configurations, warp off).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology
-----------
* Steady-state timing: the first JAX device fetch on this image's
  tunnelled TPU is a one-time per-process initialisation (measured
  30-300 s), and the first run of each program shape pays XLA
  compilation; both are warmed up OUTSIDE the timed region — a first
  untimed pass compiles every program, then fresh models are timed
  end-to-end. This matches production (programs compile once per
  process; sweeps repeat) and mirrors the reference baseline, whose
  Python/torch ops have no compile step.
* The offline number is the MEDIAN of 3 timed runs (tunnel round-trip
  latency varies ~2x run-to-run; the median is the stable artifact).
* The offline speed mode runs float32 with estimation_limit
  (HDPGPC_BENCH_ESTLIM, default 300) — the reference's own long-horizon
  cost control (GPI_HDP.py:90; its test_online_warp.py uses 100). The
  quality gate (classification error <= 2% on rec 100, reference-parity
  level is 33/2272) guards the claim; f64 exact-parity configs are
  asserted separately in tests/test_reference_parity.py.
* Online: the fused streaming engine (models/stream_online.py), chunked
  at 32 beats with per-chunk rho/omega refinement; its per-beat
  partition parity vs the host fast path (and the host path's parity vs
  the reference's include_sample_fast) is asserted in tests.

vs_baseline compares against the measured CPU reference wall-time in
BASELINE_MEASURED.json (written by tools/measure_baseline.py);
vs_baseline is 0.0 when no measurement or the quality gate fails.
"""

import contextlib
import io
import json
import os
import sys
import time

import numpy as np

N_BEATS = int(os.environ.get("HDPGPC_BENCH_BEATS", "2272"))
DTYPE = os.environ.get("HDPGPC_BENCH_DTYPE", "float32")
EST_LIMIT = int(os.environ.get("HDPGPC_BENCH_ESTLIM", "300")) or None
N_RUNS = int(os.environ.get("HDPGPC_BENCH_RUNS", "3"))
# "offline" (default): s/VI-sweep on rec 100.
# "online": beats/sec for the fused streaming engine on rec 100.
MODE = os.environ.get("HDPGPC_BENCH_MODE", "offline")

if MODE == "online":
    # the streaming engine keeps its count/ELBO accounting in float64
    # (matching the host path's numpy-f64 HDP math); cluster states stay
    # in the f32 speed dtype
    os.environ.setdefault("JAX_ENABLE_X64", "1")


def _build_model(x_basis, L, std, std_dif, bound_sigma, bound_gamma,
                 est_limit=None):
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    return HDPGPC(x_basis, n_outputs=L, ini_lengthscale=3.0,
                  bound_lengthscale=(1.0, 20.0), ini_gamma=std_dif,
                  ini_sigma=std, ini_outputscale=300.0,
                  bound_sigma=bound_sigma, bound_gamma=bound_gamma,
                  verbose=False, hmm_switch=True, max_models=100,
                  bayesian_params=True, reestimate_initial_params=True,
                  n_explore_steps=5, free_deg_MNIV=5,
                  estimation_limit=est_limit, compute_dtype=DTYPE)


def _baseline(key):
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE_MEASURED.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            return json.load(f).get(key)
    return None


def bench_online():
    """Streaming throughput: fused engine beats/sec on rec 100
    (BASELINE.json names beats/sec online as a judged metric).
    Warm-up beats (compile) excluded; quality gate = majority-label
    classification error <= 2%."""
    import jax.numpy as jnp
    from hdpgpc_tpu.data.loader import default_x_basis, load_record
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.stream_online import OnlineStreamEngine

    int(jnp.zeros((), jnp.int32))
    n_beats = min(N_BEATS, 800)
    data, labels = load_record("100", lead=0)
    data = data[:n_beats]
    std, std_dif, bound_sigma, bound_gamma = compute_estimators_lds(data)
    N, T, L = data.shape
    x_basis = default_x_basis(T)
    chunk = 32
    model = _build_model(x_basis, L, std, std_dif, bound_sigma,
                         bound_gamma)
    eng = OnlineStreamEngine(model, K=16, chunk=chunk)
    warm = chunk * 3
    with contextlib.redirect_stdout(io.StringIO()):
        eng.run(data[:warm, :, 0])
        t0 = time.time()
        eng.run(data[warm:, :, 0])
    elapsed = time.time() - t0
    bps = (N - warm) / elapsed
    lab = eng.labels()
    err = 0
    M = int(np.asarray(eng.carry.M))
    for c in range(M):
        idx = np.flatnonzero(lab == c)
        if idx.size:
            _v, cnts = np.unique(labels[idx], return_counts=True)
            err += idx.size - cnts.max()
    quality_ok = (err / max(N, 1)) <= 0.02
    baseline = _baseline("reference_online_beats_per_sec")
    vs = (bps / baseline) if (baseline and quality_ok) else 0.0
    print(json.dumps({
        "metric": (f"online_stream_beats_per_sec_rec100_n{N}_{DTYPE}"
                   f"_chunk{chunk}_err{err}of{N}"),
        "value": round(bps, 4),
        "unit": "beats/s",
        "vs_baseline": round(vs, 3),
    }))


def main():
    import jax.numpy as jnp
    from hdpgpc_tpu.data.loader import default_x_basis, load_record
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.utils.eval import classification_error

    if MODE == "online":
        return bench_online()

    # one-time device/tunnel initialisation (NOT model work)
    int(jnp.zeros((), jnp.int32))

    data, labels = load_record("100", lead=0)
    data = data[:N_BEATS]
    std, std_dif, bound_sigma, bound_gamma = compute_estimators_lds(data)
    N, T, L = data.shape
    x_basis = default_x_basis(T)
    x_trains = np.tile(np.arange(T, dtype=np.float64), (N, 1))

    def one_run():
        model = _build_model(x_basis, L, std, std_dif, bound_sigma,
                             bound_gamma, est_limit=EST_LIMIT)
        t0 = time.time()
        with contextlib.redirect_stdout(io.StringIO()):
            model.include_batch(x_trains, data, with_warp=False)
        elapsed = time.time() - t0
        sweeps = max(len(model.train_elbo), 1)
        return elapsed / sweeps, model

    # ---- warm-up pass: compiles every program shape (untimed): the
    # fixed refit lattice explicitly, everything else via one full run
    warm_model = _build_model(x_basis, L, std, std_dif, bound_sigma,
                              bound_gamma, est_limit=EST_LIMIT)
    warm_model.warmup_programs(N)
    del warm_model
    one_run()

    # ---- timed steady-state runs on fresh models; median reported ----
    secs = []
    model = None
    for _ in range(max(N_RUNS, 1)):
        s, model = one_run()
        secs.append(s)
    sec_per_sweep = float(np.median(secs))

    # quality gate: the speed mode must reproduce the reference-parity
    # clustering error (rec 100 full: 33/2272) AND pass the f32
    # fragility guard (no structural decision inside dtype noise — the
    # rec-104-class divergence signal, config.f32_guard_tol); a
    # degraded run reports vs_baseline = 0 rather than a meaningless
    # speedup.
    err, tot = classification_error(model, labels[:N_BEATS], 0)
    quality_ok = (err / max(tot, 1)) <= 0.02 and not model.f32_fragile

    baseline = None
    ref_total = _baseline("reference_offline_total_sec_rec100_full")
    ref_sweeps = _baseline("reference_offline_sweeps_rec100_full") or 1
    if ref_total:
        baseline = (ref_total / ref_sweeps) * (N_BEATS / 2272.0)
    vs = (baseline / sec_per_sweep) if (baseline and quality_ok) else 0.0
    record = {
        "metric": (f"offline_vi_sec_per_sweep_rec100_n{N_BEATS}_"
                   f"{DTYPE}_est{EST_LIMIT}_median{len(secs)}_"
                   f"err{err}of{tot}"),
        "value": round(sec_per_sweep, 4),
        "unit": "s/sweep",
        "vs_baseline": round(vs, 3),
        # every timed run, not just the median — lets a variance band
        # be assembled across invocations (tunnel round-trip latency
        # swings ~2x run-to-run; docs/bench_variance.json)
        "runs_sec": [round(s, 4) for s in secs],
    }
    # Also record the judged ONLINE metric (BASELINE.json: "beats/sec
    # online") in the same single JSON line. The online engine needs
    # x64 accounting enabled at process start, so it runs as a
    # subprocess; failures degrade to omitting the online fields.
    try:
        import subprocess
        env = dict(os.environ, HDPGPC_BENCH_MODE="online")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=1800)
        line = [ln for ln in out.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        online = json.loads(line)
        record["online_metric"] = online["metric"]
        record["online_beats_per_sec"] = online["value"]
        record["online_vs_baseline"] = online["vs_baseline"]
    except Exception:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
