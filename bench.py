"""Benchmark: offline VI sweep on MIT-BIH record 100 (reference
test_offline.py configuration, warp off).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: steady-state sweep time. The first JAX device fetch on
this image's tunnelled TPU is a one-time per-process initialisation
(measured 30-300 s, unrelated to the model), and the first run of each
program shape pays XLA compilation; both are warmed up OUTSIDE the
timed region — a first untimed pass compiles every program, then a
fresh model is timed end-to-end. This matches how the framework runs
in production (programs compile once per process, sweeps repeat) and
mirrors the reference baseline, whose Python/torch ops have no compile
step.

vs_baseline compares against the CPU reference implementation's
wall-time for the same configuration when a measured number is
available in BASELINE_MEASURED.json (written by tools/measure_baseline.py);
otherwise vs_baseline is 0.0.
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
# "offline" (default): s/VI-sweep on rec 100.
# "online": beats/sec for the cached streaming step on rec 100.
MODE = os.environ.get("HDPGPC_BENCH_MODE", "offline")


def _build_model(x_basis, L, std, std_dif, bound_sigma, bound_gamma):
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    return HDPGPC(x_basis, n_outputs=L, ini_lengthscale=3.0,
                  bound_lengthscale=(1.0, 20.0), ini_gamma=std_dif,
                  ini_sigma=std, ini_outputscale=300.0,
                  bound_sigma=bound_sigma, bound_gamma=bound_gamma,
                  verbose=False, hmm_switch=True, max_models=100,
                  bayesian_params=True, reestimate_initial_params=True,
                  n_explore_steps=5, free_deg_MNIV=5,
                  compute_dtype=DTYPE)


def bench_online():
    """Streaming throughput: include_sample_fast beats/sec on rec 100
    (reference test_online.py prints sec/beat; BASELINE.json names
    beats/sec online as a judged metric). Warm-up beats excluded."""
    import contextlib
    import io

    import jax.numpy as jnp
    from hdpgpc_tpu.data.loader import default_x_basis, load_record
    from hdpgpc_tpu.data.priors import compute_estimators_lds

    int(jnp.zeros((), jnp.int32))
    n_beats = min(N_BEATS, 400)
    data, labels = load_record("100", lead=0)
    data = data[:n_beats]
    std, std_dif, bound_sigma, bound_gamma = compute_estimators_lds(data)
    N, T, L = data.shape
    x_basis = default_x_basis(T)
    model = _build_model(x_basis, L, std, std_dif, bound_sigma, bound_gamma)
    x = np.arange(T, dtype=np.float64)
    warm = 30
    with contextlib.redirect_stdout(io.StringIO()):
        for i in range(warm):
            model.include_sample_fast(x, data[i], with_warp=False)
        t0 = time.time()
        for i in range(warm, N):
            model.include_sample_fast(x, data[i], with_warp=False)
    elapsed = time.time() - t0
    bps = (N - warm) / elapsed
    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE_MEASURED.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            bl = json.load(f)
        ref_bps = bl.get("reference_online_beats_per_sec")
        if ref_bps:
            baseline = ref_bps
    print(json.dumps({
        "metric": f"online_fast_beats_per_sec_rec100_n{N}_{DTYPE}",
        "value": round(bps, 4),
        "unit": "beats/s",
        "vs_baseline": round(bps / baseline, 3) if baseline else 0.0,
    }))


def main():
    import jax
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

    # ---- warm-up pass: compiles every program shape (untimed) ----
    warm = _build_model(x_basis, L, std, std_dif, bound_sigma, bound_gamma)
    with contextlib.redirect_stdout(io.StringIO()):
        warm.include_batch(x_trains, data, with_warp=False)
    del warm

    # ---- timed steady-state run on a fresh model ----
    model = _build_model(x_basis, L, std, std_dif, bound_sigma, bound_gamma)
    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        model.include_batch(x_trains, data, with_warp=False)
    elapsed = time.time() - t0
    sweeps = max(len(model.train_elbo), 1)
    sec_per_sweep = elapsed / sweeps

    # quality gate: the speed mode must reproduce the reference-parity
    # clustering (rec 100 full: 33/2272); a degraded run reports
    # vs_baseline = 0 rather than a meaningless speedup.
    err, tot = classification_error(model, labels[:N_BEATS], 0)
    quality_ok = (err / max(tot, 1)) <= 0.02

    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE_MEASURED.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            bl = json.load(f)
        # measured reference (run via tools/refstubs) total / sweeps,
        # scaled linearly to the bench beat count
        ref_total = bl.get("reference_offline_total_sec_rec100_full")
        ref_sweeps = bl.get("reference_offline_sweeps_rec100_full", 1)
        if ref_total:
            baseline = (ref_total / ref_sweeps) * (N_BEATS / 2272.0)
    vs = (baseline / sec_per_sweep) if (baseline and quality_ok) else 0.0
    print(json.dumps({
        "metric": (f"offline_vi_sec_per_sweep_rec100_n{N_BEATS}_"
                   f"{DTYPE}_err{err}of{tot}"),
        "value": round(sec_per_sweep, 4),
        "unit": "s/sweep",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
