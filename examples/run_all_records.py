"""Full MIT-BIH sweep: offline VI on every bundled record.

Usage: python examples/run_all_records.py [--beats N] [--records 100,101]
       [--mesh [--devices D]]

Each record's VI search is independent (embarrassingly parallel across
records — SURVEY.md §2). Two execution modes:

* default: sequential on one device.
* ``--mesh``: data-parallel over the device mesh — records are
  dispatched concurrently, one per device (``jax.default_device`` is
  thread-local, so each worker thread pins its record's programs to its
  own device). Per-record control flow (birth search, accept/reject) is
  data-dependent and diverges between records, so device-per-record is
  the correct mesh layout for the full algorithm; the lockstep
  fixed-assignment iteration (refit + HDP theta update + FB) is the
  sharded-program alternative exercised by
  hdpgpc_tpu/parallel/records.build_sharded_vi_step and the driver's
  multi-chip dry run. Results are identical to the sequential mode by
  construction (same per-record algorithm, same seeds).

Validate on a virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/run_all_records.py --mesh --beats 300
"""

import argparse
import contextlib
import io
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor


class _MainThreadOnlyStdout:
    """stdout proxy that drops writes from worker threads.

    contextlib.redirect_stdout swaps sys.stdout process-wide, so with
    concurrent records one worker's redirect would hijack (or leak) the
    others' prints; this keeps only the main thread's output."""

    def __init__(self, real):
        self._real = real
        self._main = threading.main_thread().ident

    def write(self, s):
        if threading.get_ident() == self._main:
            self._real.write(s)
        return len(s)

    def flush(self):
        if threading.get_ident() == self._main:
            self._real.flush()


def _sweep_record(rec, beats, hdp, device=None, quiet_redirect=True,
                  dtype="float64"):
    import jax
    import numpy as np

    from hdpgpc_tpu.data.loader import default_x_basis, load_record
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    from hdpgpc_tpu.utils.eval import classification_error

    ctx = jax.default_device(device) if device is not None \
        else contextlib.nullcontext()
    with ctx:
        data, labels = load_record(rec, lead=0)
        if beats:
            data, labels = data[:beats], labels[:beats]
        std, std_dif, bs, bg = compute_estimators_lds(data)
        N, T, L = data.shape
        x = np.tile(np.arange(T, dtype=np.float64), (N, 1))
        m = HDPGPC(default_x_basis(T), n_outputs=L, ini_gamma=std_dif,
                   ini_sigma=std, ini_outputscale=300.0, bound_sigma=bs,
                   bound_gamma=bg, reestimate_initial_params=True,
                   n_explore_steps=5, hdp_hyp=hdp, compute_dtype=dtype)
        t0 = time.time()
        # in mesh mode the caller installs _MainThreadOnlyStdout, which
        # silences worker threads; redirect only when running solo
        redir = contextlib.redirect_stdout(io.StringIO()) \
            if quiet_redirect else contextlib.nullcontext()
        with redir:
            m.include_batch(x, data, with_warp=False)
        err, tot = classification_error(m, labels, 0)
        return rec, N, m.M, err, tot, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beats", type=int, default=None)
    ap.add_argument("--records", default=None)
    ap.add_argument("--hdp", default="balanced")
    ap.add_argument("--dtype", default="float64",
                    help="compute dtype; float32 is the TPU speed mode "
                         "(validate its quality with this sweep)")
    ap.add_argument("--mesh", action="store_true",
                    help="run records concurrently, one per device")
    ap.add_argument("--devices", type=int, default=None,
                    help="cap the number of devices used with --mesh")
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. 'cpu' for the "
                         "virtual host mesh; this image's sitecustomize "
                         "overrides the JAX_PLATFORMS env var, so the "
                         "config knob must be set explicitly)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from hdpgpc_tpu.data.loader import list_records

    recs = (args.records.split(",") if args.records else list_records())
    t_all = time.time()
    results = []
    if args.mesh:
        import jax
        devs = jax.devices()
        if args.devices:
            devs = devs[:args.devices]
        print(f"mesh mode: {len(devs)} {devs[0].platform} devices")

        def worker(i_rec):
            i, rec = i_rec
            try:
                return _sweep_record(rec, args.beats, args.hdp,
                                     device=devs[i % len(devs)],
                                     quiet_redirect=False,
                                     dtype=args.dtype)
            except FileNotFoundError:
                return None

        sys.stdout = _MainThreadOnlyStdout(sys.stdout)
        with ThreadPoolExecutor(max_workers=len(devs)) as ex:
            for r in ex.map(worker, enumerate(recs)):
                if r is None:
                    continue
                results.append(r)
                rec, N, M, err, tot, dt = r
                print(f"rec {rec}: N={N} clusters={M} err={err}/{tot} "
                      f"({err / tot:.4f}) in {dt:.1f}s", flush=True)
    else:
        for rec in recs:
            try:
                r = _sweep_record(rec, args.beats, args.hdp,
                                  dtype=args.dtype)
            except FileNotFoundError:
                continue
            results.append(r)
            rec, N, M, err, tot, dt = r
            print(f"rec {rec}: N={N} clusters={M} err={err}/{tot} "
                  f"({err / tot:.4f}) in {dt:.1f}s", flush=True)

    total_err = sum(r[3] for r in results)
    total_beats = sum(r[4] for r in results)
    print(f"TOTAL: {total_err}/{total_beats} "
          f"({total_err / max(total_beats, 1):.4f}) "
          f"in {(time.time() - t_all) / 60:.1f} min")


if __name__ == "__main__":
    main()
