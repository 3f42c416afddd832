"""Full MIT-BIH sweep: offline VI on every bundled record.

Usage: python examples/run_all_records.py [--beats N] [--records 100,101]

Each record's VI search is independent (embarrassingly parallel across
records — see hdpgpc_tpu/parallel for the sharded fixed-assignment
step); this driver runs them sequentially on one chip and reports the
per-record classification error table.
"""

import argparse
import contextlib
import io
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beats", type=int, default=None)
    ap.add_argument("--records", default=None)
    ap.add_argument("--hdp", default="balanced")
    args = ap.parse_args()

    from hdpgpc_tpu.data.loader import (default_x_basis, list_records,
                                        load_record)
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    from hdpgpc_tpu.utils.eval import classification_error

    recs = (args.records.split(",") if args.records else list_records())
    total_err = total_beats = 0
    t_all = time.time()
    for rec in recs:
        try:
            data, labels = load_record(rec, lead=0)
        except FileNotFoundError:
            continue
        if args.beats:
            data, labels = data[:args.beats], labels[:args.beats]
        std, std_dif, bs, bg = compute_estimators_lds(data)
        N, T, L = data.shape
        x = np.tile(np.arange(T, dtype=np.float64), (N, 1))
        m = HDPGPC(default_x_basis(T), n_outputs=L, ini_gamma=std_dif,
                   ini_sigma=std, ini_outputscale=300.0, bound_sigma=bs,
                   bound_gamma=bg, reestimate_initial_params=True,
                   n_explore_steps=5, hdp_hyp=args.hdp)
        t0 = time.time()
        with contextlib.redirect_stdout(io.StringIO()):
            m.include_batch(x, data, with_warp=False)
        err, tot = classification_error(m, labels, 0)
        total_err += err
        total_beats += tot
        print(f"rec {rec}: N={N} clusters={m.M} err={err}/{tot} "
              f"({err / tot:.4f}) in {time.time() - t0:.1f}s", flush=True)
    print(f"TOTAL: {total_err}/{total_beats} "
          f"({total_err / max(total_beats, 1):.4f}) "
          f"in {(time.time() - t_all) / 60:.1f} min")


if __name__ == "__main__":
    main()
