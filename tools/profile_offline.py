"""Profile the offline VI sweep on rec 100 with the phase timers.

Usage: HDPGPC_TIMING=1 python tools/profile_offline.py [n_beats]
Prints the phase table plus sweep count and total wall time.
"""

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault("HDPGPC_TIMING", "1")
    n_beats = int(sys.argv[1]) if len(sys.argv) > 1 else 2272
    from hdpgpc_tpu.data.loader import default_x_basis, load_record
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    from hdpgpc_tpu.utils.eval import classification_error

    data, labels = load_record("100", lead=0)
    data = data[:n_beats]
    std, std_dif, bound_sigma, bound_gamma = compute_estimators_lds(data)
    N, T, L = data.shape
    x_basis = default_x_basis(T)
    x_trains = np.tile(np.arange(T, dtype=np.float64), (N, 1))
    est_limit = int(os.environ.get("HDPGPC_BENCH_ESTLIM", "0")) or None

    def build():
        return HDPGPC(x_basis, n_outputs=L, ini_lengthscale=3.0,
                      bound_lengthscale=(1.0, 20.0), ini_gamma=std_dif,
                      ini_sigma=std, ini_outputscale=300.0,
                      bound_sigma=bound_sigma, bound_gamma=bound_gamma,
                      verbose=False, hmm_switch=True, max_models=100,
                      bayesian_params=True, reestimate_initial_params=True,
                      n_explore_steps=5, free_deg_MNIV=5,
                      estimation_limit=est_limit,
                      compute_dtype=os.environ.get("HDPGPC_BENCH_DTYPE",
                                                   "float32"))

    if os.environ.get("HDPGPC_PROFILE_WARM") == "1":
        warm = build()
        warm.warmup_programs(N)
        with contextlib.redirect_stdout(io.StringIO()):
            warm.include_batch(x_trains, data, with_warp=False)
        del warm  # timings are per-instance; the timed model starts clean
    model = build()
    t0 = time.time()
    with contextlib.redirect_stdout(io.StringIO()):
        model.include_batch(x_trains, data, with_warp=False)
    elapsed = time.time() - t0
    sweeps = max(len(model.train_elbo), 1)
    err, tot = classification_error(model, labels[:n_beats], 0)
    print(f"total {elapsed:.1f}s, {sweeps} sweeps, "
          f"{elapsed / sweeps:.2f}s/sweep, err {err}/{tot}, M={model.M}")
    model.print_timings()


if __name__ == "__main__":
    main()
