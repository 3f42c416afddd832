"""Online streaming VI on one MIT-BIH record (reference tests/test_online.py
and test_online_warp.py with --warp).

Usage: python examples/run_online.py [record] [--beats N] [--warp]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("record", nargs="?", default="102")
    ap.add_argument("--beats", type=int, default=None)
    ap.add_argument("--lead", type=int, default=0)
    ap.add_argument("--warp", action="store_true")
    ap.add_argument("--estimation-limit", type=int, default=None)
    args = ap.parse_args()

    from hdpgpc_tpu.data.loader import default_x_basis, load_record
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    from hdpgpc_tpu.utils.eval import print_results

    data, labels = load_record(args.record, lead=args.lead)
    if args.beats:
        data, labels = data[:args.beats], labels[:args.beats]
    num_samples, T, L = data.shape
    std, std_dif, bound_sigma, bound_gamma = compute_estimators_lds(data, 30)
    noise_warp = std * 0.1

    x_basis = default_x_basis(T)
    x_train = np.arange(T, dtype=np.float64)
    sw_gp = HDPGPC(x_basis, n_outputs=L, model_type="dynamic",
                   ini_lengthscale=3.0, bound_lengthscale=(1.0, 20.0),
                   ini_gamma=std_dif, ini_sigma=std, ini_outputscale=300.0,
                   noise_warp=noise_warp,
                   bound_sigma=bound_sigma, bound_gamma=bound_gamma,
                   bound_noise_warp=(noise_warp * 0.1, noise_warp * 0.2),
                   method_compute_warp="greedy", verbose=False,
                   hmm_switch=True, max_models=100,
                   bayesian_params=True,
                   estimation_limit=args.estimation_limit,
                   free_deg_MNIV=20)
    sw_gp.warp = args.warp
    t0 = time.time()
    for i in range(data.shape[0]):
        t1 = time.time()
        sw_gp.include_sample(x_train, data[i], with_warp=args.warp)
        print(f"Sample: {i} / {data.shape[0] - 1} label: {labels[i]} "
              f"--- {time.time() - t1:.3f} seconds ---")
    print("Time --- %s mins ---" % str((time.time() - t0) / 60.0))
    print_results(sw_gp, labels, 0)


if __name__ == "__main__":
    main()
