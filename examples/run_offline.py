"""Offline batch VI on one MIT-BIH record (reference tests/test_offline.py).

Usage: python examples/run_offline.py [record] [--beats N] [--lead L]
"""

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("record", nargs="?", default="100")
    ap.add_argument("--beats", type=int, default=None)
    ap.add_argument("--lead", type=int, default=0)
    ap.add_argument("--warp", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from hdpgpc_tpu.data.loader import default_x_basis, load_record
    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    from hdpgpc_tpu.utils.eval import print_results
    from hdpgpc_tpu.utils.plots import plot_models_plotly

    data, labels = load_record(args.record, lead=args.lead)
    if args.beats:
        data, labels = data[:args.beats], labels[:args.beats]
    num_samples, T, L = data.shape
    std, std_dif, bound_sigma, bound_gamma = compute_estimators_lds(data)
    noise_warp = std * 0.1

    x_basis = default_x_basis(T)
    x_trains = np.tile(np.arange(T, dtype=np.float64), (num_samples, 1))
    sw_gp = HDPGPC(x_basis, n_outputs=L, model_type="dynamic",
                   ini_lengthscale=3.0, bound_lengthscale=(1.0, 20.0),
                   ini_gamma=std_dif, ini_sigma=std, ini_outputscale=300.0,
                   noise_warp=noise_warp,
                   bound_sigma=bound_sigma, bound_gamma=bound_gamma,
                   bound_noise_warp=(noise_warp * 0.1, noise_warp * 0.2),
                   method_compute_warp="greedy", verbose=False,
                   hmm_switch=True, max_models=100, mode_warp="rough",
                   bayesian_params=True, reestimate_initial_params=True,
                   n_explore_steps=5, free_deg_MNIV=5)
    t0 = time.time()
    sw_gp.include_batch(x_trains, data, with_warp=args.warp)
    print("Time --- %s mins ---" % str((time.time() - t0) / 60.0))
    main_model = print_results(sw_gp, labels, 0)
    sel = sw_gp.selected_gpmodels()
    out = args.out or f"Rec{args.record}_Offline_Clusters.png"
    plot_models_plotly(sw_gp, sel, main_model, labels, 0, lead=args.lead,
                       save=out, step=0.5, plot_latent=True)
    print("saved", out)


if __name__ == "__main__":
    main()
