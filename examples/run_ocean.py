"""Non-ECG use case: clustering ocean wave spectra (the reference's
test_step_ocean.ipynb tutorial domain).

The reference ships data/ocean/freq.npy (the 171-point frequency axis);
the spectra themselves were stripped from the bundle, so this driver
synthesises JONSWAP-like spectra with regime switches when the real
data file is absent. Demonstrates the framework on a domain with very
different lengthscales from ECG.
"""

import argparse
import os
import time

import numpy as np


def jonswap_like(freq, hs, tp, gamma=3.3):
    """Simplified JONSWAP spectral shape."""
    fp = 1.0 / tp
    sigma = np.where(freq <= fp, 0.07, 0.09)
    r = np.exp(-((freq - fp) ** 2) / (2 * sigma**2 * fp**2))
    alpha = 5.0 / 16.0 * hs**2 * fp**4
    with np.errstate(divide="ignore", over="ignore"):
        s = alpha * freq**-5 * np.exp(-1.25 * (fp / freq) ** 4) * gamma**r
    return np.nan_to_num(s, posinf=0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--regimes", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (float32 = TPU speed mode)")
    args = ap.parse_args()

    freq_path = "/root/reference/hdpgpc/data/ocean/freq.npy"
    if os.path.exists(freq_path):
        freq = np.load(freq_path).astype(np.float64).reshape(-1)
    else:
        freq = np.linspace(0.03, 0.5, 171)
    T = freq.shape[0]

    rng = np.random.default_rng(0)
    params = [(1.5 + 2.5 * k, 6.0 + 4.0 * k) for k in range(args.regimes)]
    z = np.repeat(np.arange(args.regimes), args.n // args.regimes + 1)[: args.n]
    rng.shuffle(z)
    spectra = np.stack([
        jonswap_like(freq, *params[zi]) * (1 + 0.08 * rng.standard_normal(T))
        for zi in z])[:, :, None]

    from hdpgpc_tpu.data.priors import compute_estimators_lds
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    from hdpgpc_tpu.utils.eval import print_results

    std, std_dif, bs, bg = compute_estimators_lds(spectra)
    x_basis = np.atleast_2d(freq).T
    # ocean spectra need small lengthscales on the frequency axis
    # (reference test_step_ocean uses tiny lengthscales)
    m = HDPGPC(x_basis, n_outputs=1, ini_lengthscale=0.02,
               bound_lengthscale=(0.005, 0.2), ini_gamma=std_dif,
               ini_sigma=std, ini_outputscale=float(np.var(spectra)),
               bound_sigma=bs, bound_gamma=bg,
               # batch prior re-estimation reads the first 10 samples
               # (an ECG-baseline heuristic) — spectra are ~0 there, so
               # keep the constructor estimates instead
               reestimate_initial_params=False, n_explore_steps=5,
               compute_dtype=args.dtype)
    x_trains = np.tile(freq, (args.n, 1))
    t0 = time.time()
    m.include_batch(x_trains, spectra, with_warp=False)
    print("OCEAN: %.1fs, clusters=%d" % (time.time() - t0, m.M))
    print_results(m, z, 0)


if __name__ == "__main__":
    main()
