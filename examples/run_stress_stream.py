"""Long-horizon streaming stress: 1M synthetic beats, K=64 clusters
(BASELINE.json config 5).

Usage: python examples/run_stress_stream.py [--beats 1000000] [--k 64]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beats", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--t", type=int, default=90)
    ap.add_argument("--chunk", type=int, default=8192)
    args = ap.parse_args()

    import jax.numpy as jnp
    from hdpgpc_tpu.data.loader import synthetic_beats
    from hdpgpc_tpu.models.streaming import (init_stream_state,
                                             stream_classify)

    K, T = args.k, args.t
    warm, z_warm = synthetic_beats(50 * K, T=T, n_clusters=K, noise=0.05,
                                   seed=0)
    tmpl = np.stack([warm[z_warm == k][:, :, 0].mean(0) for k in range(K)])
    st = init_stream_state(jnp.asarray(tmpl), ini_gamma=0.001,
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
