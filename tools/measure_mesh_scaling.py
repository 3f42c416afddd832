"""Measure multi-record scale-out throughput of the sharded VI step.

VERDICT r3 ask #7: put a NUMBER next to the mesh equality tests
(tests/test_parallel.py). BASELINE config 4's scale-out axis is
records/patients (embarrassingly parallel — SURVEY.md §2); the sharded
program is ``parallel.records.build_sharded_vi_step`` (one fixed-K VI
iteration: vmapped refit of K clusters per record + HMM FB + ELBO,
jitted over a 'records' mesh; reference per-record cost center is
GPI_HDP.py:805's include_batch loop).

Two regimes, both honest about this host:

* ``--platform tpu`` (default, the one real chip): the mesh has ONE
  device, so what is measured is the BATCHING dimension of the same
  sharded program — wall-clock per step for R in {1,2,4,8,16} records
  resident on one chip. A single record underutilises the chip, so
  records/s rises with R until the MXU saturates. On a real v5e-8 the
  identical program with mesh=8 multiplies the saturated throughput by
  the device count (zero cross-record collectives except the scalar
  ELBO psum), which is what the 8-device virtual-mesh equality test
  (test_parallel.py::test_sharded_matches_single_device) validates
  functionally.

* ``--platform cpu --devices 8``: the 8-device virtual mesh itself.
  NOTE: this host has ONE physical core — XLA's virtual CPU devices
  share one thread pool, so wall-clock parallel speedup is impossible
  by construction here; this mode demonstrates correctness + overhead
  of the sharded dispatch, not scaling. The result table says which
  regime produced each row.

Usage:
    python tools/measure_mesh_scaling.py [--steps 30] [--repeats 3]
        [--platform tpu|cpu] [--devices N] [--out docs/MESH_SCALING.md]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(R, N, T, K, steps, repeats, n_devices, dtype):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdpgpc_tpu.parallel import records as pr

    n_dev = min(n_devices, R)
    mesh = pr.make_mesh(n_dev)
    step = pr.build_sharded_vi_step(T, K, mesh)

    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.standard_normal((R, N, T)), dtype)
    resp = jnp.zeros((R, N, K), dtype).at[:, :, 0].set(1.0)
    states = jax.tree.map(lambda x: x.astype(dtype) if x.dtype.kind == "f"
                          else x, pr.init_record_states(R, K, T))
    start = jnp.full((R, K), -jnp.log(K), dtype)
    trans = jnp.full((R, K, K), -jnp.log(K), dtype)

    Y = pr.shard_records(mesh, Y)
    resp = pr.shard_records(mesh, resp)
    states = jax.tree.map(lambda x: pr.shard_records(mesh, x), states)
    start = pr.shard_records(mesh, start)
    trans = pr.shard_records(mesh, trans)

    # warm the program (compile) + one timed-region shakeout
    out = step(Y, resp, states, start, trans)
    jax.block_until_ready(out)

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        r, st = resp, states
        for _ in range(steps):
            _q, _ql, r, _rp, _e, st = step(Y, r, st, start, trans)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best, n_dev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--N", type=int, default=256, help="beats per record")
    ap.add_argument("--T", type=int, default=96)
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--rs", default="1,2,4,8,16")
    ap.add_argument("--out", default=None,
                    help="append the markdown table to this file")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    backend = jax.default_backend()
    n_devices = args.devices or len(jax.devices())
    dtype = "float32" if backend == "tpu" else "float64"

    rows = []
    base_rps = None
    for R in [int(r) for r in args.rs.split(",")]:
        sec, n_dev = bench_config(R, args.N, args.T, args.K,
                                  args.steps, args.repeats,
                                  n_devices, dtype)
        rps = R / sec
        if base_rps is None:
            base_rps = rps
        rows.append((R, n_dev, sec * 1e3, rps, rps / base_rps))
        print(f"R={R:3d} devices={n_dev} {sec * 1e3:8.2f} ms/step "
              f"{rps:8.1f} rec-steps/s  x{rps / base_rps:.2f} vs R=1",
              flush=True)

    lines = [
        "",
        f"### Sharded VI step scaling ({backend}, {n_devices} device(s), "
        f"N={args.N} T={args.T} K={args.K}, {dtype})",
        "",
        "| R records | devices | ms/step | record-steps/s | vs R=1 |",
        "|---|---|---|---|---|",
    ]
    for R, n_dev, ms, rps, sc in rows:
        lines.append(f"| {R} | {n_dev} | {ms:.2f} | {rps:.1f} | "
                     f"{sc:.2f}x |")
    md = "\n".join(lines) + "\n"
    print(md)
    if args.out:
        with open(args.out, "a") as f:
            f.write(md)
        print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
