"""Smoke-scale growth stress (BASELINE config 5, VERDICT r3 ask #4).

Long-horizon streaming with cluster GROWTH: the stream starts with one
morphology and introduces new ones on a schedule; clusters must be born
on device into preallocated slots (GPI_HDP.py:90 est-limit freeze
semantics), the carry must stay CONSTANT-SIZE (a fixed K-slot bank —
memory does not grow with beats or with births), and the majority-mapped
accuracy must stay high. The full-scale artifact (1M beats / K=64 on
TPU) is produced by examples/run_stress_stream.py --grow and recorded
in docs/STRESS.md; this test pins the same properties at smoke scale
(>= 50k beats) so a regression fails the suite, not just the artifact.
"""

import os
import sys

import numpy as np
import pytest

from hdpgpc_tpu.data.loader import default_x_basis
from hdpgpc_tpu.models.hdpgpc import HDPGPC
from hdpgpc_tpu.models.stream_online import OnlineStreamEngine

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))
from run_stress_stream import synthetic_growth_stream  # noqa: E402

BEATS = 50_000
T = 24
K = 12          # preallocated slots
N_CLUSTERS = 8  # true morphologies introduced over the stream


def _growth_stream(n, start_beat, interval, seed):
    """The SAME generator the 1M-beat artifact run uses
    (examples/run_stress_stream.synthetic_growth_stream)."""
    return synthetic_growth_stream(n, T, N_CLUSTERS, seed=seed,
                                   start_beat=start_beat,
                                   interval=interval)


def _carry_bytes(carry):
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(carry))


@pytest.mark.slow
def test_growth_stress_smoke():
    import jax

    interval = BEATS // N_CLUSTERS
    warm, _ = _growth_stream(256, 0, interval, seed=7)
    std = float(np.std(warm))
    std_dif = float(np.std(np.diff(warm, axis=0)))
    model = HDPGPC(default_x_basis(T), n_outputs=1, ini_lengthscale=3.0,
                   bound_lengthscale=(1.0, 20.0), ini_gamma=std_dif,
                   ini_sigma=std, ini_outputscale=4.0,
                   bound_sigma=(std * 0.05, std * 0.2),
                   bound_gamma=(std_dif * 0.05, std_dif * 0.2),
                   verbose=False, hmm_switch=True, max_models=K,
                   bayesian_params=True, estimation_limit=50,
                   free_deg_MNIV=5, compute_dtype="float32")
    eng = OnlineStreamEngine(model, K=K, chunk=2048)

    block = 10_000
    done = 0
    z_all = []
    born_at_quarter = None
    bytes_at_quarter = None
    while done < BEATS:
        y, z = _growth_stream(block, done, interval, seed=100 + done)
        eng.run(y, hdp_refresh=True)
        z_all.append(z)
        done += block
        if born_at_quarter is None and done >= BEATS // 4:
            born_at_quarter = int(np.asarray(eng.carry.M))
            bytes_at_quarter = _carry_bytes(eng.carry)

    z_all = np.concatenate(z_all)
    M = int(np.asarray(eng.carry.M))

    # growth observed: births happened ON DEVICE after the first block
    # (the stream starts with 1 morphology; 8 are introduced)
    assert M > born_at_quarter >= 1
    assert M >= N_CLUSTERS - 2, f"only {M} clusters born for 8 morphologies"
    assert M <= K

    # constant memory: the K-slot carry does not grow with beats/births
    assert _carry_bytes(eng.carry) == bytes_at_quarter

    # majority-mapped accuracy
    uids = np.asarray(eng.uids)
    correct = 0
    for u in np.unique(uids):
        idx = np.flatnonzero(uids == u)
        _v, c = np.unique(z_all[idx], return_counts=True)
        correct += int(c.max())
    acc = correct / BEATS
    assert acc >= 0.85, f"majority-mapped accuracy {acc:.4f}"
