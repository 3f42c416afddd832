"""Data ingestion: MIT-BIH beat matrices and synthetic streams.

The reference bundles pre-segmented beats as ``<rec>.npy`` with shape
(n_beats, 90, 2) float64 plus ``<rec>_labels.npy`` (U1 symbols)
(reference hdpgpc/data/mitbih, produced by extract_data.py:16-33 with
window [60, 150] around R-87). We load those arrays directly; WFDB
re-segmentation is out of scope for the framework itself (the arrays
are the canonical fixture).

All loaders return static-shape float64 arrays; beat length is padded
to a static T if requested, so downstream jits never recompile on
shape.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

_DEFAULT_DIRS = (
    os.environ.get("HDPGPC_DATA_DIR", ""),
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data", "mitbih"),
    "/root/reference/hdpgpc/data/mitbih",
)

INCLUDED_LABELS = ['N', 'L', 'R', 'a', 'A', 'J', 'S', 'e', 'j', 'V', 'E',
                   'F', '/', 'f', 'Q', '!', 'n']


def _data_dir() -> str:
    for d in _DEFAULT_DIRS:
        if d and os.path.isdir(d):
            return d
    raise FileNotFoundError(
        "No MIT-BIH data directory found; set HDPGPC_DATA_DIR")


def list_records() -> List[str]:
    d = _data_dir()
    recs = sorted(f[:-4] for f in os.listdir(d)
                  if f.endswith(".npy") and not f.endswith("_labels.npy"))
    return recs


def load_record(rec: str, lead: Optional[int] = None,
                pad_to: Optional[int] = None,
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Load (beats, labels). beats: (N, T, L) float64.

    ``lead``: select a single lead (keepdims). ``pad_to``: right-pad the
    beat axis to a static length with edge values.
    """
    d = _data_dir()
    data = np.load(os.path.join(d, f"{rec}.npy")).astype(np.float64)
    labels = np.load(os.path.join(d, f"{rec}_labels.npy"))
    if data.ndim == 2:
        data = data[:, :, None]
    if lead is not None:
        data = data[:, :, [lead]]
    if pad_to is not None and data.shape[1] < pad_to:
        pad = pad_to - data.shape[1]
        data = np.pad(data, ((0, 0), (0, pad), (0, 0)), mode="edge")
    return data, labels


def default_x_basis(T: int) -> np.ndarray:
    """Time index support [0, T) as column vector (test_offline.py:60)."""
    return np.atleast_2d(np.arange(0, T, 1, dtype=np.float64)).T


def synthetic_beats(n: int, T: int = 90, n_clusters: int = 4,
                    n_outputs: int = 1, noise: float = 0.05,
                    seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic beat stream: Gaussian-bump morphologies with drift.

    Used by the 1M-beat / K=64 stress configs (BASELINE.json) and unit
    tests when the MIT-BIH fixtures are unavailable.
    """
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 1.0, T)
    centers = rng.uniform(0.25, 0.75, size=n_clusters)
    widths = rng.uniform(0.03, 0.12, size=n_clusters)
    amps = rng.uniform(0.8, 2.0, size=n_clusters)
    z = rng.integers(0, n_clusters, size=n)
    beats = np.zeros((n, T, n_outputs))
    for ld in range(n_outputs):
        shift = 0.02 * ld
        tmpl = amps[:, None] * np.exp(
            -0.5 * ((t[None, :] - centers[:, None] - shift) / widths[:, None]) ** 2)
        beats[:, :, ld] = tmpl[z] + noise * rng.standard_normal((n, T))
    return beats.astype(np.float64), z


def segment_beats(signal: np.ndarray, annotations: np.ndarray,
                  window=(60, 150), r_offset: int = 87,
                  scale_type: str = "mean") -> np.ndarray:
    """Segment a continuous multi-lead signal into beat windows around
    annotation samples (the reference's extraction recipe,
    get_data.py:184-203 / extract_data.py:24: window [lo, hi] relative
    to annotation - r_offset; per-beat mean subtraction for
    scale_type='mean').

    signal: (n_samples, n_leads); annotations: (n_beats,) R-peak sample
    indices. Returns (n_kept, hi - lo, n_leads) float64.
    """
    signal = np.atleast_2d(np.asarray(signal, np.float64))
    if signal.shape[0] < signal.shape[1]:
        signal = signal.T
    lo, hi = window
    beats = []
    for a in np.asarray(annotations, np.int64):
        s = a - r_offset + lo
        e = a - r_offset + hi
        if s < 0 or e > signal.shape[0]:
            continue
        b = signal[s:e].copy()
        if scale_type == "mean":
            b -= b.mean(axis=0)
        elif scale_type == "single":
            sd = b.std(axis=0)
            b = (b - b.mean(axis=0)) / np.where(sd == 0, 1.0, sd)
        beats.append(b)
    return np.asarray(beats, np.float64)


def signaltonoise(a: np.ndarray, axis: int = 0, ddof: int = 0) -> np.ndarray:
    """Mean^2 / var SNR (get_data.signaltonoise, get_data.py:243-248)."""
    a = np.asanyarray(a)
    m = a.mean(axis) ** 2
    sd = a.std(axis=axis, ddof=ddof) ** 2
    return np.where(sd == 0, 0, m / sd)


def rolling_snr(signal: np.ndarray, window_size: int) -> float:
    """Windowed SNR in dB (get_data.rolling_snr, get_data.py:235-241;
    GPI_HDP.rolling_snr, GPI_HDP.py:673-683) without pandas."""
    x = np.asarray(signal, np.float64)
    n = x.shape[0] - window_size + 1
    if n <= 1:
        return 0.0
    c = np.cumsum(np.insert(x, 0, 0.0))
    means = (c[window_size:] - c[:-window_size]) / window_size
    c2 = np.cumsum(np.insert(x * x, 0, 0.0))
    var = (c2[window_size:] - c2[:-window_size]) / window_size - means**2
    stds = np.sqrt(np.maximum(var * window_size / (window_size - 1), 0))
    mean_m = means[1:].mean()
    mean_s = stds[1:].mean()
    return float(10.0 * np.log10((mean_m**2)
                                 / max(mean_s**2, np.finfo(float).eps)))
