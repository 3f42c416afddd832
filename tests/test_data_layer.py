"""Data-layer breadth: segmentation scale modes, annotation
reconciliation, standard-label filtering (reference get_data.py)."""

import numpy as np
import pytest

from hdpgpc_tpu.data.loader import (reconcile_annotations, segment_beats,
                                    take_standard_labels)


def _signal(n=2000, leads=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, leads)) + 3.0


def test_segment_scale_modes():
    sig = _signal()
    ann = np.array([300, 700, 1100, 1500])
    raw = segment_beats(sig, ann, window=(60, 150), scale_type="none")
    assert raw.shape == (4, 90, 2)
    single = segment_beats(sig, ann, window=(60, 150), scale_type="single")
    np.testing.assert_allclose(single.mean(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(single.std(axis=1), 1.0, rtol=1e-12)
    mean = segment_beats(sig, ann, window=(60, 150), scale_type="mean")
    np.testing.assert_allclose(mean.mean(axis=1), 0.0, atol=1e-12)
    first = segment_beats(sig, ann, window=(60, 150), scale_type="first")
    # every beat standardised by the FIRST beat's stats (get_data.py:196)
    m0, s0 = raw[0].mean(), raw[0].std()
    np.testing.assert_allclose(first, (raw - m0) / s0, rtol=1e-12)


def test_segment_drops_out_of_range():
    sig = _signal(n=500)
    ann = np.array([10, 300, 490])       # first underflows, last overflows
    out = segment_beats(sig, ann, window=(60, 150))
    assert out.shape[0] == 1


def test_reconcile_annotations():
    ref = np.array([100, 300, 500, 700])
    test = np.array([105, 295, 1000])    # 1000 spurious; 500/700 missed
    out = reconcile_annotations(test, ref, window=60)
    # spurious dropped, missed refs added, matched test kept
    np.testing.assert_array_equal(out, [105, 295, 500, 700])


def test_reconcile_empty():
    ref = np.array([100, 200])
    np.testing.assert_array_equal(
        reconcile_annotations(np.array([]), ref), ref)
    np.testing.assert_array_equal(
        reconcile_annotations(ref, np.array([])), ref)


def test_take_standard_labels_quirks():
    """Reference quirks preserved (get_data.py:251-293): excluded rows
    are zeroed but kept in data; labels list is filtered; NaNs -> 0."""
    data = np.ones((4, 5, 2))
    data[1, 0, 0] = np.nan
    labels = ["N", "V", "?", "L"]        # '?' not in the standard set
    d, d2d, labs = take_standard_labels(data, labels)
    assert labs == ["N", "V", "L"]
    assert d.shape == (4, 5, 2)          # excluded row kept...
    np.testing.assert_array_equal(d[2], 0.0)   # ...but zeroed
    assert d[1, 0, 0] == 0.0             # NaN scrubbed
    assert (d[0] == 1.0).all()


def test_take_standard_labels_custom_filter():
    data = np.ones((3, 4))
    labels = ["N", "V", "N"]
    d, d2d, labs = take_standard_labels(data, labels, filter=["V"])
    assert labs == ["V"]
    np.testing.assert_array_equal(d[0], 0.0)
    np.testing.assert_array_equal(d[1], 1.0)
    assert len(d2d) == 3 and d2d[0].shape == (4, 1)


def test_get_data_requires_wfdb():
    from hdpgpc_tpu.data.loader import get_data
    with pytest.raises(ImportError, match="wfdb"):
        get_data("mitdb", "100")
