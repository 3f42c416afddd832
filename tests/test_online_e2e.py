"""End-to-end online streaming VI on synthetic beats (reference
tests/test_online.py shape)."""

import dataclasses

import numpy as np
import pytest

from hdpgpc_tpu.data.loader import default_x_basis, synthetic_beats
from hdpgpc_tpu.data.priors import compute_estimators_lds


@pytest.mark.slow
def test_online_stream_recovers_clusters():
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    T, N = 24, 30
    y, z = synthetic_beats(N, T=T, n_clusters=2, noise=0.03, seed=4)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    m = HDPGPC(default_x_basis(T), n_outputs=1, ini_gamma=std_dif,
               ini_sigma=std, ini_outputscale=10.0, bound_sigma=bs,
               bound_gamma=bg, max_models=100)
    m.cfg = dataclasses.replace(
        m.cfg, gp=dataclasses.replace(m.cfg.gp, kernel_fit_iters=200))
    x = np.arange(T, dtype=np.float64)
    for i in range(N):
        m.include_sample(x, y[i], with_warp=False)
    assert m.T_count == N
    labels = m.resp_assigned[-1]
    err = sum(int(np.sum(z[labels == k]
                         != np.bincount(z[labels == k]).argmax()))
              for k in np.unique(labels))
    assert err / N < 0.25, f"online clustering error {err}/{N}"
    # caches consistent
    assert m.q_last.shape[0] == N
    assert m.resp_last.shape == (N, m.M)


@pytest.mark.slow
def test_online_fast_path_matches_reference_behaviour():
    """include_sample_fast (cached O(1)-per-beat step,
    GPI_HDP.py:2312-2629) must stream with flat per-beat cost and make
    the same conservative birth decisions as the reference: on THIS
    synthetic stream the reference's include_sample_fast keeps a single
    cluster (golden-pinned by running the reference via tools/refstubs
    on identical data: M=1, all labels 0 — its birth gate requires the
    reinit template's emission to beat every existing cluster, which a
    mild two-mode mixture never does)."""
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    T, N = 24, 30
    y, z = synthetic_beats(N, T=T, n_clusters=2, noise=0.03, seed=4)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    m = HDPGPC(default_x_basis(T), n_outputs=1, ini_gamma=std_dif,
               ini_sigma=std, ini_outputscale=10.0, bound_sigma=bs,
               bound_gamma=bg, max_models=100)
    m.cfg = dataclasses.replace(
        m.cfg, gp=dataclasses.replace(m.cfg.gp, kernel_fit_iters=200))
    x = np.arange(T, dtype=np.float64)
    for i in range(N):
        m.include_sample_fast(x, y[i], with_warp=False)
    assert m.T_count == N
    labels = m.resp_assigned[-1]
    assert m.M == 1, f"reference keeps one cluster here; got M={m.M}"
    np.testing.assert_array_equal(labels, 0)
    # cache invariants: hard one-hot history of the right shape
    assert m.resp_last.shape == (N, m.M)
    np.testing.assert_allclose(m.resp_last.sum(axis=1), 1.0)
    assert m.q_last.shape[0] == N


@pytest.mark.slow
def test_reload_and_classify():
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    T = 24
    y_all, z_all = synthetic_beats(60, T=T, n_clusters=3, noise=0.03,
                                   seed=1)
    y, z = y_all[:40], z_all[:40]
    y2, z2 = y_all[40:], z_all[40:]
    std, std_dif, bs, bg = compute_estimators_lds(y)
    m = HDPGPC(default_x_basis(T), n_outputs=1, ini_gamma=std_dif,
               ini_sigma=std, ini_outputscale=10.0, bound_sigma=bs,
               bound_gamma=bg)
    m.cfg = dataclasses.replace(
        m.cfg, gp=dataclasses.replace(m.cfg.gp, kernel_fit_iters=200))
    x = np.tile(np.arange(T, dtype=np.float64), (40, 1))
    m.reload_model_from_labels(x, y, z, M=3)
    pred = m.cluster_new_batch(np.tile(np.arange(T, dtype=np.float64),
                                       (20, 1)), y2)
    acc = float(np.mean(pred == z2))
    assert acc > 0.9, f"classification accuracy {acc}"


@pytest.mark.slow
def test_save_load_swgp_roundtrip(tmp_path):
    """Checkpoints are a safe npz archive (no pickle on load);
    save -> load must reproduce scoring state exactly."""
    import numpy as np
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    T, N = 24, 20
    y, z = synthetic_beats(N, T=T, n_clusters=2, noise=0.03, seed=7)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    m = HDPGPC(default_x_basis(T), n_outputs=1, ini_gamma=std_dif,
               ini_sigma=std, ini_outputscale=10.0, bound_sigma=bs,
               bound_gamma=bg)
    m.cfg = dataclasses.replace(
        m.cfg, gp=dataclasses.replace(m.cfg.gp, kernel_fit_iters=200))
    x = np.arange(T, dtype=np.float64)
    for i in range(N):
        m.include_sample(x, y[i], with_warp=False)
    p = str(tmp_path / "ckpt.npz")
    m.save_swgp(p)
    import zipfile
    assert zipfile.is_zipfile(p), "checkpoint must be an npz, not pickle"
    m2 = HDPGPC.load_swgp(p)
    assert m2.M == m.M and m2.T_count == m.T_count
    assert m2.train_elbo == m.train_elbo
    for cl, cl2 in zip(m.clusters[0], m2.clusters[0]):
        np.testing.assert_array_equal(cl.members, cl2.members)
        np.testing.assert_array_equal(np.asarray(cl.state.A),
                                      np.asarray(cl2.state.A))
    # loaded model classifies like the original
    q1, r1, _ = m.include_sample(x, y[0], with_warp=False, classify=True)
    q2, r2, _ = m2.include_sample(x, y[0], with_warp=False, classify=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


def test_compute_h_and_baum_welch_surface():
    """Model-level compute_h / baum_welch (GPI_HDP.py:3824-3931): legacy
    ML surfaces must run on a live model and return well-formed
    log-domain quantities."""
    from hdpgpc_tpu.models.hdpgpc import HDPGPC
    T, N = 16, 8
    y, _ = synthetic_beats(N, T=T, n_clusters=2, noise=0.03, seed=9)
    std, std_dif, bs, bg = compute_estimators_lds(y)
    m = HDPGPC(default_x_basis(T), n_outputs=1, ini_gamma=std_dif,
               ini_sigma=std, ini_outputscale=10.0, bound_sigma=bs,
               bound_gamma=bg)
    m.cfg = dataclasses.replace(
        m.cfg, gp=dataclasses.replace(m.cfg.gp, kernel_fit_iters=50))
    x = np.arange(T, dtype=np.float64)
    for i in range(N):
        m.include_sample(x, y[i], with_warp=False)
    h = m.compute_h()
    assert h.shape == (N, m.M)
    # rows are normalized posteriors in log space
    np.testing.assert_allclose(np.exp(h).sum(axis=1), 1.0, rtol=1e-8)
    np.testing.assert_allclose(m.compute_h(time=2), h[2])
    pi_, trans = m.baum_welch()
    assert pi_.shape == (m.M,) and trans.shape == (m.M, m.M)
    assert np.all(np.exp(np.asarray(trans)).sum(axis=1) <= 1.0 + 1e-9)
    # hmm_switch=False: reference returns current pis unchanged (:3930)
    m.cfg = dataclasses.replace(m.cfg, hmm_switch=False)
    pi0, tr0 = m.baum_welch()
    assert pi0.shape == (m.M,) and tr0.shape == (m.M, m.M)
