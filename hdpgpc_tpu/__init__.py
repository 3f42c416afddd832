"""hdpgpc_tpu: a TPU-native (JAX/XLA/Pallas) framework for HDP-GPC.

Hierarchical Dirichlet Process Gaussian Process Clustering — Bayesian
nonparametric dynamic clustering of fixed-length time-series segments
(e.g. ECG heartbeats), rebuilt TPU-first:

* per-cluster switching GP-LDS passes compile to single ``lax.scan``
  XLA programs (forward Kalman + per-step MNIW conjugate updates +
  RTS smoothing + fused emission/latent scoring),
* HMM message passing, HDP stick-breaking updates and ELBO accounting
  are batched fixed-shape jitted functions,
* monotone time-warp alignment is a batched fixed-iteration optax
  program,
* multi-record scale-out is data-parallel over a ``jax.sharding.Mesh``.

Capability reference: AdrianPerezHerrero/HDP-GPC (see SURVEY.md). This is
a ground-up reimplementation, not a port: the reference's Python/torch
object graph (lists of tensors, deepcopies, per-sample loops) is replaced
with fixed-shape pytrees and compiled scans.
"""

import os as _os

import jax

# The model is specified in float64 (reference: GPI_HDP.py:25,
# torch.set_default_dtype(float64)); parity requires x64 end-to-end.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the orchestrator compiles a handful of
# fixed-shape programs per (N, T, K); caching them across processes
# removes the dominant cold-start cost (remote TPU compiles).
_cache_dir = _os.environ.get(
    "HDPGPC_JIT_CACHE", _os.path.join(_os.path.expanduser("~"),
                                      ".cache", "hdpgpc_tpu_jit"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs
    pass

__version__ = "0.1.0"

from hdpgpc_tpu.config import GPConfig, HDPConfig, ModelConfig  # noqa: E402


def __getattr__(name):
    # Lazy import: the orchestrator pulls in every subsystem.
    if name == "HDPGPC":
        from hdpgpc_tpu.models.hdpgpc import HDPGPC
        return HDPGPC
    raise AttributeError(name)


__all__ = ["GPConfig", "HDPConfig", "ModelConfig", "HDPGPC", "__version__"]
