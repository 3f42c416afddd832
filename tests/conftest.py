import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
# compile and execute without TPU hardware. NOTE: this image's
# sitecustomize registers the TPU backend and overrides JAX_PLATFORMS,
# so the config knob (which wins) must be set too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
