"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code
is validated on virtual CPU devices exactly as the driver's
``dryrun_multichip`` does.

Note: the image's sitecustomize pre-imports jax and registers the "axon"
TPU backend, and pre-sets ``JAX_PLATFORMS=axon`` — plain env vars are
latched before conftest runs, so we must go through ``jax.config``.
"""

import os

# must precede CPU backend initialization (read from env at backend init)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

os.environ["DENTIST_TPU_STRICT"] = "1"  # fallback paths re-raise in tests

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated test runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
