"""Test harness: force the CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (the driver benches on the real chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (after env setup)

# The container's sitecustomize imports jax with JAX_PLATFORMS=axon (remote
# TPU tunnel) baked in before conftest runs, so the env var alone is not
# enough — force the CPU backend via the config flag. CI runs on 8 virtual
# CPU devices; the driver benches on the real chip separately.
jax.config.update("jax_platforms", "cpu")

# Full-f32 matmuls/convs in CI: the default precision is bf16-grade even on
# CPU, which fails exact-parity comparisons against TF/NumPy oracles. (The
# JAX_DEFAULT_MATMUL_PRECISION env var is not honored; the config flag is.)
jax.config.update("jax_default_matmul_precision", "highest")
