"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding semantics (pjit/psum over a Mesh) are exercised without TPUs
(SURVEY.md §4 implication (c))."""

import os

# Override unconditionally: the environment pins JAX_PLATFORMS to the TPU
# backend (and a sitecustomize imports jax at interpreter startup), so both
# the env var and the live jax config must be pointed back at CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices())
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"
