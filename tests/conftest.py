"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on host-platform virtual devices (the
TPU-native analog of a fake distributed backend). The axon TPU plugin in
this image overrides the JAX_PLATFORMS env var, so the platform must be
forced through jax.config *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (after env setup)

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: model-sized compiles are seconds each; cache them
# across test runs. (Tests jit whole model applies — op-by-op eager execution
# is far slower.)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
