"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on host-platform virtual devices
(the TPU-native analog of a fake distributed backend); set the XLA
flags before JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (after env setup)

# Persistent compile cache: model-sized CPU compiles are seconds each; cache
# them across test runs. (Eager/op-by-op execution is far slower still — tests
# jit whole model applies.)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
