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
# Some machines export JAX_PLATFORMS=axon in the profile. tools/_common.py
# honors that env via jax.config (by design, for the CLIs) — and test
# modules that import tools in-process (test_norm_guard, test_flag_surface)
# would flip this very process onto the 1-device tunneled TPU at collection
# time, silently running the whole suite there (seen round 3: 24 spurious
# mesh/tolerance failures, 4x wall time). Pin the env for this process so
# any in-process _common import re-asserts cpu instead.
os.environ["JAX_PLATFORMS"] = "cpu"

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
