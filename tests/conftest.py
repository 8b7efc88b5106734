"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh/shard_map) are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must run before jax initializes a backend.  Force CPU: the harness presets
# JAX_PLATFORMS=axon (the tunneled TPU) and the axon plugin overrides the env
# var, so the config API below is the binding setting; unit tests need the
# 8-virtual-device CPU mesh, and TPU verification happens via bench.py / the
# verify skill.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)  # reference solvers are f64 (src/lib.rs:38)

# Persistent compilation cache — the suite compiles many tiny programs.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
