"""Test configuration: force the CPU backend with 8 virtual devices.

The axon sitecustomize pins jax_platforms to the (single, remote) TPU chip;
tests must run on the host CPU so they are fast, hermetic, and can exercise
multi-chip sharding logic on a virtual 8-device mesh
(xla_force_host_platform_device_count) — per SURVEY.md §4(e).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the EC-combinator graphs are expensive to
# compile on CPU; cache them across test sessions.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
