"""Test harness: force an 8-virtual-device CPU platform BEFORE jax import.

Multi-chip sharding tests run on a host-platform mesh (the reference never
tested multi-node behavior at all — SURVEY §4); real-TPU benchmarking happens
in bench.py, not the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins a TPU platform
# zero-egress: fail HF lookups fast instead of stalling in HTTP retries
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Fast tier (pytest -m "not slow", or any -m expression containing it, or
# FSAT_FAST_TESTS=1): the suite is XLA-compile-bound on this single-core
# host, so drop the backend optimization level — measured ~2x faster cold
# compiles; results stay within every test's tolerance. The FULL suite keeps
# default optimization so default-pipeline numerics are also covered — i.e.
# fast-tier and full-suite runs compile with DIFFERENT XLA pipelines by
# design. (Must be decided before backend init, hence the argv sniff.)
import sys as _sys

_fast_tier = (os.environ.get("FSAT_FAST_TESTS") == "1"
              or any("not slow" in a for a in _sys.argv))
if _fast_tier and "xla_backend_optimization_level" not in _flags:
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags

import jax

# The session's sitecustomize force-registers a TPU PJRT plugin and overrides
# JAX_PLATFORMS; pin the platform back to host CPU before any backend init.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (hundreds of jitted
# programs on one CPU core); repeat runs hit the cache instead of XLA.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
