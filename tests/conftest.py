"""Test harness setup.

Runs the whole suite on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``) so pjit/shard_map collective paths
are exercised without TPU hardware (SURVEY.md §4 item 4).  Must run before
jax is imported anywhere.
"""

import os
import sys

# Force CPU: the ambient environment points JAX_PLATFORMS at the real TPU
# tunnel ("axon"), which must stay reserved for bench.py — unit tests run on
# a virtual 8-device CPU mesh.  The interpreter's sitecustomize imports jax
# before pytest starts, so the env var alone is latched too late; update the
# live config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# NOTE on compile caching: enabling jax's persistent compilation cache
# here (jax_compilation_cache_dir) segfaults this jaxlib build inside
# compilation_cache.get_executable_and_time when reloading entries
# (reproduced twice on clean runs).  The suite therefore relies on `slow`
# markers for a quick default loop instead; run the full matrix with
# `pytest tests/` (no -m filter).
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    Running the whole suite in one process accumulates hundreds of
    XLA:CPU executables; this jaxlib build then segfaults inside
    ``backend_compile_and_load`` partway through (reproduced twice at the
    same suite position, in different ops' compiles — position-dependent
    resource exhaustion, not a specific program).  Dropping the caches at
    module boundaries keeps the live-executable count bounded; the cost
    is only cross-module recompiles.
    """
    yield
    jax.clear_caches()


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
