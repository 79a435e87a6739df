"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per the build contract the
sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count) and the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (VERDICT r4 item 10): the heaviest
# tests (dense recovery, sharded API) serialize minutes of XLA:CPU
# compiles per run; caching cuts the warm full-suite wall.  The suite's
# test-strategy contract is SINGLE-process (SURVEY.md §4), and the dir
# is scoped per-backend (the benchmarks' documented concurrent-writer
# segfault involved a TPU process and a CPU process sharing one dir —
# suite.py), so no concurrent writers exist here.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# Full-suite SIGSEGV root cause + fix (VERDICT r3 item 1).
#
# Every XLA:CPU jit compilation JIT-links its code into anonymous mmap'd
# r-xp/r--p/rw-p section triplets (~10 mappings per compiled module,
# measured).  Compiled executables stay alive in jit caches for the whole
# process, so a single-process run of the full suite accumulates memory
# mappings linearly with compilations and crosses the kernel's
# vm.max_map_count limit (65530 on this box) during the compile-heavy
# dense tests near the end of the suite; once mmap() fails, the JIT code
# loader dereferences MAP_FAILED and the process dies with SIGSEGV.
# (Reproduced 2/2 at tests/test_track.py::test_dense_recovery_coverage
# after 202 passes with maps ≈ max_map_count at death; passes in
# isolation because a fresh process starts at ~450 mappings.)
#
# Fix: bound the mapping count.  jax.clear_caches() releases the
# executables (and their code mappings — verified to return the count to
# near-baseline), at the cost of recompiles for whatever runs next, so
# clear only when the count approaches the limit.
# ---------------------------------------------------------------------------
_MAPS_CLEAR_THRESHOLD = 30_000


def _n_maps() -> int:
    try:
        with open("/proc/self/maps") as fh:
            return sum(1 for _ in fh)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _bound_xla_code_maps():
    yield
    if _n_maps() > _MAPS_CLEAR_THRESHOLD:
        jax.clear_caches()
