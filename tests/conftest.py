"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware; the
driver separately dry-runs `__graft_entry__.dryrun_multichip`.

The environment's TPU plugin force-selects its own platform at import, so a
plain JAX_PLATFORMS env var is not enough — we must update jax.config before
any backend initializes (pytest imports conftest first, so this is safe).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Tests-only compilation cache, READ-ONLY during the suite.
#
# Earlier rounds ran the suite with no persistent cache at all (~13 min,
# every program compiled in-memory).  Enabling one must respect two
# crashes observed while trying:
# * the bench harnesses write /tmp/jax_cache from their own processes —
#   a suite sharing that dir with a concurrent TPU bench had two writers
#   and segfaulted in the cache writer.  Tests get their own stable dir.
# * `executable.serialize()` inside the cache WRITE path segfaults
#   late in a full-suite process (hundreds of loaded executables) —
#   reproducibly at tests/test_xla_ms.py's wildfire inloop compile, while
#   the identical test standalone passes and writes fine.  That's a
#   jaxlib bug we can only avoid: min_compile_time_secs is checked
#   BEFORE serialize (jax/_src/compiler.py _cache_write), so a huge
#   threshold keeps cache READS warm and skips every in-suite write.
#   New programs compile in-memory each run; populate the dir by running
#   the owning test file standalone if a recompile ever gets annoying.
_cache_dir = "/tmp/jax_cache_tests"
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)


# Modules whose tests compile many large programs (episode rollouts, PPO
# train steps, pallas kernels).  Live compiled-executable count in a single
# pytest process otherwise grows with TEST COUNT, and jaxlib gets fragile
# past a few hundred executables (round 3's end-of-suite SIGSEGV — root
# cause note: artifacts/suite_segfault_rootcause.md).  Clearing jax's
# in-process caches at these module boundaries bounds accumulation per
# module; persistent-cache READS keep any recompiles cheap.
_HEAVY_MODULE_PREFIXES = (
    "test_xla_ms",
    "test_pallas",
    "test_ppo",
    "test_training",
    "test_bench_multichip",
    "test_shard_map",
    "test_parallel",
    "test_selfplay",
)

_last_module = [None]


def _module_name(item):
    return getattr(item, "module", None) and item.module.__name__ or ""


def pytest_runtest_setup(item):
    prev, cur = _last_module[0], _module_name(item)
    if prev is not None and prev != cur and prev.startswith(
        _HEAVY_MODULE_PREFIXES
    ):
        import gc

        jax.clear_caches()
        gc.collect()
    _last_module[0] = cur


def pytest_runtest_teardown(item):
    """Invariant: NOTHING in the suite may re-enable cache writes.

    The failure mode this guards against is nasty: a test that imports a
    bench module whose import-time config sets min_compile_time back to 0
    re-arms the serialize() segfault, and the suite then dies ~200 tests
    LATER at whatever large program compiles next (that is exactly how
    round 3 found it: test_bench_multichip -> import bench_all -> crash in
    test_xla_ms).  Failing the offending test here turns that haunted-
    house crash into a one-line diagnosis."""
    v = jax.config.jax_persistent_cache_min_compile_time_secs
    d = jax.config.jax_compilation_cache_dir
    if v != 1e9 or d != _cache_dir:
        raise RuntimeError(
            f"persistent-cache config changed after {item.nodeid}: "
            f"min_compile_time={v}, dir={d} — writes must stay disabled "
            "in-suite (see the cache comment above)"
        )
