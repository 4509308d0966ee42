"""Test bootstrap: run the suite on a virtual 8-device CPU mesh.

Multi-chip behavior is tested without TPU hardware via
``--xla_force_host_platform_device_count`` (the standard fake-mesh trick,
SURVEY.md §4).  Pallas kernels run in interpreter mode on CPU (see
ops/pallas/common.use_interpret).  Set ``VTB_TEST_PLATFORM=tpu`` to run the
suite against real hardware instead.
"""

import os

os.environ.setdefault("VTB_TEST_PLATFORM", "cpu")

if os.environ["VTB_TEST_PLATFORM"] == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # The persistent compilation cache is DISABLED for CPU test runs:
    # the jax 0.9 executable (de)serializer segfaults on some CPU
    # Pallas executables (reproduced on both the read and write paths
    # with a fresh cache dir — every earlier "flaky" suite abort had
    # this exact stack).  TPU runs keep the cache (stable all round,
    # and cold Mosaic compiles through the tunnel are expensive).
    # Env (not jax.config): the package __init__ reads it and would
    # otherwise re-enable the cache on import.
    os.environ["VTB_COMPILE_CACHE"] = "0"
    jax.config.update("jax_compilation_cache_dir", None)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    Every live CPU-JIT executable holds several memory mappings (code
    pages, guard pages); a full-suite run accumulates >60k maps and
    crosses the kernel's vm.max_map_count (65,530 default), at which
    point mmap fails inside LLVM and the process SEGFAULTS (observed:
    repeatable crash at test #136, maps polled at 55k+ shortly before).
    Module-scoped clearing keeps the ceiling far away (re-compiles are
    in-process only — the disk cache is off for CPU runs, see above)."""
    yield
    import jax

    jax.clear_caches()
