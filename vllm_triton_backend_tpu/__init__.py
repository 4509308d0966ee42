"""vllm_triton_backend_tpu — a TPU-native paged-attention LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capability stack of
``foundation-model-stack/vllm-triton-backend`` (the reference implements a
Triton attention backend plugged into vLLM; see SURVEY.md).  This package is a
*standalone* engine: model execution, paged KV-cache management, continuous
batching, sampling, quantization, autotuning, and multi-chip sharding are all
first-class here rather than delegated to a host framework.

Layer map (TPU edition of SURVEY.md §1):

  L6  benchmarks/           serving + latency sweep drivers
  L5  runtime/              engine: scheduler, block allocator, sampler, server
  L4  ops/attention.py      unified attention dispatcher (the "backend")
  L3  ops/pallas/*          kernel wrappers (grid/launch logic)
  L2  ops/pallas/*          Pallas TPU kernels (Mosaic-compiled)
  L1  autotune/dejavu.py    persistent block-shape config cache
  L0  jaxlib/XLA/Mosaic     provided by the environment
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (set VTB_COMPILE_CACHE=0 to skip).

    First Mosaic/XLA compiles dominate cold-start latency; the on-disk
    cache makes every subsequent process reuse them — the same
    persistence story as the autotuner DB (SURVEY.md §5.4)."""
    if _os.environ.get("VTB_COMPILE_CACHE", "1") == "0":
        return
    try:
        import jax

        # Separate cache dirs per JAX platform: a CPU test run and a
        # TPU bench/smoke run executing concurrently share no entries
        # (keys embed the platform anyway) but DO race on directory-level
        # LRU eviction and timestamp updates — observed as a segfault in
        # put_executable_and_time during a concurrent suite + smoke run.
        plat = _os.environ.get("JAX_PLATFORMS", "") or "default"
        path = _os.environ.get(
            "VTB_COMPILE_CACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache",
                f"vtb_jax_cache-{plat.split(',')[0]}",
            ),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _atomic_cache_writes(path)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _atomic_cache_writes(cache_dir: str) -> None:
    """Make persistent-cache entry writes atomic (tmp + os.replace).

    jax's LRUCache.put writes entries with a bare ``Path.write_bytes``:
    a process killed mid-write (SIGTERM'd test run, preempted worker)
    leaves a truncated entry, and a concurrent reader can observe a
    partial file.  ``backend.deserialize_executable`` SEGFAULTS on such
    garbage (observed: repeatable full-suite crash after a timeout-
    killed predecessor).  Patch ``Path.write_bytes`` once, rerouting
    only writes that land inside our cache dir through a same-dir temp
    file + atomic rename — the same discipline as the autotuner DB
    (autotune/dejavu.py)."""
    import pathlib
    import tempfile

    if getattr(pathlib.Path, "_vtb_atomic_cache", None) == cache_dir:
        return
    real = _os.path.realpath(cache_dir)
    orig = pathlib.Path.write_bytes

    def write_bytes(self, data, *a, **kw):
        p = _os.path.realpath(str(self))
        if not p.startswith(real + _os.sep):
            return orig(self, data, *a, **kw)
        fd, tmp = tempfile.mkstemp(dir=_os.path.dirname(p), suffix=".tmp")
        try:
            with _os.fdopen(fd, "wb") as f:
                f.write(data)
            _os.replace(tmp, p)
            return len(data)
        except BaseException:
            try:
                _os.unlink(tmp)
            except OSError:
                pass
            raise

    pathlib.Path.write_bytes = write_bytes
    pathlib.Path._vtb_atomic_cache = cache_dir


_enable_compilation_cache()

from vllm_triton_backend_tpu.config import CacheConfig, EngineConfig, ModelConfig

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelConfig",
    "__version__",
]
