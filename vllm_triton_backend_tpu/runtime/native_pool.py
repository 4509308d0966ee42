"""ctypes bridge to the native C++ page pool (csrc/page_pool.cc).

Build-on-first-use: compiles the shared library with g++ into
``csrc/build/`` (cached by source mtime).  :class:`NativeBlockAllocator`
mirrors :class:`BlockAllocator`'s API exactly, so the scheduler can use
either; ``make_block_allocator`` picks native when available, Python
otherwise (``VTB_DISABLE_NATIVE_POOL=1`` forces the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_LIB_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build_and_load():
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = os.path.join(_CSRC, "page_pool.cc")
        out_dir = os.path.join(_CSRC, "build")
        lib_path = os.path.join(out_dir, "libpagepool.so")
        try:
            if (
                not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)
            ):
                os.makedirs(out_dir, exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                        src, "-o", lib_path,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
        except (OSError, subprocess.CalledProcessError):
            _LIB_FAILED = True
            return None
        lib.pp_create.restype = ctypes.c_void_p
        lib.pp_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.pp_destroy.argtypes = [ctypes.c_void_p]
        lib.pp_num_free_blocks.restype = ctypes.c_int64
        lib.pp_num_free_blocks.argtypes = [ctypes.c_void_p]
        lib.pp_can_allocate.restype = ctypes.c_int
        lib.pp_can_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.pp_allocate.restype = ctypes.c_int64
        lib.pp_allocate.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.pp_append_slots.restype = ctypes.c_int
        lib.pp_append_slots.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.pp_publish.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.pp_free_seq.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.pp_block_table.restype = ctypes.c_int64
        lib.pp_block_table.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.pp_num_cached_tokens.restype = ctypes.c_int64
        lib.pp_num_cached_tokens.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _LIB = lib
        return _LIB


def native_pool_available() -> bool:
    if os.environ.get("VTB_DISABLE_NATIVE_POOL") == "1":
        return False
    return _build_and_load() is not None


class NativeBlockAllocator:
    """Drop-in replacement for runtime.block_allocator.BlockAllocator."""

    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        enable_prefix_caching: bool = True,
    ):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError("native page pool unavailable")
        self._lib = lib
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        self._h = lib.pp_create(
            num_blocks, block_size, int(enable_prefix_caching)
        )
        self._ids: dict[str, int] = {}
        self._next_id = 0

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.pp_destroy(h)
            self._h = None

    def _sid(self, seq_id: str, create: bool = False) -> int:
        if seq_id not in self._ids:
            if not create:
                raise KeyError(seq_id)
            self._ids[seq_id] = self._next_id
            self._next_id += 1
        return self._ids[seq_id]

    @property
    def num_free_blocks(self) -> int:
        return self._lib.pp_num_free_blocks(self._h)

    def can_allocate(self, prompt_len: int) -> bool:
        return bool(self._lib.pp_can_allocate(self._h, prompt_len))

    def allocate(self, seq_id: str, prompt: list[int]):
        arr = np.asarray(prompt, dtype=np.int32)
        r = self._lib.pp_allocate(
            self._h,
            self._sid(seq_id, create=True),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
        )
        if r == -1:
            raise MemoryError("page pool exhausted")
        if r == -2:
            raise AssertionError(f"{seq_id} already allocated")

        from vllm_triton_backend_tpu.runtime.block_allocator import (
            SeqBlocks,
        )

        # a real value object: a class with class-level attributes would
        # return STALE .pages on any later read after mutation
        return SeqBlocks(
            pages=self.block_table(seq_id),
            num_cached_tokens=int(r),
        )

    def append_slots(self, seq_id: str, seq_len: int) -> None:
        r = self._lib.pp_append_slots(self._h, self._sid(seq_id), seq_len)
        if r == -1:
            raise MemoryError("page pool exhausted")

    def publish_full_blocks(self, seq_id: str, tokens: list[int]) -> None:
        arr = np.asarray(tokens, dtype=np.int32)
        self._lib.pp_publish(
            self._h,
            self._sid(seq_id),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
        )

    def free(self, seq_id: str) -> None:
        self._lib.pp_free_seq(self._h, self._sid(seq_id))
        del self._ids[seq_id]

    def block_table(self, seq_id: str) -> list[int]:
        cap = 4096
        out = np.zeros(cap, dtype=np.int64)
        n = self._lib.pp_block_table(
            self._h,
            self._sid(seq_id),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap,
        )
        if n < 0:
            raise KeyError(seq_id)
        return out[:n].tolist()

    def num_cached_tokens(self, seq_id: str) -> int:
        return int(
            self._lib.pp_num_cached_tokens(self._h, self._sid(seq_id))
        )


def make_block_allocator(
    num_blocks: int, block_size: int, enable_prefix_caching: bool = True
):
    """Native pool when buildable, Python fallback otherwise."""
    if native_pool_available():
        return NativeBlockAllocator(
            num_blocks, block_size, enable_prefix_caching
        )
    from vllm_triton_backend_tpu.runtime.block_allocator import (
        BlockAllocator,
    )

    return BlockAllocator(num_blocks, block_size, enable_prefix_caching)
