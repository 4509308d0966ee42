"""Native C++ page pool vs Python BlockAllocator — behavioral equivalence.

Drives both implementations with identical randomized workloads
(allocate / publish / append / free with shared prefixes) and asserts the
externally visible state matches at every step: free-block count, block
tables, and cached-token counts.
"""

import numpy as np
import pytest

from vllm_triton_backend_tpu.runtime.block_allocator import BlockAllocator
from vllm_triton_backend_tpu.runtime.native_pool import (
    NativeBlockAllocator,
    native_pool_available,
)

pytestmark = pytest.mark.skipif(
    not native_pool_available(), reason="g++ / native pool unavailable"
)


def test_native_basic_alloc_free():
    a = NativeBlockAllocator(8, 4)
    a.allocate("s1", list(range(10)))
    assert a.num_free_blocks == 5
    assert len(a.block_table("s1")) == 3
    a.free("s1")
    assert a.num_free_blocks == 8


def test_native_prefix_cache_hit():
    a = NativeBlockAllocator(16, 4)
    prompt = list(range(12))
    a.allocate("s1", prompt)
    a.publish_full_blocks("s1", prompt)
    sb = a.allocate("s2", prompt + [99])
    assert sb.num_cached_tokens == 12
    assert a.block_table("s2")[:3] == a.block_table("s1")[:3]


def test_native_whole_prompt_cached_leaves_one_block():
    a = NativeBlockAllocator(16, 4)
    prompt = list(range(8))
    a.allocate("s1", prompt)
    a.publish_full_blocks("s1", prompt)
    assert a.allocate("s2", prompt).num_cached_tokens == 4


def test_native_exhaustion_raises():
    a = NativeBlockAllocator(2, 4)
    a.allocate("s1", list(range(8)))
    with pytest.raises(MemoryError):
        a.append_slots("s1", 12)


def test_equivalence_random_workload():
    rng = np.random.default_rng(0)
    py = BlockAllocator(64, 4)
    cc = NativeBlockAllocator(64, 4)
    live: dict[str, list[int]] = {}
    sid = 0
    # shared token pool so prefix hits actually occur
    base = rng.integers(0, 50, size=40).tolist()
    for step in range(300):
        op = rng.choice(["alloc", "append", "publish", "free"])
        if op == "alloc" and py.num_free_blocks > 16:
            name = f"s{sid}"
            sid += 1
            # 50%: extend a shared prefix; else fresh random prompt
            if rng.random() < 0.5:
                cut = int(rng.integers(4, len(base)))
                prompt = base[:cut] + rng.integers(0, 50, 3).tolist()
            else:
                prompt = rng.integers(0, 50, int(rng.integers(3, 30))).tolist()
            if not py.can_allocate(len(prompt)):
                continue
            assert cc.can_allocate(len(prompt))
            r_py = py.allocate(name, prompt)
            r_cc = cc.allocate(name, prompt)
            assert r_py.num_cached_tokens == r_cc.num_cached_tokens, (
                f"step {step} {name}"
            )
            live[name] = prompt
        elif op == "append" and live:
            name = rng.choice(list(live))
            new_len = len(live[name]) + int(rng.integers(1, 6))
            if py.num_free_blocks < 4:
                continue
            py.append_slots(name, new_len)
            cc.append_slots(name, new_len)
            live[name] += rng.integers(0, 50, new_len - len(live[name])).tolist()
        elif op == "publish" and live:
            name = rng.choice(list(live))
            py.publish_full_blocks(name, live[name])
            cc.publish_full_blocks(name, live[name])
        elif op == "free" and live:
            name = rng.choice(list(live))
            py.free(name)
            cc.free(name)
            del live[name]
        assert py.num_free_blocks == cc.num_free_blocks, f"step {step}"
        for name in live:
            assert py.block_table(name) == cc.block_table(name), (
                f"step {step} {name}"
            )
