"""Shared test fixtures: random paged caches and batches.

Mirrors the reference's fixture realism (reference scripts/benchmark.py:
108,384-390 random block tables over a large page pool;
``create_kv_caches_with_random``, scripts/vllm_utils.py:46-98).
"""

from __future__ import annotations

import numpy as np

from vllm_triton_backend_tpu.ops.metadata import make_metadata


def random_cache(
    rng: np.random.Generator,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
    head_size: int,
    dtype=np.float32,
    num_layers: int = 1,
    head_pad: int | None = None,
):
    """Random fused paged cache [L, blocks, 2, Hkv, bs, hd(_pad)].

    ``head_pad`` mimics the production lane-padded layout
    (llama.make_kv_caches): real data in [..., :head_size], zeros after.
    """
    shape = (num_layers, num_blocks, 2, num_kv_heads, block_size, head_size)
    kv = (rng.standard_normal(shape) * 0.5).astype(dtype)
    if head_pad and head_pad != head_size:
        kv = np.concatenate(
            [kv, np.zeros(shape[:-1] + (head_pad - head_size,), dtype)],
            axis=-1,
        )
    return kv


def random_batch(
    rng: np.random.Generator,
    query_lens: list[int],
    context_lens: list[int],
    num_q_heads: int,
    head_size: int,
    block_size: int,
    num_blocks: int,
    dtype=np.float32,
    num_token_bucket: int | None = None,
    max_num_seqs: int | None = None,
):
    """Random q + non-overlapping random block table + metadata."""
    num_seqs = len(query_lens)
    total = sum(query_lens)
    seq_lens = [c + q for c, q in zip(context_lens, query_lens)]
    max_blocks = max(-(-s // block_size) for s in seq_lens) if seq_lens else 1
    # non-overlapping random physical pages
    perm = rng.permutation(num_blocks)
    needed = num_seqs * max_blocks
    assert needed <= num_blocks, "page pool too small for test"
    block_table = perm[:needed].reshape(num_seqs, max_blocks).astype(np.int32)
    q = (rng.standard_normal((total, num_q_heads, head_size)) * 0.5).astype(
        dtype
    )
    meta = make_metadata(
        query_lens,
        context_lens,
        block_table,
        block_size,
        num_token_bucket=num_token_bucket,
        max_num_seqs=max_num_seqs,
    )
    return q, block_table, meta
