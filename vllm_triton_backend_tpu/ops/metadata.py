"""Per-step attention metadata — the scheduler <-> kernel contract.

TPU re-design of the reference's ``TritonAttentionMetadata`` dataclass
(reference backend/triton_attn.py:60-103).  All arrays are padded to static
bucket shapes so every step with the same bucket hits the same XLA executable
(the TPU answer to CUDA-graph capture).  Semantics:

  - ``query_start_loc[i]``: start offset of sequence i's new tokens in the
    flat token batch; ``query_start_loc[num_seqs]`` == num_actual_tokens.
    Padded tail repeats the last value (zero-length sequences).
  - ``seq_lens[i]``: TOTAL kv length of sequence i (context + new tokens).
  - ``block_table[i, j]``: physical page id of sequence i's j-th logical
    block.  Unused entries are 0 (they are never read thanks to masking).
  - ``slot_mapping[t]``: global cache slot (page * block_size + offset) for
    new token t; PAD_SLOT_ID (-1) marks padded tokens that must not be
    written (reference mamba_ssm.py PAD_SLOT_ID semantics; the builder fills
    unused entries with -1 at reference backend/triton_attn.py:146-153).
  - ``num_seqs``: actual number of live sequences (scalar int32).
  - ``max_query_len`` / ``max_seq_len``: host-side Python ints used for
    kernel-grid sizing and autotune keys (static under jit).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AttentionMetadata(NamedTuple):
    query_start_loc: jax.Array  # [max_num_seqs + 1] int32
    seq_lens: jax.Array  # [max_num_seqs] int32
    block_table: jax.Array  # [max_num_seqs, max_blocks_per_seq] int32
    slot_mapping: jax.Array  # [num_token_bucket] int32
    num_seqs: jax.Array  # scalar int32
    # Optional precomputed mixed-split gather/scatter plan
    # (ops.attention.plan_mixed_split).  The compaction index math is
    # layer-invariant; computing it inside the layer ``lax.scan`` cost
    # 5.4 ms/step at the 2048-token prefill shape (40 layers x 8
    # s32[2048] fusions — XLA does not hoist loop-invariant code out of
    # a scan), so the model's forward computes it ONCE before the scan.
    mixed_plan: Any = None

    @property
    def max_num_seqs(self) -> int:
        return self.seq_lens.shape[0]

    @property
    def num_tokens(self) -> int:
        return self.slot_mapping.shape[0]


def make_metadata(
    query_lens: list[int],
    context_lens: list[int],
    block_table: np.ndarray,
    block_size: int,
    num_token_bucket: int | None = None,
    max_num_seqs: int | None = None,
    pad_slot_id: int = -1,
) -> AttentionMetadata:
    """Build padded metadata from per-sequence query/context lengths.

    ``context_lens[i]`` is the number of tokens already in the cache;
    the new tokens are appended at positions [context, context+query).
    Primarily a test/bench helper — the engine's scheduler builds the same
    arrays incrementally.
    """
    num_seqs = len(query_lens)
    assert len(context_lens) == num_seqs
    total = int(sum(query_lens))
    num_token_bucket = num_token_bucket or total
    max_num_seqs = max_num_seqs or num_seqs
    assert num_token_bucket >= total and max_num_seqs >= num_seqs

    qsl = np.zeros(max_num_seqs + 1, dtype=np.int32)
    qsl[1 : num_seqs + 1] = np.cumsum(query_lens)
    qsl[num_seqs + 1 :] = total

    seq_lens = np.zeros(max_num_seqs, dtype=np.int32)
    seq_lens[:num_seqs] = np.asarray(context_lens) + np.asarray(query_lens)

    bt = np.zeros((max_num_seqs, block_table.shape[1]), dtype=np.int32)
    bt[:num_seqs] = block_table[:num_seqs]

    slots = np.full(num_token_bucket, pad_slot_id, dtype=np.int32)
    t = 0
    for i, (ql, cl) in enumerate(zip(query_lens, context_lens)):
        for p in range(cl, cl + ql):
            page = block_table[i, p // block_size]
            slots[t] = page * block_size + p % block_size
            t += 1

    return AttentionMetadata(
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(seq_lens),
        block_table=jnp.asarray(bt),
        slot_mapping=jnp.asarray(slots),
        num_seqs=jnp.int32(num_seqs),
    )
