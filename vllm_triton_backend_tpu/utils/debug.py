"""Debug/sanitizer tier — the ``TRITON_BACKEND_DEBUG`` analog.

The reference ships an env-gated device-print debug mode
(``TRITON_BACKEND_DEBUG=1`` — reference
kernels/triton_flash_attention.py:207-215 ``print_gpu``, plus host-side
stride dumps, triton_paged_decode_attention_2d.py:321-351).  SURVEY
§5.2 names jax ``checkify``/``debug.print`` as the TPU analog.  Two
tiers here, both enabled by ``VTB_DEBUG=1``:

1. **Host metadata guard** (:func:`check_batch_metadata`) — validates a
   scheduled batch BEFORE upload: slot_mapping within the page pool,
   block-table ids in range, query_start_loc monotone, seq_lens within
   the table's capacity.  This catches the dominant real failure
   (a bad block table / slot computation) with precise indices instead
   of an opaque Mosaic fault or a silent wrong-page read.
2. **In-kernel OOB page print** — the attention kernels gate a
   ``pl.debug_print`` on out-of-range page ids when
   :func:`kernel_debug` is on (see ops/pallas/decode_attention.py /
   prefill_attention.py ``foreach_page``).

Both default OFF: the guard costs host time per step and device prints
serialize the kernel.
"""

from __future__ import annotations

import os

import numpy as np


def debug_enabled() -> bool:
    return os.environ.get("VTB_DEBUG", "") not in ("", "0")


def kernel_debug() -> bool:
    """In-kernel device prints (separately gateable: VTB_DEBUG_KERNEL
    falls back to VTB_DEBUG)."""
    v = os.environ.get("VTB_DEBUG_KERNEL")
    if v is not None:
        return v not in ("", "0")
    return debug_enabled()


def check_batch_metadata(
    batch,
    num_blocks: int,
    block_size: int,
    pad_slot_id: int = -1,
) -> None:
    """Raise ValueError with precise indices on malformed metadata."""
    qsl = np.asarray(batch.query_start_loc)
    sl = np.asarray(batch.seq_lens)
    tbl = np.asarray(batch.block_table)
    slots = np.asarray(batch.slot_mapping)
    n = batch.num_seqs

    d = np.diff(qsl[: n + 1])
    if (d < 0).any():
        raise ValueError(
            f"query_start_loc not monotone at seq {int(np.argmax(d < 0))}: "
            f"{qsl[: n + 1].tolist()}"
        )
    if (tbl < 0).any() or (tbl >= num_blocks).any():
        bad = np.argwhere((tbl < 0) | (tbl >= num_blocks))[0]
        raise ValueError(
            f"block_table[{bad[0]},{bad[1]}]={int(tbl[bad[0], bad[1]])} "
            f"outside page pool [0,{num_blocks})"
        )
    max_tokens = tbl.shape[1] * block_size
    over = np.argwhere(sl[:n] > max_tokens)
    if over.size:
        i = int(over[0][0])
        raise ValueError(
            f"seq_lens[{i}]={int(sl[i])} exceeds block-table capacity "
            f"{max_tokens} ({tbl.shape[1]} pages x {block_size})"
        )
    live = slots != pad_slot_id
    limit = num_blocks * block_size
    bad = np.argwhere(live & ((slots < 0) | (slots >= limit)))
    if bad.size:
        i = int(bad[0][0])
        raise ValueError(
            f"slot_mapping[{i}]={int(slots[i])} outside cache "
            f"[0,{limit}) (and != pad {pad_slot_id})"
        )
