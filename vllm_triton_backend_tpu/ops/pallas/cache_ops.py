"""Paged KV-cache write: scatter new token K/V into cache pages.

TPU-native equivalent of the reference's native CUDA op
``torch.ops._C_cache_ops.reshape_and_cache_flash`` with quantize-on-write
scales (reference backend/triton_attn.py:396-405; SURVEY.md §2.4).

Cache layout (fused, page-contiguous):
    ``kv_cache[L, num_blocks, 2, num_kv_heads, block_size, head_size]``
One page — K and V of every head — is one contiguous slab, the DMA unit of
the attention kernels.

Why ``dynamic_update_slice`` chains and not one XLA scatter: the first
version used ``kv_cache.at[layer, pages, :, :, offs].set(...)``; measured
on a real TPU v5e, XLA refuses to update that windowed scatter in place
even with the buffer donated through the decoder's layer-``scan`` carry and
instead copies the FULL multi-GiB cache — twice per layer when the result
also feeds the attention kernel (~5 ms/layer for a 1.5 GiB cache ≈ the
whole decode-step budget).  ``dynamic_update_slice`` with the update
covering whole trailing windows IS aliased in place by XLA, so the write
costs only its own bytes.  Two paths:

* **token path** (``num_tokens <= 64``, the decode regime): one
  ``[1, 1, 2, H, 1, hd]`` DUS per token.  Measured: fused with the decode
  attention kernel the whole write+attend layer scan runs *faster* than
  attention alone did next to the scatter (0.15 ms/layer vs 5 ms/layer).
* **run path** (larger flat batches, the prefill/mixed regime): tokens of
  one sequence occupy consecutive slots, so they form page-aligned *runs*;
  each run is applied as one read-merge-write of the whole
  ``[2, H, block_size, hd]`` page under a ``while_loop`` over the actual
  run count.  The merge uses a full ``block_size`` source window (padded
  staging tensor) so the slice sizes stay static.

Dead slots (``slot_mapping == -1``, the PAD_SLOT_ID skip of reference
mamba_ssm.py / triton_attn.py:146-153): redirected to the cache's reserved
**trash page** — callers allocate ``num_blocks + 1`` pages (see
``models.llama.make_kv_caches``) and the allocator never hands out the last
one, so dead writes land in a page no block table references.  This keeps
the write a pure store (no read-modify-select per token).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_kv(x: jax.Array, scale, dtype) -> jax.Array:
    """Quantize-on-write: divide by scale, clip, cast (identity when the
    cache dtype matches the input)."""
    if dtype == x.dtype:
        return x
    x = x.astype(jnp.float32) / scale
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        x = jnp.clip(jnp.round(x), info.min, info.max)
    else:
        finfo = jnp.finfo(dtype)
        x = jnp.clip(x, float(finfo.min), float(finfo.max))
    return x.astype(dtype)


# Flat batches up to this many tokens take the per-token DUS path; larger
# ones the page-run path.  64 covers every decode batch (max_num_seqs).
_TOKEN_PATH_MAX = 64

# Run-path capacity head-room: runs = page crossings + one per sequence;
# sized for max_num_seqs up to 128 (scheduler-format slot mappings).
_MAX_SEQ_RUNS = 129


def reshape_and_cache(
    kv_cache: jax.Array,  # [L, num_blocks + 1, 2, Hkv, block_size, head]
    layer_idx: jax.Array,  # scalar int32
    key: jax.Array,  # [num_tokens, num_kv_heads, head_size]
    value: jax.Array,  # [num_tokens, num_kv_heads, head_size]
    slot_mapping: jax.Array,  # [num_tokens] int32; -1 = skip (pad)
    k_scale: jax.Array | float = 1.0,
    v_scale: jax.Array | float = 1.0,
) -> jax.Array:
    """Returns the updated kv_cache (in place when the buffer is donated).

    The cache's LAST page is the reserved trash page (never in any block
    table): padded slots (-1) are redirected there instead of dropped, so
    the update lowers to in-place ``dynamic_update_slice`` stores.
    """
    n_layers, n_pages, _, num_kv_heads, block_size, head_pad = kv_cache.shape
    trash = n_pages - 1
    dtype = kv_cache.dtype
    if key.shape[-1] != head_pad:  # cache head dim is lane-padded
        pad = ((0, 0), (0, 0), (0, head_pad - key.shape[-1]))
        key = jnp.pad(key, pad)
        value = jnp.pad(value, pad)
    upd = jnp.stack(
        (quantize_kv(key, k_scale, dtype), quantize_kv(value, v_scale, dtype)),
        axis=1,
    )  # [T, 2, Hkv, head_pad]
    num_tokens = upd.shape[0]
    slot_mapping = slot_mapping.astype(jnp.int32)
    valid = slot_mapping >= 0
    page = jnp.where(valid, slot_mapping // block_size, trash).astype(
        jnp.int32
    )
    off = jnp.where(valid, slot_mapping % block_size, 0).astype(jnp.int32)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(())
    zero = jnp.int32(0)

    if num_tokens <= _TOKEN_PATH_MAX:
        for t in range(num_tokens):
            win = upd[t][None, None, :, :, None, :]  # [1,1,2,H,1,hd]
            kv_cache = jax.lax.dynamic_update_slice(
                kv_cache, win, (lidx, page[t], zero, zero, off[t], zero)
            )
        return kv_cache

    # ---- page-run path ----
    # A run = a maximal group of consecutive tokens writing consecutive
    # slots within one page.  Scheduler batches give one run per
    # (sequence, touched page).
    prev_slot = jnp.concatenate(
        [jnp.full((1,), -2, jnp.int32), slot_mapping[:-1]]
    )
    prev_valid = jnp.concatenate([jnp.zeros((1,), bool), valid[:-1]])
    is_start = valid & (
        ~prev_valid | (slot_mapping != prev_slot + 1) | (off == 0)
    )
    run_of = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # [T]
    max_runs = num_tokens // block_size + _MAX_SEQ_RUNS
    t_idx = jnp.arange(num_tokens, dtype=jnp.int32)
    rid = jnp.where(valid, jnp.clip(run_of, 0, max_runs - 1), max_runs)
    # per-run descriptors via small scatters (overflow bin at max_runs)
    run_page = jnp.full((max_runs + 1,), trash, jnp.int32).at[rid].set(
        page, mode="drop"
    )
    run_t0 = jnp.full(
        (max_runs + 1,), jnp.iinfo(jnp.int32).max, jnp.int32
    ).at[rid].min(t_idx, mode="drop")
    run_o0 = jnp.full((max_runs + 1,), block_size, jnp.int32).at[rid].min(
        off, mode="drop"
    )
    run_hi = jnp.zeros((max_runs + 1,), jnp.int32).at[rid].max(
        off + 1, mode="drop"
    )
    n_runs = jnp.maximum(run_of[-1] + 1, 0)

    # staging source: [2, H, T + 2*bs, hd] so a full block_size window
    # around any run start is a static-size slice
    stage_src = jnp.pad(
        upd.transpose(1, 2, 0, 3),
        ((0, 0), (0, 0), (block_size, block_size), (0, 0)),
    )
    off_iota = jnp.arange(block_size, dtype=jnp.int32)

    def apply_run(state):
        p, kvc = state
        pg = run_page[p]
        o0 = run_o0[p]
        hi = run_hi[p]
        ws = run_t0[p] - o0 + block_size  # source window start (padded)
        window = jax.lax.dynamic_slice(
            stage_src,
            (zero, zero, ws, zero),
            (2, num_kv_heads, block_size, head_pad),
        )
        cur = jax.lax.dynamic_slice(
            kvc,
            (lidx, pg, zero, zero, zero, zero),
            (1, 1, 2, num_kv_heads, block_size, head_pad),
        )[0, 0]
        m = (off_iota >= o0) & (off_iota < hi)
        merged = jnp.where(m[None, None, :, None], window, cur)
        kvc = jax.lax.dynamic_update_slice(
            kvc, merged[None, None], (lidx, pg, zero, zero, zero, zero)
        )
        return p + 1, kvc

    _, kv_cache = jax.lax.while_loop(
        lambda st: st[0] < n_runs, apply_run, (jnp.int32(0), kv_cache)
    )
    return kv_cache


# ---------------------------------------------------------------------------
# Pallas window-scatter: the decode-step cache write as ONE kernel launch.
# ---------------------------------------------------------------------------


def _scatter_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    slots_ref,  # [S_pad] int32 (-1 = dead -> trash page)
    # inputs
    kvnew_ref,  # [G, 2, H, W, head_pad] VMEM block (token row replicated)
    cache_in,  # [L, P, 2, H, bs, head_pad] ANY (aliased to the output)
    # outputs
    cache_out,
    # scratch
    wbuf,  # [G, 2, H, W, head_pad] cache dtype
    rsem,  # [G] DMA
    wsem,  # [G] DMA
    *,
    block_size: int,
    group: int,
):
    g = pl.program_id(0)
    lyr = layer_ref[0]
    trash = cache_in.shape[1] - 1
    w_rows = wbuf.shape[3]

    def wslot(i):
        sl = slots_ref[g * group + i]
        valid = sl >= 0
        pg = jnp.where(valid, sl // block_size, trash)
        off = jnp.where(valid, jax.lax.rem(sl, block_size), 0)
        base = off // w_rows * w_rows
        return pg, base, off - base

    def win(ref, pg, base):
        return ref.at[lyr, pg, :, :, pl.ds(base, w_rows), :]

    # drain the previous group's writes before reusing wbuf (the windows
    # all share one byte count, so this step's descriptors drain them)
    @pl.when(g > 0)
    def _drain_prev():
        for i in range(group):
            pg, base, _ = wslot(i)
            pltpu.make_async_copy(
                wbuf.at[i], win(cache_out, pg, base), wsem.at[i]
            ).wait()

    for i in range(group):  # burst-issue all window reads
        pg, base, _ = wslot(i)
        pltpu.make_async_copy(
            win(cache_in, pg, base), wbuf.at[i], rsem.at[i]
        ).start()
    for i in range(group):
        pg, base, sub = wslot(i)
        pltpu.make_async_copy(
            win(cache_in, pg, base), wbuf.at[i], rsem.at[i]
        ).wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, wbuf.shape[1:], 2)
        wbuf[i] = jnp.where(rows == sub, kvnew_ref[i], wbuf[i])
        pltpu.make_async_copy(
            wbuf.at[i], win(cache_out, pg, base), wsem.at[i]
        ).start()

    @pl.when(g == pl.num_programs(0) - 1)
    def _drain_last():
        for i in range(group):
            pg, base, _ = wslot(i)
            pltpu.make_async_copy(
                wbuf.at[i], win(cache_out, pg, base), wsem.at[i]
            ).wait()


@functools.partial(jax.jit, static_argnames=("k_scale", "v_scale"))
def scatter_kv_windows(
    kv_cache: jax.Array,  # [L, num_blocks + 1, 2, H, bs, head_pad]
    layer_idx: jax.Array,  # scalar int32
    key: jax.Array,  # [S, H, head_size]
    value: jax.Array,  # [S, H, head_size]
    slot_mapping: jax.Array,  # [S] int32; -1 = dead (trash page)
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Decode-step cache write as ONE Pallas launch (replaces S per-token
    DUS chains): each token's K/V row is read-merge-written into a
    tile-aligned W-row window of its page.  Windows are read in one burst,
    merged with a lane-wise select, and written back — ~2 x S x W-row
    bytes total, microseconds at decode batch sizes.

    Kept OUT of the attention kernel on purpose: an aliased HBM output
    makes Mosaic serialize a kernel's cross-grid-step DMA overlap
    (measured 2x on the decode kernel — 95 us vs 48 us at batch 32), so
    the alias is confined to this tiny kernel and the attention kernel
    stays pure.  Reference semantics: reshape_and_cache_flash
    (backend/triton_attn.py:393-405) with quantize-on-write.
    """
    n_layers, n_pages, _, num_kv_heads, block_size, head_pad = (
        kv_cache.shape
    )
    num_tokens = key.shape[0]
    dtype = kv_cache.dtype
    if key.shape[-1] != head_pad:
        pad = ((0, 0), (0, 0), (0, head_pad - key.shape[-1]))
        key = jnp.pad(key, pad)
        value = jnp.pad(value, pad)
    kvn = jnp.stack(
        (quantize_kv(key, k_scale, dtype), quantize_kv(value, v_scale, dtype)),
        axis=1,
    )  # [S, 2, H, head_pad]
    w_rows = 8 if block_size % 8 == 0 else block_size
    group = min(num_tokens, 32)
    s_pad = -(-num_tokens // group) * group
    slots = slot_mapping.astype(jnp.int32)
    if s_pad != num_tokens:
        slots = jnp.pad(slots, (0, s_pad - num_tokens), constant_values=-1)
        kvn = jnp.pad(kvn, ((0, s_pad - num_tokens), (0, 0), (0, 0), (0, 0)))
    kvn = jnp.broadcast_to(
        kvn[:, :, :, None, :],
        (s_pad, 2, num_kv_heads, w_rows, head_pad),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s_pad // group,),
        in_specs=[
            pl.BlockSpec(
                (group, 2, num_kv_heads, w_rows, head_pad),
                lambda g, *prefetch: (g, 0, 0, 0, 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(
                (group, 2, num_kv_heads, w_rows, head_pad), dtype
            ),
            pltpu.SemaphoreType.DMA((group,)),
            pltpu.SemaphoreType.DMA((group,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _scatter_kernel, block_size=block_size, group=group
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases={3: 0},  # 2 scalars + kvnew + cache
        interpret=_use_interpret(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        slots,
        kvn,
        kv_cache,
    )


def _use_interpret():
    from vllm_triton_backend_tpu.ops.pallas.common import use_interpret

    return use_interpret()
