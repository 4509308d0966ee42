"""Kernel correctness vs numpy oracles.

Tier-1 correctness in the reference's sense (scripts/test.py pins vLLM's own
unit-test parameters): decode over random seq lens, full prefill, chunked
prefill, mixed batches, GQA/MHA, sliding window, softcap, ALiBi, fp8 KV.
Tolerance discipline follows the reference (benchmark.py:328-345: decode
atol ~1e-3 of max value; fp8 KV at 1e-2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import random_batch, random_cache
from vllm_triton_backend_tpu.ops.attention import (
    unified_attention,
    xla_paged_attention,
)
from vllm_triton_backend_tpu.ops.refs import ref_paged_attention

SCALE_BY_HD = lambda hd: hd ** -0.5


def run_case(
    query_lens,
    context_lens,
    num_q_heads=4,
    num_kv_heads=2,
    head_size=128,
    block_size=16,
    num_blocks=64,
    sliding_window=0,
    logits_soft_cap=0.0,
    alibi=False,
    cache_dtype=np.float32,
    k_scale=1.0,
    v_scale=1.0,
    force_selection=None,
    atol=2e-2,
    seed=0,
    num_layers=2,
    layer=1,
    mixed_prefill_rows=0,
):
    rng = np.random.default_rng(seed)
    kv_cache = random_cache(
        rng, num_kv_heads, num_blocks, block_size, head_size,
        num_layers=num_layers,
    )
    q, block_table, meta = random_batch(
        rng, query_lens, context_lens, num_q_heads, head_size,
        block_size, num_blocks,
    )
    scale = SCALE_BY_HD(head_size)
    alibi_slopes = (
        np.geomspace(0.5, 0.01, num_q_heads).astype(np.float32)
        if alibi else None
    )

    if cache_dtype == np.float32:
        kv = jnp.asarray(kv_cache)
        ref_kv = kv_cache[layer]
    else:
        kv = jnp.asarray(kv_cache / k_scale).astype(cache_dtype)
        # oracle sees exactly what the kernel will dequantize
        ref_kv = np.asarray(kv[layer].astype(jnp.float32)) * k_scale

    ref = ref_paged_attention(
        q, ref_kv,
        np.asarray(meta.query_start_loc), np.asarray(meta.seq_lens),
        block_table, scale,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        alibi_slopes=alibi_slopes,
    )

    out = unified_attention(
        jnp.asarray(q), kv, jnp.int32(layer), meta,
        scale=scale,
        max_query_len=max(query_lens),
        max_seq_len=max(c + ql for c, ql in zip(context_lens, query_lens)),
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        alibi_slopes=None if alibi_slopes is None else jnp.asarray(alibi_slopes),
        k_scale=k_scale, v_scale=v_scale,
        force_selection=force_selection,
        mixed_prefill_rows=mixed_prefill_rows,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=atol, rtol=2e-2)
    return out


# ---------------- decode ----------------

@pytest.mark.parametrize("head_size", [64, 128])
@pytest.mark.parametrize("heads", [(4, 2), (4, 4), (8, 1)])
def test_decode_basic(heads, head_size):
    hq, hkv = heads
    run_case([1, 1, 1, 1], [0, 16, 31, 33],
             num_q_heads=hq, num_kv_heads=hkv, head_size=head_size,
             atol=2e-3)


def test_decode_block_size_32():
    run_case([1, 1], [40, 70], block_size=32, atol=2e-3)


def test_decode_sliding_window():
    run_case([1, 1, 1], [5, 40, 64], sliding_window=16, atol=2e-3)


def test_decode_softcap():
    run_case([1, 1], [33, 7], logits_soft_cap=30.0, atol=2e-3)


def test_decode_fp8_kv():
    run_case([1, 1, 1], [9, 33, 64], cache_dtype=jnp.float8_e4m3fn,
             k_scale=0.05, v_scale=0.05, atol=5e-2)


def test_decode_long_context_many_chunks():
    """KV length spanning several kernel chunks exercises the
    double-buffered DMA pipeline across chunk steps."""
    run_case([1, 1], [900, 333], num_blocks=150, atol=2e-3)


def test_decode_layer_indexing():
    """The kernel must read the layer given by layer_idx, not layer 0."""
    run_case([1, 1], [20, 40], num_layers=3, layer=2, atol=2e-3)


def test_decode_padded_seqs():
    """Zero-length padded sequences produce zeros and no NaNs."""
    rng = np.random.default_rng(3)
    kv_cache = random_cache(rng, 2, 64, 16, 128)
    q, block_table, meta = random_batch(
        rng, [1, 1], [10, 20], 4, 128, 16, 64, max_num_seqs=4,
        num_token_bucket=4,
    )
    out = unified_attention(
        jnp.asarray(np.pad(q, ((0, 2), (0, 0), (0, 0)))),
        jnp.asarray(kv_cache), jnp.int32(0), meta,
        scale=128 ** -0.5, max_query_len=1, max_seq_len=32,
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out)[2:], 0.0)


def test_decode_partials_merge():
    """return_partials + merge == direct result (the reduce_segments /
    context-parallel merge contract)."""
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_attention,
    )

    rng = np.random.default_rng(5)
    kv_cache = random_cache(rng, 2, 64, 16, 64)
    q, block_table, meta = random_batch(
        rng, [1, 1, 1], [30, 64, 7], 4, 64, 16, 64
    )
    kw = dict(scale=0.125, max_seq_len=128)
    kv = jnp.asarray(kv_cache)
    direct = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), kv, jnp.int32(0), meta.seq_lens,
            meta.block_table, **kw
        )
    )
    acc, m, l = paged_decode_attention(
        jnp.asarray(q), kv, jnp.int32(0), meta.seq_lens,
        meta.block_table, return_partials=True, **kw
    )
    merged = np.asarray(acc) / np.asarray(l)[..., None]
    np.testing.assert_allclose(merged, direct, atol=1e-4, rtol=1e-4)


def test_lane_padded_cache_head_dim():
    """Production caches pad head 64 -> 128 lanes (make_kv_caches); both
    kernels must pad q / slice outputs transparently."""
    rng = np.random.default_rng(9)
    kv_cache = random_cache(rng, 2, 64, 16, 64, head_pad=128)
    for qlens, clens, mq in (([1, 1], [30, 60], 1), ([9, 5], [10, 0], 9)):
        q, block_table, meta = random_batch(
            rng, qlens, clens, 4, 64, 16, 64
        )
        out = unified_attention(
            jnp.asarray(q), jnp.asarray(kv_cache), jnp.int32(0), meta,
            scale=64 ** -0.5, max_query_len=mq,
            max_seq_len=max(c + ql for c, ql in zip(clens, qlens)),
        )
        ref = ref_paged_attention(
            q, kv_cache[0][..., :64],
            np.asarray(meta.query_start_loc), np.asarray(meta.seq_lens),
            block_table, 64 ** -0.5,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3,
                                   rtol=2e-2)


# ---------------- prefill ----------------

@pytest.mark.parametrize("heads", [(4, 2), (4, 4)])
def test_prefill_full(heads):
    hq, hkv = heads
    run_case([17, 32, 5], [0, 0, 0], num_q_heads=hq, num_kv_heads=hkv,
             atol=2e-3)


def test_prefill_chunked():
    """Chunked prefill: new tokens attend to cached context through pages."""
    run_case([8, 16], [24, 9], atol=2e-3)


def test_prefill_mixed_with_decode_rows():
    """Mixed batch: decode rows (qlen=1) + partial + full prefill
    (reference DEC_PRE batch composition, benchmark.py:80-84)."""
    run_case([1, 7, 33], [20, 13, 0], atol=2e-3)


def test_prefill_sliding_window():
    run_case([16, 9], [10, 30], sliding_window=8, atol=2e-3)


def test_prefill_softcap():
    run_case([12, 20], [0, 11], logits_soft_cap=20.0, atol=2e-3)


def test_prefill_alibi():
    run_case([9, 17], [0, 0], alibi=True, atol=5e-3)


def test_prefill_fp8_kv():
    run_case([8, 21], [10, 0], cache_dtype=jnp.float8_e4m3fn,
             k_scale=0.05, v_scale=0.05, atol=6e-2)


def test_prefill_long_seq_multi_superblock():
    """kv length spanning several super-blocks exercises the page-accumulate
    flush path (block_size 16, super=512 -> use many pages)."""
    run_case([64], [600], num_blocks=64, atol=2e-3)


def test_prefill_layer_indexing():
    run_case([5, 12], [9, 0], num_layers=3, layer=2, atol=2e-3)


def test_force_selection_prefill_on_decode_batch():
    run_case([1, 1], [10, 22], force_selection="prefill", atol=2e-3)


# ---------------- mixed split path ----------------

def test_mixed_split_decode_riders_plus_prefills():
    """Split path (mixed_prefill_rows > 0): decode rows through the
    decode kernel + compacted prefill sub-batch (the reference's
    two-launch chunked_prefill_paged_decode design, legacy/
    triton_chunked_prefill_paged_decode.py:28-117)."""
    run_case([1, 7, 1, 33, 1], [20, 13, 40, 0, 9],
             mixed_prefill_rows=2, atol=2e-3)


def test_mixed_split_bucket_larger_than_count():
    """Bucket bound larger than the true prefill-row count: fill rows
    are masked out."""
    run_case([1, 5, 12], [16, 3, 0], mixed_prefill_rows=8, atol=2e-3)


def test_mixed_split_with_padded_rows():
    """Zero-length padded rows neither decode nor prefill."""
    run_case([1, 9, 0, 0], [25, 4, 0, 0], mixed_prefill_rows=2,
             atol=2e-3)


def test_mixed_split_sliding_window_softcap():
    run_case([1, 14, 1], [30, 8, 22], sliding_window=16,
             logits_soft_cap=25.0, mixed_prefill_rows=2, atol=2e-3)


def test_mixed_split_int8_kv():
    run_case([1, 11, 1], [33, 6, 50], cache_dtype=jnp.int8,
             k_scale=0.05, v_scale=0.05, mixed_prefill_rows=2,
             atol=5e-2)


def test_mixed_split_prefill_only_rows_still_correct():
    """All rows prefill (no decode rows): split path must still work
    even though the engine wouldn't request it for this composition."""
    run_case([5, 9], [10, 0], mixed_prefill_rows=2, atol=2e-3)


# ---------------- XLA baseline ----------------

def test_xla_baseline_matches_ref():
    rng = np.random.default_rng(7)
    kv_cache = random_cache(rng, 2, 64, 16, 64)
    q, block_table, meta = random_batch(rng, [1, 9, 16], [30, 8, 0], 4, 64, 16, 64)
    scale = 64 ** -0.5
    ref = ref_paged_attention(
        q, kv_cache[0], np.asarray(meta.query_start_loc),
        np.asarray(meta.seq_lens), block_table, scale,
    )
    out = xla_paged_attention(
        jnp.asarray(q), jnp.asarray(kv_cache), jnp.int32(0), meta,
        scale=scale, max_query_len=16, max_seq_len=31,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-2)


@pytest.mark.parametrize("chunk_pages", [1, 2, 8])
def test_decode_chunk_pages_equivalent(chunk_pages):
    """The chunk-size tunable never changes results, only the schedule."""
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_attention,
    )

    rng = np.random.default_rng(7)
    kv_cache = random_cache(rng, 4, 64, 16, 64)
    q, block_table, meta = random_batch(
        rng, [1] * 5, [37, 3, 64, 16, 50], 8, 64, 16, 64
    )
    kw = dict(scale=0.125, max_seq_len=128, logits_soft_cap=5.0)
    kv = jnp.asarray(kv_cache)
    out = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), kv, jnp.int32(0), meta.seq_lens,
            meta.block_table, chunk_pages=chunk_pages, **kw
        )
    )
    ref = ref_paged_attention(
        q, kv_cache[0],
        np.asarray(meta.query_start_loc), np.asarray(meta.seq_lens),
        block_table, 0.125, logits_soft_cap=5.0,
    )
    np.testing.assert_allclose(out, ref, atol=2e-2)


@pytest.mark.parametrize("mode", ["decode", "prefill", "mixed"])
def test_local_chunk_attention(mode):
    """Chunked local attention (iRoPE analog): kernels == oracle with the
    chunk mask, on decode, prefill, and mixed batches."""
    chunk = 32
    rng = np.random.default_rng(11)
    kv_cache = random_cache(rng, 2, 64, 16, 64)
    if mode == "decode":
        query_lens, context_lens = [1, 1, 1], [37, 64, 90]
    elif mode == "prefill":
        query_lens, context_lens = [48, 70], [0, 0]
    else:
        query_lens, context_lens = [1, 20, 40], [50, 33, 0]
    q, block_table, meta = random_batch(
        rng, query_lens, context_lens, 4, 64, 16, 64
    )
    max_q = max(query_lens)
    max_s = max(c + ql for c, ql in zip(context_lens, query_lens))
    kv = jnp.asarray(kv_cache)
    out = unified_attention(
        jnp.asarray(q), kv, jnp.int32(0), meta,
        scale=0.125, max_query_len=max_q, max_seq_len=max_s,
        local_chunk_size=chunk,
    )
    ref = ref_paged_attention(
        q, kv_cache[0],
        np.asarray(meta.query_start_loc), np.asarray(meta.seq_lens),
        block_table, 0.125, local_chunk_size=chunk,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2)
    # sanity: chunking must actually change the result vs full causal
    full = np.asarray(
        unified_attention(
            jnp.asarray(q), kv, jnp.int32(0), meta,
            scale=0.125, max_query_len=max_q, max_seq_len=max_s,
        )
    )
    assert np.abs(full - ref).max() > 1e-3


def test_decode_alibi():
    """ALiBi bias in the decode kernel (reference decode kernels support
    ALiBi: triton_unified_attention.py:481-482, test.py alibi sweep)."""
    run_case([1, 1, 1], [12, 40, 70], alibi=True, atol=5e-3)


def test_decode_alibi_gqa():
    run_case([1, 1], [33, 100], num_q_heads=8, num_kv_heads=2, alibi=True,
             atol=5e-3)


# ---------------- stick-breaking variant ----------------

@pytest.mark.parametrize("attend_current", [False, True])
@pytest.mark.parametrize("heads", [(4, 2), (8, 8)])
def test_stickbreaking_decode(heads, attend_current):
    from vllm_triton_backend_tpu.ops.attention import xla_stickbreaking_decode
    from vllm_triton_backend_tpu.ops.refs import ref_stickbreaking_decode

    hq, hkv = heads
    rng = np.random.default_rng(3)
    head_size, block_size, num_blocks = 64, 16, 64
    context_lens = [1, 17, 33, 130]
    kv_cache = random_cache(rng, hkv, num_blocks, block_size, head_size)
    q, block_table, meta = random_batch(
        rng, [1] * len(context_lens), context_lens, hq, head_size,
        block_size, num_blocks,
    )
    scale = SCALE_BY_HD(head_size)
    qd = q.reshape(len(context_lens), hq, head_size)

    ref = ref_stickbreaking_decode(
        qd, kv_cache[0], np.asarray(meta.seq_lens)[: len(context_lens)],
        block_table, scale, attend_current=attend_current,
    )
    out = xla_stickbreaking_decode(
        jnp.asarray(qd), jnp.asarray(kv_cache), jnp.int32(0),
        meta.seq_lens[: len(context_lens)], jnp.asarray(block_table),
        scale=scale, max_seq_len=max(context_lens),
        attend_current=attend_current,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-2)


def test_stickbreaking_mass_bounded():
    """Unnormalized stick weights must sum to <= 1 per head."""
    from vllm_triton_backend_tpu.ops.refs import ref_stickbreaking_decode

    rng = np.random.default_rng(0)
    head_size, block_size, num_blocks = 64, 16, 32
    kv_cache = random_cache(rng, 2, num_blocks, block_size, head_size)
    # V == 1 everywhere -> output == total attention mass
    kv_cache[:, :, 1] = 1.0
    q, block_table, meta = random_batch(
        rng, [1], [100], 4, head_size, block_size, num_blocks,
    )
    out = ref_stickbreaking_decode(
        q.reshape(1, 4, head_size) * 4.0,  # sharpen logits
        kv_cache[0], np.asarray(meta.seq_lens)[:1], block_table,
        SCALE_BY_HD(head_size),
    )
    mass = np.asarray(out)[0, :, 0]
    assert np.all(mass <= 1.0 + 1e-5) and np.all(mass > 0.0)


@pytest.mark.parametrize("attend_current", [False, True])
@pytest.mark.parametrize("chunk_pages", [2, 8])
def test_stickbreaking_pallas_kernel(attend_current, chunk_pages):
    """Pallas stick-breaking decode (reverse-chunk pipeline carrying the
    suffix log-mass) vs the numpy oracle (VERDICT r1 item 10)."""
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        stickbreaking_decode_attention,
    )
    from vllm_triton_backend_tpu.ops.refs import ref_stickbreaking_decode

    hq, hkv = 8, 2
    rng = np.random.default_rng(5)
    head_size, block_size, num_blocks = 64, 16, 64
    context_lens = [1, 17, 33, 130]
    kv_cache = random_cache(rng, hkv, num_blocks, block_size, head_size)
    q, block_table, meta = random_batch(
        rng, [1] * len(context_lens), context_lens, hq, head_size,
        block_size, num_blocks,
    )
    scale = SCALE_BY_HD(head_size)
    qd = q.reshape(len(context_lens), hq, head_size)

    ref = ref_stickbreaking_decode(
        qd, kv_cache[0], np.asarray(meta.seq_lens)[: len(context_lens)],
        block_table, scale, attend_current=attend_current,
    )
    out = stickbreaking_decode_attention(
        jnp.asarray(qd), jnp.asarray(kv_cache), jnp.int32(0),
        meta.seq_lens[: len(context_lens)], jnp.asarray(block_table),
        scale=scale, max_seq_len=160,
        attend_current=attend_current, chunk_pages=chunk_pages,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-2)


def test_decode_pipeline_depths():
    """The chunk-DMA pipeline must be depth-correct: every
    pipeline_depth (2/3/4) produces oracle-exact output across a
    multi-chunk KV span, ragged lengths, and a GQA head layout."""
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_attention,
    )

    rng = np.random.default_rng(11)
    num_layers, hq, hkv, hd, bs, nb = 2, 8, 2, 128, 16, 80
    kv_cache = random_cache(rng, hkv, nb, bs, hd, num_layers=num_layers)
    q, block_table, meta = random_batch(
        rng, [1, 1, 1], [300, 17, 129], hq, hd, bs, nb
    )
    scale = SCALE_BY_HD(hd)
    ref = ref_paged_attention(
        q, kv_cache[1],
        np.asarray(meta.query_start_loc), np.asarray(meta.seq_lens),
        block_table, scale,
    )
    for depth in (2, 3, 4):
        out = paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kv_cache), jnp.int32(1),
            meta.seq_lens, meta.block_table,
            scale=scale, max_seq_len=512,
            chunk_pages=2,  # 16 chunks for the long seq
            pipeline_depth=depth,
        )
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=2e-3, rtol=1e-3,
        ), depth


def test_append_decode_pipeline_depths():
    """Depth sweep through the fused append-attend path: cache write
    placement must stay correct when more chunks are in flight."""
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_append_attention,
    )

    rng = np.random.default_rng(12)
    hq, hkv, hd, bs, nb = 4, 2, 128, 16, 64
    ctx = [100, 37]  # length INCLUDING the current (new) token
    kv_cache = random_cache(rng, hkv, nb, bs, hd, num_layers=1)
    q, block_table, meta = random_batch(
        rng, [1, 1], [c - 1 for c in ctx], hq, hd, bs, nb
    )
    k_new = rng.standard_normal((2, hkv, hd), dtype=np.float32)
    v_new = rng.standard_normal((2, hkv, hd), dtype=np.float32)
    # oracle: write-then-attend
    ref_cache = np.array(kv_cache[0])
    slots = []
    for i, c in enumerate(ctx):
        pg = block_table[i, (c - 1) // bs]
        slots.append(int(pg) * bs + (c - 1) % bs)
        ref_cache[pg, 0, :, (c - 1) % bs, :] = k_new[i]
        ref_cache[pg, 1, :, (c - 1) % bs, :] = v_new[i]
    ref = ref_paged_attention(
        q, ref_cache,
        np.asarray(meta.query_start_loc), np.asarray(meta.seq_lens),
        block_table, SCALE_BY_HD(hd),
    )
    for depth in (2, 3, 4):
        out, new_cache = paged_decode_append_attention(
            jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(kv_cache), jnp.int32(0), jnp.int32(1),
            meta.seq_lens, meta.block_table,
            jnp.asarray(slots, jnp.int32),
            scale=SCALE_BY_HD(hd), max_seq_len=256,
            chunk_pages=2, pipeline_depth=depth,
        )
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=2e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(new_cache[0]), ref_cache, atol=2e-6,
        )


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_mixed_split_fuzz_random_compositions(seed):
    """Randomized mixed batches through the split path (the reference's
    ALTERNATING/DEC_PRE/PRE_DEC composition fuzzing role,
    benchmark.py:80-84): random mixes of decode rows, partial prefills
    (context > 0), full prefills, and zero-length padding rows."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 7))
    qls, ctxs = [], []
    n_pf = 0
    for _ in range(n):
        kind = rng.choice(["dec", "partial", "full", "pad"])
        if kind == "dec":
            qls.append(1)
            ctxs.append(int(rng.integers(1, 60)))
        elif kind == "partial":
            qls.append(int(rng.integers(2, 20)))
            ctxs.append(int(rng.integers(1, 40)))
            n_pf += 1
        elif kind == "full":
            qls.append(int(rng.integers(2, 30)))
            ctxs.append(0)
            n_pf += 1
        else:
            qls.append(0)
            ctxs.append(0)
    if n_pf == 0:  # ensure the split path engages
        qls[0], ctxs[0] = 5, 3
        n_pf = 1
    bucket = 1 << max(4, (max(n_pf, 1) - 1).bit_length())
    run_case(qls, ctxs, num_blocks=96,
             mixed_prefill_rows=bucket, atol=2e-3, seed=seed)
