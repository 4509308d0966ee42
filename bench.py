"""Headline benchmark — the BASELINE.md north-star metrics, one chip.

Prints ONE JSON line carrying the four north-star numbers
(BASELINE.md "Targets"; reference anchors scripts/bench_vllm_serve_avg.py
:97-123 for the serving metrics, scripts/benchmark.py:549-564 for kernel
utilization):

  * ``value``/``metric``: steady-state decode tokens/s/chip on
    granite-3.1-8B with INT8 weight-only linears + INT8 KV-cache
    (the largest north-star config that fits one v5e's 16 GB HBM —
    granite bf16 weights alone are 16 GB, so weight-only INT8 is the
    fitting configuration; reference README.md:58 names granite-3.1-8b
    as the serving example).  INT8 rather than FP8-e4m3 KV because the
    v5e VPU has no fast e4m3 path: measured (xplane trace) the decode
    kernel runs 245 us/call on an fp8 cache vs 27-44 us on int8 at the
    same byte count — int8 is this chip generation's hardware-matched
    8-bit KV format (fp8 stays fully supported, and is the right
    choice on v6e-class chips).  Prefill excluded: the decode clock
    starts once every request has produced its first token.
  * ``ttft_p50_ms``: median time-to-first-token across the batch, from
    request submission (includes queueing behind other prefills — the
    serving-driver definition).
  * ``paged_attn_util_bytes_pct``: measured decode-attention kernel time
    (device wall-clock amortized over an in-jit scan of kernel calls —
    no dispatch overhead in the loop) vs the chip's HBM roofline.
  * ``vs_baseline``: Pallas decode kernel speedup over the pure-XLA paged
    attention baseline on the same shapes (the reference's IUT-vs-
    BASELINE_TRITON methodology; the reference publishes no absolute
    numbers, BASELINE.md).

Also reports ``tinyllama_decode_tps`` (round-1 continuity config) and the
measured decode step latency.

Protocol: correctness-gate first (kernel vs oracle — incorrect kernels
never produce perf rows, reference scripts/benchmark.py:476-489), then
compile-warmup, then timed run.  Device timing is fenced with a 1-element
device-side slice fetch (fetching full arrays over the tunneled runtime
costs seconds).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _fence(x) -> None:
    import jax

    np.asarray(jax.device_get(x.ravel()[:1]))


def bench_fn(fn, warmup=3, reps=20):
    for _ in range(warmup):
        r = fn()
    _fence(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    _fence(r)
    return (time.perf_counter() - t0) / reps


def kernel_microbench(peaks):
    """Pallas decode kernel vs XLA baseline + measured HBM utilization on
    granite-3.1-8B decode shapes with an INT8 KV-cache."""
    import functools

    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.ops.attention import xla_paged_attention
    from vllm_triton_backend_tpu.ops.metadata import make_metadata
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        _paged_decode_impl,
        paged_decode_attention,
    )
    from vllm_triton_backend_tpu.ops.refs import ref_paged_attention

    rng = np.random.default_rng(0)
    # granite-3.1-8B decode shapes: 32 q heads, 8 kv heads, head 128
    num_seqs, num_q_heads, num_kv_heads, hd = 16, 32, 8, 128
    block_size, seq_len, max_seq = 64, 640, 1024
    pages_per_seq = max_seq // block_size
    num_blocks = num_seqs * pages_per_seq + 1
    k_scale = v_scale = 0.03
    n_bench_layers = 4  # >1: a constant layer index would let XLA hoist
    # the loop-invariant kernel call out of the timing scan below
    kv_f = rng.standard_normal(
        (n_bench_layers, num_blocks, 2, num_kv_heads, block_size, hd)
    ).astype(np.float32) * 0.3
    kv_cache = jnp.asarray(
        np.clip(np.round(kv_f / k_scale), -127, 127), jnp.int8
    )
    q = jnp.asarray(
        rng.standard_normal((num_seqs, num_q_heads, hd)) * 0.3, jnp.bfloat16
    )
    bt = (
        rng.permutation(num_blocks - 1)[: num_seqs * pages_per_seq]
        .reshape(num_seqs, -1)
        .astype(np.int32)
    )
    meta = make_metadata(
        [1] * num_seqs, [seq_len - 1] * num_seqs, bt, block_size
    )
    scale = hd**-0.5
    layer = jnp.int32(0)

    def run_pallas():
        return paged_decode_attention(
            q, kv_cache, layer, meta.seq_lens, meta.block_table,
            scale=scale, max_seq_len=max_seq,
            k_scale=k_scale, v_scale=v_scale,
        )

    def run_xla():
        return xla_paged_attention(
            q, kv_cache, layer, meta, scale=scale,
            max_query_len=1, max_seq_len=max_seq,
            k_scale=k_scale, v_scale=v_scale,
        )

    # correctness gate (dequantized cache vs f32 oracle, fp8 tolerance —
    # reference test.py:283-316 discipline)
    out = np.asarray(run_pallas(), np.float32)
    deq = np.asarray(kv_cache.astype(jnp.float32)) * k_scale
    ref = ref_paged_attention(
        np.asarray(q, np.float32), deq[0],
        np.asarray(meta.query_start_loc), np.asarray(meta.seq_lens),
        bt, scale,
    )
    err = np.max(np.abs(out - ref))
    assert err < 5e-2, f"decode kernel incorrect: max err {err}"

    t_pallas = bench_fn(run_pallas)
    t_xla = bench_fn(run_xla, warmup=2, reps=5)

    # measured kernel-only time: in-jit scan of N kernel calls — the loop
    # has no dispatch or fence inside, so t/N is device kernel time
    N = 32

    @functools.partial(jax.jit, static_argnames=())
    def kscan(q, kv, lens, tbl):
        def body(c, l):
            o = _paged_decode_impl(
                q, kv, l % n_bench_layers, lens, tbl, scale=scale,
                max_seq_len=max_seq,
                k_scale=k_scale, v_scale=v_scale,
                chunk_pages=512 // block_size, pipeline_depth=3,
            )
            return c + o.astype(jnp.float32).sum(), None
        c, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(N, dtype=jnp.int32)
        )
        return c

    # measured from the xplane trace (real device kernel durations — the
    # reference's proton-profile discipline, benchmark.py:549-564): the
    # wall-clock alternative carries the tunnel's ~30 ms D2H fence
    # latency, which at 5 reps x 32 calls adds ~200 us/call of noise
    import shutil
    import tempfile

    from benchmarks.xplane import matched_kernel_time

    _fence(kscan(q, kv_cache, meta.seq_lens, meta.block_table))  # warm
    trace_dir = tempfile.mkdtemp(prefix="bench_xplane_")
    try:
        with jax.profiler.trace(trace_dir):
            _fence(kscan(q, kv_cache, meta.seq_lens, meta.block_table))
        kt = matched_kernel_time(trace_dir, "paged_decode")
    except Exception:
        kt = None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    if kt is not None and kt.count:
        t_kernel = kt.total_s / kt.count
    else:  # fallback: amortized wall clock
        t_loop = bench_fn(
            lambda: kscan(q, kv_cache, meta.seq_lens, meta.block_table),
            warmup=1, reps=5,
        )
        t_kernel = t_loop / N
    # true bytes: live KV pages for each sequence (fp8 = 1 B/elem)
    kv_bytes = num_seqs * (
        -(-seq_len // block_size) * block_size
    ) * 2 * num_kv_heads * hd * 1  # int8: 1 B/elem
    util_bytes = kv_bytes / t_kernel / peaks.hbm_bytes
    # utilization vs the MEASURED speed-of-light (pure-DMA probe): the
    # nominal HBM figure is unattainable by any access pattern on this
    # deployment, so this is the honest "what's left on the table" number
    from benchmarks.roofline import measure_practical_hbm

    bw = measure_practical_hbm()
    util_practical = kv_bytes / t_kernel / bw if bw else None
    RECORD["hbm_practical_gbps"] = round(bw / 1e9) if bw else None
    return t_xla / t_pallas, t_kernel, util_bytes, util_practical


def run_e2e(cfg, params, n_seqs, prompt_len, n_new, vocab):
    """Step an engine over a batch; returns (ttft_p50_s, decode_tps,
    decode_step_ms)."""
    from vllm_triton_backend_tpu.runtime.engine import LLMEngine
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    rng = np.random.default_rng(7)
    engine = LLMEngine(cfg, params=params)
    t_start = time.perf_counter()
    for _ in range(n_seqs):
        prompt = rng.integers(0, vocab, size=prompt_len)
        engine.add_request(prompt.tolist(), SamplingParams(max_tokens=n_new))
    first_tok: dict = {}
    decode_t0 = None
    tokens_at_decode_start = 0
    deadline = time.perf_counter() + 560
    while engine.has_unfinished() and time.perf_counter() < deadline:
        engine.step()
        now = time.perf_counter()
        total = 0
        for rid, r in engine.all_requests().items():
            n = len(r.output_token_ids)
            total += n
            if n > 0 and rid not in first_tok:
                first_tok[rid] = now
        if decode_t0 is None and len(first_tok) == n_seqs:
            decode_t0 = now
            tokens_at_decode_start = total
    t_end = time.perf_counter()
    ttfts = sorted(t - t_start for t in first_tok.values())
    ttft_p50 = ttfts[len(ttfts) // 2] if ttfts else float("nan")
    decode_tokens = total - tokens_at_decode_start
    decode_dt = max(t_end - decode_t0, 1e-9) if decode_t0 else float("nan")
    decode_tps = decode_tokens / decode_dt
    step_ms = 1e3 * decode_dt / max(1, decode_tokens / n_seqs)
    return ttft_p50, decode_tps, step_ms


# Partial-measurement record: main() fills this in as results land, so a
# failure mid-run still emits everything measured so far (VERDICT r2 #4 —
# the r02 run lost its completed microbench rows when the engine failed).
RECORD: dict = {
    "metric": "decode_tokens_per_s_per_chip",
    "value": 0.0,
    "unit": "tok/s",
    "vs_baseline": 0.0,
}


def main() -> None:
    import jax

    from benchmarks.roofline import chip_peaks
    from vllm_triton_backend_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_triton_backend_tpu.models import llama

    peaks = chip_peaks()
    RECORD["chip"] = peaks.name
    vs_baseline, t_kernel, util_bytes, util_practical = (
        kernel_microbench(peaks)
    )
    RECORD.update(
        vs_baseline=round(vs_baseline, 3),
        paged_attn_kernel_us=round(t_kernel * 1e6, 1),
        paged_attn_util_bytes_pct=round(100 * util_bytes, 1),
    )
    if util_practical is not None:
        RECORD["paged_attn_util_practical_pct"] = round(
            100 * util_practical, 1
        )

    # ---------------- granite-3.1-8B INT8-weights + FP8-KV ----------------
    import dataclasses

    # int8-w8a8: prefill/mixed steps run the layer matmuls on the INT8
    # MXU (394 vs 197 TOPS on v5e; measured 242 TFLOP/s on the gate/up
    # GEMM vs 137 bf16) — decode numerics are IDENTICAL to weight-only
    # int8 (ForwardExtras.w8a8 gates on prefill steps only); the
    # activation-quant accuracy delta is measured in
    # docs/accuracy_table.md at this exact model shape.
    mc = dataclasses.replace(
        ModelConfig.granite_3_1_8b(), quantization="int8-w8a8"
    )
    params = llama.init_quantized_params(mc, jax.random.key(0), "int8")
    # batch 32: decode is weight-streaming-bound (the 8.2 GB int8 weight
    # read dominates the step), so tokens/s scales near-linearly with
    # batch until KV reads catch up; 32 x 1024-token KV fits in 2.7 GB
    # beside the 8.6 GB weights (reference protocol sweeps concurrency
    # 1->128, bench_vllm_user_range.py:44)
    import os

    # batch 128 is the max-throughput headline (weights dominate the
    # step, so tok/s scales with batch until KV reads catch up; 128 x
    # 640-token int8 KV = 6.6 GB beside the 8.6 GB weights — the top of
    # the reference protocol's concurrency sweep 1->128,
    # bench_vllm_user_range.py:44).  Measured sweep on this chip (512
    # prompt + 96 new): 64 -> 3,038 tok/s, 96 -> 3,630, 128 -> 3,794.
    # batch 32 is re-measured below as the latency-balanced context row
    n_seqs = int(os.environ.get("VTB_BENCH_BATCH", "128"))
    max_len = int(os.environ.get("VTB_BENCH_MAX_LEN", "640"))
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(
            block_size=64,
            num_blocks=n_seqs * (max_len // 64) + 8,
            cache_dtype="int8",
        ),
        scheduler=SchedulerConfig(
            max_num_seqs=n_seqs,
            max_num_batched_tokens=2048,
            max_model_len=max_len,
            token_buckets=(n_seqs, 512, 1024, 2048),
            # throughput mode: spend the whole budget on prefill while
            # prompts queue, so every row enters the fused decode
            # session in lockstep — with decode-priority (the serving
            # default), rows decoded ahead during the prefill phase
            # freeze early and the session's tail chunks run at full
            # batch cost for mostly-frozen rows (measured: 2,179 of
            # 12,288 tokens produced out-of-phase at batch 128, a ~17%
            # headline tax)
            prefill_priority=True,
        ),
    )
    prompt_len, n_new = 512, 96
    # warmup pass compiles every (bucket, extras) executable — MUST use
    # identical shapes (same n_new => same session horizon bucket / K)
    run_e2e(cfg, params, n_seqs, prompt_len, n_new, mc.vocab_size)
    ttft_p50, decode_tps, step_ms = run_e2e(
        cfg, params, n_seqs, prompt_len, n_new, mc.vocab_size
    )
    RECORD.update(
        value=round(decode_tps, 1),
        model="granite-3.1-8b-int8w-int8kv-w8a8prefill",
        batch=n_seqs,
        ttft_p50_ms=round(ttft_p50 * 1e3, 1),
        decode_step_ms=round(step_ms, 2),
    )

    # latency-balanced context row: same model at batch 32 (opt-in: it
    # adds ~12 min of compile+run; last measured 1,688 tok/s / TTFT p50
    # 2.0 s — README table)
    if (
        os.environ.get("VTB_BENCH_BATCH32_ROW")
        and n_seqs != 32
        and not os.environ.get("VTB_BENCH_BATCH")
    ):
        cfg32 = cfg.replace(
            cache=CacheConfig(
                block_size=64, num_blocks=32 * (max_len // 64) + 8,
                cache_dtype="int8",
            ),
            scheduler=SchedulerConfig(
                max_num_seqs=32,
                max_num_batched_tokens=2048,
                max_model_len=max_len,
                prefill_priority=True,
                token_buckets=(32, 512, 1024, 2048),
            ),
        )
        run_e2e(cfg32, params, 32, prompt_len, n_new, mc.vocab_size)
        ttft32, tps32, _ = run_e2e(
            cfg32, params, 32, prompt_len, n_new, mc.vocab_size
        )
        RECORD.update(
            decode_tps_batch32=round(tps32, 1),
            ttft_p50_ms_batch32=round(ttft32 * 1e3, 1),
        )
    del params

    # ---------------- TinyLlama bf16 (round-1 continuity) ----------------
    mc_t = ModelConfig.tinyllama_1_1b()
    params_t = llama.init_params(mc_t, jax.random.key(0))
    cfg_t = EngineConfig(
        model=mc_t,
        cache=CacheConfig(block_size=64, num_blocks=512),
        scheduler=SchedulerConfig(
            max_num_seqs=16,
            max_num_batched_tokens=2048,
            max_model_len=2048,
            token_buckets=(16, 512, 1024, 2048),
        ),
    )
    run_e2e(cfg_t, params_t, 16, 128, 256, mc_t.vocab_size)
    # median-of-3 (VERDICT r4 #5): this small-model row is the most
    # tunnel-variance-sensitive number in the record (BENCH_r03 -> r04
    # drifted -4.6% with no code change on its path); the median
    # de-noises single-run excursions
    tiny_runs = sorted(
        run_e2e(cfg_t, params_t, 16, 128, 256, mc_t.vocab_size)[1]
        for _ in range(3)
    )
    RECORD["tinyllama_decode_tps"] = round(tiny_runs[1], 1)
    RECORD["tinyllama_tps_spread"] = [
        round(t, 1) for t in tiny_runs
    ]

    _drift_check()
    print(json.dumps(RECORD))


def _drift_check() -> None:
    """Compare this run against the last committed driver record and
    flag drifts > 5% (VERDICT r4 #5: the r03 -> r04 TinyLlama drift
    went unnoticed because nothing guarded the bench)."""
    import glob
    import os

    records = sorted(glob.glob(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_r*.json")
    ))
    if not records:
        return
    try:
        with open(records[-1]) as f:
            prev = json.load(f).get("parsed", {})
    except Exception:
        return
    drift = {}
    for key in ("value", "tinyllama_decode_tps", "decode_step_ms"):
        old, new = prev.get(key), RECORD.get(key)
        if not old or not new:
            continue
        pct = 100.0 * (float(new) - float(old)) / float(old)
        if abs(pct) > 5.0:
            drift[key] = round(pct, 1)
    if drift:
        RECORD["drift_vs_committed_pct"] = drift
        RECORD["drift_baseline"] = os.path.basename(records[-1])


def _main_guarded() -> None:
    """The driver records this script's ONE JSON line; never die without
    printing it.  On a partial failure (e.g. a kernel that stops
    compiling after a code change, or a flaky device tunnel) emit
    everything measured so far (RECORD) plus the error, instead of
    nothing."""
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        RECORD["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(RECORD))
        raise SystemExit(1)


if __name__ == "__main__":
    _main_guarded()
