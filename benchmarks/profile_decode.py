"""Decode-step component profiler (dev tool, real TPU).

Times each component of a decode step at bench.py's flagship shapes to
locate the bottleneck: full fused step, model forward pieces (linears,
attention kernel, cache write), and a pure-HBM-bandwidth probe for the
roofline ceiling.  The reference's analog is scripts/profile_and_bench.py
(torch.profiler per-impl traces).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fence(out):
    """block_until_ready does not reliably wait on the tunneled TPU
    runtime (see bench.py): fence with a D2H fetch of one element."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench(fn, *args, warmup=5, reps=50):
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / reps


def main():
    from vllm_triton_backend_tpu.config import ModelConfig
    from vllm_triton_backend_tpu.models.llama import (
        ForwardExtras,
        forward_fn,
        init_params,
        make_kv_caches,
    )
    from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_attention,
    )
    from vllm_triton_backend_tpu.runtime.multistep import decode_steps

    cfg = ModelConfig.tinyllama_1_1b()
    rng = np.random.default_rng(0)

    # ---- HBM bandwidth probe -------------------------------------------
    big = jnp.zeros((512, 1024, 1024), jnp.bfloat16)  # 1 GiB

    @jax.jit
    def read_all(x):
        return jnp.sum(x, dtype=jnp.float32)

    t = bench(read_all, big)
    bw = big.nbytes / t / 1e9
    print(f"HBM read bandwidth probe: {bw:.0f} GB/s  ({t*1e3:.3f} ms / GiB)")

    # ---- weight-streaming ceiling: all model matmuls, batch 16 ---------
    params = init_params(cfg, jax.random.key(0))
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"model bytes: {nbytes/1e9:.2f} GB -> ceiling "
          f"{nbytes/1e9/bw*1e3:.2f} ms/step")

    S = 16
    block_size, num_blocks = 64, 640
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    max_blocks = 32  # horizon 512
    bt = rng.permutation(num_blocks - 1)[: S * max_blocks].reshape(
        S, max_blocks).astype(np.int32)
    lens = np.full(S, 384, np.int32)
    extras = ForwardExtras(max_query_len=1, max_seq_len=512)

    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, S), jnp.int32)
    lens_d = jnp.asarray(lens)
    bt_d = jnp.asarray(bt)
    live = jnp.ones(S, bool)
    from vllm_triton_backend_tpu.runtime.sampler import SamplingTensors

    st = SamplingTensors(
        jnp.zeros(S, jnp.float32), jnp.ones(S, jnp.float32),
        jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.float32),
    )
    key = jax.random.key(0)

    # ---- full fused chunk (K=32) ---------------------------------------
    K = 32

    # kv_cache is donated by decode_steps: thread it through the loop
    # (inputs lens/tokens reset every call — same slots rewritten)
    def run_chunks(kv, n):
        k = key
        for _ in range(n):
            sampled, _lp, _toks, _lens, k, kv = decode_steps(
                params, cfg, tokens, lens_d, bt_d, live,
                jnp.full_like(lens_d, 1 << 30), kv,
                st, k, extras, K, block_size,
            )
        return sampled, kv

    out, kv_cache = run_chunks(kv_cache, 3)  # warmup/compile
    _fence(out)
    t0 = time.perf_counter()
    reps = 10
    out, kv_cache = run_chunks(kv_cache, reps)
    _fence(out)
    t = (time.perf_counter() - t0) / reps
    print(f"fused chunk K={K}: {t*1e3:.2f} ms -> {t/K*1e3:.3f} ms/step "
          f"-> {S*K/t:.0f} tok/s")

    # ---- single forward step (jitted alone) ----------------------------
    qsl = jnp.arange(S + 1, dtype=jnp.int32)
    pos = lens_d - 1
    page = jnp.take_along_axis(bt_d, (pos // block_size)[:, None], 1)[:, 0]
    slots = (page * block_size + pos % block_size).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnums=())
    def fwd(params, tokens, pos, kv, qsl, lens_d, bt_d, slots):
        meta = AttentionMetadata(
            query_start_loc=qsl, seq_lens=lens_d, block_table=bt_d,
            slot_mapping=slots, num_seqs=jnp.int32(S),
        )
        logits, kv = forward_fn(
            params, cfg, tokens, pos, kv, meta, extras)
        return logits, kv

    t = bench(fwd, params, tokens, pos, kv_cache, qsl, lens_d, bt_d, slots)
    print(f"single forward step: {t*1e3:.3f} ms")

    # ---- components ----------------------------------------------------
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_size
    q = jnp.asarray(rng.standard_normal((S, H, hd)), jnp.bfloat16)

    def attn(q, kv, lens_d, bt_d):
        return paged_decode_attention(
            q, kv, jnp.int32(0), lens_d, bt_d, scale=hd**-0.5,
            max_seq_len=512)

    t = bench(attn, q, kv_cache, lens_d, bt_d)
    print(f"decode attention kernel (1 layer): {t*1e3:.3f} ms  x"
          f"{cfg.num_layers} = {t*cfg.num_layers*1e3:.3f} ms")

    # dense matmuls only (proxy: same weights, no attention/cache)
    x = jnp.asarray(rng.standard_normal((S, cfg.hidden_size)), jnp.bfloat16)

    @jax.jit
    def mlps(x, params):
        def body(x, lp):
            h = (x @ lp.q_proj) @ lp.o_proj
            h2 = (x @ lp.k_proj).sum() + (x @ lp.v_proj).sum()
            x = x + h * 1e-6 + h2 * 0
            g = x @ lp.gate_proj
            u = x @ lp.up_proj
            x = x + ((jax.nn.silu(g) * u) @ lp.down_proj) * 1e-6
            return x, None

        x, _ = jax.lax.scan(body, x, params.layers)
        return x @ params.lm_head

    t = bench(mlps, x, params)
    print(f"all dense matmuls only: {t*1e3:.3f} ms")

    # cache write op
    from vllm_triton_backend_tpu.ops.pallas.cache_ops import (
        reshape_and_cache,
    )
    knew = jnp.asarray(rng.standard_normal((S, KV, hd)), jnp.bfloat16)

    @jax.jit
    def cache_write(kv, knew, slots):
        return reshape_and_cache(kv, jnp.int32(0), knew, knew, slots)

    t = bench(cache_write, kv_cache, knew, slots)
    print(f"cache write (1 layer): {t*1e3:.3f} ms  x{cfg.num_layers} = "
          f"{t*cfg.num_layers*1e3:.3f} ms")


if __name__ == "__main__":
    main()
