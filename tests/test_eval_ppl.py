"""Perplexity evaluator: engine NLL must match transformers' on the same
checkpoint (the accuracy-baseline discipline of BASELINE.md)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from benchmarks.eval_ppl import compute_ppl
from vllm_triton_backend_tpu.models.hf import config_from_hf, load_params


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama_ppl")
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_ppl_matches_transformers(tiny_hf_dir):
    d, hf_model = tiny_hf_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    rng = np.random.default_rng(0)
    chunks = [
        rng.integers(1, cfg.vocab_size, size=33).astype(np.int32)
        for _ in range(3)
    ]
    ours = compute_ppl(cfg, params, chunks)

    total_nll, total_tok = 0.0, 0
    with torch.no_grad():
        for c in chunks:
            logits = hf_model(torch.tensor(c[None].astype(np.int64))).logits[0]
            logp = torch.log_softmax(logits[:-1].float(), dim=-1)
            nll = -logp.gather(
                1, torch.tensor(c[1:].astype(np.int64))[:, None]
            ).sum()
            total_nll += float(nll)
            total_tok += len(c) - 1
    ref_ppl = float(np.exp(total_nll / total_tok))
    assert ours["tokens"] == total_tok
    np.testing.assert_allclose(ours["ppl"], ref_ppl, rtol=1e-3)


def test_quantized_kv_ppl_close(tiny_hf_dir):
    """fp8 KV-cache perplexity stays within a small delta of fp32."""
    d, _ = tiny_hf_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    rng = np.random.default_rng(1)
    chunks = [rng.integers(1, cfg.vocab_size, 33).astype(np.int32)]
    full = compute_ppl(cfg, params, chunks, "auto")
    fp8 = compute_ppl(cfg, params, chunks, "fp8")
    assert abs(fp8["ppl"] - full["ppl"]) / full["ppl"] < 0.05


def test_calibrated_int8_kv_beats_default_heuristic(tiny_hf_dir):
    """Calibrated (absmax) int8-KV scales keep perplexity within the
    relaxed-atol discipline of the bf16 run, and no worse than the
    engine's static 1/16 heuristic (VERDICT r1 item 8)."""
    from vllm_triton_backend_tpu.runtime.calibration import (
        calibrate_kv_scales,
    )

    d, _ = tiny_hf_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    rng = np.random.default_rng(2)
    calib = [rng.integers(1, cfg.vocab_size, 48).astype(np.int32)]
    chunks = [
        rng.integers(1, cfg.vocab_size, 33).astype(np.int32)
        for _ in range(2)
    ]
    k_scale, v_scale = calibrate_kv_scales(cfg, params, calib, "int8")
    assert 0 < k_scale < 1 and 0 < v_scale < 1

    full = compute_ppl(cfg, params, chunks, "auto")
    cal = compute_ppl(
        cfg, params, chunks, "int8", k_scale=k_scale, v_scale=v_scale
    )
    heur = compute_ppl(
        cfg, params, chunks, "int8",
        k_scale=1.0 / 16.0, v_scale=1.0 / 16.0,
    )
    rel_cal = abs(cal["ppl"] - full["ppl"]) / full["ppl"]
    rel_heur = abs(heur["ppl"] - full["ppl"]) / full["ppl"]
    assert rel_cal < 0.05, (cal["ppl"], full["ppl"])
    assert rel_cal <= rel_heur * 1.05 + 1e-4, (rel_cal, rel_heur)


def test_engine_accepts_calibrated_scales():
    """kv_scales ctor override reaches the forward (smoke)."""
    import jax

    from vllm_triton_backend_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_triton_backend_tpu.models.llama import init_params
    from vllm_triton_backend_tpu.runtime.engine import LLMEngine
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    mc = ModelConfig.tiny(dtype="float32")
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_blocks=32, cache_dtype="int8"),
        scheduler=SchedulerConfig(
            max_num_seqs=2, max_num_batched_tokens=32,
            max_model_len=64, token_buckets=(8, 16, 32),
        ),
    )
    eng = LLMEngine(
        cfg, params=init_params(mc, jax.random.key(0)),
        kv_scales=(0.021, 0.017),
    )
    assert (eng.k_scale, eng.v_scale) == (0.021, 0.017)
    eng.add_request([1, 2, 3, 4, 5], SamplingParams(max_tokens=3))
    while eng.has_unfinished():
        eng.step()
    assert eng.stats()["generated_tokens"] == 3
