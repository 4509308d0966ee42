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
