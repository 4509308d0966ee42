"""HF checkpoint parity: our engine's logits vs transformers' reference.

Builds a tiny random LlamaForCausalLM with transformers (torch CPU), saves
it as safetensors, loads it through models/hf.py, and compares prefill
logits.  This is the accuracy baseline discipline of BASELINE.md ("match
reference perplexity"): exact architecture parity against the canonical
implementation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from vllm_triton_backend_tpu.models.hf import config_from_hf, load_params
from vllm_triton_backend_tpu.models.llama import (
    ForwardExtras,
    forward,
    make_kv_caches,
)
from vllm_triton_backend_tpu.ops.metadata import make_metadata


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama_hf")
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_prefill_logits_match_transformers(tiny_hf_dir):
    d, hf_model = tiny_hf_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=17)

    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    block_size, num_blocks = 16, 8
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    logits, _ = forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, meta,
        ForwardExtras(max_query_len=32, max_seq_len=32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, atol=2e-3, rtol=1e-3
    )


@pytest.fixture(scope="module")
def tiny_qwen2_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_qwen2_hf")
    cfg = transformers.Qwen2Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(cfg)
    # transformers zero-inits Linear biases; randomize so the bias path
    # actually carries signal
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in ("q_proj", "k_proj", "v_proj"):
                getattr(layer.self_attn, proj).bias.normal_(0, 0.5)
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_qwen2_prefill_logits_match_transformers(tiny_qwen2_dir):
    """Qwen2 = llama + qkv biases (model-family widening): logits parity
    against transformers proves the bias load path and grouped fused
    bias layout."""
    d, hf_model = tiny_qwen2_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    assert cfg.attention_bias
    assert params.layers.qkv_bias is not None

    rng = np.random.default_rng(5)
    prompt = rng.integers(0, cfg.vocab_size, size=13)

    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    block_size, num_blocks = 16, 8
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    logits, _ = forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, meta,
        ForwardExtras(max_query_len=16, max_seq_len=32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, atol=2e-4, rtol=2e-3
    )


def test_qwen2_bias_is_applied_in_quantized_fused_path(tiny_qwen2_dir):
    """The fused-qkv quantized path must add the (dense) bias: zeroing
    it changes the logits."""
    from vllm_triton_backend_tpu.models.llama import quantize_params

    d, _ = tiny_qwen2_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    qp = quantize_params(params, dtype="int8", cfg=cfg)
    assert qp.layers.qkv_proj is not None  # fused layout engaged
    assert qp.layers.qkv_bias is not None  # bias kept dense

    rng = np.random.default_rng(6)
    prompt = rng.integers(0, cfg.vocab_size, size=9)
    block_size, num_blocks = 16, 8
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    extras = ForwardExtras(max_query_len=16, max_seq_len=32)

    def logits_of(p):
        kv = make_kv_caches(cfg, num_blocks, block_size)
        out, _ = forward(
            p, cfg, jnp.asarray(prompt, jnp.int32),
            jnp.arange(len(prompt), dtype=jnp.int32), kv, meta, extras,
        )
        return np.asarray(out)

    with_bias = logits_of(qp)
    no_bias = logits_of(
        qp._replace(
            layers=qp.layers._replace(
                qkv_bias=jnp.zeros_like(qp.layers.qkv_bias)
            )
        )
    )
    assert not np.allclose(with_bias, no_bias)
    # and the biased quantized logits stay close to the dense reference
    dense = logits_of(params)
    assert np.mean(np.abs(with_bias - dense)) < 0.1 * np.std(dense)


@pytest.fixture(scope="module")
def tiny_mixtral_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_mixtral_hf")
    cfg = transformers.MixtralConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = transformers.MixtralForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_mixtral_prefill_logits_match_transformers(tiny_mixtral_dir):
    """Mixtral = llama + sparse-MoE MLP (softmax-all -> top-k ->
    renormalize router): logits parity proves the routing math and the
    concatenated expert gate|up packing."""
    d, hf_model = tiny_mixtral_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    assert cfg.num_local_experts == 4 and cfg.num_experts_per_tok == 2
    assert params.layers.moe_router is not None
    assert params.layers.gate_proj is None

    rng = np.random.default_rng(8)
    prompt = rng.integers(0, cfg.vocab_size, size=14)

    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    block_size, num_blocks = 16, 8
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    logits, _ = forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, meta,
        ForwardExtras(max_query_len=16, max_seq_len=32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, atol=5e-4, rtol=2e-3
    )


@pytest.fixture(scope="module")
def tiny_gemma2_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_gemma2_hf")
    cfg = transformers.Gemma2Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rope_theta=10000.0,
        query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        sliding_window=8,  # < prompt length so the even layer truly slides
        tie_word_embeddings=True,
    )
    torch.manual_seed(3)
    model = transformers.Gemma2ForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_gemma2_prefill_logits_match_transformers(tiny_gemma2_dir):
    """Gemma-2 = sandwich norms, (1+w) RMSNorm, gelu-tanh, sqrt(h)
    embedding scale, attn+final logit softcaps, ALTERNATING sliding
    window (per-layer pattern scan).  The prompt exceeds the window so
    the even layer's slide actually bites."""
    d, hf_model = tiny_gemma2_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    assert cfg.sandwich_norms and cfg.norm_add_unit_offset
    assert cfg.sliding_window_pattern == (8, None)
    assert cfg.hidden_act == "gelu_tanh"
    assert params.layers.pre_ffw_norm is not None

    rng = np.random.default_rng(9)
    prompt = rng.integers(0, cfg.vocab_size, size=24)

    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    block_size, num_blocks = 16, 8
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    logits, _ = forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, meta,
        ForwardExtras(max_query_len=32, max_seq_len=32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, atol=5e-4, rtol=2e-3
    )


def test_gemma2_engine_paths(tiny_gemma2_dir):
    """Gemma-2 through the full engine: fused decode sessions and TP=2
    match the per-step single-chip run (pattern-scan + sandwich norms
    through every engine path)."""
    import jax

    from vllm_triton_backend_tpu.config import (
        CacheConfig,
        EngineConfig,
        ParallelConfig,
        SchedulerConfig,
    )
    from vllm_triton_backend_tpu.runtime.engine import LLMEngine
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    d, _ = tiny_gemma2_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    ecfg = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    rng = np.random.default_rng(10)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=n).tolist() for n in (21, 9)
    ]

    def run(c, multistep):
        eng = LLMEngine(c, params=params, multistep=multistep)
        for p in prompts:
            eng.add_request(p, SamplingParams(max_tokens=6))
        out = {}
        while eng.has_unfinished():
            for o in eng.step():
                out[o.req_id] = o.output_token_ids
        return out

    per_step = run(ecfg, 0)
    assert run(ecfg, 4) == per_step
    if len(jax.devices()) >= 2:
        tp = ecfg.replace(parallel=ParallelConfig(tensor_parallel=2))
        assert run(tp, 0) == per_step


def test_qwen3_prefill_logits_match_transformers(tmp_path_factory):
    """Qwen3 = llama + per-head q/k RMSNorm before rope."""
    d = tmp_path_factory.mktemp("tiny_qwen3_hf")
    cfg_hf = transformers.Qwen3Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    hf_model = transformers.Qwen3ForCausalLM(cfg_hf)
    hf_model.save_pretrained(d, safe_serialization=True)

    cfg, params = load_params(
        str(d), config_from_hf(str(d), dtype="float32")
    )
    assert cfg.qk_norm and params.layers.q_norm is not None
    assert not cfg.attention_bias

    rng = np.random.default_rng(11)
    prompt = rng.integers(0, cfg.vocab_size, size=15)

    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    block_size, num_blocks = 16, 8
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    logits, _ = forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, meta,
        ForwardExtras(max_query_len=16, max_seq_len=32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, atol=5e-4, rtol=2e-3
    )


def test_gemma3_prefill_logits_match_transformers(tmp_path_factory):
    """Gemma-3 = gemma-2 block + per-head q/k norms + DUAL rope bases
    (local layers rope at rope_local_base_freq, global layers at
    rope_theta) with the 5:1 sliding:full layer pattern."""
    d = tmp_path_factory.mktemp("tiny_gemma3_hf")
    cfg_hf = transformers.Gemma3TextConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=6,  # one full 5:1 pattern period
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rope_theta=1000000.0,
        rope_local_base_freq=10000.0,
        query_pre_attn_scalar=16,
        sliding_window=8,
        tie_word_embeddings=True,
    )
    torch.manual_seed(5)
    hf_model = transformers.Gemma3ForCausalLM(cfg_hf)
    hf_model.save_pretrained(d, safe_serialization=True)

    cfg, params = load_params(
        str(d), config_from_hf(str(d), dtype="float32")
    )
    assert cfg.sliding_window_pattern == (8, 8, 8, 8, 8, None)
    assert cfg.qk_norm and cfg.sandwich_norms
    assert cfg.rope_local_base_freq == 10000.0

    rng = np.random.default_rng(12)
    prompt = rng.integers(0, cfg.vocab_size, size=24)  # window bites

    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    block_size, num_blocks = 16, 8
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    logits, _ = forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, meta,
        ForwardExtras(max_query_len=32, max_seq_len=32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, atol=5e-4, rtol=2e-3
    )


@pytest.mark.parametrize(
    "scaling",
    [
        {"rope_type": "linear", "factor": 4.0},
        {
            "rope_type": "yarn", "factor": 4.0,
            "original_max_position_embeddings": 32,
        },
    ],
    ids=["linear", "yarn"],
)
def test_rope_scaling_matches_transformers(tmp_path_factory, scaling):
    """Long-context rope scaling parity (linear + YaRN NTK-by-parts;
    YaRN's attention_factor folds into the attention scale)."""
    d = tmp_path_factory.mktemp(f"tiny_rope_{scaling['rope_type']}")
    cfg_hf = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        rope_scaling=dict(scaling),
        tie_word_embeddings=False,
    )
    torch.manual_seed(6)
    hf_model = transformers.LlamaForCausalLM(cfg_hf)
    hf_model.save_pretrained(str(d), safe_serialization=True)

    cfg, params = load_params(
        str(d), config_from_hf(str(d), dtype="float32")
    )
    rng = np.random.default_rng(13)
    prompt = rng.integers(0, cfg.vocab_size, size=40)

    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    block_size, num_blocks = 16, 8
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    bt = np.arange(4, dtype=np.int32).reshape(1, 4)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    logits, _ = forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, meta,
        ForwardExtras(max_query_len=64, max_seq_len=64),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, atol=5e-4, rtol=2e-3
    )


def test_qwen3_moe_prefill_logits_match_transformers(tmp_path_factory):
    """Qwen3-MoE = per-head q/k norms + sparse MoE with
    norm_topk_prob-controlled renormalization and its own expert key
    layout (mlp.experts.N.gate/up/down_proj, moe_intermediate_size)."""
    d = tmp_path_factory.mktemp("tiny_qwen3moe_hf")
    cfg_hf = transformers.Qwen3MoeConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=False,  # exercise the non-renormalized path
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    hf_model = transformers.Qwen3MoeForCausalLM(cfg_hf)
    hf_model.save_pretrained(str(d), safe_serialization=True)

    cfg, params = load_params(
        str(d), config_from_hf(str(d), dtype="float32")
    )
    assert cfg.qk_norm and cfg.num_local_experts == 4
    assert not cfg.moe_renormalize
    assert params.layers.moe_gate_up.shape[-1] == 96  # 2 * moe_inter

    rng = np.random.default_rng(14)
    prompt = rng.integers(0, cfg.vocab_size, size=12)

    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    block_size, num_blocks = 16, 8
    kv_cache = make_kv_caches(cfg, num_blocks, block_size)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, block_size)
    logits, _ = forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, meta,
        ForwardExtras(max_query_len=16, max_seq_len=32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, atol=5e-4, rtol=2e-3
    )
