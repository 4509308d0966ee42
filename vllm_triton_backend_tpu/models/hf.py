"""HuggingFace checkpoint loading — config.json + safetensors → LlamaParams.

The reference relies on vLLM's loader pulling HF weights
(reference scripts/offline_inference.py:44); here loading is native: parse
``config.json`` into :class:`ModelConfig` and stream ``*.safetensors``
shards into the stacked-layer pytree (one device transfer per stacked
tensor, not per layer).

Supported architectures: LlamaForCausalLM (TinyLlama, Llama-2/3),
GraniteForCausalLM (granite-3.x scalar multipliers).
"""

from __future__ import annotations

import glob
import json
import os

import jax.numpy as jnp
import numpy as np

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import LayerParams, LlamaParams

_SUPPORTED = {
    "LlamaForCausalLM",
    "GraniteForCausalLM",
    "MistralForCausalLM",
    "Qwen2ForCausalLM",  # llama + qkv biases (attention_bias)
    "MixtralForCausalLM",  # llama + sparse MoE MLP
    "Gemma2ForCausalLM",  # sandwich norms, gelu-tanh, alt. sliding win
    "Qwen3ForCausalLM",  # per-head q/k RMSNorm before rope
    "Gemma3ForCausalLM",  # gemma-2 block + qk norms + dual rope bases
    "Qwen3MoeForCausalLM",  # qwen3 qk norms + sparse MoE MLP
}
_SUPPORTED_SSM = {"MambaForCausalLM"}


def _min_pattern(entries: tuple) -> tuple:
    """Reduce a per-layer pattern to its minimal repeating period so the
    pattern-scan traces one period, not the whole depth (gemma-3's
    layer_types list is per-layer; its true period is 6)."""
    n = len(entries)
    for period in range(1, n + 1):
        if n % period == 0 and entries == entries[:period] * (n // period):
            return entries[:period]
    return entries


def _attention_multiplier(hf: dict) -> float | None:
    """Attention scale from the config, with YaRN's attention_factor
    folded in (q_rot and k_rot each scale by s -> scores by s^2, so the
    factor lives entirely in the scale — zero kernel changes)."""
    import math

    if hf.get("query_pre_attn_scalar"):
        scale = float(hf["query_pre_attn_scalar"]) ** -0.5
    elif hf.get("attention_multiplier") is not None:
        scale = float(hf["attention_multiplier"])
    else:
        scale = None
    rs = hf.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) == "yarn":
        if scale is None:
            hd = hf.get("head_dim") or (
                hf["hidden_size"] // hf["num_attention_heads"]
            )
            scale = float(hd) ** -0.5
        s = rs.get("attention_factor")
        if s is None:
            s = 0.1 * math.log(rs["factor"]) + 1.0
        scale *= float(s) ** 2
    return scale


def config_from_hf(model_dir: str, **overrides) -> ModelConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    arch = (hf.get("architectures") or ["LlamaForCausalLM"])[0]
    if arch in _SUPPORTED_SSM:
        return _mamba_config_from_hf(hf, **overrides)
    if arch not in _SUPPORTED:
        raise ValueError(f"unsupported architecture {arch!r}")
    kw = dict(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get(
            "num_key_value_heads", hf["num_attention_heads"]
        ),
        head_dim=hf.get("head_dim"),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_scaling=hf.get("rope_scaling"),
        rms_norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        # Qwen2 carries qkv biases; its config reports attention_bias
        # (older configs omit it -> Qwen2's default True)
        attention_bias=bool(
            hf.get(
                "attention_bias", arch == "Qwen2ForCausalLM"
            )
        ),
        # Mixtral-family sparse MoE MLP (qwen3-moe names it num_experts)
        num_local_experts=int(
            hf.get("num_local_experts") or hf.get("num_experts") or 0
        ),
        num_experts_per_tok=int(hf.get("num_experts_per_tok", 2)),
        moe_renormalize=bool(hf.get("norm_topk_prob", True)),
        # Qwen3/Gemma-3 per-head q/k norms
        qk_norm=arch in (
            "Qwen3ForCausalLM", "Qwen3MoeForCausalLM",
            "Gemma3ForCausalLM",
        ),
        # gemma block shape
        sandwich_norms=arch in (
            "Gemma2ForCausalLM", "Gemma3ForCausalLM"
        ),
        norm_add_unit_offset=arch in (
            "Gemma2ForCausalLM", "Gemma3ForCausalLM"
        ),
        hidden_act=(
            "gelu_tanh"
            if hf.get("hidden_activation", hf.get("hidden_act"))
            in ("gelu_pytorch_tanh", "gelu_tanh") else "silu"
        ),
        final_logit_softcap=float(
            hf.get("final_logit_softcapping") or 0.0
        ),
        logits_soft_cap=float(
            hf.get("attn_logit_softcapping") or 0.0
        ),
        # gemma-2: EVEN layers slide (HF `not bool(layer_idx % 2)`),
        # odd layers full; gemma-3: explicit layer_types list
        sliding_window_pattern=(
            (hf["sliding_window"], None)
            if arch == "Gemma2ForCausalLM" and hf.get("sliding_window")
            else _min_pattern(
                tuple(
                    hf["sliding_window"] if t == "sliding_attention"
                    else None
                    for t in hf["layer_types"]
                )
            )
            if arch == "Gemma3ForCausalLM" and hf.get("layer_types")
            else None
        ),
        rope_local_base_freq=hf.get("rope_local_base_freq"),
        # gemma scales embeddings by sqrt(hidden)
        embedding_multiplier=(
            float(hf["hidden_size"]) ** 0.5
            if arch in ("Gemma2ForCausalLM", "Gemma3ForCausalLM")
            else float(hf.get("embedding_multiplier", 1.0))
        ),
        attention_multiplier=_attention_multiplier(hf),
        sliding_window=(
            # gemma's window applies via the per-layer pattern only
            None
            if arch in ("Gemma2ForCausalLM", "Gemma3ForCausalLM")
            else hf.get("sliding_window")
        ),
        # granite multipliers (absent for plain llama -> identity)
        residual_multiplier=float(hf.get("residual_multiplier", 1.0)),
        logits_scaling=float(hf.get("logits_scaling", 1.0)),
    )
    kw.update(overrides)
    return ModelConfig(**kw)


def _mamba_config_from_hf(hf: dict, **overrides) -> ModelConfig:
    """MambaForCausalLM config.json -> ModelConfig(architecture='mamba')."""
    h = hf["hidden_size"]
    dt_rank = hf.get("time_step_rank", "auto")
    kw = dict(
        vocab_size=hf["vocab_size"],
        hidden_size=h,
        intermediate_size=hf.get("intermediate_size", 2 * h),
        num_layers=hf["num_hidden_layers"],
        num_heads=1,
        num_kv_heads=1,
        head_dim=h,
        rms_norm_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
        architecture="mamba",
        mamba_state_size=hf.get("state_size", 16),
        mamba_conv_kernel=hf.get("conv_kernel", 4),
        mamba_expand=hf.get("expand", 2),
        mamba_dt_rank=0 if dt_rank == "auto" else int(dt_rank),
    )
    kw.update(overrides)
    return ModelConfig(**kw)


def _load_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    """Load all safetensors shards into a host numpy dict.

    bfloat16 tensors (the common checkpoint dtype) are not supported by
    the numpy safetensors reader; they are loaded as raw uint16 and
    re-viewed as ``ml_dtypes.bfloat16`` so no precision is lost.
    """
    from safetensors import safe_open

    import ml_dtypes

    paths = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not paths:
        raise FileNotFoundError(f"no .safetensors under {model_dir}")
    state: dict[str, np.ndarray] = {}
    for p in paths:
        with safe_open(p, framework="pt") as f:
            for name in f.keys():
                t = f.get_tensor(name)  # torch tensor (cpu)
                if str(t.dtype) == "torch.bfloat16":
                    import torch

                    state[name] = (
                        t.view(torch.uint16)
                        .numpy()
                        .view(ml_dtypes.bfloat16)
                    )
                else:
                    state[name] = t.numpy()
    return state


def load_params(
    model_dir: str, cfg: ModelConfig | None = None
) -> tuple[ModelConfig, LlamaParams]:
    """Load an HF checkpoint (Llama-family or Mamba) into model params."""
    cfg = cfg or config_from_hf(model_dir)
    if cfg.architecture == "mamba":
        return _load_mamba_params(model_dir, cfg)
    state = _load_state_dict(model_dir)
    dtype = jnp.dtype(cfg.dtype)
    nl = cfg.num_layers

    def get(name: str) -> np.ndarray:
        t = state[name]
        # bf16 safetensors arrive as uint16 views under numpy; let
        # ml_dtypes handle it via jnp conversion at stack time.
        return t

    def stack_linear(fmt: str) -> jnp.ndarray:
        # HF stores Linear as [out, in]; our layout is [in, out].
        mats = [get(fmt.format(i)).T for i in range(nl)]
        return jnp.asarray(np.stack(mats), dtype=dtype)

    def stack_norm(fmt: str) -> jnp.ndarray:
        return jnp.asarray(
            np.stack([get(fmt.format(i)) for i in range(nl)]), dtype=dtype
        )

    p = "model.layers.{}."
    qkv_bias = None
    if (p.format(0) + "self_attn.q_proj.bias") in state:
        from vllm_triton_backend_tpu.models.llama import fuse_qkv_bias

        qkv_bias = fuse_qkv_bias(
            stack_norm(p + "self_attn.q_proj.bias"),
            stack_norm(p + "self_attn.k_proj.bias"),
            stack_norm(p + "self_attn.v_proj.bias"),
            cfg.num_kv_heads, cfg.head_size,
        )
    moe = {}
    if cfg.num_local_experts > 0:
        from vllm_triton_backend_tpu.models.llama import fuse_gate_up

        e = cfg.num_local_experts
        # Mixtral: block_sparse_moe.{gate, experts.N.w1/w3/w2};
        # Qwen3-MoE: mlp.{gate, experts.N.gate_proj/up_proj/down_proj}
        if (p.format(0) + "block_sparse_moe.gate.weight") in state:
            bp = p + "block_sparse_moe."
            w_gate, w_up, w_down = "w1.weight", "w3.weight", "w2.weight"
        else:
            bp = p + "mlp."
            w_gate, w_up, w_down = (
                "gate_proj.weight", "up_proj.weight", "down_proj.weight"
            )
        moe = dict(
            gate_proj=None, up_proj=None, down_proj=None,
            # HF router Linear [E, h] -> [h, E]
            moe_router=stack_linear(bp + "gate.weight"),
            # per-expert w1 (gate) / w3 (up) concatenated, w2 (down)
            moe_gate_up=jnp.stack(
                [
                    jnp.stack(
                        [
                            fuse_gate_up(
                                jnp.asarray(
                                    get(
                                        bp.format(i)
                                        + f"experts.{x}.{w_gate}"
                                    ).T,
                                    dtype=dtype,
                                ),
                                jnp.asarray(
                                    get(
                                        bp.format(i)
                                        + f"experts.{x}.{w_up}"
                                    ).T,
                                    dtype=dtype,
                                ),
                            )
                            for x in range(e)
                        ]
                    )
                    for i in range(nl)
                ]
            ),
            moe_down=jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.asarray(
                                get(
                                    bp.format(i)
                                    + f"experts.{x}.{w_down}"
                                ).T,
                                dtype=dtype,
                            )
                            for x in range(e)
                        ]
                    )
                    for i in range(nl)
                ]
            ),
        )
    layers = LayerParams(
        input_norm=stack_norm(p + "input_layernorm.weight"),
        q_proj=stack_linear(p + "self_attn.q_proj.weight"),
        k_proj=stack_linear(p + "self_attn.k_proj.weight"),
        v_proj=stack_linear(p + "self_attn.v_proj.weight"),
        o_proj=stack_linear(p + "self_attn.o_proj.weight"),
        post_attn_norm=stack_norm(p + "post_attention_layernorm.weight"),
        **(
            moe or dict(
                gate_proj=stack_linear(p + "mlp.gate_proj.weight"),
                up_proj=stack_linear(p + "mlp.up_proj.weight"),
                down_proj=stack_linear(p + "mlp.down_proj.weight"),
            )
        ),
        qkv_bias=qkv_bias,
        q_norm=(
            stack_norm(p + "self_attn.q_norm.weight")
            if (p.format(0) + "self_attn.q_norm.weight") in state
            else None
        ),
        k_norm=(
            stack_norm(p + "self_attn.k_norm.weight")
            if (p.format(0) + "self_attn.k_norm.weight") in state
            else None
        ),
        # gemma-2 sandwich norms
        pre_ffw_norm=(
            stack_norm(p + "pre_feedforward_layernorm.weight")
            if (p.format(0) + "pre_feedforward_layernorm.weight")
            in state else None
        ),
        post_ffw_norm=(
            stack_norm(p + "post_feedforward_layernorm.weight")
            if (p.format(0) + "post_feedforward_layernorm.weight")
            in state else None
        ),
    )
    embed = jnp.asarray(state["model.embed_tokens.weight"], dtype=dtype)
    if cfg.tie_word_embeddings or "lm_head.weight" not in state:
        lm_head = embed.T
    else:
        lm_head = jnp.asarray(state["lm_head.weight"].T, dtype=dtype)
    params = LlamaParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.asarray(state["model.norm.weight"], dtype=dtype),
        lm_head=lm_head,
    )
    return cfg, params


def _load_mamba_params(model_dir: str, cfg: ModelConfig):
    """HF MambaForCausalLM ('backbone.*') -> HybridParams tuple-of-layers."""
    from vllm_triton_backend_tpu.models.hybrid import (
        HybridParams,
        MambaLayerParams,
    )

    state = _load_state_dict(model_dir)
    dtype = jnp.dtype(cfg.dtype)

    def t(name, transpose=False, f32=False):
        arr = state[name]
        if transpose:
            arr = arr.T
        return jnp.asarray(arr, dtype=jnp.float32 if f32 else dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"backbone.layers.{i}."
        layers.append(
            MambaLayerParams(
                norm=t(p + "norm.weight"),
                in_proj=t(p + "mixer.in_proj.weight", transpose=True),
                # HF conv1d weight is [di, 1, k] depthwise
                conv_w=jnp.asarray(
                    state[p + "mixer.conv1d.weight"][:, 0, :], dtype
                ),
                conv_b=t(p + "mixer.conv1d.bias"),
                x_proj=t(p + "mixer.x_proj.weight", transpose=True),
                dt_proj=t(p + "mixer.dt_proj.weight", transpose=True),
                dt_bias=t(p + "mixer.dt_proj.bias", f32=True),
                A_log=t(p + "mixer.A_log", f32=True),
                D=t(p + "mixer.D", f32=True),
                out_proj=t(p + "mixer.out_proj.weight", transpose=True),
            )
        )
    embed = jnp.asarray(state["backbone.embeddings.weight"], dtype)
    if cfg.tie_word_embeddings or "lm_head.weight" not in state:
        lm_head = embed.T
    else:
        lm_head = jnp.asarray(state["lm_head.weight"].T, dtype)
    params = HybridParams(
        embed=embed,
        layers=tuple(layers),
        final_norm=jnp.asarray(state["backbone.norm_f.weight"], dtype),
        lm_head=lm_head,
    )
    return cfg, params
