"""Layered configuration system.

TPU re-design of the reference's config stack (SURVEY.md §5.6): the reference
layers (1) ``.conf`` dotenv files whose values are JSON-decoded into
whitelisted module globals (reference scripts/benchmark.py:179-244), (2) env
vars, (3) CLI pass-through, (4) container defaults.  Here the same layering is
expressed over typed dataclasses:

  defaults (dataclass fields)  <  .conf file  <  environment  <  kwargs

Env vars use the ``VTB_`` prefix with the upper-cased field name, e.g.
``VTB_BLOCK_SIZE=32``.  Values are JSON-decoded when possible (so ``true``,
``[1,2]``, ``0.5`` all work), mirroring the reference's ``json.loads`` of
dotenv values.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field, fields
from typing import Any

ENV_PREFIX = "VTB_"


def _json_or_str(raw: str) -> Any:
    try:
        return json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        return raw


def parse_conf_file(path: str) -> dict[str, Any]:
    """Parse a dotenv-style ``.conf`` file with JSON-decoded values.

    Format parity with the reference's setups/*.conf: one ``KEY=value`` per
    line, ``#`` comments, values are JSON when decodable else raw strings.
    """
    out: dict[str, Any] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, raw = line.partition("=")
            out[key.strip()] = _json_or_str(raw.strip())
    return out


def _apply_layers(cls, conf_path: str | None, kwargs: dict[str, Any]):
    """defaults < conf file < env < kwargs, for any config dataclass."""
    values: dict[str, Any] = {}
    names = {f.name for f in fields(cls)}
    if conf_path:
        for k, v in parse_conf_file(conf_path).items():
            if k.lower() in names:
                values[k.lower()] = v
    for f in fields(cls):
        env_key = ENV_PREFIX + f.name.upper()
        if env_key in os.environ:
            values[f.name] = _json_or_str(os.environ[env_key])
    values.update({k: v for k, v in kwargs.items() if v is not None})
    return cls(**values)


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for a decoder-only transformer.

    Covers the Llama family (TinyLlama, Llama-2/3, granite-3.x): the granite
    scalar multipliers default to the plain-Llama identity values.
    """

    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 22
    num_heads: int = 32
    num_kv_heads: int = 4
    head_dim: int | None = None  # defaults to hidden_size // num_heads
    rope_theta: float = 10000.0
    # qkv projection biases (Qwen2-family); o/mlp stay bias-free as in
    # every supported architecture
    attention_bias: bool = False
    rope_scaling: dict | None = None  # llama3-style {"factor", "low_freq_factor", ...}
    rms_norm_eps: float = 1e-5
    # Mixture-of-Experts MLP (Mixtral-family): 0 experts = dense MLP.
    # Router: softmax over all experts -> top-k -> renormalize (HF
    # Mixtral semantics).
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    # renormalize the top-k routing weights (Mixtral yes; Qwen3-MoE's
    # norm_topk_prob flag)
    moe_renormalize: bool = True
    max_position_embeddings: int = 2048
    tie_word_embeddings: bool = False
    dtype: str = "bfloat16"
    # Granite multipliers (== 1.0 for Llama).
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    attention_multiplier: float | None = None  # None -> 1/sqrt(head_dim)
    logits_scaling: float = 1.0
    # Sliding-window attention (None = full causal), reference
    # backend/triton_attn.py:314-317 semantics: window of (w-1) past tokens.
    sliding_window: int | None = None
    # Per-layer sliding-window PATTERN (gemma-2/3 style): layer i uses
    # entry i % len(pattern); None entry = full causal. The layer scan
    # runs over pattern-period blocks so each position keeps a static
    # window. None = uniform (plain ``sliding_window``).
    sliding_window_pattern: tuple | None = None
    # rope base for SLIDING pattern positions (gemma-3: local layers use
    # 10k while global layers use rope_theta, typically 1M with scaling
    # applied to the global layers only). None = rope_theta everywhere.
    rope_local_base_freq: float | None = None
    # Gemma-family block shape: RMSNorm weights stored as (w - 1) with a
    # unit offset applied at use; sandwich norms (post-attention and
    # post-feedforward norms applied to the SUBLAYER OUTPUT before the
    # residual add, plus a pre-feedforward norm).
    norm_add_unit_offset: bool = False
    sandwich_norms: bool = False
    # MLP activation: "silu" (llama) or "gelu_tanh" (gemma)
    hidden_act: str = "silu"
    # Per-head q/k RMSNorm before rope (Qwen3 / Gemma-3)
    qk_norm: bool = False
    # lm_head logit softcapping (gemma-2; 0 = off) — applied before
    # logits_scaling
    final_logit_softcap: float = 0.0
    # Attention logit softcapping (0 = off), reference
    # kernels/triton_unified_attention.py:25-29 tanh softcap semantics.
    logits_soft_cap: float = 0.0
    # Chunked local attention (iRoPE): tokens attend only within chunks of
    # this size (None = global).  Reference use_irope local-attention
    # virtual batches, backend/triton_attn.py:156-190.
    attention_chunk_size: int | None = None
    # Cross-layer KV sharing: per-layer index of the layer whose KV this
    # layer attends over (YOCO-style; reference kv_sharing_target_layer —
    # backend/triton_attn.py:302,393: sharing layers skip the cache write).
    # Owners point at themselves; entries must reference an earlier-or-same
    # owner layer.  None = every layer owns its KV.  The cache is sized to
    # the number of OWNER layers only.
    kv_sharing: tuple[int, ...] | None = None
    # Quantization: "none" | "int8" | "fp8" (weight-only linears) |
    # "int8-w8a8" (int8 weights + int8-MXU activation quantization on
    # prefill/mixed steps; decode stays weight-only — ForwardExtras.w8a8).
    quantization: str = "none"
    # Architecture family: "llama" (covers granite via multipliers) |
    # "mamba" (pure SSM) | "hybrid" (per-layer mix, see layers_block_type).
    architecture: str = "llama"
    # Per-layer block kinds for hybrids: tuple of "attention" | "mamba".
    # None -> homogeneous per `architecture`.
    layers_block_type: tuple[str, ...] | None = None
    # Mamba/SSM mixer hyperparameters (reference mamba_ssm.py semantics).
    mamba_state_size: int = 16
    mamba_conv_kernel: int = 4
    mamba_expand: int = 2
    mamba_dt_rank: int = 0  # 0 -> ceil(hidden/16)

    def __post_init__(self):
        # rope_scaling arrives as a JSON dict (unhashable — ModelConfig
        # is a jit-static arg); normalize to a sorted item tuple
        if isinstance(self.rope_scaling, dict):
            object.__setattr__(
                self, "rope_scaling",
                tuple(sorted(self.rope_scaling.items())),
            )
        if isinstance(self.sliding_window_pattern, list):
            object.__setattr__(
                self, "sliding_window_pattern",
                tuple(self.sliding_window_pattern),
            )

    @property
    def head_size(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads

    def kv_cache_slots(self) -> tuple[tuple[int, ...], int]:
        """(per-layer cache-slot index, number of cache layers).

        With ``kv_sharing`` the cache holds only OWNER layers' pages;
        sharing layers map onto their source's slot and never write.
        """
        if self.kv_sharing is None:
            return tuple(range(self.num_layers)), self.num_layers
        if len(self.kv_sharing) != self.num_layers:
            raise ValueError("kv_sharing must have one entry per layer")
        slots, n = [], 0
        for l, src in enumerate(self.kv_sharing):
            if src == l:
                slots.append(n)
                n += 1
            else:
                if not 0 <= src < l or self.kv_sharing[src] != src:
                    raise ValueError(
                        f"layer {l}: kv_sharing source {src} must be an "
                        "earlier owner layer"
                    )
                slots.append(slots[src])
        return tuple(slots), n

    @property
    def num_queries_per_kv(self) -> int:
        return self.num_heads // self.num_kv_heads

    @property
    def attn_scale(self) -> float:
        if self.attention_multiplier is not None:
            return self.attention_multiplier
        return self.head_size ** -0.5

    @classmethod
    def tiny(cls, **kw) -> "ModelConfig":
        """A tiny debug model (fast CPU tests)."""
        base = dict(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2,
            max_position_embeddings=512,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def tinyllama_1_1b(cls, **kw) -> "ModelConfig":
        """TinyLlama-1.1B (north-star config 1)."""
        base = dict(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_layers=22, num_heads=32, num_kv_heads=4,
            max_position_embeddings=2048, rope_theta=10000.0,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama3_8b(cls, **kw) -> "ModelConfig":
        base = dict(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8,
            max_position_embeddings=8192, rope_theta=500000.0,
            rms_norm_eps=1e-5,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama3_70b(cls, **kw) -> "ModelConfig":
        """Llama-3-70B (north-star staged config 5: multi-host serving,
        BASELINE.md; weights must be tensor-sharded — 140 GB bf16 is ~9
        v5e chips at minimum, served TP=8 per host with DP across hosts).
        """
        base = dict(
            vocab_size=128256, hidden_size=8192, intermediate_size=28672,
            num_layers=80, num_heads=64, num_kv_heads=8,
            max_position_embeddings=8192, rope_theta=500000.0,
            rms_norm_eps=1e-5,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def granite_3_1_8b(cls, **kw) -> "ModelConfig":
        """granite-3.1-8B (the reference README's serving example model)."""
        base = dict(
            vocab_size=49155, hidden_size=4096, intermediate_size=12800,
            num_layers=40, num_heads=32, num_kv_heads=8,
            max_position_embeddings=4096, rope_theta=10000000.0,
            embedding_multiplier=12.0, residual_multiplier=0.22,
            attention_multiplier=0.0078125, logits_scaling=16.0,
            tie_word_embeddings=True,
        )
        base.update(kw)
        return cls(**base)


@dataclass(frozen=True)
class CacheConfig:
    """Paged KV-cache configuration.

    TPU-first layout: ONE fused array
    ``[num_layers, num_blocks, 2, num_kv_heads, block_size, head_size]`` so
    that a page — K and V of every head — is a single contiguous slab: the
    DMA unit of the Pallas attention kernels (one ``make_async_copy`` per
    page).  The reference's GPU layout is
    ``(2, num_blocks, block_size, num_kv_heads, head_size)``
    (reference backend/triton_attn.py:269-277); there pointer arithmetic
    makes layout almost free, here the DMA-issue rate makes page-contiguity
    the first-order design decision.  TPU-friendly block sizes are LARGER
    than GPU ones (32-128): each page fetch should move >=32 KB to amortize
    DMA issue cost.
    """

    block_size: int = 32
    # 0 = auto-size from free device memory at engine init (the vLLM
    # ``gpu_memory_utilization`` analog; see runtime/engine.py
    # _auto_num_blocks).
    num_blocks: int = 1024
    # Fraction of TOTAL device memory the engine may occupy including
    # weights; only consulted when num_blocks == 0.
    memory_utilization: float = 0.85
    # KV-cache dtype: "auto" (model dtype) | "fp8" (e4m3) | "int8".
    cache_dtype: str = "auto"
    # Slot id marking padded entries that must not be written
    # (reference mamba_ssm.py PAD_SLOT_ID semantics).
    pad_slot_id: int = -1


@dataclass(frozen=True)
class ParallelConfig:
    """Mesh axes for multi-chip execution (SURVEY.md §2.6 build column).

    * ``data_parallel`` — replica scheduling: each data shard runs its own
      scheduler + page pool; batches stack on a leading replica axis.
    * ``tensor_parallel`` — Megatron TP (parallel/sharded.py).
    * ``pipeline_parallel`` — GPipe stage pipeline (parallel/pipeline.py);
      mutually exclusive with tp/dp in v1.
    * ``context_parallel`` — sequence-sharded KV (parallel/context.py);
      mutually exclusive with the others in v1.
    """

    data_parallel: int = 1
    tensor_parallel: int = 1
    pipeline_parallel: int = 1
    context_parallel: int = 1
    # Decompose TP reductions into ring reduce-scatter collective_matmuls
    # so communication overlaps with compute (dense weights only;
    # parallel/sharded.row_parallel_matmul_overlapped).  Off by default:
    # ring summation order differs from psum, so bit-exact parity with
    # the single-chip engine no longer holds.
    overlap_collectives: bool = False

    @property
    def world_size(self) -> int:
        return (
            self.data_parallel * self.tensor_parallel
            * self.pipeline_parallel * self.context_parallel
        )


@dataclass(frozen=True)
class SchedulerConfig:
    """Continuous-batching scheduler limits (static-shape buckets)."""

    max_num_seqs: int = 64
    max_num_batched_tokens: int = 1024
    max_model_len: int = 2048
    # Chunked prefill: cap on new prefill tokens scheduled per step.
    enable_chunked_prefill: bool = True
    # Prefix caching: reuse full blocks across requests by content hash.
    enable_prefix_caching: bool = True
    # Static jit shape buckets for num_tokens (TPU's answer to CUDA graphs).
    token_buckets: tuple[int, ...] = (8, 16, 32, 64, 128, 256, 512, 1024)
    # Throughput-oriented policy: while prompts are WAITING, spend the
    # whole token budget on prefill and defer decode-only rows (they
    # resume as soon as the queue drains — typically into the fused
    # decode session).  Keeps a big batch's rows in lockstep so the
    # session never runs chunks for mostly-frozen rows; default False =
    # decode-priority continuous batching (vLLM behavior, better ITL).
    prefill_priority: bool = False


@dataclass(frozen=True)
class EngineConfig:
    model: ModelConfig = field(default_factory=ModelConfig.tiny)
    cache: CacheConfig = field(default_factory=CacheConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    seed: int = 0

    @classmethod
    def from_layers(cls, conf_path: str | None = None, **kwargs) -> "EngineConfig":
        """Build from the config layering (defaults < conf < env < kwargs)."""
        sub = {}
        for name, sub_cls in (
            ("model", ModelConfig), ("cache", CacheConfig),
            ("parallel", ParallelConfig), ("scheduler", SchedulerConfig),
        ):
            sub[name] = _apply_layers(sub_cls, conf_path, dict(kwargs.get(name) or {}))
        return cls(**sub)

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)
