"""The inference engine: model runner + scheduler + sampler in a step loop.

Replaces the reference's host framework (vLLM engine, SURVEY.md §1 L5).
``LLMEngine.step()`` is the production unit of work (the analog of vLLM's
``execute_model`` step the reference's metadata builder feeds, reference
backend/triton_attn.py:130-227): schedule → forward (jit, bucketed static
shapes) → sample → update request states.  ``LLM`` is the offline
user-facing wrapper (the ``offline_inference.py`` analog, reference
scripts/offline_inference.py:43-75).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vllm_triton_backend_tpu.config import EngineConfig
from vllm_triton_backend_tpu.models import llama
from vllm_triton_backend_tpu.models.llama import ForwardExtras
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams, sample
from vllm_triton_backend_tpu.runtime.scheduler import (
    Request,
    ScheduledBatch,
    Scheduler,
)
from vllm_triton_backend_tpu.utils import get_dtype


@dataclass
class RequestOutput:
    req_id: str
    prompt_token_ids: list[int]
    output_token_ids: list[int]
    finish_reason: str
    text: str | None = None


class LLMEngine:
    def __init__(
        self,
        config: EngineConfig,
        params=None,
        eos_token_id: int | None = None,
        rng_seed: int = 0,
    ):
        self.config = config
        mc, cc = config.model, config.cache
        if params is None:
            params = llama.init_params(mc, jax.random.key(config.seed))
        self.params = params
        cache_dtype = (
            jnp.dtype(mc.dtype)
            if cc.cache_dtype == "auto"
            else get_dtype(cc.cache_dtype)
        )
        self.k_cache, self.v_cache = llama.make_kv_caches(
            mc, cc.num_blocks, cc.block_size, cache_dtype
        )
        self.scheduler = Scheduler(config.scheduler, cc)
        self.eos_token_id = eos_token_id
        self._key = jax.random.key(rng_seed)
        self._id_counter = itertools.count()
        # kv scales for quantized caches (static; per-tensor calibration is
        # a TODO — these defaults assume O(1)-magnitude K/V activations).
        # fp8-e4m3 has enough dynamic range for scale 1.0; int8 needs the
        # fixed-point range mapped to ~[-8, 8].
        if cc.cache_dtype == "int8":
            self.k_scale = self.v_scale = 1.0 / 16.0
        else:
            self.k_scale = self.v_scale = 1.0

    # ---------------- request API ----------------

    def add_request(
        self,
        prompt_token_ids: list[int],
        sampling: SamplingParams | None = None,
        req_id: str | None = None,
    ) -> str:
        req_id = req_id or f"req-{next(self._id_counter)}"
        self.scheduler.add_request(
            Request(req_id, list(prompt_token_ids), sampling or SamplingParams())
        )
        return req_id

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished()

    # ---------------- step ----------------

    def step(self) -> list[RequestOutput]:
        batch = self.scheduler.schedule()
        if batch.is_empty:
            return []
        metadata = AttentionMetadata(
            query_start_loc=jnp.asarray(batch.query_start_loc),
            seq_lens=jnp.asarray(batch.seq_lens),
            block_table=jnp.asarray(batch.block_table),
            slot_mapping=jnp.asarray(batch.slot_mapping),
            num_seqs=jnp.int32(batch.num_seqs),
        )
        extras = ForwardExtras(
            max_query_len=batch.max_query_len,
            max_seq_len=batch.max_seq_len,
            k_scale=self.k_scale,
            v_scale=self.v_scale,
        )
        logits, self.k_cache, self.v_cache = llama.forward(
            self.params,
            self.config.model,
            jnp.asarray(batch.token_ids),
            jnp.asarray(batch.positions),
            self.k_cache,
            self.v_cache,
            metadata,
            extras,
        )
        # gather last-token logits per sequence and sample
        last = logits[jnp.asarray(batch.logits_indices)]
        reqs = [self.scheduler.requests[r] for r in batch.req_ids]
        temp = np.zeros(batch.logits_indices.shape[0], np.float32)
        top_p = np.ones_like(temp)
        top_k = np.zeros(temp.shape, np.int32)
        for i, r in enumerate(reqs):
            temp[i] = r.sampling.temperature
            top_p[i] = r.sampling.top_p
            top_k[i] = r.sampling.top_k
        self._key, sub = jax.random.split(self._key)
        sampled = np.asarray(
            sample(
                last,
                jnp.asarray(temp),
                jnp.asarray(top_p),
                jnp.asarray(top_k),
                sub,
            )
        )
        finished = self.scheduler.update(batch, sampled, self.eos_token_id)
        return [
            RequestOutput(
                req_id=r.req_id,
                prompt_token_ids=r.prompt_token_ids,
                output_token_ids=list(r.output_token_ids),
                finish_reason=r.status.value.removeprefix("finished_"),
            )
            for r in finished
        ]


class LLM:
    """Offline inference wrapper (the reference's ``LLM.generate`` analog)."""

    def __init__(
        self,
        config: EngineConfig | None = None,
        model_dir: str | None = None,
        tokenizer=None,
        **config_kw,
    ):
        params = None
        if model_dir is not None:
            from vllm_triton_backend_tpu.models.hf import (
                config_from_hf,
                load_params,
            )

            mc, params = load_params(model_dir)
            config = (config or EngineConfig()).replace(model=mc)
            if tokenizer is None:
                try:
                    from tokenizers import Tokenizer

                    tokenizer = Tokenizer.from_file(
                        f"{model_dir}/tokenizer.json"
                    )
                except Exception:
                    tokenizer = None
        config = config or EngineConfig()
        if config_kw:
            config = config.replace(**config_kw)
        self.tokenizer = tokenizer
        eos = None
        if tokenizer is not None:
            eos = tokenizer.token_to_id("</s>")
        self.engine = LLMEngine(config, params=params, eos_token_id=eos)

    def generate(
        self,
        prompts: list[list[int]] | list[str],
        sampling: SamplingParams | list[SamplingParams] | None = None,
    ) -> list[RequestOutput]:
        if prompts and isinstance(prompts[0], str):
            assert self.tokenizer is not None, "string prompts need tokenizer"
            prompts = [self.tokenizer.encode(p).ids for p in prompts]
        if not isinstance(sampling, list):
            sampling = [sampling] * len(prompts)
        order = {}
        for i, (p, sp) in enumerate(zip(prompts, sampling)):
            order[self.engine.add_request(p, sp)] = i
        outputs: list[RequestOutput | None] = [None] * len(prompts)
        while self.engine.has_unfinished():
            for out in self.engine.step():
                if self.tokenizer is not None:
                    out.text = self.tokenizer.decode(out.output_token_ids)
                outputs[order[out.req_id]] = out
        assert all(o is not None for o in outputs)
        return outputs
