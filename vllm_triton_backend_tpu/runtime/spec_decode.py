"""Speculative decoding — draft-model propose, target verify, LOSSLESS
under greedy decoding.

No reference counterpart (the reference delegates serving to vLLM; spec
decode is a vLLM engine feature) — native here, built entirely from
machinery this engine already has:

* **Draft proposal** is the existing fused K-step decode scan
  (``runtime/multistep.decode_steps``) running the small draft model
  greedily on its own paged KV cache.
* **Target verification** is ONE standard mixed-batch forward: every
  sequence contributes ``k`` tokens (the current token + k-1 drafts),
  which is exactly the chunked-prefill executable shape — the same
  prefill attention kernel, the same static (num_tokens, qlen) bucket.
* **Cache self-healing**: draft and target share the scheduler's block
  tables (same page geometry, separate cache arrays sized to each
  model).  Rejected positions hold stale K/V, but every cache write
  happens at ``position == seq_len - 1`` BEFORE that position is ever
  attended, so the next round's writes overwrite rejected slots before
  any read — no rollback pass exists because none is needed.

Greedy losslessness: the verify pass computes the target's argmax at
every fed position; the emitted tokens are the target's own choices
(t_0..t_a where a = accepted-draft prefix length), so output is
token-identical to running the target alone — the draft only changes
how many tokens each step yields (1..k).

Numerics caveat (the standard batch-variance caveat every spec-decode
implementation carries): "the target's own argmax" is computed by the
qlen=k verify executable, while the non-spec baseline uses the qlen=1
decode executable.  In exact arithmetic they agree identically (the
f32 test suite pins this); under bf16, near-tied logits can argmax
differently between the two executables — outputs then differ from the
non-spec run the way any batching/bucketing change can, while remaining
the target model's own greedy choices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import ForwardExtras, forward_fn
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata


def ngram_propose(
    tokens: list[int], k: int, max_n: int = 3
) -> list[int] | None:
    """Prompt-lookup proposal (vLLM's ngram speculator): find the most
    recent earlier occurrence of the longest suffix n-gram (n = max_n
    down to 1) and propose the k tokens that followed it.  Host-side,
    draft-model-free; a wrong proposal costs nothing but acceptance
    (the verifier emits the target's own tokens regardless)."""
    t = len(tokens)
    for n in range(min(max_n, t - 1), 0, -1):
        suffix = tokens[t - n:]
        # most recent match first
        for start in range(t - n - 1, -1, -1):
            if tokens[start : start + n] == suffix:
                cont = tokens[start + n : start + n + k]
                if cont:
                    # pad short continuations by repeating the last
                    return (cont + [cont[-1]] * k)[:k]
    return None


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "extras", "k", "block_size"),
    donate_argnames=("kv_cache",),
)
def verify_step(
    params,
    cfg: ModelConfig,
    cur_tokens: jax.Array,  # [S] int32 last sampled token per seq
    drafts: jax.Array,  # [k-1, S] int32 draft proposals
    seq_lens: jax.Array,  # [S] int32 length INCLUDING cur token
    block_table: jax.Array,  # [S, max_blocks]
    live: jax.Array,  # [S] bool
    kv_cache: jax.Array,
    extras: ForwardExtras,  # max_query_len == k
    k: int,
    block_size: int,
):
    """Target forward over [cur, d_0..d_{k-2}] per sequence; returns
    (target_tokens [S, k] — the target's greedy choice at every fed
    position, n_accepted [S] — length of the matching draft prefix,
    kv_cache).  Emitting t_0..t_{n_acc} (n_acc+1 tokens) reproduces
    target-only greedy decoding exactly."""
    s = cur_tokens.shape[0]
    fed = jnp.concatenate([cur_tokens[None], drafts], axis=0)  # [k, S]
    tokens = fed.T.reshape(-1)  # [S*k], per-seq contiguous
    offs = jnp.arange(k, dtype=jnp.int32)
    positions = (
        (seq_lens - 1)[:, None] + offs[None, :]
    ).reshape(-1)
    qsl = jnp.arange(s + 1, dtype=jnp.int32) * k
    vis_lens = jnp.where(live, seq_lens + (k - 1), seq_lens)
    page = jnp.take_along_axis(
        block_table,
        (positions.reshape(s, k) // block_size),
        axis=1,
    )
    slots = jnp.where(
        live[:, None],
        page * block_size + positions.reshape(s, k) % block_size,
        -1,
    ).reshape(-1).astype(jnp.int32)
    meta = AttentionMetadata(
        query_start_loc=qsl,
        seq_lens=vis_lens,
        block_table=block_table,
        slot_mapping=slots,
        num_seqs=jnp.int32(s),
    )
    logits, kv_cache = forward_fn(
        params, cfg, tokens, positions, kv_cache, meta, extras
    )
    tgt = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(s, k)
    match = drafts.T == tgt[:, : k - 1]  # [S, k-1]
    n_acc = jnp.sum(
        jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
    )
    return tgt, n_acc, kv_cache
