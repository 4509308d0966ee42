"""Multi-chip sharded execution on the virtual 8-device CPU mesh.

Gold check: the (data x model) shard_map step must produce logits and cache
contents identical to the single-device forward run per data-replica.  This
is the multi-host test tier the reference lacks (SURVEY.md §4: "the TPU
build must add what the reference lacks: multi-host tests ... fake mesh").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import (
    ForwardExtras,
    forward,
    init_params,
    make_kv_caches,
)
from vllm_triton_backend_tpu.ops.metadata import make_metadata
from vllm_triton_backend_tpu.parallel import (
    make_mesh,
    make_sharded_forward,
    shard_caches,
    shard_params,
)

BS = 16  # block size
NB_LOCAL = 8  # blocks per data shard


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4), (1, 2), (2, 1)])
def test_sharded_forward_matches_single_device(dp, tp):
    if dp * tp > len(jax.devices()):
        pytest.skip("not enough devices")
    cfg = ModelConfig.tiny(dtype="float32", num_heads=8, num_kv_heads=4)
    params = init_params(cfg, jax.random.key(0))
    mesh = make_mesh(data=dp, model=tp)

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=6 + 3 * d).tolist()
        for d in range(dp)
    ]
    extras = ForwardExtras(max_query_len=16, max_seq_len=64)

    # --- single-device reference, one replica at a time ---
    ref_logits = []
    for p in prompts:
        kv = make_kv_caches(cfg, NB_LOCAL, BS)
        bt = np.arange(4, dtype=np.int32).reshape(1, 4)
        meta = make_metadata([len(p)], [0], bt, BS, num_token_bucket=16)
        padded = np.zeros(16, np.int32)
        padded[: len(p)] = p
        logits, kv = forward(
            params, cfg, jnp.asarray(padded),
            jnp.arange(16, dtype=jnp.int32),
            kv, meta, extras,
        )
        ref_logits.append(np.asarray(logits))

    # --- sharded run: all replicas in one step ---
    sp = shard_params(params, mesh)
    kv_cache = make_kv_caches(cfg, dp * NB_LOCAL, BS, data_shards=dp)
    kv_cache = shard_caches(kv_cache, mesh)

    T = 16
    tok = np.zeros((dp, T), np.int32)
    pos = np.tile(np.arange(T, dtype=np.int32), (dp, 1))
    qsl = np.zeros((dp, 2), np.int32)
    sl = np.zeros((dp, 1), np.int32)
    tbl = np.zeros((dp, 1, 4), np.int32)
    slots = np.full((dp, T), -1, np.int32)
    for d, p in enumerate(prompts):
        tok[d, : len(p)] = p
        qsl[d] = [0, len(p)]
        sl[d] = len(p)
        tbl[d, 0] = np.arange(4)  # local page ids
        slots[d, : len(p)] = np.arange(len(p))  # pages 0.. contiguous
    step = make_sharded_forward(cfg, mesh, extras)
    logits, kv_cache = step(
        sp, jnp.asarray(tok), jnp.asarray(pos), kv_cache,
        jnp.asarray(qsl), jnp.asarray(sl), jnp.asarray(tbl),
        jnp.asarray(slots),
    )
    logits = np.asarray(logits)

    for d, p in enumerate(prompts):
        np.testing.assert_allclose(
            logits[d, : len(p)],
            ref_logits[d][: len(p)],
            atol=2e-4, rtol=1e-3,
            err_msg=f"replica {d} (dp={dp}, tp={tp})",
        )


def test_row_parallel_matmul_overlapped_matches_psum():
    """collective_matmul ring reduce-scatter == monolithic psum."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh, PartitionSpec as P

    from vllm_triton_backend_tpu.parallel.sharded import (
        row_parallel_matmul_overlapped,
    )

    p = 4
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("model",))
    rng = np.random.default_rng(0)
    t, k, n = 8, 64, 32
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

    def ring(x, w):
        return row_parallel_matmul_overlapped(x, w, "model")

    def mono(x, w):
        return jax.lax.psum(x @ w, "model")

    run = lambda f: jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=(P(None, "model"), P("model", None)),
            out_specs=P(), check_vma=False,
        )
    )(x, w)
    np.testing.assert_allclose(
        np.asarray(run(ring)), np.asarray(run(mono)), rtol=1e-5, atol=1e-5
    )
