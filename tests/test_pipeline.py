"""Pipeline parallelism on the virtual CPU mesh vs single-device forward."""

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
from vllm_triton_backend_tpu.parallel.pipeline import (
    make_pp_forward,
    make_pp_mesh,
    shard_params_pp,
)

BS = 16


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 3)])
def test_pp_forward_matches_single_device(stages, microbatches):
    if stages > len(jax.devices()):
        pytest.skip("not enough devices")
    cfg = ModelConfig.tiny(dtype="float32", num_layers=4)
    params = init_params(cfg, jax.random.key(0))
    mesh = make_pp_mesh(stages)
    m = microbatches
    tm, sm, nb_per_mb = 16, 1, 2

    rng = np.random.default_rng(0)
    qlens = [int(rng.integers(4, tm + 1)) for _ in range(m)]
    prompts = [
        rng.integers(0, cfg.vocab_size, size=q).astype(np.int32)
        for q in qlens
    ]

    # --- single-device reference per microbatch ---
    nb_total = m * nb_per_mb + 1
    ref_logits = []
    kv_ref = make_kv_caches(cfg, nb_total, BS)
    for i, p in enumerate(prompts):
        bt = (np.arange(nb_per_mb, dtype=np.int32) + i * nb_per_mb).reshape(
            1, nb_per_mb
        )
        meta = make_metadata(
            [len(p)], [0], bt, BS, num_token_bucket=tm
        )
        padded = np.zeros(tm, np.int32)
        padded[: len(p)] = p
        logits, kv_ref = forward(
            params, cfg, jnp.asarray(padded),
            jnp.arange(tm, dtype=jnp.int32), kv_ref, meta,
            ForwardExtras(max_query_len=tm, max_seq_len=64),
        )
        ref_logits.append(np.asarray(logits))

    # --- pipeline run: all microbatches at once ---
    sp = shard_params_pp(params, mesh)
    kv_cache = make_kv_caches(cfg, nb_total, BS)
    from jax.sharding import NamedSharding, PartitionSpec as P

    kv_cache = jax.device_put(kv_cache, NamedSharding(mesh, P("stage")))

    tok = np.zeros((m, tm), np.int32)
    pos = np.tile(np.arange(tm, dtype=np.int32), (m, 1))
    qsl = np.zeros((m, sm + 1), np.int32)
    sl = np.zeros((m, sm), np.int32)
    tbl = np.zeros((m, sm, nb_per_mb), np.int32)
    slots = np.full((m, tm), -1, np.int32)
    for i, p in enumerate(prompts):
        tok[i, : len(p)] = p
        qsl[i] = [0, len(p)]
        sl[i] = len(p)
        tbl[i, 0] = np.arange(nb_per_mb) + i * nb_per_mb
        slots[i, : len(p)] = i * nb_per_mb * BS + np.arange(len(p))

    pp_step = make_pp_forward(
        cfg, mesh, ForwardExtras(max_query_len=tm, max_seq_len=64), m
    )
    logits, kv_cache = pp_step(
        sp, jnp.asarray(tok), jnp.asarray(pos), kv_cache,
        jnp.asarray(qsl), jnp.asarray(sl), jnp.asarray(tbl),
        jnp.asarray(slots),
    )
    logits = np.asarray(logits)

    for i, p in enumerate(prompts):
        np.testing.assert_allclose(
            logits[i, : len(p)],
            ref_logits[i][: len(p)],
            atol=3e-4, rtol=1e-3,
            err_msg=f"microbatch {i} (stages={stages})",
        )
