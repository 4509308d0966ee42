"""Context (sequence) parallelism on the virtual CPU mesh vs oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vllm_triton_backend_tpu.ops.refs import ref_paged_attention
from vllm_triton_backend_tpu.parallel.context import (
    cp_decode_attention,
    ring_prefill_attention,
)

BS = 16


def test_cp_decode_matches_single_chip():
    """KV shards on 4 chips; merged decode == single-pool oracle."""
    n_chips = 4
    if len(jax.devices()) < n_chips:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(0)
    S, HQ, HKV, HD = 3, 4, 2, 64
    per_chip_lens = np.asarray(
        [[40, 33, 7], [25, 0, 16], [16, 16, 16], [5, 64, 1]], np.int32
    )  # [P, S]
    nb_local = 16
    max_blocks = 4

    # global fused cache: chip p owns blocks [p*nb_local, (p+1)*nb_local)
    kv_all = (
        rng.standard_normal((1, n_chips * nb_local, 2, HKV, BS, HD)) * 0.4
    ).astype(np.float32)
    q = (rng.standard_normal((S, HQ, HD)) * 0.5).astype(np.float32)
    # local tables (page ids local to each shard), non-overlapping
    tbl_local = np.zeros((n_chips, S, max_blocks), np.int32)
    for p in range(n_chips):
        perm = rng.permutation(nb_local)
        i = 0
        for s in range(S):
            nbk = -(-int(per_chip_lens[p, s]) // BS)
            tbl_local[p, s, :nbk] = perm[i : i + nbk]
            i += nbk
    scale = HD**-0.5

    mesh = Mesh(np.asarray(jax.devices()[:n_chips]), ("seq",))

    def step(q, kv_shard, lens, tbl):
        return cp_decode_attention(
            q, kv_shard, jnp.int32(0), lens[0], tbl[0], "seq",
            scale=scale, max_seq_len=64,
        )

    mapped = jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(
                P(), P(None, "seq"), P("seq"), P("seq"),
            ),
            out_specs=P(),
            check_vma=False,
        )
    )
    out = mapped(
        jnp.asarray(q),
        jnp.asarray(kv_all),
        jnp.asarray(per_chip_lens),
        jnp.asarray(tbl_local),
    )

    # oracle: concatenated KV per sequence across chips, decode attention
    # over the union; build a single-pool equivalent
    outs = np.zeros((S, HQ, HD), np.float32)
    for s in range(S):
        ks, vs = [], []
        for p in range(n_chips):
            L = int(per_chip_lens[p, s])
            for pos in range(L):
                pg = tbl_local[p, s, pos // BS] + p * nb_local
                ks.append(kv_all[0, pg, 0, :, pos % BS, :])
                vs.append(kv_all[0, pg, 1, :, pos % BS, :])
        kk = np.stack(ks, 0)  # [L, HKV, HD]
        vv = np.stack(vs, 0)
        kk = np.repeat(kk, HQ // HKV, axis=1)
        vv = np.repeat(vv, HQ // HKV, axis=1)
        logits = np.einsum("hd,khd->hk", q[s], kk) * scale
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        outs[s] = np.einsum("hk,khd->hd", w, vv)
    np.testing.assert_allclose(np.asarray(out), outs, atol=2e-3, rtol=1e-3)


def test_ring_prefill_matches_dense_causal():
    n_chips = 4
    if len(jax.devices()) < n_chips:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(1)
    C, HQ, HKV, HD = 32, 4, 2, 64
    T = n_chips * C
    q = (rng.standard_normal((T, HQ, HD)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((T, HKV, HD)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((T, HKV, HD)) * 0.5).astype(np.float32)
    scale = HD**-0.5

    mesh = Mesh(np.asarray(jax.devices()[:n_chips]), ("seq",))
    mapped = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_prefill_attention(
                q, k, v, "seq", scale=scale
            ),
            mesh=mesh,
            in_specs=(P("seq"), P("seq"), P("seq")),
            out_specs=P("seq"),
            check_vma=False,
        )
    )
    out = np.asarray(mapped(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    # dense causal oracle
    kk = np.repeat(k, HQ // HKV, axis=1)
    vv = np.repeat(v, HQ // HKV, axis=1)
    logits = np.einsum("qhd,khd->qhk", q, kk) * scale
    mask = np.tril(np.ones((T, T), bool))
    logits = np.where(mask[:, None, :], logits, -np.inf)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    expect = np.einsum("qhk,khd->qhd", w, vv)
    np.testing.assert_allclose(out, expect, atol=2e-3, rtol=1e-3)


def test_ulysses_matches_dense_causal():
    from vllm_triton_backend_tpu.parallel.ulysses import (
        ulysses_prefill_attention,
    )

    n_chips = 4
    if len(jax.devices()) < n_chips:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(2)
    C, HQ, HKV, HD = 16, 8, 4, 64
    T = n_chips * C
    q = (rng.standard_normal((T, HQ, HD)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((T, HKV, HD)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((T, HKV, HD)) * 0.5).astype(np.float32)
    scale = HD**-0.5

    mesh = Mesh(np.asarray(jax.devices()[:n_chips]), ("seq",))
    mapped = jax.jit(
        jax.shard_map(
            lambda q, k, v: ulysses_prefill_attention(
                q, k, v, "seq", scale=scale
            ),
            mesh=mesh,
            in_specs=(P("seq"), P("seq"), P("seq")),
            out_specs=P("seq"),
            check_vma=False,
        )
    )
    out = np.asarray(mapped(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    kk = np.repeat(k, HQ // HKV, axis=1)
    vv = np.repeat(v, HQ // HKV, axis=1)
    logits = np.einsum("qhd,khd->qhk", q, kk) * scale
    mask = np.tril(np.ones((T, T), bool))
    logits = np.where(mask[:, None, :], logits, -np.inf)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    expect = np.einsum("qhk,khd->qhd", w, vv)
    np.testing.assert_allclose(out, expect, atol=2e-3, rtol=1e-3)
