"""On-chip autotuning sweep — populates the SHIPPED dejavu DBs.

Run on real TPU hardware:  ``python tools/tune_chip.py [--quick]``

Tunes the decode kernel (``chunk_tokens``) and the prefill kernel
(``block_q`` x ``super_size``) over the north-star shape grid
(TinyLlama-1.1B, llama3-8B, granite-3.1-8B head configs x seq buckets x
cache dtypes) and writes the winning configs into
``vllm_triton_backend_tpu/autotune/dejavu_data/`` — the tree that ships
with the package, the analog of the reference's committed
``kernels/dejavu_data`` (reference setup.py:66-68; 540 configs /
72,003 s of tuning evidence per SURVEY.md §2.2).  Configs are timed by
MEASURED device kernel duration from xplane traces (dejavu
``trace_pattern``), not wall clock.

Also emits a tuned-vs-fallback TSV (`dejavu_data/tuned_vs_fallback.tsv`)
proving the tuned configs beat the static heuristic.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# write straight into the shipped package data tree
os.environ["VTB_DEJAVU_STORAGE"] = os.path.join(
    REPO, "vllm_triton_backend_tpu", "autotune", "dejavu_data"
)
os.environ.setdefault("VTB_PRINT_AUTOTUNING", "1")

import numpy as np  # noqa: E402


def main(
    quick: bool = False, qmm_only: bool = False, b32: bool = False,
    serving: bool = False,
) -> None:
    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.ops.metadata import make_metadata
    import importlib

    # the pallas package __init__ re-exports a function named
    # prefill_attention, shadowing the submodule attribute — go through
    # importlib to get the modules themselves
    da = importlib.import_module(
        "vllm_triton_backend_tpu.ops.pallas.decode_attention"
    )
    pa = importlib.import_module(
        "vllm_triton_backend_tpu.ops.pallas.prefill_attention"
    )
    import sys as _sys
    da = _sys.modules["vllm_triton_backend_tpu.ops.pallas.decode_attention"]
    pa = _sys.modules["vllm_triton_backend_tpu.ops.pallas.prefill_attention"]
    from vllm_triton_backend_tpu.utils import next_power_of_2
    from vllm_triton_backend_tpu.utils.xplane import matched_kernel_time

    rng = np.random.default_rng(0)
    rows = []

    # (num_q_heads, num_kv_heads, head_size) per model family
    head_cfgs = [
        (32, 4, 64),    # TinyLlama-1.1B
        (32, 8, 128),   # llama3-8B / granite-3.1-8B
    ]
    seq_lens = [512, 1024] if quick else [256, 512, 1024, 2048]
    dtypes = [jnp.bfloat16, jnp.int8] if quick else [
        jnp.bfloat16, jnp.int8, jnp.float8_e4m3fn
    ]
    batch, bs = 16, 64
    batches = [None]
    if b32:  # fill the batch-32/64 decode keys (bench sweeps 32 and 64)
        batches = [32, 64]
        head_cfgs = [(32, 8, 128)]
        seq_lens = [512, 1024, 2048]
        dtypes = [jnp.bfloat16, jnp.int8]
    if serving:
        # the headline SERVING shapes (VERDICT r3 #6): granite-3.1-8B
        # heads, block 64, batch 128 decode (the concurrency-sweep top)
        # at the session's max_seq buckets, int8 KV
        batches = [128]
        head_cfgs = [(32, 8, 128)]
        seq_lens = [640, 1024]
        dtypes = [jnp.int8]

    def measure(fn, pattern, reps=10):
        """Measured device kernel time per call via an xplane trace."""
        import shutil
        import tempfile

        def fence(r):
            leaf = jax.tree_util.tree_leaves(r)[0]
            np.asarray(jax.device_get(leaf.ravel()[:1]))

        d = tempfile.mkdtemp(prefix="tune_tsv_")
        try:
            fence(fn())
            with jax.profiler.trace(d):
                r = None
                for _ in range(reps):
                    r = fn()
                fence(r)
            kt = matched_kernel_time(d, pattern)
            return kt.total_s / kt.count if kt and kt.count else None
        except Exception as e:  # config fails to compile (e.g. VMEM OOM)
            print(f"  measure failed: {type(e).__name__}", flush=True)
            return None
        finally:
            shutil.rmtree(d, ignore_errors=True)

    for (hq, hkv, hd) in head_cfgs if not qmm_only else []:
        for dtype in dtypes:
            for max_seq, bcur in (
                (sq, bt) for sq in seq_lens for bt in batches
            ):
                if bcur is not None:
                    batch = bcur
                pages = max_seq // bs
                nb = batch * pages + 1
                kv = jnp.zeros((1, nb, 2, hkv, bs, max(hd, 128)), dtype)
                q = jnp.asarray(
                    rng.standard_normal((batch, hq, hd)) * 0.3,
                    jnp.bfloat16,
                )
                seq = max(1, max_seq - bs // 2)
                # engine-realistic RANDOM page placement: sequential
                # tables flatter the DMA pipeline (measured 36 vs 54
                # us/layer, docs/decode_step_profile.md) and would tune
                # chunk/depth for a pattern the engine never produces
                bt = (
                    rng.permutation(batch * pages)
                    .reshape(batch, pages)
                    .astype(np.int32) % (nb - 1)
                )
                meta = make_metadata(
                    [1] * batch, [seq - 1] * batch, bt, bs
                )
                kw = dict(
                    scale=hd**-0.5, max_seq_len=max_seq,
                    sliding_window=0, logits_soft_cap=0.0,
                    alibi_slopes=None, k_scale=1 / 16.0,
                    v_scale=1 / 16.0, return_partials=False,
                    local_chunk_size=0,
                    max_seq_len_p2=next_power_of_2(max_seq),
                    num_seqs_p2=next_power_of_2(batch),
                    num_q_heads=hq, num_kv_heads=hkv,
                    head_size=max(hd, 128), block_size=bs,
                    kv_dtype=str(jnp.dtype(dtype)),
                )
                da._decode_launch._load_db()
                tuned_already = (
                    da._decode_launch._make_key(kw)
                    in da._decode_launch._mem
                )
                # fallback timing (heuristic config), then tune
                fb_cfg = da._decode_launch.fallback_heuristic(
                    da._decode_launch._make_key(kw)
                )
                args = (q, kv, jnp.int32(0), meta.seq_lens,
                        meta.block_table)
                t_fb = measure(
                    lambda: da._decode_launch.fn(*args, **kw, **fb_cfg),
                    "paged_decode",
                )
                if tuned_already:
                    won = dict(
                        da._decode_launch._mem[
                            da._decode_launch._make_key(kw)
                        ]
                    )
                else:
                    won = da._decode_launch.tune(*args, **kw)
                t_tuned = measure(
                    lambda: da._decode_launch.fn(*args, **kw, **won),
                    "paged_decode",
                )
                rows.append(
                    ("decode", f"{hq}/{hkv}h hd{hd} b{batch}",
                     str(jnp.dtype(dtype)), max_seq,
                     fb_cfg, t_fb, won, t_tuned)
                )
                print(
                    f"decode {hq}/{hkv} hd{hd} {jnp.dtype(dtype)} "
                    f"seq{max_seq}: fallback {fb_cfg} "
                    f"{(t_fb or 0)*1e6:.1f}us -> tuned {won} "
                    f"{(t_tuned or 0)*1e6:.1f}us",
                    flush=True,
                )
                del kv

    # ---- prefill ----
    prefill_seqs = [512] if quick else [512, 2048]
    if serving:
        # the mixed-split compact sub-batch shape: ~4 chunked prefills
        # of 512 with context growing into the 1024 bucket
        prefill_seqs = [1024]
    for (hq, hkv, hd) in head_cfgs if not (qmm_only or b32) else []:
        for dtype in dtypes[:2]:  # bf16 + int8
            for max_seq in prefill_seqs:
                pages = max_seq // bs
                n_seqs = 4
                nb = n_seqs * pages + 1
                kv = jnp.zeros((1, nb, 2, hkv, bs, max(hd, 128)), dtype)
                q_len = min(512, max_seq)
                total = n_seqs * q_len
                q = jnp.asarray(
                    rng.standard_normal((total, hq, hd)) * 0.3,
                    jnp.bfloat16,
                )
                bt = (
                    np.arange(n_seqs * pages, dtype=np.int32)
                    .reshape(n_seqs, pages) % (nb - 1)
                )
                meta = make_metadata(
                    [q_len] * n_seqs,
                    [max_seq - q_len] * n_seqs,
                    bt, bs, num_token_bucket=total,
                )
                kw = dict(
                    scale=hd**-0.5, max_query_len=q_len,
                    max_seq_len=max_seq, sliding_window=0,
                    logits_soft_cap=0.0, alibi_slopes=None,
                    k_scale=1 / 16.0, v_scale=1 / 16.0,
                    local_chunk_size=0,
                    max_query_len_p2=next_power_of_2(q_len),
                    max_seq_len_p2=next_power_of_2(max_seq),
                    num_q_heads=hq, num_kv_heads=hkv,
                    head_size=hd, block_size=bs,
                    kv_dtype=str(jnp.dtype(dtype)),
                )
                pa._prefill_launch._load_db()
                tuned_already = (
                    pa._prefill_launch._make_key(kw)
                    in pa._prefill_launch._mem
                )
                fb_cfg = pa._prefill_launch.fallback_heuristic(
                    pa._prefill_launch._make_key(kw)
                )
                args = (q, kv, jnp.int32(0), meta.query_start_loc,
                        meta.seq_lens, meta.block_table)
                t_fb = measure(
                    lambda: pa._prefill_launch.fn(*args, **kw, **fb_cfg),
                    "prefill_attention", reps=3,
                )
                if tuned_already:
                    won = dict(
                        pa._prefill_launch._mem[
                            pa._prefill_launch._make_key(kw)
                        ]
                    )
                else:
                    won = pa._prefill_launch.tune(*args, **kw)
                t_tuned = measure(
                    lambda: pa._prefill_launch.fn(*args, **kw, **won),
                    "prefill_attention", reps=3,
                )
                rows.append(
                    ("prefill", f"{hq}/{hkv}h hd{hd}",
                     str(jnp.dtype(dtype)), max_seq,
                     fb_cfg, t_fb, won, t_tuned)
                )
                print(
                    f"prefill {hq}/{hkv} hd{hd} {jnp.dtype(dtype)} "
                    f"seq{max_seq}: fallback {fb_cfg} "
                    f"{(t_fb or 0)*1e6:.1f}us -> tuned {won} "
                    f"{(t_tuned or 0)*1e6:.1f}us",
                    flush=True,
                )
                del kv

    # ---- quantized matmuls (the decode step's dominant HBM stream) ----
    import functools

    ql = importlib.import_module(
        "vllm_triton_backend_tpu.ops.pallas.quant_linear"
    )
    # granite-3.1-8B int8 projection shapes (K, N, stacked?): fused qkv
    # (48 heads x 128), fused gate|up, down, o, padded lm_head
    # (49155 -> 49*1024)
    qmm_shapes = [
        (4096, 6144, True),
        (4096, 25600, True),
        (12800, 4096, True),
        (4096, 4096, True),
        (4096, 50176, False),
    ]
    qmm_ts = [16] if quick else [16, 32, 512, 2048]
    if b32:
        qmm_ts = [32]
    if serving:
        qmm_ts = [128, 2048]
    quantize = jax.jit(
        jax.vmap(functools.partial(ql.quantize_weights, dtype="int8"))
    )
    for (kd, nd, stacked) in qmm_shapes:
        qw = quantize(
            jnp.asarray(
                rng.standard_normal((2, kd, nd)) * 0.02, jnp.bfloat16
            )
        )
        if not stacked:
            qw = ql.QuantizedLinear(qw.w_q[0], qw.scales[0])
        for t in qmm_ts:
            if not stacked and t > 256:
                continue  # lm_head runs on sampled rows only (t<=batch)
            # a8 (int8-MXU activations) is only engaged by the engine at
            # prefill token counts; tune both paths there — a8 is part
            # of the autotune key so the configs never cross-poison
            a8_opts = [False, True] if t >= 512 else [False]
            x = jnp.asarray(
                rng.standard_normal((t, kd)) * 0.3, jnp.bfloat16
            )
            launcher = (
                ql._qmm_stacked_launch if stacked else ql._qmm_launch
            )
            args = (x, qw, jnp.int32(1)) if stacked else (x, qw)
            for a8 in a8_opts:
                kw = dict(
                    t_p2=next_power_of_2(t), k_dim=kd, n=nd,
                    w_dtype="int8", x_dtype="bfloat16", a8=a8,
                )
                launcher._load_db()
                key = launcher._make_key(kw)
                tuned_already = key in launcher._mem
                fb_cfg = launcher.fallback_heuristic(key)
                t_fb = measure(
                    lambda: launcher.fn(*args, **kw, **fb_cfg),
                    "quant_matmul",
                )
                won = (
                    dict(launcher._mem[key]) if tuned_already
                    else launcher.tune(*args, **kw)
                )
                t_tuned = measure(
                    lambda: launcher.fn(*args, **kw, **won), "quant_matmul"
                )
                name = "qmm_stacked" if stacked else "qmm"
                name += "_a8" if a8 else ""
                rows.append(
                    (name, f"{kd}x{nd}", "int8", t,
                     fb_cfg, t_fb, won, t_tuned)
                )
                print(
                    f"{name} {kd}x{nd} t={t}: fallback {fb_cfg} "
                    f"{(t_fb or 0)*1e6:.1f}us -> tuned {won} "
                    f"{(t_tuned or 0)*1e6:.1f}us",
                    flush=True,
                )
        del qw

    tsv = os.path.join(
        os.environ["VTB_DEJAVU_STORAGE"], "tuned_vs_fallback.tsv"
    )
    os.makedirs(os.path.dirname(tsv), exist_ok=True)
    # append to the rows already on disk instead of discarding earlier
    # sweeps' evidence (a --quick run after --serving used to overwrite
    # the serving rows); delete the TSV for a fresh start
    mode = "a" if os.path.exists(tsv) else "w"
    with open(tsv, mode) as f:
        if mode == "w":
            f.write(
                "kernel\theads\tkv_dtype\tmax_seq\tfallback_cfg\t"
                "fallback_us\ttuned_cfg\ttuned_us\n"
            )
        for r in rows:
            f.write(
                f"{r[0]}\t{r[1]}\t{r[2]}\t{r[3]}\t{r[4]}\t"
                f"{(r[5] or 0)*1e6:.1f}\t{r[6]}\t{(r[7] or 0)*1e6:.1f}\n"
            )
    print("wrote", tsv)


if __name__ == "__main__":
    main(
        quick="--quick" in sys.argv,
        qmm_only="--qmm-only" in sys.argv,
        b32="--b32" in sys.argv,
        serving="--serving" in sys.argv,
    )
