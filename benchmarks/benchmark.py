"""Microbenchmark driver: correctness-gated kernel timing sweeps.

The reference's dev loop (reference scripts/benchmark.py, 1864 LoC) rebuilt
for TPU.  Protocol parity:

* sweep axes: batch x (q_heads, kv_heads) x seqlen x head_size x
  block_size x prompt_pattern x impl x mode (benchmark.py:94-115), plus a
  mixed-batch ``composition`` axis ordering decode / partial-prefill /
  full-prefill rows (reference BatchComposition DEC_PRE / PRE_DEC /
  ALTERNATING, benchmark.py:80-84 with batch synthesis 1053-1112);
* numerical gate *before* timing — incorrect kernels never produce perf
  rows (benchmark.py:476-489);
* warmup 25 / rep 100, quantiles [0.5, 0.2, 0.8] (benchmark.py:144,518);
* roofline utilization columns from the chip peaks table (§5.1 TPU analog);
* TSV records under ``STORE_TEST_RESULT_PATH/<chip>/<timestamp>/`` with
  dejavu env provenance embedded (benchmark.py:566-627);
* ``.conf`` setup files layered under env overrides (benchmark.py:179-244).

CLI:  python benchmarks/benchmark.py [setups/foo.conf] [--quick]
"""

from __future__ import annotations

import csv
import dataclasses
import itertools
import json
import os
import sys
import time
from dataclasses import dataclass, field

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from vllm_triton_backend_tpu.config import parse_conf_file  # noqa: E402

# Ragged-batch realism: fractional lengths cycled over the batch
# (reference benchmark.py:113-115 PROMPT_PATTERNS).
PROMPT_PATTERNS = {
    "uniform": [1.0],
    "ragged": [0.1, 0.4, 0.5, 1.0, 0.2],
    "mixed": [1.0, 0.2, 0.8],
}


@dataclass
class BenchSetup:
    impls: list[str] = field(
        default_factory=lambda: ["pallas_unified", "xla_baseline"]
    )
    modes: list[str] = field(default_factory=lambda: ["decode", "prefill"])
    batch_sizes: list[int] = field(default_factory=lambda: [1, 8, 32])
    seq_lens: list[int] = field(default_factory=lambda: [128, 1024])
    heads: list[list[int]] = field(
        default_factory=lambda: [[32, 8], [32, 4]]
    )
    head_sizes: list[int] = field(default_factory=lambda: [128])
    block_sizes: list[int] = field(default_factory=lambda: [16])
    prompt_patterns: list[str] = field(default_factory=lambda: ["uniform"])
    # mixed-batch row ordering (mode == "mixed" only): decode rows first,
    # prefill rows first, or interleaved.
    batch_compositions: list[str] = field(
        default_factory=lambda: ["alternating"]
    )
    # mixed-batch shares of (decode, partial-prefill, full-prefill) rows.
    mixed_shares: list[float] = field(
        default_factory=lambda: [0.5, 0.25, 0.25]
    )
    kv_dtypes: list[str] = field(default_factory=lambda: ["bfloat16"])
    warmup: int = 25
    rep: int = 100
    quantiles: list[float] = field(default_factory=lambda: [0.5, 0.2, 0.8])
    atol: float = 2e-2
    allow_incorrect: bool = False
    result_path: str = ""
    # capture a jax profiler trace per timed impl and derive
    # util_*_measured from ACTUAL device kernel durations (xplane parse —
    # the reference's proton-profile columns, benchmark.py:549-564);
    # silently skipped when tracing/parsing is unavailable (CPU runs)
    capture_profile: bool = True
    profile_reps: int = 10
    # Stream a 256 MB dummy buffer through the chip between timed reps —
    # the reference's L2-flush discipline (torch_utils.py:35-73).  On TPU
    # this is protocol parity, not a correctness need: Pallas kernels
    # stream operands from HBM every launch (VMEM is software-managed and
    # re-filled per launch; there is no persistent data cache a hot rep
    # could hit), so timings are "cold" by construction.  The knob exists
    # to prove that claim on demand: enable it and the quantiles should
    # not move.
    flush_between_reps: bool = False

    @classmethod
    def load(cls, conf_path: str | None) -> "BenchSetup":
        values = {}
        names = {f.name for f in dataclasses.fields(cls)}
        if conf_path:
            for k, v in parse_conf_file(conf_path).items():
                if k.lower() in names:
                    values[k.lower()] = v
        for f in dataclasses.fields(cls):
            env = os.environ.get("VTB_BENCH_" + f.name.upper())
            if env is not None:
                try:
                    values[f.name] = json.loads(env)
                except json.JSONDecodeError:
                    values[f.name] = env
        if "result_path" not in values:
            values["result_path"] = os.environ.get(
                "STORE_TEST_RESULT_PATH", ""
            )
        return cls(**values)


def _compose_mixed(batch, seq_len, fracs, shares, composition):
    """(query_len, context_len) rows for a mixed batch, ordered.

    Reference semantics: the batch is a blend of decode rows, partial
    prefills (half the tokens already cached) and full prefills, laid out
    decodes-first (dec_pre), prefills-first (pre_dec), or interleaved
    (alternating) — reference benchmark.py:80-84,1053-1112.
    """
    n_dec = max(1, round(batch * shares[0]))
    n_part = max(1, round(batch * shares[1]))
    n_full = max(1, batch - n_dec - n_part)
    n_dec = batch - n_part - n_full
    rows = {"dec": [], "part": [], "full": []}
    for i in range(n_dec):
        s = max(2, int(seq_len * fracs[i % len(fracs)]))
        rows["dec"].append((1, s - 1))
    for i in range(n_part):
        s = max(4, int(seq_len * fracs[i % len(fracs)]))
        rows["part"].append((s // 2, s - s // 2))
    for i in range(n_full):
        s = max(2, int(seq_len * fracs[i % len(fracs)]))
        rows["full"].append((s, 0))
    if composition == "dec_pre":
        ordered = rows["dec"] + rows["part"] + rows["full"]
    elif composition == "pre_dec":
        ordered = rows["part"] + rows["full"] + rows["dec"]
    elif composition == "alternating":
        ordered = []
        pools = [rows["dec"], rows["part"], rows["full"]]
        while any(pools):
            for p in pools:
                if p:
                    ordered.append(p.pop(0))
    else:
        raise ValueError(f"unknown composition {composition!r}")
    return ordered


def _build_case(rng, mode, batch, seq_len, nq, nkv, hd, bs, pattern, kv_dtype,
                composition="alternating", shares=(0.5, 0.25, 0.25)):
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.utils import random_batch, random_cache  # noqa: E402

    fracs = PROMPT_PATTERNS[pattern]
    if mode == "decode":
        query_lens = [1] * batch
        context_lens = [
            max(1, int(seq_len * fracs[i % len(fracs)]) - 1)
            for i in range(batch)
        ]
    elif mode == "prefill":
        query_lens = [
            max(2, int(seq_len * fracs[i % len(fracs)]))
            for i in range(batch)
        ]
        context_lens = [0] * batch
    elif mode == "mixed":  # decode + partial + full prefill in one batch
        ordered = _compose_mixed(batch, seq_len, fracs, shares, composition)
        query_lens = [ql for ql, _ in ordered]
        context_lens = [cl for _, cl in ordered]
    else:  # prefix: half context cached, half new
        query_lens = []
        context_lens = []
        for i in range(batch):
            s = max(4, int(seq_len * fracs[i % len(fracs)]))
            query_lens.append(s // 2)
            context_lens.append(s - s // 2)
    total_pages = sum(
        -(-(c + q) // bs) for c, q in zip(context_lens, query_lens)
    )
    num_blocks = max(64, 2 * total_pages)
    kv_cache = random_cache(rng, nkv, num_blocks, bs, hd)
    q, block_table, meta = random_batch(
        rng, query_lens, context_lens, nq, hd, bs, num_blocks
    )
    dtype = jnp.bfloat16 if kv_dtype == "bfloat16" else jnp.float32
    return (
        jnp.asarray(q, dtype),
        jnp.asarray(kv_cache, dtype),
        meta,
        block_table,
        (np.asarray(q), np.asarray(kv_cache)),
        query_lens,
        context_lens,
    )


def run(setup: BenchSetup, out_stream=sys.stdout) -> list[dict]:
    import jax

    from benchmarks.callers import Implementation, make_call_func
    from benchmarks.roofline import attention_cost, chip_peaks, utilization
    from vllm_triton_backend_tpu.autotune import global_cache_lock
    from vllm_triton_backend_tpu.ops.refs import ref_paged_attention

    peaks = chip_peaks()
    rows: list[dict] = []
    rng = np.random.default_rng(0)
    # freeze tuning during timed runs (reference benchmark.py:427-429)
    global_cache_lock.lock()
    try:
        cases = list(
            itertools.product(
                setup.modes, setup.batch_sizes, setup.seq_lens,
                setup.heads, setup.head_sizes, setup.block_sizes,
                setup.prompt_patterns, setup.batch_compositions,
                setup.kv_dtypes,
            )
        )
        for mode, batch, seq_len, (nq, nkv), hd, bs, pattern, comp, kvd in (
            cases
        ):
            # composition only reshapes mixed batches — don't duplicate
            # the other modes across the axis
            if mode != "mixed" and comp != setup.batch_compositions[0]:
                continue
            (
                q, kv_cache, meta, bt, host, qlens, clens
            ) = _build_case(
                rng, mode, batch, seq_len, nq, nkv, hd, bs, pattern, kvd,
                composition=comp, shares=tuple(setup.mixed_shares),
            )
            scale = hd**-0.5
            max_q = int(max(qlens))
            max_s = int(max(c + ql for c, ql in zip(clens, qlens)))
            ref = ref_paged_attention(
                host[0].astype(np.float32),
                host[1][0].astype(np.float32),
                np.asarray(meta.query_start_loc),
                np.asarray(meta.seq_lens),
                bt,
                scale,
            )
            for impl_name in setup.impls:
                impl = Implementation(impl_name)
                if impl == Implementation.PALLAS_DECODE and max_q != 1:
                    continue
                try:
                    call = make_call_func(
                        impl, q, kv_cache, meta, scale=scale,
                        max_query_len=max_q, max_seq_len=max_s,
                    )
                    out = call()
                    out.block_until_ready()
                except Exception as e:
                    print(
                        f"SKIP {impl_name} {mode} b{batch} s{seq_len}: "
                        f"{type(e).__name__}: {e}",
                        file=out_stream,
                    )
                    continue
                err = float(
                    np.max(np.abs(np.asarray(out, np.float32) - ref))
                )
                correct = err < setup.atol
                if not correct and not setup.allow_incorrect:
                    print(
                        f"INCORRECT {impl_name} {mode} b{batch} "
                        f"s{seq_len} err={err:.2e} — not timed",
                        file=out_stream,
                    )
                    continue
                for _ in range(setup.warmup):
                    call()
                jax.block_until_ready(call())
                flush = None
                if setup.flush_between_reps:
                    import jax.numpy as jnp

                    flush_buf = jnp.zeros(
                        (256, 1024, 1024 // 4), jnp.float32
                    )  # 256 MB
                    flush = jax.jit(
                        lambda b: jnp.sum(b, dtype=jnp.float32)
                    )
                    flush(flush_buf).block_until_ready()
                times = []
                for _ in range(setup.rep):
                    if flush is not None:
                        flush(flush_buf).block_until_ready()
                    t0 = time.perf_counter()
                    call().block_until_ready()
                    times.append(time.perf_counter() - t0)
                qs = np.quantile(times, setup.quantiles)
                total_q = sum(qlens)
                kv_total = sum(c + ql for c, ql in zip(clens, qlens))
                flops, bts = attention_cost(
                    total_q, kv_total // max(batch, 1), nq, nkv, hd,
                    kv_bytes=2 if kvd == "bfloat16" else 4,
                )
                flops *= batch / max(batch, 1)
                util = utilization(flops, bts * batch, qs[0], peaks)
                measured = None
                if setup.capture_profile and jax.default_backend() != "cpu":
                    import shutil
                    import tempfile

                    from benchmarks.xplane import measured_utilization

                    pattern = (
                        "paged_decode|prefill_attention|paged_attention"
                    )
                    d = tempfile.mkdtemp(prefix="vtb_bench_xplane_")
                    try:
                        with jax.profiler.trace(d):
                            r = None
                            for _ in range(setup.profile_reps):
                                r = call()
                            jax.block_until_ready(r)
                        measured = measured_utilization(
                            d, pattern, flops, bts * batch, peaks,
                            calls=setup.profile_reps,
                        )
                    except Exception:
                        measured = None
                    finally:
                        shutil.rmtree(d, ignore_errors=True)
                row = {
                    "impl": impl_name,
                    "mode": mode,
                    "batch": batch,
                    "seq_len": seq_len,
                    "num_q_heads": nq,
                    "num_kv_heads": nkv,
                    "head_size": hd,
                    "block_size": bs,
                    "pattern": pattern,
                    "composition": comp if mode == "mixed" else "",
                    # timing discipline provenance (reference modes
                    # CUDA_EVENTS/CUDA_GRAPHS/END2END, benchmark.py:
                    # 1708-1750): fenced = per-call wall clock;
                    # end2end-flush additionally streams 256 MB between
                    # reps (torch_utils.py:35-73 L2-flush analog)
                    "timing": (
                        "end2end-flush" if setup.flush_between_reps
                        else "fenced"
                    ),
                    "kv_dtype": kvd,
                    "ms": qs[0] * 1e3,
                    "min_ms": qs[1] * 1e3,
                    "max_ms": qs[2] * 1e3,
                    "max_err": err,
                    "correct": correct,
                    "util_flops": round(util["util_flops"], 4),
                    "util_bytes": round(util["util_bytes"], 4),
                    # measured (trace-derived) columns; analytic kept as
                    # the fallback above
                    "kernel_ms_measured": round(
                        measured["kernel_ms_measured"], 4
                    ) if measured else "",
                    "util_flops_measured": round(
                        measured["util_flops_measured"], 4
                    ) if measured else "",
                    "util_bytes_measured": round(
                        measured["util_bytes_measured"], 4
                    ) if measured else "",
                    "chip": peaks.name,
                    # provenance (reference benchmark.py:594-606)
                    "dejavu_storage": os.environ.get(
                        "VTB_DEJAVU_STORAGE", ""
                    ),
                    "dejavu_fallback": os.environ.get(
                        "VTB_DEJAVU_FORCE_FALLBACK", ""
                    ),
                }
                rows.append(row)
                print(
                    f"{impl_name:16s} {mode:8s} b{batch:<3d} s{seq_len:<5d}"
                    f" {nq}/{nkv}h hd{hd} -> {row['ms']:.3f} ms"
                    f" (bw {row['util_bytes']*100:.0f}%)",
                    file=out_stream,
                )
    finally:
        global_cache_lock.unlock()

    if rows and setup.result_path:
        ts = time.strftime("%Y%m%d-%H%M%S")
        out_dir = os.path.join(setup.result_path, peaks.name, ts)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "results.tsv")
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=rows[0].keys(), delimiter="\t")
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} rows -> {path}", file=out_stream)
    return rows


def main(argv: list[str]) -> None:
    conf = None
    quick = False
    for a in argv:
        if a == "--quick":
            quick = True
        elif a.endswith(".conf"):
            conf = a
    setup = BenchSetup.load(conf)
    if quick:
        setup.batch_sizes = [4]
        setup.seq_lens = [256]
        setup.heads = [[8, 2]]
        setup.warmup, setup.rep = 3, 10
    run(setup)


if __name__ == "__main__":
    main(sys.argv[1:])
