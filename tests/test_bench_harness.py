"""The benchmark harness itself: correctness gating, records, conf files."""

import io
import os

import numpy as np
import pytest

from benchmarks.benchmark import BenchSetup, run
from benchmarks.roofline import attention_cost, chip_peaks, utilization


def _micro_setup(**kw):
    base = dict(
        impls=["pallas_unified", "xla_baseline"],
        modes=["decode", "prefix"],
        batch_sizes=[2],
        seq_lens=[64],
        heads=[[4, 2]],
        head_sizes=[64],
        block_sizes=[16],
        prompt_patterns=["ragged"],
        kv_dtypes=["float32"],
        warmup=1,
        rep=3,
    )
    base.update(kw)
    return BenchSetup(**base)


def test_run_produces_correct_gated_rows(tmp_path):
    setup = _micro_setup(result_path=str(tmp_path))
    out = io.StringIO()
    rows = run(setup, out_stream=out)
    # 2 modes x 2 impls
    assert len(rows) == 4
    for r in rows:
        assert r["correct"], r
        assert r["ms"] > 0
        assert 0 <= r["util_bytes"] <= 10
    # TSV written with provenance columns
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tmp_path)
        for f in fs
    ]
    assert any(f.endswith("results.tsv") for f in files)


def test_splash_baseline_slot(tmp_path):
    """jaxlib splash attention runs as a cross-check IUT on full-prefill
    batches (reference flash_attn/flashinfer baseline-caller slots,
    scripts/callers/) and is SKIPped — not mis-timed — on batches with
    prior context, which a dense kernel cannot express."""
    out = io.StringIO()
    setup = _micro_setup(
        impls=["pallas_prefill", "splash_prefill"],
        modes=["prefill", "prefix"],
        result_path=str(tmp_path),
    )
    rows = run(setup, out_stream=out)
    by = {(r["impl"], r["mode"]) for r in rows}
    assert ("splash_prefill", "prefill") in by
    assert ("pallas_prefill", "prefill") in by
    # prefix mode: splash must refuse (context needs paging)
    assert ("splash_prefill", "prefix") not in by
    assert "SKIP splash_prefill prefix" in out.getvalue()
    assert all(r["correct"] for r in rows)


def test_conf_layering(tmp_path, monkeypatch):
    conf = tmp_path / "x.conf"
    conf.write_text('MODES=["decode"]\nWARMUP=0\nREP=2\n')
    monkeypatch.setenv("VTB_BENCH_BATCH_SIZES", "[1]")
    setup = BenchSetup.load(str(conf))
    assert setup.modes == ["decode"]
    assert setup.warmup == 0
    assert setup.batch_sizes == [1]  # env overrides


def test_roofline_math():
    peaks = chip_peaks()
    flops, bts = attention_cost(1, 1024, 32, 4, 128)
    u = utilization(flops, bts, 1e-3, peaks)
    assert u["attained_tflops"] == pytest.approx(flops / 1e-3 / 1e12)
    assert 0 < u["util_bytes"] < 1e3
    assert np.isfinite(u["util_flops"])


def test_mixed_batch_compositions():
    """Mixed decode/partial/full batches run under every row ordering."""
    from benchmarks.benchmark import _compose_mixed

    # synthesis invariants across orderings
    for comp in ["dec_pre", "pre_dec", "alternating"]:
        rows = _compose_mixed(8, 64, [1.0], (0.5, 0.25, 0.25), comp)
        assert len(rows) == 8
        kinds = sorted(
            ("dec" if ql == 1 else "full" if cl == 0 else "part")
            for ql, cl in rows
        )
        assert set(kinds) == {"dec", "part", "full"}
    assert _compose_mixed(6, 64, [1.0], (0.5, 0.25, 0.25), "dec_pre")[0][0] == 1
    assert _compose_mixed(6, 64, [1.0], (0.5, 0.25, 0.25), "pre_dec")[-1][0] == 1

    # end-to-end: correctness-gated rows for each composition
    out = io.StringIO()
    setup = _micro_setup(
        modes=["mixed"],
        batch_sizes=[4],
        batch_compositions=["dec_pre", "pre_dec", "alternating"],
        impls=["pallas_unified"],
    )
    rows = run(setup, out_stream=out)
    assert {r["composition"] for r in rows} == {
        "dec_pre", "pre_dec", "alternating"
    }
    assert all(r["correct"] for r in rows)
