"""Weight-only quantized linear correctness + quantized model accuracy."""

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
    quantize_params,
)
from vllm_triton_backend_tpu.ops.metadata import make_metadata
from vllm_triton_backend_tpu.ops.pallas.quant_linear import (
    quant_matmul,
    quantize_weights,
)


@pytest.mark.parametrize("qdtype", ["int8", "fp8"])
@pytest.mark.parametrize(
    "t,k,n", [(8, 256, 512), (3, 300, 130), (64, 512, 512)]
)
def test_quant_matmul_matches_dense(qdtype, t, k, n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((t, k)).astype(np.float32) * 0.5
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    qw = quantize_weights(jnp.asarray(w), qdtype)
    out = np.asarray(quant_matmul(jnp.asarray(x), qw))
    # oracle: dequantize then dense matmul in f64
    wq = np.asarray(qw.w_q, np.float32) * np.asarray(qw.scales)[None, :]
    expect = x.astype(np.float64) @ wq.astype(np.float64)
    np.testing.assert_allclose(out, expect, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("qdtype", ["int8", "fp8"])
def test_quant_error_bounded(qdtype):
    """Quantized matmul must stay close to the *original* dense weights
    (weight-only quantization noise, not kernel bugs)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 512)).astype(np.float32) * 0.3
    w = rng.standard_normal((512, 256)).astype(np.float32) * 0.05
    qw = quantize_weights(jnp.asarray(w), qdtype)
    out = np.asarray(quant_matmul(jnp.asarray(x), qw))
    dense = x @ w
    rel = np.abs(out - dense).max() / (np.abs(dense).max() + 1e-9)
    assert rel < (0.02 if qdtype == "int8" else 0.05)


@pytest.mark.parametrize("fused", [False, True])
def test_quantized_model_close_to_dense(fused):
    cfg = ModelConfig.tiny(dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    # fused=True packs q/k/v and gate/up into the launch-saving layouts
    qparams = quantize_params(params, "int8", cfg=cfg if fused else None)

    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, 12)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([12], [0], bt, 16)
    extras = ForwardExtras(max_query_len=16, max_seq_len=32)

    def run(p):
        kv = make_kv_caches(cfg, 16, 16)
        logits, _ = forward(
            p, cfg, jnp.asarray(prompt, jnp.int32),
            jnp.arange(12, dtype=jnp.int32), kv, meta, extras,
        )
        return np.asarray(logits)

    dense = run(params)
    quant = run(qparams)
    # top-1 agreement on nearly all positions + small relative error
    agree = (dense.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.9, f"top-1 agreement {agree}"
    rel = np.abs(dense - quant).max() / np.abs(dense).max()
    assert rel < 0.1, f"relative logits error {rel}"


def test_snap_and_fit_blocks():
    from vllm_triton_backend_tpu.ops.pallas.quant_linear import (
        _fit_blocks,
        _snap_block,
    )

    # divisor snapping: granite shapes
    assert _snap_block(12800, 2048, 128) == 1280
    assert _snap_block(12800, 4096, 256) == 2560
    assert _snap_block(4096, 2048, 256) == 2048
    assert _snap_block(50176, 2048, 128) == 1792  # padded lm_head 49*1024
    # unaligned dims fall back to min(want, dim) (runtime-pad path)
    assert _snap_block(130, 512, 128) == 130
    assert _snap_block(300, 256, 256) == 256
    # VMEM fit shrinks a tile pair that cannot fit (huge T)
    bn, bk = _fit_blocks(8192, 12800, 12800, 2048, 4096, 1, 4)
    assert bn * bk < 2048 * 4096
    assert 12800 % bn == 0 and 12800 % bk == 0


@pytest.mark.parametrize("t,k,n", [(5, 300, 130), (16, 512, 640)])
def test_autotuned_linear_matches_dense(t, k, n, monkeypatch):
    """The model-path entry (autotuned launcher) on unaligned shapes."""
    monkeypatch.setenv("VTB_DEJAVU_FORCE_FALLBACK", "1")
    from vllm_triton_backend_tpu.ops.pallas.quant_linear import linear

    rng = np.random.default_rng(2)
    x = rng.standard_normal((t, k)).astype(np.float32) * 0.5
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    qw = quantize_weights(jnp.asarray(w), "int8")
    out = np.asarray(linear(jnp.asarray(x), qw))
    wq = np.asarray(qw.w_q, np.float32) * np.asarray(qw.scales)[None, :]
    expect = x.astype(np.float64) @ wq.astype(np.float64)
    np.testing.assert_allclose(out, expect, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("t,k,n", [(256, 512, 640), (512, 512, 512)])
def test_a8_matmul_close_to_dequant_path(t, k, n):
    """INT8-MXU activation-quantized path vs the bf16 dequant path.

    Tolerance sized to per-tile int8 activation error: each activation
    row is quantized to int8 against its per-K-tile absmax, so the
    relative error per dot product is bounded by ~(1/127) * sqrt(k/bk)
    noise accumulation — a few percent of the output scale."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((t, k)) * 0.5, jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    qw = quantize_weights(jnp.asarray(w), "int8")
    base = np.asarray(
        quant_matmul(x, qw, block_n=256, block_k=256, a8=False), np.float32
    )
    a8 = np.asarray(
        quant_matmul(x, qw, block_n=256, block_k=256, a8=True), np.float32
    )
    rel = np.abs(a8 - base).max() / (np.abs(base).max() + 1e-9)
    assert rel < 0.03, f"a8 relative error {rel}"


def test_a8_linear_entry_and_decode_guard():
    """``linear(..., a8=True)`` engages only for int8 weights x bf16
    activations; f32 activations silently keep exact bf16/f32 math."""
    from vllm_triton_backend_tpu.ops.pallas.quant_linear import linear

    rng = np.random.default_rng(5)
    w = rng.standard_normal((256, 256)).astype(np.float32) * 0.1
    qw = quantize_weights(jnp.asarray(w), "int8")
    x32 = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    exact = np.asarray(linear(x32, qw, a8=False))
    guarded = np.asarray(linear(x32, qw, a8=True))
    np.testing.assert_array_equal(exact, guarded)  # a8 ignored on f32

    xb = x32.astype(jnp.bfloat16)
    base = np.asarray(linear(xb, qw, a8=False), np.float32)
    a8 = np.asarray(linear(xb, qw, a8=True), np.float32)
    rel = np.abs(a8 - base).max() / (np.abs(base).max() + 1e-9)
    assert rel < 0.03


def test_w8a8_model_forward_close_to_weight_only():
    """End-to-end: ForwardExtras.w8a8 on a quantized model stays close to
    the weight-only forward (engine plumbing for quantization="int8-w8a8")."""
    cfg = ModelConfig.tiny(dtype="bfloat16")
    params = init_params(cfg, jax.random.key(0))
    qparams = quantize_params(params, "int8", cfg=cfg)

    prompt = np.random.default_rng(6).integers(0, cfg.vocab_size, 16)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([16], [0], bt, 16)

    def run(w8a8):
        kv = make_kv_caches(cfg, 16, 16)
        logits, _ = forward(
            qparams, cfg, jnp.asarray(prompt, jnp.int32),
            jnp.arange(16, dtype=jnp.int32), kv, meta,
            ForwardExtras(max_query_len=16, max_seq_len=32, w8a8=w8a8),
        )
        return np.asarray(logits, np.float32)

    base = run(False)
    a8 = run(True)
    agree = (base.argmax(-1) == a8.argmax(-1)).mean()
    assert agree >= 0.85, f"top-1 agreement {agree}"


def test_quantize_pad_to_zero_columns():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 130)).astype(np.float32)
    qw = quantize_weights(jnp.asarray(w), "int8", pad_to=128)
    assert qw.w_q.shape == (64, 256)
    assert qw.scales.shape == (256,)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    out = np.asarray(quant_matmul(x, qw))
    # pad columns produce exact zeros
    np.testing.assert_array_equal(out[:, 130:], 0.0)
