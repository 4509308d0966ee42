"""Mamba HF checkpoint parity: our engine's logits vs transformers'."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from vllm_triton_backend_tpu.models import hybrid
from vllm_triton_backend_tpu.models.hf import config_from_hf, load_params
from vllm_triton_backend_tpu.models.llama import ForwardExtras
from vllm_triton_backend_tpu.ops.metadata import make_metadata


@pytest.fixture(scope="module")
def tiny_mamba_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_mamba_hf")
    cfg = transformers.MambaConfig(
        vocab_size=256,
        hidden_size=64,
        state_size=16,
        num_hidden_layers=2,
        conv_kernel=4,
        expand=2,
        time_step_rank=4,
    )
    torch.manual_seed(0)
    model = transformers.MambaForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_mamba_prefill_logits_match_transformers(tiny_mamba_dir):
    d, hf_model = tiny_mamba_dir
    cfg, params = load_params(d, config_from_hf(d, dtype="float32"))
    assert cfg.architecture == "mamba"

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=13)
    with torch.no_grad():
        ref = hf_model(torch.tensor(prompt[None])).logits[0].numpy()

    bs, nb = 16, 8
    kv_cache = hybrid.make_kv_caches(cfg, nb, bs)
    conv, ssm = hybrid.make_state_pools(cfg, 2)
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    meta = make_metadata([len(prompt)], [0], bt, bs)
    logits, *_ = hybrid.forward(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(len(prompt), dtype=jnp.int32),
        kv_cache, conv, ssm,
        jnp.asarray([1], jnp.int32), meta,
        ForwardExtras(max_query_len=16, max_seq_len=32),
    )
    np.testing.assert_allclose(
        np.asarray(logits)[: len(prompt)], ref, atol=3e-3, rtol=1e-3
    )
