"""Real-weights accuracy path is turnkey (VERDICT r4 #8).

The only accuracy bar not demonstrable in this environment is absolute
perplexity on a real checkpoint (zero egress, no weights on the image —
docs/accuracy_table.md).  This test removes the "untested code path"
risk: it writes a tiny SYNTHETIC HF checkpoint (safetensors + config via
transformers, exactly the on-disk layout real weights arrive in), then
runs BOTH tools end-to-end against it exactly as a user with real
weights would:

    python benchmarks/accuracy_table.py --model-dir PATH
    python benchmarks/eval_ppl.py --model-dir PATH

and checks the table math (baseline row is bf16 weights with zero
deltas; quantized rows carry finite NLL/KL; eval_ppl's ppl == exp of
its own mean NLL).  The day weights appear, the only new thing is the
data.
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("turnkey_hf")
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_accuracy_table_model_dir_end_to_end(hf_checkpoint, tmp_path):
    from benchmarks.accuracy_table import main

    out = tmp_path / "table.md"
    result = main([
        "--model-dir", hf_checkpoint,
        "--seq-len", "48", "--max-seqs", "2",
        "--out", str(out),
    ])
    rows = result["rows"]
    names = [r["name"] for r in rows]
    # the --model-dir path must produce the TRUE bf16-weights baseline
    assert names[0].startswith("bf16-W / bf16-KV"), names
    assert any(n.startswith("int8-W ") for n in names), names
    base = rows[0]
    assert base["d_nll"] == 0.0 and base["kl"] == 0.0
    for r in rows:
        assert np.isfinite(r["nll"]) and np.isfinite(r["kl"])
        assert r["ppl"] == pytest.approx(np.exp(r["nll"]), rel=1e-6)
    # quantized rows measure a shift vs the baseline, not garbage: the
    # recorded delta must reproduce nll - baseline nll
    for r in rows[1:]:
        assert r["d_nll"] == pytest.approx(
            r["nll"] - base["nll"], abs=1e-9
        )
    # the committed-artifact table was written with the model's rows
    text = out.read_text()
    assert "bf16-W / bf16-KV" in text
    assert os.path.basename(hf_checkpoint) in text


def test_eval_ppl_model_dir_end_to_end(hf_checkpoint, tmp_path):
    from benchmarks.eval_ppl import main

    # a user-supplied corpus file, as documented
    tokens = np.random.default_rng(1).integers(
        1, 256, size=96
    ).astype(np.int32)
    tf = tmp_path / "corpus.npy"
    np.save(tf, tokens)
    result = main([
        "--model-dir", hf_checkpoint,
        "--tokens-file", str(tf),
        "--seq-len", "48", "--max-seqs", "2",
    ])
    assert np.isfinite(result["ppl"]) and result["ppl"] > 1.0
    assert result["ppl"] == pytest.approx(
        np.exp(result["nll"]), rel=1e-6
    )
    json.dumps(result)  # JSON-serializable contract (tooling consumes it)
