"""OpenAI-compatible server integration test (aiohttp test client)."""

import asyncio
import json
import time

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from vllm_triton_backend_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.entrypoints.openai_server import (
    EngineWorker,
    build_app,
)
from vllm_triton_backend_tpu.runtime.engine import LLMEngine


@pytest.fixture()
def worker():
    cfg = EngineConfig(
        model=ModelConfig.tiny(),
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=64,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    w = EngineWorker(LLMEngine(cfg))
    w.start()
    yield w
    w.stop()


def test_completions_and_health(worker):
    async def run():
        app = build_app(worker)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            r = await client.get("/health")
            assert r.status == 200

            r = await client.get("/v1/models")
            data = await r.json()
            assert data["data"][0]["id"] == "vtb-model"

            r = await client.post(
                "/v1/completions",
                json={"prompt": [1, 2, 3, 4], "max_tokens": 5},
            )
            assert r.status == 200
            data = await r.json()
            assert data["object"] == "text_completion"
            assert data["usage"]["completion_tokens"] == 5
            assert data["choices"][0]["finish_reason"] == "length"

            # concurrent requests batch through the engine
            results = await asyncio.gather(
                *[
                    client.post(
                        "/v1/completions",
                        json={"prompt": [i + 1, i + 2], "max_tokens": 4},
                    )
                    for i in range(3)
                ]
            )
            for r in results:
                d = await r.json()
                assert d["usage"]["completion_tokens"] == 4

            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "3 5 7"}],
                    "max_tokens": 3,
                },
            )
            d = await r.json()
            assert d["object"] == "chat.completion"
            assert d["choices"][0]["message"]["role"] == "assistant"

            r = await client.get("/metrics")
            text = await r.text()
            assert "vtb_requests_total" in text
        finally:
            await client.close()

    asyncio.run(run())


def test_streaming(worker):
    async def run():
        app = build_app(worker)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            r = await client.post(
                "/v1/completions",
                json={
                    "prompt": [5, 6, 7],
                    "max_tokens": 4,
                    "stream": True,
                },
            )
            assert r.status == 200
            body = await r.text()
            events = [
                line[len("data: "):]
                for line in body.splitlines()
                if line.startswith("data: ")
            ]
            assert events[-1] == "[DONE]"
            payloads = [json.loads(e) for e in events[:-1]]
            finishes = [
                p["choices"][0]["finish_reason"] for p in payloads
            ]
            assert finishes[-1] == "length"
            # at least one delta with text before the finish chunk
            assert any(
                p["choices"][0]["text"] for p in payloads[:-1]
            )
        finally:
            await client.close()

    asyncio.run(run())


def test_n_completions_and_logprobs(worker):
    async def run():
        app = build_app(worker)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            r = await client.post(
                "/v1/completions",
                json={
                    "prompt": [1, 2, 3], "max_tokens": 4, "n": 3,
                    "temperature": 1.0, "seed": 7, "logprobs": True,
                },
            )
            assert r.status == 200
            data = await r.json()
            assert len(data["choices"]) == 3
            assert [c["index"] for c in data["choices"]] == [0, 1, 2]
            for c in data["choices"]:
                lps = c["logprobs"]["token_logprobs"]
                assert len(lps) == 4 and all(v <= 0 for v in lps)
            assert data["usage"]["completion_tokens"] == 12
        finally:
            await client.close()

    asyncio.run(run())


def test_chat_streaming(worker):
    async def run():
        app = build_app(worker)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "1 2 3"}],
                    "max_tokens": 4,
                    "stream": True,
                },
            )
            assert r.status == 200
            raw = (await r.read()).decode()
            events = [
                json.loads(line[len("data: "):])
                for line in raw.splitlines()
                if line.startswith("data: ") and "[DONE]" not in line
            ]
            assert events, raw
            assert events[0]["object"] == "chat.completion.chunk"
            content = "".join(
                e["choices"][0]["delta"].get("content", "")
                for e in events
            )
            assert content.strip()
            assert events[-1]["choices"][0]["finish_reason"] == "length"
            assert raw.rstrip().endswith("data: [DONE]")
        finally:
            await client.close()

    asyncio.run(run())


def test_chat_template_rendering():
    """/v1/chat/completions uses the tokenizer's own chat template when
    present (transformers apply_chat_template), else the plain
    transcript fallback."""
    import transformers
    from tokenizers import Tokenizer as RawTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    from vllm_triton_backend_tpu.entrypoints.openai_server import (
        _render_chat,
    )

    vocab = {w: i for i, w in enumerate(
        ["[UNK]", "user", "assistant", "hi", "there", "yo"]
    )}
    raw = RawTok(WordLevel(vocab, unk_token="[UNK]"))
    raw.pre_tokenizer = Whitespace()
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=raw,
        unk_token="[UNK]",
        chat_template=(
            "{% for m in messages %}{{ m['role'] }} {{ m['content'] }}"
            " {% endfor %}{% if add_generation_prompt %}assistant"
            "{% endif %}"
        ),
    )
    msgs = [{"role": "user", "content": "hi there"}]
    ids = _render_chat(tok, msgs)
    # "user hi there assistant"
    assert ids == [vocab["user"], vocab["hi"], vocab["there"],
                   vocab["assistant"]]
    # without a template: transcript fallback through the tokenizer
    tok_plain = transformers.PreTrainedTokenizerFast(
        tokenizer_object=raw, unk_token="[UNK]"
    )
    tok_plain.chat_template = None
    ids2 = _render_chat(tok_plain, msgs)
    assert vocab["hi"] in ids2 and vocab["there"] in ids2


def test_sse_keepalive_on_stall(worker, monkeypatch):
    """The serving-layer stall hedge: a step stalled past the keep-alive
    interval emits SSE comment frames (``: keep-alive``) so streaming
    clients are not left on a silent dead connection, and the stall is
    counted in /metrics (docs/serving_percentiles.md TTFT-p99 hedge)."""
    import vllm_triton_backend_tpu.entrypoints.openai_server as srv

    monkeypatch.setattr(srv, "_KEEPALIVE_S", 0.05)
    monkeypatch.setattr(srv, "_STALL_MS", 100.0)
    orig_step = worker.engine.step
    stalled = {"done": False}

    def slow_step():
        if not stalled["done"]:
            stalled["done"] = True
            time.sleep(0.4)  # simulated device/tunnel stall
        return orig_step()

    monkeypatch.setattr(worker.engine, "step", slow_step)

    async def run():
        app = build_app(worker)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            r = await client.post(
                "/v1/completions",
                json={
                    "prompt": [5, 6, 7],
                    "max_tokens": 4,
                    "stream": True,
                },
            )
            assert r.status == 200
            body = await r.text()
            assert ": keep-alive" in body
            assert "data: [DONE]" in body.splitlines()
            m = await client.get("/metrics")
            text = await m.text()
            assert "vtb_sse_keepalives_total" in text
            assert "vtb_device_stalls_total" in text
        finally:
            await client.close()

    asyncio.run(run())
