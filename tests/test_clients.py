"""LLM client layer against a local OpenAI-compatible stub server: transport
URL/header construction (plain, Azure), SRT attach-mode chat, retry loop on
server errors, dynamic response models (reference clients/*, SURVEY §4: LLM
clients tested against stubs)."""

import asyncio
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

httpx = pytest.importorskip("httpx")

from multimodal_sae_tpu.clients import SRT, OpenAIClient
from multimodal_sae_tpu.clients.client import (
    ChatTransport,
    create_response_model,
    retry_chat,
)


class _Handler(BaseHTTPRequestHandler):
    server_version = "stub"

    def log_message(self, *a):
        pass

    def do_POST(self):
        srv = self.server
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        srv.requests.append(
            {"path": self.path, "headers": dict(self.headers), "body": body}
        )
        if srv.fail_first and len(srv.requests) == 1:
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"boom")
            return
        reply = {
            "choices": [{"message": {"role": "assistant", "content": "stub reply"}}]
        }
        payload = json.dumps(reply).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.requests = []
    srv.fail_first = False
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(srv):
    return f"http://127.0.0.1:{srv.server_address[1]}"


def test_srt_attach_mode_generate(server):
    client = SRT(model="test-model", base_url=_url(server), launch_server=False)
    assert client.process is None  # attach mode: no server spawned
    out = asyncio.run(client.generate("hello", temperature=0.5))
    assert out == "stub reply"
    req = server.requests[0]
    assert req["path"] == "/v1/chat/completions"
    assert req["body"]["model"] == "test-model"
    assert req["body"]["temperature"] == 0.5
    assert req["body"]["messages"][0]["content"][0]["text"] == "hello"
    client.clean()


def test_openai_client_plain(server):
    client = OpenAIClient("gpt-x", api_key="sk-test", base_url=_url(server))
    out = asyncio.run(client.generate("hi"))
    assert out == "stub reply"
    req = server.requests[0]
    assert req["path"] == "/chat/completions"
    assert req["headers"]["Authorization"] == "Bearer sk-test"


def test_openai_client_azure_routing(server):
    client = OpenAIClient(
        "my-deploy", api_key="az-key", azure_endpoint=_url(server)
    )
    out = asyncio.run(client.generate([{"role": "user", "content": "hi"}]))
    assert out == "stub reply"
    req = server.requests[0]
    # Azure routes by deployment and carries api-version + api-key header.
    assert req["path"] == "/openai/deployments/my-deploy/chat/completions?api-version=2024-02-01"
    assert req["headers"]["api-key"] == "az-key"


def test_retry_chat_retries_on_server_error(server):
    server.fail_first = True
    transport = ChatTransport(_url(server))
    out = asyncio.run(
        retry_chat(transport, "m", [{"role": "user", "content": "x"}], max_retries=3)
    )
    assert out == "stub reply"
    assert len(server.requests) == 2  # one failure, one success
    asyncio.run(transport.aclose())


def test_retry_chat_raises_after_exhaustion(server):
    transport = ChatTransport(_url(server) + "/missing-prefix-zzz")

    class _Always500(ChatTransport):
        async def chat(self, *a, **k):
            raise RuntimeError("down")

    with pytest.raises(RuntimeError):
        asyncio.run(
            retry_chat(
                _Always500(_url(server)),
                "m",
                [{"role": "user", "content": "x"}],
                max_retries=2,
            )
        )


def test_create_response_model():
    pytest.importorskip("pydantic")
    model = create_response_model(3)
    inst = model(example_0=1, example_1=2, example_2=3)
    assert inst.example_2 == 3
    with pytest.raises(Exception):
        model(example_0="not-an-int-at-all", example_1=2, example_2=3)


def test_srt_timeout_not_in_request_body(server):
    """`timeout` is an HTTP option; strict servers 400 on unknown body fields."""
    client = SRT(model="test-model", base_url=_url(server), launch_server=False)
    asyncio.run(client.generate("hello"))
    assert "timeout" not in server.requests[0]["body"]
    client.clean()


def test_openrouter_shared_transport(server):
    from multimodal_sae_tpu.clients import OpenRouter

    client = OpenRouter(
        "some/model",
        api_key="or-key",
        base_url=_url(server) + "/api/v1/chat/completions",
    )
    out = asyncio.run(client.generate("hi"))
    assert out == "stub reply"
    req = server.requests[0]
    assert req["path"] == "/api/v1/chat/completions"
    assert req["headers"]["Authorization"] == "Bearer or-key"
    assert req["body"]["messages"][0]["content"] == "hi"


def test_retry_chat_aborts_on_4xx(monkeypatch):
    """Review r5: deterministic HTTP 4xx (bad model name, oversized prompt)
    must fail fast instead of burning max_retries identical requests +
    sleeps per pipeline record; 429 stays retryable."""
    import asyncio

    import httpx

    from multimodal_sae_tpu.clients.client import retry_chat

    calls = {"n": 0}

    class Stub404:
        async def chat(self, model, messages, **kw):
            calls["n"] += 1
            resp = httpx.Response(404, request=httpx.Request("POST", "http://x/v1"))
            raise httpx.HTTPStatusError("404", request=resp.request, response=resp)

    with pytest.raises(httpx.HTTPStatusError):
        asyncio.run(retry_chat(Stub404(), "m", [], max_retries=3))
    assert calls["n"] == 1  # no retries on a deterministic client error

    calls["n"] = 0

    class Stub429:
        async def chat(self, model, messages, **kw):
            calls["n"] += 1
            resp = httpx.Response(429, request=httpx.Request("POST", "http://x/v1"))
            raise httpx.HTTPStatusError("429", request=resp.request, response=resp)

    with pytest.raises(httpx.HTTPStatusError):
        asyncio.run(retry_chat(Stub429(), "m", [], max_retries=2))
    assert calls["n"] == 2  # rate limiting keeps retrying


def test_module_row_writer_matches_per_row_format(tmp_path):
    """Review r5: the buffered explain writer must produce the exact artifact
    the per-row rewrites did, flush on threshold, and land pending rows on
    close()."""
    import json

    from multimodal_sae_tpu.launch.explain._writer import ModuleRowWriter

    w = ModuleRowWriter(str(tmp_path), flush_every=3)
    rows = [{"f%d" % i: "expl%d" % i} for i in range(5)]
    for r in rows[:3]:
        w.append("m.json", r)
    # Threshold flush already landed the first three.
    assert json.load(open(tmp_path / "m.json")) == rows[:3]
    w.append("m.json", rows[3])
    w.append("other.json", {"g": "h"})
    w.close()
    assert json.load(open(tmp_path / "m.json")) == rows[:4]
    assert json.load(open(tmp_path / "other.json")) == [{"g": "h"}]
    # Appending to a pre-existing file extends it (the resume case).
    w2 = ModuleRowWriter(str(tmp_path), flush_every=1)
    w2.append("m.json", rows[4])
    assert json.load(open(tmp_path / "m.json")) == rows
