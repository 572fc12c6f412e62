"""LLM client tests against a local stub OpenAI-compatible HTTP server
(SURVEY.md §4: clients tested against a stub), covering the chat transport,
retry behavior, legacy completions, and the SRT attach mode."""

import asyncio
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from multimodal_sae_tpu.clients import Local, SRT
from multimodal_sae_tpu.clients.client import ChatTransport, retry_chat


class StubHandler(BaseHTTPRequestHandler):
    fail_next = 0
    requests = []

    def do_POST(self):
        length = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(length))
        StubHandler.requests.append((self.path, body))
        if StubHandler.fail_next > 0:
            StubHandler.fail_next -= 1
            self.send_response(500)
            self.end_headers()
            return
        if self.path.endswith("/chat/completions"):
            payload = {
                "choices": [
                    {"message": {"content": f"echo:{body['messages'][-1]['content']}"}}
                ]
            }
        else:  # legacy completions
            payload = {"choices": [{"text": f"legacy:{body['prompt']}"}]}
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # health endpoint
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), StubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_chat_transport(server):
    transport = ChatTransport(server + "/v1", "EMPTY", timeout=10)
    out = asyncio.run(retry_chat(transport, "m", [{"role": "user", "content": "hi"}]))
    assert out == "echo:hi"


def test_retry_then_success(server):
    StubHandler.fail_next = 1
    transport = ChatTransport(server + "/v1", "EMPTY", timeout=10)
    out = asyncio.run(
        retry_chat(transport, "m", [{"role": "user", "content": "x"}], max_retries=3)
    )
    assert out == "echo:x"


def test_retry_exhaustion(server):
    StubHandler.fail_next = 5
    transport = ChatTransport(server + "/v1", "EMPTY", timeout=10)
    with pytest.raises(Exception):
        asyncio.run(
            retry_chat(transport, "m", [{"role": "user", "content": "x"}], max_retries=2)
        )
    StubHandler.fail_next = 0


def test_local_client(server):
    client = Local("model-x", base_url=server + "/v1")
    out = asyncio.run(client.generate([{"role": "user", "content": "q"}]))
    assert out == "echo:q"
    out = asyncio.run(client.generate("raw prompt", use_legacy_api=True))
    assert out == "legacy:raw prompt"


def test_srt_attach_mode(server):
    # launch_server=False attaches to an existing endpoint.
    client = SRT("model-y", base_url=server, launch_server=False)
    out = asyncio.run(client.generate("ping"))
    assert out.startswith("echo:")
    # string prompts are wrapped into a single user message with text content
    path, body = StubHandler.requests[-1]
    assert body["messages"][0]["content"][0] == {"type": "text", "text": "ping"}
    client.clean()  # no spawned process; must be a no-op
