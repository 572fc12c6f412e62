"""End-to-end drive of tools/label_explanation.py against a local stub LLM
server on an ephemeral port (--base-url): each refined explanation gets a
concept label; sentinel rows are skipped."""

import json
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import pytest

pytest.importorskip("httpx")
REPO = Path(__file__).resolve().parent.parent


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        self.server.requests.append(body)
        reply = {"choices": [{"message": {"role": "assistant", "content": "object"}}]}
        payload = json.dumps(reply).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


def test_label_explanation_cli(tmp_path):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)  # ephemeral port
    srv.requests = []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        refined = tmp_path / "refined.json"
        refined.write_text(json.dumps({
            "layers.1_feature3": "pictures of cars",
            "layers.1_feature7": "Unable to produce descriptions for this one",
            "layers.1_feature9": "blue textures",
        }))
        out = tmp_path / "labels.json"
        result = subprocess.run(
            [sys.executable, str(REPO / "tools" / "label_explanation.py"),
             "--refined-explanation", str(refined), "--save-path", str(out),
             "--base-url", f"http://127.0.0.1:{srv.server_address[1]}"],
            capture_output=True, text=True, timeout=240,
            env={"PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu",
                 "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
        )
        assert result.returncode == 0, result.stderr[-2000:]
        labels = json.loads(out.read_text())
        # sentinel row skipped, the other two labeled by the stub LLM
        assert labels == {"layers.1_feature3": "object", "layers.1_feature9": "object"}
        assert len(srv.requests) == 2
        assert all("pictures of cars" in json.dumps(r) or "blue textures" in json.dumps(r)
                   for r in srv.requests)
    finally:
        srv.shutdown()
