"""HttpLLMEnricher against an in-process localhost HTTP server — covers the
real-API request shape (YandexGPT-style envelope, dag/...py:224-240), the
retry prompt mutation (:519), and error handling, with zero external network.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from vacancy_gpt_etl_pipeline_spark.operators.enrichment import (
    UNDEFINED,
    HttpLLMEnricher,
    _process_chunk,
)


class _FakeLLM(BaseHTTPRequestHandler):
    requests: list[dict] = []
    fail_first = False

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests.append(
            {"body": body, "auth": self.headers.get("Authorization")}
        )
        if type(self).fail_first and len(type(self).requests) == 1:
            self.send_response(500)
            self.end_headers()
            return
        prompt = body["messages"][0]["text"]
        # echo classification: every item in the prompt's {items} list gets a label
        items = [s.strip() for s in prompt.split("|")[-1].split(",") if s.strip()]
        payload = {
            "result": {
                "alternatives": [
                    {
                        "message": {
                            "text": "```json\n"
                            + json.dumps(
                                [{"original": k, "normalized_title": f"T:{k}"} for k in items],
                                ensure_ascii=False,
                            )
                            + "\n```"
                        }
                    }
                ]
            }
        }
        data = json.dumps(payload).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):
        pass


@pytest.fixture()
def llm_server():
    _FakeLLM.requests = []
    _FakeLLM.fail_first = False
    srv = HTTPServer(("127.0.0.1", 0), _FakeLLM)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1/completion"
    srv.shutdown()


def _enricher(endpoint):
    return HttpLLMEnricher(
        endpoint=endpoint,
        api_key="test-key",
        prompt_template="classify | {items}",
        output_cols=("normalized_title",),
        model="test-model",
        retry_values=frozenset({UNDEFINED}),
    )


def test_request_envelope_and_response_parse(llm_server):
    e = _enricher(llm_server)
    raw = e.respond(["аналитик", "devops"], attempt=0)
    assert "```json" in raw  # operator, not enricher, owns fence stripping
    req = _FakeLLM.requests[0]
    assert req["auth"] == "Api-Key test-key"
    assert req["body"]["modelUri"] == "test-model"
    assert req["body"]["completionOptions"] == {"temperature": 0.3, "maxTokens": 4000}
    assert req["body"]["messages"][0]["text"] == "classify | аналитик, devops"


def test_retry_mutates_prompt(llm_server):
    e = _enricher(llm_server)
    e.respond(["a"], attempt=1)
    prompt = _FakeLLM.requests[0]["body"]["messages"][0]["text"]
    assert prompt.startswith("ВНИМАНИЕ")  # dag/...py:519 warning injection


def test_http_500_flows_into_retry_residue(llm_server):
    _FakeLLM.fail_first = True
    e = _enricher(llm_server)
    rows = _process_chunk(
        ["x", "y"], e, max_retries=1, defaults={"normalized_title": UNDEFINED}, sleep_s=0
    )
    # attempt 0 got HTTP 500 (exception path), attempt 1 resolved everything
    assert {r["original"]: r["normalized_title"] for r in rows} == {
        "x": "T:x", "y": "T:y",
    }
    assert len(_FakeLLM.requests) == 2


def test_unreachable_endpoint_stubs_totally():
    e_down = _enricher("http://127.0.0.1:1/v1/completion")  # nothing listens
    rows = _process_chunk(
        ["x"], e_down, max_retries=1, defaults={"normalized_title": UNDEFINED}, sleep_s=0
    )
    assert rows == [{"original": "x", "normalized_title": UNDEFINED}]
