"""HTTP serving for open-domain QA (beyond reference parity — the reference
has no serving layer at all, SURVEY.md §1: "There is no service/serving
layer"; its only QA surface is batch eval against gold answers,
/root/reference/qa/train_retrieve_qa.py:274-401).

Stdlib-only threaded HTTP server wrapping the warm retrieve->read->extract
path (`QATrainer.answer`). The model, the device-resident index, and every
compiled dispatch cache stay warm across requests — a request costs one
fused encode+search dispatch plus one reader forward, not a process start.

Endpoints:
  GET  /healthz              -> {"status": "ok"}
  GET  /answer?q=<question>  -> answer row (see below)
  POST /answer {"question": ..., "topn"?: int, "alpha"?: float}
  POST /answer {"questions": [...]}   (batched: list of rows)

Answer row: {"question", "answer", "alpha", "candidates": [{"answer",
"score", "span_score", "rank_score", "passage"}]}.

Device dispatches are serialized by a lock: concurrent requests queue on
the single chip rather than interleaving sampler/cache state.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def make_qa_server(
    trainer,
    make_sampler,
    host: str = "127.0.0.1",
    port: int = 8080,
    alpha: float = 0.8,
    topn: int = 3,
    logger=None,
) -> ThreadingHTTPServer:
    """Build (not start) the server. Call .serve_forever() to run; tests use
    port=0 for an ephemeral port and .shutdown() from another thread."""
    lock = threading.Lock()

    def _answer(questions: list[str], a: float, n: int) -> list[dict]:
        sampler = make_sampler([{"question": q} for q in questions])
        with lock:
            return trainer.answer(sampler, alpha=a, topn=n)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to our logger, not stderr
            if logger:
                logger.info("serve: " + fmt % args)

        def _send(self, code: int, payload):
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                return self._send(200, {"status": "ok"})
            if url.path == "/answer":
                qs = parse_qs(url.query)
                if "q" not in qs:
                    return self._send(400, {"error": "missing query param 'q'"})
                if not all(q.strip() for q in qs["q"]):
                    return self._send(400, {"error": "questions must be non-empty"})
                try:
                    rows = _answer(qs["q"], alpha, topn)
                except Exception as e:  # pragma: no cover - defensive
                    return self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return self._send(200, rows[0] if len(rows) == 1 else rows)
            return self._send(404, {"error": f"no route {url.path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/answer":
                return self._send(404, {"error": f"no route {url.path}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._send(400, {"error": f"bad json: {e}"})
            if not isinstance(req, dict):
                return self._send(400, {"error": "body must be a json object"})
            if "question" in req:
                questions, single = [req["question"]], True
            elif "questions" in req and isinstance(req["questions"], list):
                questions, single = list(req["questions"]), False
            else:
                return self._send(
                    400, {"error": "provide 'question' or 'questions' list"}
                )
            if not questions or not all(
                isinstance(q, str) and q.strip() for q in questions
            ):
                return self._send(400, {"error": "questions must be non-empty strings"})
            try:
                a = float(req.get("alpha", alpha))
                n = int(req.get("topn", topn))
            except (TypeError, ValueError) as e:
                return self._send(400, {"error": f"bad alpha/topn: {e}"})
            if n < 1:
                return self._send(400, {"error": f"topn must be >= 1, got {n}"})
            try:
                rows = _answer(questions, a, n)
            except Exception as e:  # pragma: no cover - defensive
                return self._send(500, {"error": f"{type(e).__name__}: {e}"})
            return self._send(200, rows[0] if single else rows)

    return ThreadingHTTPServer((host, port), Handler)
