"""S9 — serving-parity shim (the reference's Flask predict API, api.py:44-60).

The reference serves POST /predict {sentence} -> [{word, tag, confidence}]
by running one model on one sentence. The engine equivalent keeps the
response contract but answers from the engine's primitives:

  predict()        one view's record-shape tagging (api.py parity)
  predict_voted()  tri-view agreement-voted mentions for the sentence —
                   what a production endpoint should actually serve

Both are driver-side conveniences over the same shared pure functions the
distributed plan uses, so serving and batch can never drift. For real
QPS-scale serving you'd front the materialized `mentions` table
(spark.sql point lookups), not per-request tagging — noted in SURVEY §2.1.
"""

from __future__ import annotations

from typing import Any

from .operators.tagging import tag_all_views_flat, tag_sentence


def predict(sentence: str, view_id: int = 1) -> list[dict[str, Any]]:
    """api.py response shape: [{'word','tag','confidence'}] (predict.py:114)."""
    return tag_sentence(sentence, view_id)


def predict_voted(
    sentence: str,
    cos_threshold: float = 0.7,
    tcfd_threshold: float = 0.7,
    scfd_threshold: float = 0.6,
) -> dict[str, Any]:
    """Tri-view voted answer for one sentence (reference algebra, C1/C2).

    Returns {'tokens', 'tags', 'confidences', 'selection_rule'};
    selection_rule is None when no rotation passes and views disagree
    (the sentence would be filtered in batch). Delegates to the same
    vote_sentence_flat the batch/streaming fused pass runs — serving and
    batch cannot drift.
    """
    from .functions.simfn import avg_confident_score_flat, cosine_similarity
    from .operators.mentions import vote_sentence_flat

    tokens, views = tag_all_views_flat(sentence)
    tags = [v[0] for v in views]
    confs = [v[1] for v in views]
    cfd = [avg_confident_score_flat(t, c) for t, c in views]
    cosines = [cosine_similarity(tags[0], tags[1]),
               cosine_similarity(tags[1], tags[2]),
               cosine_similarity(tags[0], tags[2])]
    picked = vote_sentence_flat(tags, confs, cfd, cosines,
                                cos_threshold, tcfd_threshold, scfd_threshold)
    if picked is None:
        return {"tokens": tokens, "tags": None, "confidences": None,
                "selection_rule": None}
    v_tags, v_confs, rule, _cos = picked
    return {"tokens": tokens, "tags": v_tags,
            "confidences": v_confs, "selection_rule": rule}


def engine_info() -> dict[str, Any]:
    """GET /info payload (api.py:57-60 serves model_config.json; the
    engine's analog is its vote/view configuration). Thresholds are read
    from predict_voted's OWN signature defaults so /info can never drift
    from what the served votes actually use."""
    import inspect

    defaults = {
        k: p.default
        for k, p in inspect.signature(predict_voted).parameters.items()
        if k.endswith("_threshold")
    }
    return {
        "engine": "thesis_ner_co_tri_training_spark",
        "views": 3,
        "vote": defaults,
        "response_shape": ["word", "tag", "confidence"],
    }


def make_http_server(port: int = 0):
    """Socket-level S9 parity: the reference's Flask routes (api.py:44-60)
    on the stdlib ThreadingHTTPServer — no new dependencies.

      POST /predict {"sentence": ...} -> {"result": [{word,tag,confidence}]}
      GET  /info                      -> {"config": {...}}
      model failure                   -> {"result": "Model Failed"}
                                         (api.py:53-55 contract)

    Returns the server (not started); call serve_forever() in a thread and
    shutdown() to stop. port=0 binds an ephemeral port (server_port tells).
    Per-request tagging is a driver-side convenience — production QPS
    should front the materialized mentions table instead (SURVEY §2.1).
    """
    import json as _json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, obj: dict, code: int = 200) -> None:
            body = _json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API name)
            if self.path == "/info":
                self._send({"config": engine_info()})
            else:
                self._send({"error": "not found"}, 404)

        def do_POST(self):  # noqa: N802
            if self.path not in ("/predict", "/predict_voted"):
                self._send({"error": "not found"}, 404)
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = _json.loads(self.rfile.read(n) or b"{}")
                text = payload["sentence"]
                if self.path == "/predict_voted":
                    # optional per-request threshold overrides — same
                    # keyword names as predict_voted's signature
                    kw = {k: float(v) for k, v in payload.items()
                          if k.endswith("_threshold")}
                    self._send({"result": predict_voted(text, **kw)})
                else:
                    self._send({"result": predict(text)})
            except Exception:
                # api.py:53-55: failures answer 200 {"result":"Model Failed"}
                self._send({"result": "Model Failed"})

        def log_message(self, *args):  # quiet test runs
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
