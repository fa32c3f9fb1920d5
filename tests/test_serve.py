"""Serving shim parity: per-sentence answers == the distributed vote."""

from thesis_ner_co_tri_training_spark.functions.textnorm import (
    extract_text, split_sentences)
from thesis_ner_co_tri_training_spark.operators.mentions import vote_mentions
from thesis_ner_co_tri_training_spark.operators.tagging import (
    tag_pages_df, tag_sentence)
from thesis_ner_co_tri_training_spark.serve import predict, predict_voted
from thesis_ner_co_tri_training_spark.sources.pages import gen_page, gen_pages_df

N_PAGES = 12


def test_predict_reference_record_shape():
    out = predict("Angela Merkel besucht Berlin 1999")
    assert out and all(set(d) == {"word", "tag", "confidence"} for d in out)
    assert out == tag_sentence("Angela Merkel besucht Berlin 1999", 1)


def test_predict_voted_matches_batch_vote(spark):
    pages = gen_pages_df(spark, N_PAGES, partitions=2)
    voted = vote_mentions(tag_pages_df(pages.drop("text")))
    batch = {
        (r["url"], r["sent_id"]): (list(r["tags"]), r["selection_rule"])
        for r in voted.collect()
    }

    checked_selected = checked_filtered = 0
    for pid in range(N_PAGES):
        page = gen_page(pid)
        for sid, sent in enumerate(split_sentences(extract_text(page["html"]))):
            serve = predict_voted(sent)
            key = (page["url"], sid)
            if key in batch:
                assert serve["selection_rule"] == batch[key][1], key
                assert serve["tags"] == batch[key][0], key
                checked_selected += 1
            else:
                assert serve["selection_rule"] is None, key
                checked_filtered += 1
    assert checked_selected > 0 and checked_filtered > 0


def test_http_predict_socket_parity():
    """S9 socket-level: POST /predict and GET /info over a real HTTP
    round-trip match the api.py:44-60 contract (result record shape,
    'Model Failed' on bad payloads)."""
    import json
    import threading
    import urllib.request

    from thesis_ner_co_tri_training_spark.serve import make_http_server

    srv = make_http_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"sentence": "Angela Merkel besucht Berlin"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=10) as resp:
            out = json.loads(resp.read())
        assert out["result"] == predict("Angela Merkel besucht Berlin")
        assert all(set(d) == {"word", "tag", "confidence"} for d in out["result"])

        # api.py:53-55 failure contract: 200 + {"result": "Model Failed"}
        bad = urllib.request.Request(
            f"{base}/predict", data=b'{"nope": 1}',
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(bad, timeout=10) as resp:
            assert json.loads(resp.read()) == {"result": "Model Failed"}

        with urllib.request.urlopen(f"{base}/info", timeout=10) as resp:
            info = json.loads(resp.read())
        assert "config" in info and info["config"]["views"] == 3
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_voted_concurrent_parity(spark):
    """Verdict r4 item 10: the voted path under load — 8 parallel
    clients, 100 requests over /predict_voted — answers byte-identical
    to the batch vote for every sentence (ThreadingHTTPServer: each
    request runs the same pure functions concurrently; any shared
    mutable state would surface as cross-request corruption here)."""
    import json
    import threading
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from thesis_ner_co_tri_training_spark.serve import make_http_server

    # expected answers from the batch vote (the distributed plan's path)
    pages = gen_pages_df(spark, 6, partitions=2)
    voted = vote_mentions(tag_pages_df(pages.drop("text")))
    batch = {
        (r["url"], r["sent_id"]): (list(r["tags"]), r["selection_rule"])
        for r in voted.collect()
    }
    sentences = []  # (sentence, expected tags-or-None)
    for pid in range(6):
        page = gen_page(pid)
        for sid, sent in enumerate(split_sentences(extract_text(page["html"]))):
            exp = batch.get((page["url"], sid))
            sentences.append((sent, exp[0] if exp else None))
    assert len(sentences) >= 10

    srv = make_http_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"

    def one(i):
        sent, want = sentences[i % len(sentences)]
        req = urllib.request.Request(
            f"{base}/predict_voted",
            data=json.dumps({"sentence": sent}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())["result"]
        if want is None:
            assert out["selection_rule"] is None, sent
        else:
            assert out["tags"] == want, sent
        return True

    try:
        with ThreadPoolExecutor(max_workers=8) as ex:
            assert all(ex.map(one, range(100)))
    finally:
        srv.shutdown()
        srv.server_close()
