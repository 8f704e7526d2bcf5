"""REST server tests (reference server parity: search / suggest / _id)."""

import json
import urllib.request


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_server_endpoints(spark_index, corpus):
    from veloci_spark.server import serve

    httpd = serve({"webtext": spark_index}, port=0, background=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}/webtext"
    try:
        res = _post(f"{base}/search",
                    {"search": {"terms": ["urge"], "path": "text"}, "top": 5})
        assert res["num_hits"] >= 1
        assert res["data"][0]["score"] > 0

        res = _get(f"{base}/search?query=urge&top=3")
        assert len(res["data"]) >= 1

        res = _get(f"{base}/suggest?query=majes&field=text")
        assert any(s.startswith("majes") for s, _ in res["suggestions"])

        doc_id = res and _post(f"{base}/search",
                               {"search": {"terms": ["urge"], "path": "text"},
                                "top": 1})["data"][0]["doc_id"]
        doc = _get(f"{base}/_id/{doc_id}")
        assert doc["text"] == corpus[doc_id]["text"]

        err = urllib.request.urlopen(
            urllib.request.Request(f"http://127.0.0.1:{port}/nope/search",
                                   data=b"{}", method="POST"))
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        httpd.shutdown()


def test_idtree_and_multi_suggest(spark_index, corpus):
    import urllib.request

    from veloci_spark.server import serve

    httpd = serve({"webtext": spark_index}, port=0, background=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}/webtext"
    try:
        # _idtree: doc reconstructed from the index's field relations
        doc = _get(f"{base}/_idtree/3")
        assert doc["text"] == corpus[3]["text"]
        assert doc["url"] == corpus[3]["url"]

        res = _get(f"{base}/suggest?query=ma&fields=text,lang")
        assert res["suggestions"]
        scores = [s for _t, s in res["suggestions"]]
        assert scores == sorted(scores, reverse=True)
    finally:
        httpd.shutdown()
