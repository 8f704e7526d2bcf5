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


def test_reference_route_parity(spark_index, corpus):
    """The r5 route additions: /version, /search_query_params (generator
    params incl. explicit levenshtein, stopword lists, phrase_pairs opt-in),
    POST /suggest, POST /highlight, /inspect/<field>/<id> — the reference's
    remaining Rocket routes (rocket_server.rs:168,326,565,576,607)."""
    from veloci_spark.server import serve

    httpd = serve({"webtext": spark_index}, port=0, background=True)
    port = httpd.server_address[1]
    root = f"http://127.0.0.1:{port}"
    base = f"{root}/webtext"
    try:
        assert _get(f"{root}/version").startswith("0.7")

        # generator params: same hits as the GET query-string route, but
        # reference defaults (no stopword stripping unless lists given)
        res = _post(f"{base}/search_query_params",
                    {"search_term": "urge", "top": 5})
        get_res = _get(f"{base}/search?query=urge&top=5")
        assert [d["doc_id"] for d in res["data"]] == \
            [d["doc_id"] for d in get_res["data"]]

        # explicit levenshtein=0 must kill the auto-fuzz: "urgx" matches
        # with auto (d=1) but not with levenshtein=0
        fuzzy = _post(f"{base}/search_query_params",
                      {"search_term": "urgx", "top": 5})
        exact = _post(f"{base}/search_query_params",
                      {"search_term": "urgx", "top": 5, "levenshtein": 0})
        assert fuzzy["num_hits"] >= 1 and exact["num_hits"] == 0

        # stopword_lists strip "will"; custom stopwords strip chosen terms
        r1 = _post(f"{base}/search_query_params",
                   {"search_term": "will urge", "stopword_lists": ["en"],
                    "top": 5})
        r2 = _post(f"{base}/search_query_params",
                   {"search_term": "will urge", "stopwords": ["will"],
                    "top": 5})
        r3 = _post(f"{base}/search_query_params",
                   {"search_term": "urge", "top": 5})
        assert [d["doc_id"] for d in r1["data"]] == \
            [d["doc_id"] for d in r2["data"]] == \
            [d["doc_id"] for d in r3["data"]]

        # POST /suggest twin
        res = _post(f"{base}/suggest", {"path": "text", "terms": ["majes"]})
        assert any(s.startswith("majes") for s, _ in res["suggestions"])

        # POST /highlight: ranked highlighted stored texts
        out = _post(f"{base}/highlight", {"path": "text", "terms": ["urge"],
                                          "top": 3})
        assert out and all("<b>" in text for text, _s, _d in out)
        assert all(s > 0 for _t, s, _d in out)

        # /inspect/<field>/<doc_id>: the raw indexed value
        d0 = out[0][2]
        vals = _get(f"{base}/inspect/text/{d0}")
        assert vals == [corpus[d0]["text"]]

        # boost_queries → request.boost verbatim (query_generator.rs:67,240):
        # an Add boost by doc_id shifts every score by exactly its doc_id
        import numpy as np
        base_res = _post(f"{base}/search_query_params",
                         {"search_term": "urge", "top": 5})
        boosted = _post(f"{base}/search_query_params",
                        {"search_term": "urge", "top": 5,
                         "boost_queries": [{"path": "doc_id",
                                            "boost_fun": "Add"}]})
        b0 = {d["doc_id"]: d["score"] for d in base_res["data"]}
        for d in boosted["data"]:
            want = np.float32(np.float32(b0[d["doc_id"]])
                              + np.float32(d["doc_id"]))
            assert np.float32(d["score"]) == want, d
    finally:
        httpd.shutdown()


def test_get_query_params_and_explain_plan(spark_index):
    """GET /search carries the full QueryParams form (boost_fields pairs,
    facets, flags) and POST /search_query_params/explain_plan returns the
    generated request + the Catalyst plan (reference rocket_server.rs:88-111,
    312-324)."""
    import urllib.parse

    from veloci_spark.server import serve

    httpd = serve({"webtext": spark_index}, port=0, background=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}/webtext"
    try:
        # GET with boost_fields + facets + why_found; must agree with the
        # equivalent POST generator-params body
        qs = urllib.parse.urlencode({
            "query": "urge", "top": 5, "facets": "lang",
            "boost_fields": "text->2.0", "why_found": "true"})
        got = _get(f"{base}/search?{qs}")
        want = _post(f"{base}/search_query_params",
                     {"search_term": "urge", "top": 5, "facets": ["lang"],
                      "boost_fields": {"text": 2.0}, "why_found": True})
        assert [d["doc_id"] for d in got["data"]] == \
            [d["doc_id"] for d in want["data"]]
        assert got["facets"] == want["facets"]
        assert all(d["why_found"] for d in got["data"])

        # explicit levenshtein through GET
        assert _get(f"{base}/search?query=urgx&levenshtein=0")["num_hits"] == 0

        # explain_plan: request echo + a real Catalyst formatted plan
        out = _post(f"{base}/search_query_params/explain_plan",
                    {"search_term": "urge", "top": 5})
        assert out["request"]["top"] == 5
        assert "Physical Plan" in out["plan"]
        assert "TakeOrderedAndProject" in out["plan"] or "Sort" in out["plan"]
    finally:
        httpd.shutdown()
