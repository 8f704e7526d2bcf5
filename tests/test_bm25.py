"""BM25 scoring mode: Okapi BM25 (k1=1.2, b=0.75, Lucene idf) computed at
build time (static corpus → df/N/avgdl known), packed ×100 u32, evaluated
through the unchanged segment kernel / WAND machinery. Verified against an
independent numpy model over the raw texts."""

import math
import re

import numpy as np
import pytest

from veloci_spark.config import DEFAULT_SEPARATORS, FieldConfig, IndexConfig
from tests.conftest import sorted_rows


def _runs(text):
    cls = "".join(re.escape(c) for c in DEFAULT_SEPARATORS)
    return re.findall(f"[{cls}]+|[^{cls}]+", text)


def _bm25_model(corpus, query_terms, k1=1.2, b=0.75):
    """Independent model of the build's BM25: token entries come from texts
    with ≥2 runs (tf = in-text count, dl = run count), exact-text entries
    from full texts ≤64 bytes (tf=1, dl=1); df counts texts per term across
    both kinds; duplicate (term, doc) entries SUM like the pack kernel."""
    tok_entries = {}
    exact_entries = {}
    for r in corpus:
        runs = _runs(r["text"]) if r["text"] else []
        if len(runs) >= 2:
            cnt = {}
            for tok in runs:
                cnt[tok] = cnt.get(tok, 0) + 1
            tok_entries[r["doc_id"]] = (cnt, len(runs))
        if r["text"] and len(r["text"].encode()) <= 64:
            exact_entries.setdefault(r["doc_id"], []).append(r["text"])
    dfreq = {}
    lens = []
    for doc_id, (cnt, n) in tok_entries.items():
        lens.append(n)
        for t in cnt:
            dfreq[t] = dfreq.get(t, 0) + 1
    for doc_id, txts in exact_entries.items():
        for t in txts:
            dfreq[t] = dfreq.get(t, 0) + 1
    # n_texts/avgdl from the build's stats (token texts only — lens of texts
    # with >=2 runs; exact-only texts contribute entries but no length rows)
    n_texts = len(lens)
    avgdl = sum(lens) / max(n_texts, 1)

    def quant(tf, d, dl):
        idf = math.log(1.0 + (n_texts - d + 0.5) / (d + 0.5))
        s = 100.0 * idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9)))
        return max(math.floor(s + 0.5), 1.0)

    scores = {}
    for q in query_terms:
        per_doc = {}
        for doc_id, (cnt, n) in tok_entries.items():
            if q in cnt:
                per_doc[doc_id] = quant(cnt[q], dfreq[q], n)
        for doc_id, txts in exact_entries.items():
            for t in txts:
                if t == q:
                    v = quant(1, dfreq[q], 1)
                    # same (term, doc): build SUMS duplicate entries
                    per_doc[doc_id] = per_doc.get(doc_id, 0) + v
        for doc_id, v in per_doc.items():
            # leaf max-dedup applies across different matched terms, not here
            scores.setdefault(doc_id, {})[q] = v
    return scores


@pytest.fixture(scope="module")
def bm25_index(spark, tmp_path_factory):
    from veloci_spark.build import build_index
    from veloci_spark.search import FulltextIndex

    d = str(tmp_path_factory.mktemp("bm25idx"))
    corpus = sorted_rows(100)
    cfg = IndexConfig(
        fields=(FieldConfig("text"),), doc_id_col="doc_id", segment_docs=32,
        scoring="bm25")
    build_index(spark, spark.createDataFrame(corpus), cfg, d)
    return FulltextIndex(spark, d), corpus


class TestBM25:
    def test_manifest_records_mode_and_stats(self, bm25_index):
        idx, _ = bm25_index
        assert idx.manifest["scoring"] == "bm25"
        assert idx.manifest["field_stats"]["text"]["avgdl"] > 0

    def test_stored_scores_match_model(self, bm25_index):
        from veloci_spark.vbyte import unpack_postings

        idx, corpus = bm25_index
        model = _bm25_model(corpus, ["will", "urge", "die"])
        d = idx.dict_df.where("field = 'text'").toPandas()
        tid = dict(zip(d["term"], d["term_id"]))
        for term in ("will", "urge", "die"):
            if term not in tid:
                continue
            rows = idx.postings.where(
                f"field = 'text' AND term_id = {tid[term]}").toPandas()
            got = {}
            for _, r in rows.iterrows():
                ids, sc = unpack_postings(r["docs_bin"], r["scores_bin"])
                ids = ids + int(r["segment"]) * 32
                got.update({int(i): int(s) for i, s in zip(ids, sc)})
            want = {doc: int(v) for doc, v in
                    ((doc, per.get(term)) for doc, per in model.items())
                    if v is not None}
            assert got == want, term

    def test_ranked_search_single_term(self, bm25_index):
        from veloci_spark.search import search

        idx, corpus = bm25_index
        model = _bm25_model(corpus, ["will"])
        want = sorted(
            ((doc, per["will"]) for doc, per in model.items() if "will" in per),
            key=lambda t: (-t[1], -t[0]))[:10]
        res = search(idx, {"search": {"terms": ["will"], "path": "text"},
                           "top": 10})
        # engine score = term_score(exact) × stored/100
        from veloci_spark.scoring import term_score

        ts = float(term_score(np.array([0]), np.array([False]))[0])
        got = [(d["doc_id"], round(d["score"] * 100 / ts)) for d in res["data"]]
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == round(ws), (gd, gs, ws)

    def test_wand_matches_full_eval(self, bm25_index):
        from veloci_spark.search import FulltextIndex, _search_hits, search

        idx, _ = bm25_index
        req = {"search": {"terms": ["die"], "path": "text"}, "top": 5}
        # plain path (WAND active) vs emit-all path must agree
        fast = search(idx, req)
        hits, _p, _l = _search_hits(idx, req, need_all=True)
        import pyspark.sql.functions as F
        slow = hits.orderBy(F.desc("score"), F.desc("doc_id")).limit(5).collect()
        assert [d["doc_id"] for d in fast["data"]] == [r["doc_id"] for r in slow]
