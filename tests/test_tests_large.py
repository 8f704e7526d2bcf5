"""Port of the reference's large-corpus battery
(/root/reference/tests/all/tests_large.rs): 600 repeated docs + one document
whose text exceeds the 64-byte dictionary cutoff
(do_not_store_text_longer_than, /root/reference/src/metadata.rs:66-68), so
the long text is reachable only through its TOKENS while `select` must still
return the full stored text. Exercises hit-set + rank under TOP truncation
(num_hits stays the exact total while data is truncated), the query
generator's AND/OR/filter paths, and the 1:n facet index at 300 hits/value.
"""

import pytest
from pyspark.sql import types as T

LONG_TEXT = ("a long text with more than 64 characters so that the option "
             "do_not_store_text_longer_than is active. then the whole text "
             "won't be store in the fst, only its tokens")

N_PAIRS = 300  # 300 x (superb + awesomo) docs, tests_large.rs:20-29


def large_corpus_rows():
    rows = []
    for i in range(N_PAIRS):
        rows.append({"doc_id": 2 * i, "category": "superb",
                     "tags": ["nice", "cool"], "text": None})
        rows.append({"doc_id": 2 * i + 1, "category": "awesomo",
                     "tags": ["is", "cool"], "text": None})
    rows.append({"doc_id": 2 * N_PAIRS, "category": None, "tags": None,
                 "text": LONG_TEXT})
    return rows


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("category", T.StringType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("text", T.StringType()),
])

_FIELDS = ["category", "tags[]", "text"]


@pytest.fixture(scope="session")
def large_index(spark, tmp_path_factory):
    from veloci_spark.build import build_index
    from veloci_spark.config import FieldConfig, IndexConfig
    from veloci_spark.search import FulltextIndex

    d = str(tmp_path_factory.mktemp("largeidx"))
    docs = spark.createDataFrame(large_corpus_rows(), schema=_SCHEMA)
    cfg = IndexConfig(
        fields=(FieldConfig("category"),
                FieldConfig("tags[]"),
                FieldConfig("text")),  # default 64-byte dictionary cutoff
        doc_id_col="doc_id",
        segment_docs=256,  # 601 docs -> 3 segments
    )
    build_index(spark, docs, cfg, d)
    return FulltextIndex(spark, d).cache()


class TestTestsLarge:
    def test_simple_search_count_under_top(self, large_index):
        # tests_large.rs:41-50 simple_search: num_hits is the EXACT total
        # even though data is truncated to top
        from veloci_spark.search import search

        res = search(large_index, {
            "search": {"terms": ["superb"], "path": "category"}, "top": 10})
        assert res["num_hits"] == N_PAIRS and res["num_hits_exact"]
        # all 300 docs tie on score -> rank order is doc_id DESC; the
        # truncated page is exactly the 10 highest even (superb) ids
        assert [d["doc_id"] for d in res["data"]] == \
            [2 * N_PAIRS - 2 - 2 * i for i in range(10)]

    def test_select_on_large_text(self, large_index):
        # tests_large.rs:53-71: text >64 bytes lives only as tokens in the
        # dictionary, yet select returns the full stored text
        from veloci_spark.search import search

        res = search(large_index, {
            "search_req": {"search": {"terms": ["long"], "path": "text"}},
            "select": ["text"], "top": 10})
        assert res["num_hits"] == 1
        assert res["data"][0]["doc_id"] == 2 * N_PAIRS
        assert res["data"][0]["doc"]["text"] == LONG_TEXT
        assert "category" not in res["data"][0]["doc"]  # didn't select
        # the full value is NOT a dictionary term; its tokens are
        d = large_index.dict_df.where("field = 'text'").toPandas()
        assert LONG_TEXT.lower() not in set(d["term"])
        assert {"long", "tokens", "characters"} <= set(d["term"])

    def test_and_search(self, large_index):
        # tests_large.rs:74-81: "superb AND cool" via the query generator
        from veloci_spark.query import query_to_request
        from veloci_spark.search import search

        req = query_to_request("superb AND cool", search_fields=_FIELDS,
                               top=10)
        res = search(large_index, req)
        assert res["num_hits"] == N_PAIRS

    def test_or_search(self, large_index):
        # tests_large.rs:84-90: "superb OR awesome" — awesome fuzzy-matches
        # awesomo (auto levenshtein 1), so the OR covers all 600 pair docs
        from veloci_spark.query import query_to_request
        from veloci_spark.search import search

        req = query_to_request("superb OR awesome", search_fields=_FIELDS,
                               top=10)
        res = search(large_index, req)
        assert res["num_hits"] == 2 * N_PAIRS
        assert len(res["data"]) == 10

    def test_search_and_filter(self, large_index):
        # tests_large.rs:91-99: filter "nice AND superb" intersected with
        # the scored "superb" search
        from veloci_spark.query import query_to_request
        from veloci_spark.search import search

        req = query_to_request("superb", search_fields=_FIELDS,
                               filter_query="nice AND superb", top=10)
        res = search(large_index, req)
        assert res["num_hits"] == N_PAIRS

    def test_facet_with_facet_index(self, large_index):
        # tests_large.rs:101-123: facet tags[] over the 300 "superb" hits
        from veloci_spark.search import search

        res = search(large_index, {
            "search_req": {"search": {"terms": ["superb"],
                                      "path": "category"}},
            "facets": [{"field": "tags[]"}], "top": 10})
        assert sorted(res["facets"]["tags[]"]) == \
            [("cool", N_PAIRS), ("nice", N_PAIRS)]
