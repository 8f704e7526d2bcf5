"""Multi-level (arbitrary ``[]`` depth) nesting + value-relative boost.

Ported reference expectations:
* ``deep_structured_objects`` (tests.rs:475-487): search "brook" lev 1 on
  ``address[].line[]`` → exactly the doc with id 123456.
* ``read_object_only_partly`` (tests.rs:1255-1290): read-tree returns
  ``address[].line[]`` as the nested shape ``[["nuts strees"], ["asdf"]]``.
* ``check_score_boost_relative_field`` (test_scores.rs:106-133): a matched
  1:n value boosted by its SIBLING subfield through the value relation
  (Log10, param 10).
* ``check_score_boost_add_value_from_field`` / ``_multiply_``
  (test_scores.rs:135-199): Add/Multiply anchor boost on a nested search —
  boosted == unboosted + v / × v exactly (f32).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

_F32 = np.float32


# ---------------------------------------------------------------------------
# unit: value_rows at depth 2/3


class TestValueRowsDepth:
    def test_depth2_identity_and_order(self, spark):
        from veloci_spark.nested import pos_level_cols, value_rows

        df = spark.createDataFrame(
            [(0, [{"line": ["a", "b"]}, {"line": ["c"]}]),
             (1, [{"line": []}, {"line": ["d"]}]),
             (2, None)],
            "doc_id long, address array<struct<line:array<string>>>")
        rows = value_rows(df, "address[].line[]").orderBy("doc_id", "pos").collect()
        got = [(r["doc_id"], r["pos_0"], r["pos_1"], r["value"]) for r in rows]
        assert got == [(0, 0, 0, "a"), (0, 0, 1, "b"), (0, 1, 0, "c"),
                       (1, 1, 0, "d")]
        # packed pos is DFS-ordered and strictly increasing per doc
        poss = [r["pos"] for r in rows if r["doc_id"] == 0]
        assert poss == sorted(poss) and len(set(poss)) == 3
        # decode round-trips to the per-level columns
        dec = value_rows(df, "address[].line[]").select(
            "doc_id", "pos_0", "pos_1",
            *[c.alias(f"d{i}") for i, c in
              enumerate(pos_level_cols(F.col("pos"), 2))]).collect()
        for r in dec:
            assert (r["d0"], r["d1"]) == (r["pos_0"], r["pos_1"])

    def test_depth3(self, spark):
        from veloci_spark.nested import value_rows

        df = spark.createDataFrame(
            [(7, [{"m": [{"t": ["x", "y"]}, {"t": ["z"]}]}])],
            "doc_id long, a array<struct<m:array<struct<t:array<string>>>>>")
        rows = value_rows(df, "a[].m[].t[]").orderBy("pos").collect()
        assert [(r["pos_0"], r["pos_1"], r["pos_2"], r["value"]) for r in rows] \
            == [(0, 0, 0, "x"), (0, 0, 1, "y"), (0, 1, 0, "z")]

    def test_depth1_unchanged(self, spark):
        from veloci_spark.nested import value_rows

        df = spark.createDataFrame([(0, ["p", "q"])],
                                   "doc_id long, tags array<string>")
        rows = value_rows(df, "tags[]").orderBy("pos").collect()
        assert [(r["pos"], r["pos_0"], r["value"]) for r in rows] \
            == [(0, 0, "p"), (1, 1, "q")]


# ---------------------------------------------------------------------------
# end-to-end: the tests.rs address[].line[] corpus shape


def deep_corpus_rows():
    # shape of /root/reference/tests/all/tests.rs get_test_data docs
    # 1234566 / 123456 (the fields this module exercises)
    return [
        {"doc_id": 0, "id": 1234566, "commonness": 500,
         "address": [{"line": ["nuts strees"]}, {"line": ["asdf"]}],
         "field1": [{"text": "awesome", "rank": 1}],
         "meanings": {"ger": [{"text": "der test"},
                              {"text": "das ist ein guter Treffer"}]}},
        {"doc_id": 1, "id": 123456, "commonness": 551,
         "address": [{"line": ["71955 Ilene Brook"]}],
         "field1": [{"text": "awesome", "rank": 4}, {"text": "other", "rank": 9}],
         "meanings": {"ger": [{"text": "welch"}]}},
        {"doc_id": 2, "id": 555555, "commonness": 2,
         "address": None,
         "field1": None,
         "meanings": {"ger": [{"text": "weich"}]}},
    ]


_DEEP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("id", T.LongType()),
    T.StructField("commonness", T.LongType()),
    T.StructField("address", T.ArrayType(T.StructType([
        T.StructField("line", T.ArrayType(T.StringType()))]))),
    T.StructField("field1", T.ArrayType(T.StructType([
        T.StructField("text", T.StringType()),
        T.StructField("rank", T.LongType())]))),
    T.StructField("meanings", T.StructType([
        T.StructField("ger", T.ArrayType(T.StructType([
            T.StructField("text", T.StringType())])))])),
])


@pytest.fixture(scope="session")
def deep_index(spark, tmp_path_factory):
    from veloci_spark.build import build_index
    from veloci_spark.config import FieldConfig, IndexConfig
    from veloci_spark.search import FulltextIndex

    d = str(tmp_path_factory.mktemp("deepidx"))
    docs = spark.createDataFrame(deep_corpus_rows(), schema=_DEEP_SCHEMA)
    cfg = IndexConfig(
        fields=(FieldConfig("address[].line[]"),
                FieldConfig("field1[].text"),
                FieldConfig("field1[].rank", tokenize=False,
                            phrase_pairs=False, token_texts=False),
                FieldConfig("meanings.ger[].text"),
                FieldConfig("commonness", tokenize=False, phrase_pairs=False)),
        doc_id_col="doc_id",
        segment_docs=2,
    )
    build_index(spark, docs, cfg, d)
    return FulltextIndex(spark, d)


class TestDeepBuild:
    def test_values_relation_two_levels(self, deep_index):
        v = deep_index.values["address[].line[]"].toPandas()
        got = sorted(zip(v["doc_id"], v["pos_0"], v["pos_1"], v["value"]))
        assert got == [(0, 0, 0, "nuts strees"), (0, 1, 0, "asdf"),
                       (1, 0, 0, "71955 Ilene Brook")]

    def test_dictionary_tokens(self, deep_index):
        d = deep_index.dict_df.where("field = 'address[].line[]'").toPandas()
        assert {"nuts", "strees", "71955", "Ilene", "Brook"} <= set(d["term"])


class TestDeepSearch:
    def test_deep_structured_objects(self, deep_index):
        # tests.rs:475-487 — fuzzy search through two [] levels → anchor
        from veloci_spark.search import search

        res = search(deep_index, {
            "search": {"terms": ["brook"], "path": "address[].line[]",
                       "levenshtein_distance": 1}, "top": 10})
        assert [h["doc_id"] for h in res["data"]] == [1]

    def test_read_object_only_partly(self, deep_index):
        # tests.rs:1255-1290 — read-tree reconstructs the nested shape
        from veloci_spark.search import read_data

        out = read_data(deep_index, 0,
                        ["commonness", "address[].line[]",
                         "meanings.ger[].text"])
        assert out["address[].line[]"] == [["nuts strees"], ["asdf"]]
        assert out["meanings.ger[].text"] == ["der test",
                                              "das ist ein guter Treffer"]
        assert out["commonness"] == 500

    def test_two_level_locality_identity(self, deep_index):
        # two distinct query terms in the SAME level-2 value → locality 2n²
        # groups by the packed value identity, not the doc
        from veloci_spark.search import search

        plain = search(deep_index, {
            "or": [{"search": {"terms": ["nuts"], "path": "address[].line[]"}},
                   {"search": {"terms": ["strees"], "path": "address[].line[]"}}],
            "top": 10})
        boosted = search(deep_index, {
            "or": [{"search": {"terms": ["nuts"], "path": "address[].line[]"}},
                   {"search": {"terms": ["strees"], "path": "address[].line[]"}}],
            "text_locality": True, "top": 10})
        s0 = {h["doc_id"]: h["score"] for h in plain["data"]}
        s1 = {h["doc_id"]: h["score"] for h in boosted["data"]}
        # both terms hit value (0,0) of doc 0 → factor 2·2² = 8
        assert s1[0] == float(_F32(_F32(s0[0]) * _F32(8.0)))


class TestValueRelativeBoost:
    def test_multiply_by_sibling_rank(self, deep_index):
        # boost a matched field1[].text value by the SAME element's rank
        from veloci_spark.search import search

        base = search(deep_index, {
            "search": {"terms": ["awesome"], "path": "field1[].text"},
            "top": 10})
        boosted = search(deep_index, {
            "search": {"terms": ["awesome"], "path": "field1[].text"},
            "boost": [{"path": "field1[].rank", "boost_fun": "Multiply"}],
            "top": 10})
        s0 = {h["doc_id"]: h["score"] for h in base["data"]}
        s1 = {h["doc_id"]: h["score"] for h in boosted["data"]}
        # doc 0: matched element rank 1 → ×1; doc 1: matched element rank 4
        # → ×4. The UNMATCHED sibling (rank 9) must NOT apply.
        assert s1[0] == float(_F32(_F32(s0[0]) * _F32(1.0)))
        assert s1[1] == float(_F32(_F32(s0[1]) * _F32(4.0)))

    def test_log10_relative_field(self, deep_index):
        # test_scores.rs:106-133 semantics (Log10, param 10): factor is
        # log10(rank + 10) of the matched sibling element
        from veloci_spark.search import search

        base = search(deep_index, {
            "search": {"terms": ["awesome"], "path": "field1[].text"},
            "top": 10})
        boosted = search(deep_index, {
            "search": {"terms": ["awesome"], "path": "field1[].text"},
            "boost": [{"path": "field1[].rank", "boost_fun": "Log10",
                       "param": 10}],
            "top": 10})
        s0 = {h["doc_id"]: h["score"] for h in base["data"]}
        s1 = {h["doc_id"]: h["score"] for h in boosted["data"]}
        want0 = _F32(_F32(s0[0]) * np.log10(_F32(1.0) + _F32(10.0), dtype=_F32))
        want1 = _F32(_F32(s0[1]) * np.log10(_F32(4.0) + _F32(10.0), dtype=_F32))
        assert s1[0] == float(want0)
        assert s1[1] == float(want1)

    def test_add_and_multiply_anchor_value_from_field(self, deep_index):
        # test_scores.rs:135-199 — flat commonness boost on a nested search:
        # boosted == unboosted + v (Add) and × v (Multiply), exact f32
        from veloci_spark.search import search

        req = {"search": {"terms": ["weich"], "path": "meanings.ger[].text"},
               "top": 10}
        base = search(deep_index, req)
        assert [h["doc_id"] for h in base["data"]] == [2]
        s0 = _F32(base["data"][0]["score"])

        added = search(deep_index, {
            **req, "boost": [{"path": "commonness", "boost_fun": "Add"}]})
        assert added["data"][0]["score"] == float(_F32(s0 + _F32(2.0)))

        mult = search(deep_index, {
            **req, "boost": [{"path": "commonness", "boost_fun": "Multiply"}]})
        assert mult["data"][0]["score"] == float(_F32(s0 * _F32(2.0)))
