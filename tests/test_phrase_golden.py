"""Phrase-boost goldens ported from the reference's dedicated battery
(/root/reference/tests/all/test_phrase.rs) on its exact 5-doc corpus:
phrase boost on flat and 1:n fields, multifield and AND shapes, the query
generator path, and multi-phrase multiplication preferring in-text
adjacency over cross-text hits.
"""

import pytest
from pyspark.sql import types as T


def phrase_rows():
    # test_phrase.rs:8-28 get_test_data
    return [
        {"doc_id": 0, "title": "die erbin"},
        {"doc_id": 1, "title": "erbin", "tags": ["die", "erbin"]},
        {"doc_id": 2, "tags": ["greg tagebuch 05"]},
        {"doc_id": 3, "tags": ["greg tagebuch", "05"]},
        {"doc_id": 4, "title": "greg tagebuch", "tags": ["greg tagebuch", "05"]},
    ]


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("title", T.StringType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
])


@pytest.fixture(scope="session")
def ph_index(spark, tmp_path_factory):
    from veloci_spark.build import build_index
    from veloci_spark.config import FieldConfig, IndexConfig
    from veloci_spark.search import FulltextIndex

    d = str(tmp_path_factory.mktemp("phidx"))
    docs = spark.createDataFrame(phrase_rows(), schema=_SCHEMA)
    cfg = IndexConfig(fields=(FieldConfig("title"), FieldConfig("tags[]")),
                      doc_id_col="doc_id", segment_docs=2)
    build_index(spark, docs, cfg, d)
    return FulltextIndex(spark, d).cache()


def _top_doc(index, res, cols):
    from veloci_spark.search import get_docs

    return get_docs(index, [res["data"][0]["doc_id"]], cols)[0]


class TestPhraseBoost:
    def test_should_boost_phrase(self, ph_index):
        # test_phrase.rs:39-52
        from veloci_spark.search import search

        res = search(ph_index, {
            "search_req": {"search": {"terms": ["erbin"], "path": "title"}},
            "phrase_boosts": [{"path": "title",
                               "search1": {"terms": ["die"], "path": "title"},
                               "search2": {"terms": ["erbin"],
                                           "path": "title"}}]})
        assert _top_doc(ph_index, res, ["title"])["title"] == "die erbin"

    def test_should_boost_phrase_search_multifield(self, ph_index):
        # test_phrase.rs:54-79
        from veloci_spark.search import search

        res = search(ph_index, {
            "search_req": {"or": [
                {"search": {"terms": ["die"], "path": "title"}},
                {"search": {"terms": ["erbin"], "path": "title"}},
                {"search": {"terms": ["die"], "path": "tags[]"}},
                {"search": {"terms": ["erbin"], "path": "tags[]"}}]},
            "phrase_boosts": [
                {"path": "title",
                 "search1": {"terms": ["die"], "path": "title"},
                 "search2": {"terms": ["erbin"], "path": "title"}},
                {"path": "tags[]",
                 "search1": {"terms": ["die"], "path": "tags[]"},
                 "search2": {"terms": ["erbin"], "path": "tags[]"}}]})
        assert _top_doc(ph_index, res, ["title"])["title"] == "die erbin"

    def test_should_and_boost_phrase_search(self, ph_index):
        # test_phrase.rs:81-99
        from veloci_spark.search import search

        res = search(ph_index, {
            "search_req": {"and": [
                {"search": {"terms": ["die"], "path": "title"}},
                {"search": {"terms": ["erbin"], "path": "title"}}]},
            "phrase_boosts": [{"path": "title",
                               "search1": {"terms": ["die"], "path": "title"},
                               "search2": {"terms": ["erbin"],
                                           "path": "title"}}]})
        assert _top_doc(ph_index, res, ["title"])["title"] == "die erbin"

    def test_query_generator_phrase_shapes(self, ph_index):
        # test_phrase.rs:101-128 — "die AND erbin" and "die erbin" through
        # the generator with phrase_pairs (the reference generator keeps
        # stopwords by default)
        from veloci_spark.query import search_query

        for q in ["die AND erbin", "die erbin"]:
            res = search_query(ph_index, q, remove_stopwords=False)
            assert _top_doc(ph_index, res, ["title"])["title"] == "die erbin", q


class TestMultiPhrase:
    OR_TREE = {"or": [
        {"search": {"terms": ["greg"], "path": "tags[]"}},
        {"search": {"terms": ["tagebuch"], "path": "tags[]"}},
        {"search": {"terms": ["05"], "path": "tags[]"}}]}
    AND_TREE = {"and": [
        {"search": {"terms": ["greg"], "path": "tags[]"}},
        {"search": {"terms": ["tagebuch"], "path": "tags[]"}},
        {"search": {"terms": ["05"], "path": "tags[]"}}]}
    PB_GT = {"path": "tags[]",
             "search1": {"terms": ["greg"], "path": "tags[]"},
             "search2": {"terms": ["tagebuch"], "path": "tags[]"}}
    PB_T5 = {"path": "tags[]",
             "search1": {"terms": ["tagebuch"], "path": "tags[]"},
             "search2": {"terms": ["05"], "path": "tags[]"}}

    def test_double_boost_from_multiphrases(self, ph_index):
        # test_phrase.rs:130-177 — one phrase boosts the split-text doc to
        # the top; BOTH phrases prefer the single-text adjacency doc
        from veloci_spark.search import search

        res = search(ph_index, {"search_req": self.OR_TREE,
                                "phrase_boosts": [self.PB_GT]})
        top = _top_doc(ph_index, res, ["tags"])
        assert top["tags"] == ["greg tagebuch", "05"]

        res = search(ph_index, {"search_req": self.OR_TREE,
                                "phrase_boosts": [self.PB_GT, self.PB_T5]})
        top = _top_doc(ph_index, res, ["tags"])
        assert top["tags"] == ["greg tagebuch 05"]

    def test_double_boost_multiphrases_and_searchterms(self, ph_index):
        # test_phrase.rs:179-219 — same preference under AND
        from veloci_spark.search import search

        res = search(ph_index, {"search_req": self.AND_TREE,
                                "phrase_boosts": [self.PB_GT]})
        assert _top_doc(ph_index, res, ["tags"])["tags"][0] == "greg tagebuch"

        res = search(ph_index, {"search_req": self.AND_TREE,
                                "phrase_boosts": [self.PB_GT, self.PB_T5]})
        assert _top_doc(ph_index, res, ["tags"])["tags"][0] \
            == "greg tagebuch 05"
