"""Score-ranking goldens from /root/reference/tests/all/test_scores.rs on
its own 6-doc corpus (the docs with mixed string/object ``meanings.ger[]``
are modeled uniformly as ``meanings.ger[].text`` — the reference indexes
whichever path shapes occur; the ranking semantics under test are
path-shape independent).
"""

import pytest
from pyspark.sql import types as T


def score_rows():
    # test_scores.rs:6-37 get_test_data
    return [
        {"doc_id": 0, "title": "greg tagebuch 05"},
        {"doc_id": 1, "title": "and some some text 05 this is not relevant "
                               "let tagebuch greg"},
        {"doc_id": 2, "title": "greg tagebuch"},
        {"doc_id": 3, "commonness": 41,
         "meanings": {"ger": [{"text": "Fernsehen-Schauen (n)", "boost": 20}]}},
        {"doc_id": 4, "commonness": 551,
         "meanings": {"ger": [{"text": "welch"}]}},
        {"doc_id": 5, "commonness": 2,
         "meanings": {"ger": [{"text": "weich"}]}},
    ]


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("title", T.StringType()),
    T.StructField("commonness", T.LongType()),
    T.StructField("meanings", T.StructType([
        T.StructField("ger", T.ArrayType(T.StructType([
            T.StructField("text", T.StringType()),
            T.StructField("boost", T.LongType())])))])),
])


@pytest.fixture(scope="session")
def sc_index(spark, tmp_path_factory):
    from veloci_spark.build import build_index
    from veloci_spark.config import FieldConfig, IndexConfig
    from veloci_spark.search import FulltextIndex

    d = str(tmp_path_factory.mktemp("scidx"))
    docs = spark.createDataFrame(score_rows(), schema=_SCHEMA)
    boost = dict(tokenize=False, phrase_pairs=False, token_texts=False)
    cfg = IndexConfig(
        fields=(FieldConfig("title"),
                FieldConfig("meanings.ger[].text"),
                FieldConfig("meanings.ger[].boost", **boost),
                FieldConfig("commonness", **boost)),
        doc_id_col="doc_id", segment_docs=2)
    build_index(spark, docs, cfg, d)
    return FulltextIndex(spark, d).cache()


def test_check_score_regarding_to_length(sc_index):
    # test_scores.rs:57-76 — 3 tokens + phrase > 2 tokens + phrase >
    # 3 tokens without the phrase (longer text scores lower per token)
    from veloci_spark.search import search

    res = search(sc_index, {
        "search_req": {"or": [
            {"search": {"terms": ["greg"], "path": "title"}},
            {"search": {"terms": ["tagebuch"], "path": "title"}},
            {"search": {"terms": ["05"], "path": "title"}}]},
        "phrase_boosts": [{"path": "title",
                           "search1": {"terms": ["greg"], "path": "title"},
                           "search2": {"terms": ["tagebuch"],
                                       "path": "title"}}]})
    assert [h["doc_id"] for h in res["data"]] == [0, 2, 1]


def test_should_rank_exact_matches_pretty_good(sc_index):
    # test_scores.rs:189-208 — fuzzy "weich" hits "welch" (commonness 551,
    # Log2 boost ≈ ×9.1) and exact "weich" (commonness 2, boost ×2): the
    # EXACT text match still outranks the heavily boosted fuzzy hit
    from veloci_spark.search import search, select_docs

    res = search(sc_index, {
        "search_req": {"search": {"terms": ["weich"],
                                  "path": "meanings.ger[].text",
                                  "levenshtein_distance": 1}},
        "boost": [{"path": "commonness", "boost_fun": "Log2", "param": 2}]})
    top = res["data"][0]["doc_id"]
    sel = select_docs(sc_index, [top], ["meanings.ger[].text"])
    assert sel[top]["meanings.ger[].text"] == ["weich"]
