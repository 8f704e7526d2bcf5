"""Golden rankings ported from the reference's own JMDict-style corpus
(/root/reference/tests/all/tests.rs get_test_data, :45-241) — the main
end-to-end battery the reference gates on. Each test cites the reference
test function it reproduces; assertions are on the same observable
(hit count, winning document's content) against the same 16-doc corpus.
"""

import numpy as np
import pytest
from pyspark.sql import types as T

_F32 = np.float32


def jmdict_rows():
    # /root/reference/tests/all/tests.rs:45-241 — doc order = doc_id
    return [
        {"doc_id": 0, "ignore_field": "", "commonness": 123456,
         "ent_seq": "99999", "tags": ["nice", "cool"]},
        {"doc_id": 1, "nofulltext": "my tokens", "commonness": 20,
         "tags": ["nice", "cool"],
         "kanji": [{"text": "偉容", "commonness": 0},
                   {"text": "威容", "commonness": 5}],
         "kana": [{"text": "いよう", "romaji": "Iyou", "commonness": 5}],
         "meanings": {"eng": ["karlo", "dignity", "majestic appearance",
                              "will testo"],
                      "ger": ["majestätischer Anblick (m)",
                              "majestätisches Aussehen (n)", "Majestät (f)"]},
         "ent_seq": "1587680"},
        {"doc_id": 2, "commonness": 20, "tags": ["nice"],
         "kanji": [{"text": "意欲", "commonness": 40},
                   {"text": "意慾", "commonness": 0}],
         "kana": [{"text": "いよく", "romaji": "Iyoku", "commonness": 40}],
         "meanings": {"eng": ["will", "urge", "having a long torso"],
                      "ger": ["Wollen (n)", "Wille (m)", "Begeisterung (f)",
                              "begeistern"]},
         "ent_seq": "1587690"},
        {"doc_id": 3, "meanings": {"eng": ["karl der große"]}},
        {"doc_id": 4, "id": 1234566, "gender": "male",
         "tags": ["awesome", "cool"], "commonness": 500,
         "kanji": [{"text": "意慾", "commonness": 20}],
         "field1": [{"text": "awesome", "rank": 1}],
         "kana": [{"text": "いよく"}],
         "meanings": {"eng": ["test1"],
                      "ger": ["der test", "das ist ein guter Treffer"]},
         "ent_seq": "1587700"},
        {"doc_id": 5, "id": 123456, "tags": ["nice", "cool"],
         "gender": "female", "commonness": 551,
         "kanji": [{"text": "何の", "commonness": 526}],
         "field1": [{"text": "awesome"}, {"text": "nixhit"}],
         "kana": [{"text": "どの", "romaji": "Dono", "commonness": 25}],
         "meanings": {"ger": ["welch", "guter nicht Treffer",
                              "alle meine Words", "text", "localität"]},
         "ent_seq": "1920240",
         "mylongtext": "Prolog:\nthis is a story of a guy who went out to "
                       "rule the world, but then died. the end"},
        {"doc_id": 6, "commonness": 1,
         "tags": ["nice", "cool"],
         "kanji": [{"text": "柔らかい", "commonness": 57}],
         "kana": [{"text": "やわらかい", "romaji": "Yawarakai",
                   "commonness": 30}],
         "meanings": {"ger": ["(1) weich", "stopword"]},
         "ent_seq": "1605630"},
        {"doc_id": 7, "meanings": {"ger": ["(1) 2 3 super nice weich"]},
         "ent_seq": "9555"},
        {"doc_id": 8, "meanings": {"ger": ["text localität",
                                           "alle meine Words"]},
         "ent_seq": "1000"},
        {"doc_id": 9, "commonness": 515151, "ent_seq": "25",
         "tags": ["nice", "cool"]},
        {"doc_id": 10, "title": "Die Erbin die Sünde", "type": "taschenbuch"},
        {"doc_id": 11, "title": "Die Erbin", "type": "taschenbuch"},
        {"doc_id": 12, "commonness": 30, "title": "COllectif",
         "meanings": {"ger": ["boostemich"]}},
        {"doc_id": 13, "commonness": 30, "float_value": 5.123,
         "ent_seq": "26", "tags": ["nice", "coolo"]},
        {"doc_id": 14, "commonness": 20, "ent_seq": "27", "my_bool": True,
         "tags": ["Eis", "cool"]},
        {"doc_id": 15, "commonness": 20, "ent_seq": "28",
         "tags": ["nice", "cool"]},
    ]


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("id", T.LongType()),
    T.StructField("ignore_field", T.StringType()),
    T.StructField("commonness", T.LongType()),
    T.StructField("ent_seq", T.StringType()),
    T.StructField("nofulltext", T.StringType()),
    T.StructField("gender", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("mylongtext", T.StringType()),
    T.StructField("float_value", T.DoubleType()),
    T.StructField("my_bool", T.BooleanType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("kanji", T.ArrayType(T.StructType([
        T.StructField("text", T.StringType()),
        T.StructField("commonness", T.LongType())]))),
    T.StructField("kana", T.ArrayType(T.StructType([
        T.StructField("text", T.StringType()),
        T.StructField("romaji", T.StringType()),
        T.StructField("commonness", T.LongType())]))),
    T.StructField("field1", T.ArrayType(T.StructType([
        T.StructField("text", T.StringType()),
        T.StructField("rank", T.LongType())]))),
    T.StructField("meanings", T.StructType([
        T.StructField("eng", T.ArrayType(T.StringType())),
        T.StructField("ger", T.ArrayType(T.StringType()))])),
])


@pytest.fixture(scope="session")
def jm_index(spark, tmp_path_factory):
    from veloci_spark.build import build_index
    from veloci_spark.config import FieldConfig, IndexConfig
    from veloci_spark.search import FulltextIndex

    d = str(tmp_path_factory.mktemp("jmidx"))
    docs = spark.createDataFrame(jmdict_rows(), schema=_SCHEMA)
    boost = dict(tokenize=False, phrase_pairs=False, token_texts=False)
    cfg = IndexConfig(
        fields=(FieldConfig("ent_seq"),
                FieldConfig("nofulltext", tokenize=False),
                FieldConfig("title"),
                FieldConfig("type"),
                FieldConfig("mylongtext"),
                FieldConfig("tags[]"),
                FieldConfig("kanji[].text"),
                FieldConfig("kana[].text"),
                FieldConfig("kana[].romaji"),
                FieldConfig("meanings.eng[]"),
                FieldConfig("meanings.ger[]"),
                FieldConfig("field1[].text"),
                FieldConfig("field1[].rank", **boost),
                FieldConfig("kanji[].commonness", **boost),
                FieldConfig("commonness", **boost),
                # scalar non-string fields index as their text form
                # (reference json coercion; tests.rs test_float/test_bool)
                FieldConfig("float_value", tokenize=False,
                            phrase_pairs=False),
                FieldConfig("my_bool", tokenize=False, phrase_pairs=False)),
        doc_id_col="doc_id",
        segment_docs=6,  # multi-segment on 16 docs
    )
    # the reference fixture loads a token_values boost side input
    # (tests.rs:39-41: {"text": "Begeisterung", "value": 20} on
    # meanings.ger[])
    build_index(spark, docs, cfg, d,
                token_values={"meanings.ger[]": [("Begeisterung", 20.0)]})
    return FulltextIndex(spark, d).cache()


def _hit_docs(index, res, cols=None):
    from veloci_spark.search import get_docs

    ids = [h["doc_id"] for h in res["data"]]
    docs = {d["doc_id"]: d for d in get_docs(index, ids, cols)}
    return [docs[i] for i in ids]


class TestSimpleSearch:
    def test_simple_search(self, jm_index):
        # tests.rs:267-280 simple_search
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"terms": ["urge"],
                                           "path": "meanings.eng[]"}})
        assert res["num_hits"] == 1
        # tests.rs:283-293 return_execution_time
        assert res["execution_time_ms"] > 0
        doc = _hit_docs(jm_index, res, ["ent_seq", "commonness"])[0]
        assert doc["ent_seq"] == "1587690"
        assert doc["commonness"] == 20

    def test_simple_search_skip_far(self, jm_index):
        # tests.rs:311-325 simple_search_skip_far — skip past every hit
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"terms": ["urge"],
                                           "path": "meanings.eng[]"},
                                "skip": 1000})
        assert res["data"] == []
        assert res["num_hits"] == 1  # count is unaffected by paging

    def test_simple_search_case_sensitive(self, jm_index):
        # tests.rs:327-351 simple_search_case_sensitive — "Urge" matches
        # "urge" only while ignore_case holds (default true)
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"ignore_case": True,
                                           "terms": ["Urge"],
                                           "path": "meanings.eng[]"}})
        assert len(res["data"]) == 1
        res = search(jm_index, {"search": {"ignore_case": False,
                                           "terms": ["Urge"],
                                           "path": "meanings.eng[]"}})
        assert len(res["data"]) == 0
        # sensitive + exact-case still hits, with the exact-match score
        res = search(jm_index, {"search": {"ignore_case": False,
                                           "terms": ["urge"],
                                           "path": "meanings.eng[]"}})
        assert len(res["data"]) == 1
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1587690"

    def test_case_sensitive_matches_pyref(self, spark, tmp_path_factory):
        # differential: the engine's ignore_case=false path must score
        # bit-identically to the independent model on every match shape
        from veloci_spark import pyref
        from veloci_spark.build import build_index
        from veloci_spark.config import FieldConfig, IndexConfig
        from veloci_spark.search import FulltextIndex, search

        rows = [
            {"doc_id": 0, "text": "Wollen und Wille"},
            {"doc_id": 1, "text": "wollen wir wirklich"},
            {"doc_id": 2, "text": "WOLLEN Begeisterung"},
            {"doc_id": 3, "text": "begeisterung pur Majestät"},
            {"doc_id": 4, "text": "majestätisch Willen"},
        ]
        cfg = IndexConfig(fields=(FieldConfig("text"),), doc_id_col="doc_id",
                          segment_docs=2)
        d = str(tmp_path_factory.mktemp("caseidx"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        build_index(spark, docs, cfg, d)
        idx = FulltextIndex(spark, d)
        ref = pyref.RefIndex(rows, cfg)
        for req in (
            {"search": {"ignore_case": False, "terms": ["Wollen"],
                        "path": "text"}},
            {"search": {"ignore_case": False, "terms": ["wollen"],
                        "path": "text"}},
            {"search": {"ignore_case": False, "terms": ["Begeisterung"],
                        "path": "text", "levenshtein_distance": 1}},
            {"search": {"ignore_case": False, "terms": ["Wolle"],
                        "path": "text", "starts_with": True}},
            {"search": {"ignore_case": False, "terms": ["wolle"],
                        "path": "text", "starts_with": True,
                        "levenshtein_distance": 1}},
            # case-distinct sensitive legs must stay distinct OR tags
            {"or": [{"search": {"ignore_case": False, "terms": ["Wille"],
                                "path": "text"}},
                    {"search": {"terms": ["wille"], "path": "text"}}]},
            # case-variant terms of ONE sensitive leaf must stay distinct
            # LEAVES too: the plan-dedup key folded them (fuzz-caught),
            # silently dropping the variant that matches the corpus
            {"search": {"ignore_case": False, "terms": ["Wollen", "wollen"],
                        "path": "text"}},
            {"search": {"ignore_case": False, "terms": ["PUR", "pur"],
                        "path": "text"}, "skip": 0},
        ):
            got = search(idx, {**req, "top": 20})
            want = pyref.search_request(ref, {**req, "top": 20})
            assert [(h["doc_id"], h["score"]) for h in got["data"]] == \
                [(d_, float(s)) for d_, s in want], req
        # sanity on the fixture: sensitivity actually changes the hit set
        sens = search(idx, {"search": {"ignore_case": False,
                                       "terms": ["wollen"], "path": "text"}})
        folded = search(idx, {"search": {"terms": ["wollen"],
                                         "path": "text"}})
        assert sens["num_hits"] == 1 and folded["num_hits"] == 3

    def test_select_fields(self, jm_index):
        # tests.rs:441-456 select_fields
        from veloci_spark.search import search, select_docs

        res = search(jm_index, {"search": {"terms": ["urge"],
                                           "path": "meanings.eng[]"}})
        assert res["num_hits"] == 1
        sel = select_docs(jm_index, [res["data"][0]["doc_id"]],
                          ["ent_seq", "tags[]"])
        out = sel[res["data"][0]["doc_id"]]
        assert out["ent_seq"] == "1587690"
        assert out["tags[]"] == ["nice"]
        assert "commonness" not in out  # didn't select

    def test_two_tokens_to_same_anchor(self, jm_index):
        # tests.rs:458-471 two_tokens_h_test_fn_the_same_anchor
        from veloci_spark.search import search

        res = search(jm_index, {"search": {
            "terms": ["majestätischer"], "path": "meanings.ger[]",
            "levenshtein_distance": 1}})
        assert res["num_hits"] == 1
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1587680"

    def test_search_without_first_char_exact_match(self, jm_index):
        # tests.rs:489-501
        from veloci_spark.search import search

        res = search(jm_index, {"search": {
            "terms": ["najestätischer"], "path": "meanings.ger[]",
            "levenshtein_distance": 1}})
        assert res["num_hits"] == 1
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1587680"

    def test_search_word_non_tokenized(self, jm_index):
        # tests.rs:541-553 (偉容 appears in one doc only)
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"terms": ["偉容"],
                                           "path": "kanji[].text"}})
        assert res["num_hits"] == 1
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1587680"

    def test_disabled_tokenization(self, jm_index):
        # tests.rs:555-566 — "tokens" must not match inside untokenized
        # "my tokens"
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"terms": ["tokens"],
                                           "path": "nofulltext"}})
        assert res["num_hits"] == 0
        # the whole text still matches exactly
        res = search(jm_index, {"search": {"terms": ["my tokens"],
                                           "path": "nofulltext"}})
        assert res["num_hits"] == 1

    def test_search_on_non_subobject(self, jm_index):
        # tests.rs:568-579
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"terms": ["1587690"],
                                           "path": "ent_seq"}})
        assert res["num_hits"] == 1

    def test_float(self, jm_index):
        # tests.rs:397-409 — a float column is searchable by its text form
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"terms": ["5.123"],
                                           "path": "float_value"}})
        assert res["num_hits"] == 1
        doc = _hit_docs(jm_index, res, ["float_value"])[0]
        assert doc["float_value"] == 5.123

    def test_bool(self, jm_index):
        # tests.rs:411-423
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"terms": ["true"],
                                           "path": "my_bool"}})
        assert res["num_hits"] == 1
        doc = _hit_docs(jm_index, res, ["my_bool"])[0]
        assert doc["my_bool"] is True

    def test_invalid_field_errors(self, jm_index):
        # tests.rs:426-439 should_return_an_error_when_trying_to_query_an_
        # invalid_field
        from veloci_spark.search import search

        with pytest.raises((KeyError, ValueError)):
            search(jm_index, {"search": {"terms": ["test"],
                                         "path": "notexisting"}})


class TestRankingPreferences:
    def test_prefer_exact_matches_to_tokenmatches(self, jm_index):
        # tests.rs:503-514 — doc whose text IS "will" beats the doc with
        # token "will" inside "will testo"
        from veloci_spark.search import search

        res = search(jm_index, {"search": {
            "terms": ["will"], "path": "meanings.eng[]",
            "levenshtein_distance": 1}})
        top = _hit_docs(jm_index, res, ["meanings"])[0]
        assert top["meanings"]["eng"][0] == "will"

    def test_prefer_exact_tokenmatches_to_fuzzy_text_hits(self, jm_index):
        # tests.rs:516-529 — token-exact "karl" (in "karl der große")
        # beats fuzzy text "karlo"
        from veloci_spark.search import search

        res = search(jm_index, {"search": {
            "terms": ["karl"], "path": "meanings.eng[]",
            "levenshtein_distance": 1}})
        top = _hit_docs(jm_index, res, ["meanings"])[0]
        assert top["meanings"]["eng"][0] == "karl der große"

    def test_prefer_short_results(self, jm_index):
        # tests.rs:531-540 — query generator with phrase_pairs on
        # "die erbin taschenbuch": the shorter title "Die Erbin" wins.
        # The reference generator does not strip stopwords by default
        # (query_generator.rs:175-245 — opt.stopwords defaults None).
        from veloci_spark.query import search_query

        res = search_query(jm_index, "die erbin taschenbuch",
                           remove_stopwords=False)
        top = _hit_docs(jm_index, res, ["title"])[0]
        assert top["title"] == "Die Erbin"


class TestConnectives:
    def test_and_connect_hits_same_field(self, jm_index):
        # tests.rs:581-593
        from veloci_spark.search import search

        res = search(jm_index, {"and": [
            {"search": {"terms": ["aussehen"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["majestätisches"],
                        "path": "meanings.ger[]"}}]})
        assert res["num_hits"] == 1
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1587680"

    def test_and_connect_hits_different_fields(self, jm_index):
        # tests.rs:595-608
        from veloci_spark.search import search

        res = search(jm_index, {"and": [
            {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["majestic"], "path": "meanings.eng[]"}}]})
        assert res["num_hits"] == 1
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1587680"

    def test_and_connect_different_fields_no_hit(self, jm_index):
        # tests.rs:610-628
        from veloci_spark.search import search

        res = search(jm_index, {"and": [
            {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}]})
        assert res["num_hits"] == 0

    def test_and_same_text_in_different_docs(self, jm_index):
        # tests.rs:630-649 — "words" appears in docs 5 and 8; AND with
        # ent_seq 1000 isolates doc 8
        from veloci_spark.search import search

        res = search(jm_index, {"and": [
            {"search": {"terms": ["words"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["1000"], "path": "ent_seq"}}]})
        assert res["num_hits"] == 1
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1000"

    def test_or_connect_hits(self, jm_index):
        # tests.rs:673-690 — "urge" doc wins over "majestät" doc
        from veloci_spark.search import search

        res = search(jm_index, {"or": [
            {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}]})
        assert res["num_hits"] == 2
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1587690"

    def test_or_connect_hits_with_top(self, jm_index):
        # tests.rs:652-671
        from veloci_spark.search import search

        res = search(jm_index, {"search_req": {"or": [
            {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}]},
            "top": 1})
        assert len(res["data"]) == 1
        assert _hit_docs(jm_index, res, ["ent_seq"])[0]["ent_seq"] == "1587690"

    def test_search_with_filter(self, jm_index):
        # tests.rs:692-709
        from veloci_spark.search import search

        res = search(jm_index, {
            "search_req": {"search": {"terms": ["urge"],
                                      "path": "meanings.eng[]"}},
            "filter": {"search": {"terms": ["1587690"], "path": "ent_seq"}}})
        assert res["num_hits"] == 1

    def test_or_with_filter(self, jm_index):
        # tests.rs:711-737
        from veloci_spark.search import search

        res = search(jm_index, {
            "search_req": {"or": [
                {"search": {"terms": ["majestät"],
                            "path": "meanings.ger[]"}},
                {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}]},
            "filter": {"search": {"terms": ["1587690"], "path": "ent_seq"}}})
        assert res["num_hits"] == 1

    def test_or_with_filter_reusing_query(self, jm_index):
        # tests.rs:739-761 — the filter subtree duplicates an OR leg; plan
        # dedup must still evaluate it once and filter correctly
        from veloci_spark.search import search

        res = search(jm_index, {
            "search_req": {"or": [
                {"search": {"terms": ["majestät"],
                            "path": "meanings.ger[]"}},
                {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}]},
            "filter": {"search": {"terms": ["urge"],
                                  "path": "meanings.eng[]"}}})
        assert res["num_hits"] == 1


class TestBoosts:
    def test_find_2_values_from_token(self, jm_index):
        # tests.rs:767-780 — 意慾 is a kanji[].text value in docs 2 and 4
        from veloci_spark.search import search

        res = search(jm_index, {"search": {"terms": ["意慾"],
                                           "path": "kanji[].text"}})
        assert res["num_hits"] == 2

    def test_search_and_boosto(self, jm_index):
        # tests.rs:782-797 — sibling-subfield Log10 boost keeps both hits
        from veloci_spark.search import search

        res = search(jm_index, {
            "search_req": {"search": {"terms": ["意慾"],
                                      "path": "kanji[].text"}},
            "boost": [{"path": "kanji[].commonness", "boost_fun": "Log10",
                       "param": 1}]})
        assert res["num_hits"] == 2

    def test_search_and_double_boost(self, jm_index):
        # tests.rs:799-819 — anchor Log10 boost + expression boost with
        # skip_when_score
        from veloci_spark.search import search

        res = search(jm_index, {
            "search_req": {"search": {"terms": ["awesome"],
                                      "path": "field1[].text"}},
            "boost": [
                {"path": "commonness", "boost_fun": "Log10", "param": 1},
                {"path": "field1[].rank", "expression": "10 / $SCORE",
                 "skip_when_score": [0]}]})
        assert res["num_hits"] == 2

    def test_search_and_boost_anchor(self, jm_index):
        # tests.rs:821-839 — winner is the commonness-500 doc
        from veloci_spark.search import search

        res = search(jm_index, {
            "search_req": {"search": {"terms": ["意慾"],
                                      "path": "kanji[].text",
                                      "levenshtein_distance": 0}},
            "boost": [{"path": "commonness", "boost_fun": "Log10",
                       "param": 1}]})
        top = _hit_docs(jm_index, res, ["commonness"])[0]
        assert top["commonness"] == 500


class TestPerLegBoost:
    def test_or_connect_search_and_boost_anchor(self, jm_index):
        # tests.rs:841-871 should_or_connect_search_and_boost_anchor —
        # each OR leg carries its own options.boost (leg 1: sibling
        # field1[].rank, leg 2: anchor commonness); winner is the
        # commonness-20 doc ("urge", boosted by its anchor commonness)
        from veloci_spark.search import search

        res = search(jm_index, {"or": [
            {"search": {"terms": ["awesome"], "path": "field1[].text",
                        "options": {"boost": [
                            {"path": "field1[].rank", "boost_fun": "Log10",
                             "param": 1}]}}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]",
                        "options": {"boost": [
                            {"path": "commonness", "boost_fun": "Log10",
                             "param": 1}]}}}]})
        top = _hit_docs(jm_index, res, ["commonness"])[0]
        assert top["commonness"] == 20

    def test_or_connect_same_search(self, jm_index):
        # tests.rs:873-900 should_or_connect_same_search — the duplicated
        # leg dedups to one plan leaf; winner is the commonness-551 doc
        # (equal scores break (score DESC, doc_id DESC))
        from veloci_spark.search import search

        res = search(jm_index, {"or": [
            {"search": {"terms": ["awesome"], "path": "field1[].text"}},
            {"search": {"terms": ["awesome"], "path": "field1[].text"}}]})
        assert res["num_hits"] == 2
        top = _hit_docs(jm_index, res, ["commonness"])[0]
        assert top["commonness"] == 551

    def test_per_leg_boost_matches_pyref(self, spark, tmp_path_factory):
        # differential: composed per-leg evaluation vs the independent
        # Python model, exact f32 equality on every rank + score
        from veloci_spark import pyref
        from veloci_spark.build import build_index
        from veloci_spark.config import FieldConfig, IndexConfig
        from veloci_spark.search import FulltextIndex, search

        rows = [
            {"doc_id": 0, "text": "red apple pie", "rank_": 3},
            {"doc_id": 1, "text": "green apple", "rank_": 40},
            {"doc_id": 2, "text": "apple apple orchard", "rank_": 0},
            {"doc_id": 3, "text": "orchard of pears", "rank_": 7},
            {"doc_id": 4, "text": "pears and apples", "rank_": None},
        ]
        cfg = IndexConfig(fields=(FieldConfig("text"),), doc_id_col="doc_id",
                          segment_docs=2)
        d = str(tmp_path_factory.mktemp("leggidx"))
        docs = spark.createDataFrame(rows, "doc_id long, text string, rank_ long")
        build_index(spark, docs, cfg, d)
        idx = FulltextIndex(spark, d)
        ref = pyref.RefIndex(rows, cfg)
        for req in [
            {"or": [{"search": {"terms": ["apple"], "path": "text",
                                "options": {"boost": [
                                    {"path": "rank_", "boost_fun": "Log10",
                                     "param": 1}]}}},
                    {"search": {"terms": ["orchard"], "path": "text"}}],
             "top": 10},
            {"and": [{"search": {"terms": ["apple"], "path": "text",
                                 "boost": [{"path": "rank_",
                                            "boost_fun": "Multiply"}]}},
                     {"search": {"terms": ["orchard"], "path": "text"}}],
             "top": 10},
            {"search": {"terms": ["pears"], "path": "text",
                        "options": {"boost": [
                            {"path": "rank_", "boost_fun": "Add"}]}},
             "top": 10},
        ]:
            got = search(idx, {**req, "explain_hits": True})
            want = pyref.search_request(ref, req)
            assert [h["doc_id"] for h in got["data"]] == [d_ for d_, _ in want]
            for h, (_d, s) in zip(got["data"], want):
                assert np.float32(h["score"]) == np.float32(s), req
                # explain derives the composed per-leg boost path too
                # (flat columns; nested sibling-subfield boosts still refuse)
                steps = h["explain"]
                assert np.float32(steps[-1]["score"]) == np.float32(h["score"]), (
                    req, steps)
            # at least one hit per request matched a boosted leg
            assert any(st["step"] == "leg_boost"
                       for h in got["data"] for st in h["explain"]), req

    def test_explain_derives_nested_per_leg_boost(self, jm_index):
        # r5: explain re-derives the nested sibling-subfield per-leg boost
        # (field1[].rank boosting the field1[].text leg) via the same
        # position joins _apply_value_boost runs — steps[-1].score must
        # equal the engine's score exactly, with a leg_boost step naming
        # the sibling path on boosted hits (tests.rs:841-871 leg 1 shape)
        from veloci_spark.search import search

        res = search(jm_index, {"or": [
            {"search": {"terms": ["awesome"], "path": "field1[].text",
                        "options": {"boost": [
                            {"path": "field1[].rank", "boost_fun": "Log10",
                             "param": 1}]}}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]",
                        "options": {"boost": [
                            {"path": "commonness", "boost_fun": "Log10",
                             "param": 1}]}}}],
            "explain_hits": True})
        assert res["num_hits"] >= 2
        paths = set()
        for h in res["data"]:
            steps = h["explain"]
            assert np.float32(steps[-1]["score"]) == np.float32(h["score"]), (
                h["doc_id"], steps)
            paths |= {st["path"] for st in steps if st["step"] == "leg_boost"}
        assert "field1[].rank" in paths  # the nested sibling boost fired
        assert "commonness" in paths  # and the flat anchor boost

    def test_explain_scalar_before_field_boost(self, jm_index):
        # pyref leaf order (pyref.py:321-324): scalar leg boost applies
        # BEFORE options.boost specs; the composed path runs the scalar in
        # the leg kernel. Log10(v+1) does not commute with ×2, so a wrong
        # order breaks the exact-equality invariant checked here.
        from veloci_spark.search import search

        res = search(jm_index, {"search": {
            "terms": ["urge"], "path": "meanings.eng[]", "boost": 2.0,
            "options": {"boost": [{"path": "commonness",
                                   "boost_fun": "Log10", "param": 1}]}},
            "explain_hits": True})
        assert res["data"], res
        for h in res["data"]:
            steps = h["explain"]
            assert np.float32(steps[-1]["score"]) == np.float32(h["score"]), (
                h["doc_id"], steps)
            kinds = [st["step"] for st in steps]
            assert kinds.index("boost") < kinds.index("leg_boost"), kinds


class TestComposedExtrasEquivalence:
    """Per-leg options.boost now composes with every request extra (filter /
    phrase / term boost / text locality — r5). Certification on the NESTED
    jm corpus (where the flat pyref model can't follow): `expression:
    "$SCORE"` is an exact no-op boost (eval_boost_expression returns the
    score unchanged, NaN values included), so injecting it into one leg
    must leave every rank, score, and num_hits bit-identical while forcing
    the whole request through the composed path."""

    NOOP = {"options": {"boost": [{"path": "commonness",
                                   "expression": "$SCORE"}]}}

    def _pairs(self, res):
        return ([(h["doc_id"], np.float32(h["score"])) for h in res["data"]],
                res["num_hits"])

    def test_noop_leg_boost_with_nested_locality(self, jm_index):
        # composed + text_locality over NESTED leaves → the post-combine
        # locality pass (per-VALUE grouping), same as the main path's
        # post-kernel move
        from veloci_spark.search import search

        base = {"search_req": {"or": [
            {"search": {"terms": ["text"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["localität"], "path": "meanings.ger[]"}}]},
            "text_locality": True}
        plain = search(jm_index, base)
        composed = search(jm_index, {"search_req": {"or": [
            {"search": {"terms": ["text"], "path": "meanings.ger[]",
                        **self.NOOP}},
            {"search": {"terms": ["localität"], "path": "meanings.ger[]"}}]},
            "text_locality": True})
        assert self._pairs(composed) == self._pairs(plain)

    def test_noop_leg_boost_with_filter(self, jm_index):
        # tests.rs:739-761 shape: the filter subtree reuses an OR leg
        from veloci_spark.search import search

        base = {"or": [
            {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}],
            "filter": {"search": {"terms": ["urge"],
                                  "path": "meanings.eng[]"}}}
        plain = search(jm_index, base)
        composed = search(jm_index, {"or": [
            {"search": {"terms": ["majestät"], "path": "meanings.ger[]",
                        **self.NOOP}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}],
            "filter": {"search": {"terms": ["urge"],
                                  "path": "meanings.eng[]"}}})
        assert self._pairs(composed) == self._pairs(plain)
        assert plain["num_hits"] >= 1

    def test_noop_leg_boost_with_term_boost(self, jm_index):
        from veloci_spark.search import search

        base = {"or": [
            {"search": {"terms": ["majestät"], "path": "meanings.ger[]"}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}],
            "boost_term": [{"path": "meanings.eng[]", "boost": 2.0,
                            "terms": ["urge"]}]}
        plain = search(jm_index, base)
        composed = search(jm_index, {**base, "or": [
            {"search": {"terms": ["majestät"], "path": "meanings.ger[]",
                        **self.NOOP}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}]})
        assert self._pairs(composed) == self._pairs(plain)


class TestBoostRanking:
    def test_rank_boost_on_anchor_higher_search_on_anchor(self, jm_index):
        # tests.rs:1102-1126 — Log2(commonness + 2) boost raises the score
        from veloci_spark.search import search

        req = {"search": {"terms": ["COllectif"], "path": "title"}}
        unboosted = search(jm_index, req)
        boosted = search(jm_index, {
            "search_req": req,
            "boost": [{"path": "commonness", "boost_fun": "Log2",
                       "param": 2}]})
        assert boosted["data"][0]["doc_id"] == unboosted["data"][0]["doc_id"]
        assert boosted["data"][0]["score"] > unboosted["data"][0]["score"]

    def test_rank_boost_on_anchor_higher_search_on_1_n(self, jm_index):
        # tests.rs:1127-1151 — same through a 1:n search path
        from veloci_spark.search import search

        req = {"search": {"terms": ["boostemich"], "path": "meanings.ger[]"}}
        unboosted = search(jm_index, req)
        boosted = search(jm_index, {
            "search_req": req,
            "boost": [{"path": "commonness", "boost_fun": "Log2",
                       "param": 2}]})
        assert boosted["data"][0]["score"] > unboosted["data"][0]["score"]

    def test_explain_plan_contents(self, jm_index):
        # tests.rs:1153-1173 — the explain dump names the term, the field
        # and the boost
        from veloci_spark.search import search

        res = search(jm_index, {
            "search_req": {"search": {"terms": ["weich"],
                                      "path": "meanings.ger[]",
                                      "levenshtein_distance": 1}},
            "boost": [{"path": "commonness", "boost_fun": "Log2",
                       "param": 2}],
            "explain": True})
        dump = str(res["explain"]).lower()
        assert "weich" in dump
        assert "meanings.ger[]" in dump
        assert "boost" in dump

    def test_boost_terms_and_from_cache(self, jm_index):
        # tests.rs:1175-1199 — term boost ranks the ent_seq-9555 doc first,
        # and repeated identical queries stay stable
        from veloci_spark.search import search, select_docs

        req = {"search_req": {"search": {"terms": ["weich"],
                                         "path": "meanings.ger[]",
                                         "levenshtein_distance": 1}},
               "boost_term": [{"terms": ["9555"], "path": "ent_seq",
                               "boost": 5.0}]}
        for _ in range(3):
            res = search(jm_index, req)
            top = res["data"][0]["doc_id"]
            sel = select_docs(jm_index, [top], ["meanings.ger[]"])
            assert sel[top]["meanings.ger[]"] == ["(1) 2 3 super nice weich"]

    def test_why_found_terms_fuzzy_winner(self, jm_index):
        # tests.rs:1201-1215 should_add_why_found_terms — fuzzy "weich"
        # (hits welch too): winner is the "(1) weich" doc
        from veloci_spark.search import search, select_docs

        res = search(jm_index, {
            "search_req": {"search": {"terms": ["weich"],
                                      "path": "meanings.ger[]",
                                      "levenshtein_distance": 1}},
            "why_found": True, "explain": True})
        top = res["data"][0]["doc_id"]
        sel = select_docs(jm_index, [top], ["meanings.ger[]"])
        assert sel[top]["meanings.ger[]"][0] == "(1) weich"

    def test_or_connect_but_boost_one_term(self, jm_index):
        # tests.rs:1217-1230 — scalar leaf boost ×2 on the full text
        # "majestät (f)" flips the OR winner to its doc
        from veloci_spark.search import search, select_docs

        res = search(jm_index, {"search_req": {"or": [
            {"search": {"terms": ["majestät (f)"], "path": "meanings.ger[]",
                        "boost": 2}},
            {"search": {"terms": ["urge"], "path": "meanings.eng[]"}}]}})
        assert res["num_hits"] == 2
        top = res["data"][0]["doc_id"]
        sel = select_docs(jm_index, [top], ["meanings.ger[]"])
        assert sel[top]["meanings.ger[]"][0] == "majestätischer Anblick (m)"


class TestLocalityAndReadTree:
    def test_boost_text_localitaet(self, jm_index):
        # tests.rs:1239-1256 boost_text_localitaet — the doc holding BOTH
        # query terms in ONE value ("text localität") must win the OR;
        # request uses the canonical SearchTree object form
        from veloci_spark.search import read_data, search

        res = search(jm_index, {
            "search_req": {"or": {"queries": [
                {"search": {"terms": ["text"], "path": "meanings.ger[]"}},
                {"search": {"terms": ["localität"],
                            "path": "meanings.ger[]"}}]}},
            "text_locality": True})
        win = read_data(jm_index, res["data"][0]["doc_id"],
                        ["meanings.ger[]"])
        assert win["meanings.ger[]"][0] == "text localität"

    def test_read_data_skips_none_values(self, jm_index):
        # tests.rs:1289-1296 should_skip_existing_fields_which_are_not_
        # existent_in_the_object_none_values — absent fields are SKIPPED,
        # not emitted as nulls (doc 3 has no mylongtext)
        from veloci_spark.search import read_data

        out = read_data(jm_index, 3, ["mylongtext"])
        assert "mylongtext" not in out

    def test_read_recreate_complete_object(self, jm_index):
        # tests.rs:1298-1320 read_recreate_complete_object_with_read — a
        # read over EVERY indexed field reconstructs the document's content
        # (our read-tree keys by path, the reference nests; values must
        # match including the reference's boost-column int→string quirk)
        from veloci_spark.search import read_data

        out = read_data(jm_index, 4)
        assert out["ent_seq"] == "1587700"
        assert out["commonness"] == 500
        assert out["tags[]"] == ["awesome", "cool"]
        assert out["kanji[].text"] == ["意慾"]
        assert out["kanji[].commonness"] == ["20"]
        assert out["kana[].text"] == ["いよく"]
        assert out["field1[].text"] == ["awesome"]
        assert out["field1[].rank"] == ["1"]
        assert out["meanings.eng[]"] == ["test1"]
        assert out["meanings.ger[]"] == ["der test",
                                         "das ist ein guter Treffer"]
        # fields the doc does not carry stay absent (kana[].romaji is None
        # on doc 4; nofulltext/mylongtext belong to other docs)
        for absent in ("kana[].romaji", "nofulltext", "mylongtext"):
            assert absent not in out


class TestSelectAndSuggest:
    def test_select_on_long_text(self, jm_index):
        # tests.rs:991-1008 — select returns the full long text verbatim
        from veloci_spark.search import search

        res = search(jm_index, {
            "search_req": {"search": {"terms": ["story"],
                                      "path": "mylongtext"}},
            "select": ["mylongtext"]})
        assert res["num_hits"] == 1
        assert res["data"][0]["doc"]["mylongtext"] == (
            "Prolog:\nthis is a story of a guy who went out to rule the "
            "world, but then died. the end")

    def test_custom_snippet_info(self, jm_index):
        # snippet_info.rs:15-39 — custom tags/window/connector carried
        # through the request (the commented highlight golden at
        # tests.rs:929-949 uses num_words_around_snippet: 4)
        from veloci_spark.search import search

        res = search(jm_index, {
            "search": {"terms": ["story"], "path": "mylongtext"},
            "snippets": {"field": "mylongtext", "snippet_info": {
                "num_words_around_snippet": 4,
                "snippet_start_tag": "[", "snippet_end_tag": "]",
                "snippet_connector": " .. "}},
            "top": 3})
        assert res["data"][0]["snippet"] \
            == "Prolog:\nthis is a [story] of a guy who .. "

    def test_real_suggest_with_score(self, jm_index):
        # tests.rs:1029-1056 — ordered lowercased suggestions for "majes"
        from veloci_spark.search import suggest

        got = [t for t, _s in suggest(jm_index, "meanings.ger[]", "majes")]
        assert got == [
            "majestät",
            "majestät (f)",
            "majestätisches",
            "majestätischer",
            "majestätischer anblick (m)",
            "majestätisches aussehen (n)",
        ]

    def test_multi_real_suggest_with_score(self, jm_index):
        # tests.rs:1057-1074 — merged two-field suggest, exact order
        from veloci_spark.search import suggest_multi

        got = [t for t, _s in suggest_multi(
            jm_index, ["meanings.ger[]", "meanings.eng[]"], "will")]
        assert got == ["will", "wille", "wille (m)", "will testo"]

    def test_suggest_with_token_value_boost(self, jm_index):
        # tests.rs:1076-1099 — the token_values side input (Begeisterung →
        # 20) lifts the exact text above its peers under Log10(v + 1)
        from veloci_spark.search import suggest

        got = [t for t, _s in suggest(
            jm_index, "meanings.ger[]", "begeist",
            token_value={"path": "meanings.ger[]", "boost_fun": "Log10",
                         "param": 1})]
        assert got == ["begeisterung", "begeistern", "begeisterung (f)"]


class TestSuggestTerms:
    def test_search_on_field_for_suggest_without_sorting(self, jm_index):
        # tests.rs:902-934 — prefix "majes" d=0 on meanings.ger[] matches
        # these dictionary entries (tokens ∪ storable full texts)
        from veloci_spark.search import match_terms

        m = match_terms(jm_index, "meanings.ger[]", "majes",
                        starts_with=True, levenshtein=0)
        assert sorted(m["term"]) == [
            "Majestät",
            "Majestät (f)",
            "majestätischer",
            "majestätischer Anblick (m)",
            "majestätisches",
            "majestätisches Aussehen (n)",
        ]


class TestFuzzNestedExplain:
    """Invariant fuzz over NESTED request shapes (pyref is flat-only, so the
    tree differential fuzzer cannot walk these): for random OR/AND trees
    over 1:n / 2-level paths, the per-hit explain re-derivation
    (veloci_spark.explain — an independent driver-side implementation over
    the same index data) must reproduce every hit's final f32 score
    bit-exactly, and untruncated num_hits must equal the emitted hit count."""

    # (field, term) pool spanning tags[], kanji[].text, both meanings
    # subfields, and flat title — exact corpus values plus fuzzy/prefix bait
    _POOL = [
        ("tags[]", "nice"), ("tags[]", "cool"), ("tags[]", "awesome"),
        ("kanji[].text", "意欲"), ("kana[].romaji", "Iyoku"),
        ("meanings.eng[]", "urge"), ("meanings.eng[]", "will"),
        ("meanings.eng[]", "test1"), ("meanings.ger[]", "weich"),
        ("meanings.ger[]", "Treffer"), ("meanings.ger[]", "Wollen"),
        ("meanings.ger[]", "localität"), ("field1[].text", "awesome"),
        ("title", "Erbin"), ("type", "taschenbuch"),
    ]

    def test_explain_matches_engine_scores(self, jm_index):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from veloci_spark.search import search

        import os as _os
        n_ex = int(_os.environ.get("FUZZ_EXAMPLES", "15"))
        derand = "FUZZ_RANDOM" not in _os.environ

        def leaf(i, how):
            fld, t = self._POOL[i % len(self._POOL)]
            l = {"terms": [t], "path": fld}
            if how == 1 and len(t) >= 3:           # typo + fuzzy
                l["terms"] = [t[0] + "x" + t[2:]]
                l["levenshtein_distance"] = 1
            elif how == 2 and len(t) >= 4:         # prefix
                l["terms"] = [t[:-2]]
                l["starts_with"] = True
            elif how == 3:
                l["levenshtein_distance"] = 1
            return {"search": l}

        leaf_st = st.builds(leaf, st.integers(min_value=0, max_value=10_000),
                            st.integers(min_value=0, max_value=3))
        tree_st = st.recursive(
            leaf_st,
            lambda ch: st.one_of(
                st.builds(lambda k: {"or": k},
                          st.lists(ch, min_size=2, max_size=3)),
                st.builds(lambda k: {"and": k},
                          st.lists(ch, min_size=2, max_size=3))),
            max_leaves=4)

        @settings(max_examples=n_ex, deadline=None, derandomize=derand,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(tree=tree_st, top=st.integers(min_value=1, max_value=20))
        def check(tree, top):
            got = search(jm_index, {**tree, "top": top,
                                    "explain_hits": True})
            for h in got["data"]:
                steps = h["explain"]
                assert steps, (tree, h["doc_id"])
                assert np.float32(steps[-1]["score"]) == \
                    np.float32(h["score"]), (tree, h["doc_id"], steps)
            full = search(jm_index, {**tree, "top": 10**6})
            assert got["num_hits"] == len(full["data"]), tree

        check()
