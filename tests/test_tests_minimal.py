"""Port of the reference's minimal battery
(/root/reference/tests/all/tests_minimal.rs): a one-doc corpus whose fields
are both identity columns (unique short texts → the reference marks them
is_anchor_identity_column and resolves searches against the doc store,
create_fulltext.rs:37 / search_field.rs:471-479).

Covers: identity-column search → doc fetch, identity-column filter, and the
canonical SearchTree object form ``{"or": {"queries": [...]}}``
(search_request.rs:20-26) alongside the bare-list shorthand.
"""

import pytest


@pytest.fixture(scope="session")
def minimal_index(spark, tmp_path_factory):
    from veloci_spark.build import build_index
    from veloci_spark.config import FieldConfig, IndexConfig
    from veloci_spark.search import FulltextIndex

    d = str(tmp_path_factory.mktemp("minidx"))
    # tests_minimal.rs get_test_data(): one doc, both fields identity
    docs = spark.createDataFrame(
        [{"doc_id": 0, "field": "test", "field2": "test2"}],
        schema="doc_id long, field string, field2 string")
    cfg = IndexConfig(
        fields=(FieldConfig("field", tokenize=False, phrase_pairs=False,
                            identity=True),
                FieldConfig("field2", tokenize=False, phrase_pairs=False,
                            identity=True)),
        doc_id_col="doc_id",
    )
    build_index(spark, docs, cfg, d)
    return FulltextIndex(spark, d)


class TestMinimal:
    def test_minimal(self, minimal_index):
        # tests_minimal.rs:24-37 test_minimal
        from veloci_spark.search import get_doc, search

        res = search(minimal_index, {"search": {"terms": ["test"],
                                                "path": "field"}})
        assert res["num_hits"] == 1
        assert len(res["data"]) == 1
        doc = get_doc(minimal_index, res["data"][0]["doc_id"])
        assert doc["field"] == "test"

    def test_minimal_with_filter_identity_column(self, minimal_index):
        # tests_minimal.rs:39-64: search + filter on the identity column;
        # the metadata assert (is_anchor_identity_column == true) maps to
        # our manifest's per-field identity flag
        from veloci_spark.search import get_doc, search

        res = search(minimal_index, {
            "search": {"terms": ["test"], "path": "field"},
            "filter": {"search": {"terms": ["test"], "path": "field"}},
        })
        assert len(res["data"]) == 1
        assert minimal_index.fields["field"]["identity"] is True
        doc = get_doc(minimal_index, res["data"][0]["doc_id"])
        assert doc["field"] == "test"

    def test_minimal_or_object_form(self, minimal_index):
        # tests_minimal.rs:66-90 test_minimal_or_json: the serde object form
        # {"or": {"queries": [...]}} — one doc matches both legs → 1 hit
        from veloci_spark.search import get_doc, search

        req = {"or": {"queries": [
            {"search": {"terms": ["test"], "path": "field"}},
            {"search": {"terms": ["test2"], "path": "field"}},
        ]}}
        res = search(minimal_index, req)
        assert len(res["data"]) == 1
        doc = get_doc(minimal_index, res["data"][0]["doc_id"])
        assert doc["field"] == "test"

    def test_minimal_or_list_shorthand_matches_object_form(self, minimal_index):
        # tests_minimal.rs:92-111 test_minimal_or_object — in Python both
        # constructions are dicts, so assert the two serde forms produce
        # identical results (scores included)
        from veloci_spark.search import search

        legs = [{"search": {"terms": ["test"], "path": "field"}},
                {"search": {"terms": ["test2"], "path": "field"}}]
        r_obj = search(minimal_index, {"or": {"queries": legs}})
        r_list = search(minimal_index, {"or": legs})
        assert r_obj["data"] == r_list["data"]
        assert r_obj["num_hits"] == r_list["num_hits"] == 1

    def test_and_object_form(self, minimal_index):
        # the And(SearchTree) arm of the same serde shape
        from veloci_spark.search import search

        req = {"and": {"queries": [
            {"search": {"terms": ["test"], "path": "field"}},
            {"search": {"terms": ["test2"], "path": "field2"}},
        ]}}
        res = search(minimal_index, req)
        assert len(res["data"]) == 1
