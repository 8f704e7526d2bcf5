"""Port of the reference code-search battery
(/root/reference/tests/all/test_code_search.rs): per-field
tokenize_on_chars, case-(in)sensitive wildcard/regex patterns, and the
QueryParserOptions escape hatch for pasted-code queries."""

import pytest

from veloci_spark.config import FieldConfig, IndexConfig


@pytest.fixture(scope="module")
def code_index(spark, tmp_path_factory):
    from veloci_spark.build import build_index
    from veloci_spark.search import FulltextIndex

    docs = spark.createDataFrame(
        [(0, 1, "function myfun(param1: Type1)", "cool.ts", "all/the/path")],
        "doc_id long, line_number long, line string, filename string, "
        "filepath string")
    cfg = IndexConfig(
        fields=(
            # tokenize_on_chars = ['/', '\\'] (test_code_search.rs:17-20)
            FieldConfig("filepath", separators="/\\"),
            FieldConfig("filename"),
            FieldConfig("line"),
            FieldConfig("line_number", tokenize=False, phrase_pairs=False,
                        token_texts=False),
        ),
        doc_id_col="doc_id",
        segment_docs=16,
    )
    d = str(tmp_path_factory.mktemp("codeidx"))
    build_index(spark, docs, cfg, d)
    return FulltextIndex(spark, d)


FIELDS = ["filepath", "filename", "line"]


def _gen_hits(idx, q, **kw):
    from veloci_spark.query import query_to_request
    from veloci_spark.search import search

    req = query_to_request(q, search_fields=FIELDS, **kw)
    return search(idx, req)["data"]


class TestCodeSearch:
    def test_regex_search_request_api(self, code_index):
        # test_code_search.rs:43-56
        from veloci_spark.search import search

        res = search(code_index, {
            "search": {"terms": [".*myfun.*type1.*"], "path": "line",
                       "is_regex": True}})
        assert len(res["data"]) == 1

    def test_regex_search_request_api_case_sensitive(self, code_index):
        # :58-71 — ignore_case=false: no hit ("Type1" != "type1")
        from veloci_spark.search import search

        res = search(code_index, {
            "search": {"terms": ["(?-i:.*myfun.*type1.*)"], "path": "line",
                       "is_regex": True}})
        assert len(res["data"]) == 0

    def test_pattern_code_search(self, code_index):
        # :73-81
        assert len(_gen_hits(code_index, "*myfun*Type1*")) == 1

    def test_pattern_code_search_ignore_case(self, code_index):
        # :83-92 — default ignore_case matches across case
        assert len(_gen_hits(code_index, "*myfun*type1*")) == 1

    def test_pattern_code_search_case_sensitive(self, code_index):
        # :94-102 — generator ignore_case=False
        assert len(_gen_hits(code_index, "*myfun*type1*",
                             ignore_case=False)) == 0
        assert len(_gen_hits(code_index, "*myfun*Type1*",
                             ignore_case=False)) == 1

    def test_pattern_code_search_no_fuzzy(self, code_index):
        # :104-111 — wildcard patterns never go fuzzy
        assert len(_gen_hits(code_index, "*myfun*type2*")) == 0

    def test_token_code_search(self, code_index):
        # :113-120
        assert len(_gen_hits(code_index, "myfun")) == 1

    def test_token_code_search_disable_parser(self, code_index):
        # :124-137 — pasted code survives with QueryParserOptions
        from veloci_spark.query import QueryParserOptions

        opts = QueryParserOptions(no_parentheses=True, no_attributes=True,
                                  no_levensthein=True)
        assert len(_gen_hits(code_index, "*myfun(param1: Type1)*",
                             parser_options=opts)) == 1

    def test_token_code_phrase_pattern(self, code_index):
        # :139-146 — quoting shields the parser; wildcards still expand
        assert len(_gen_hits(code_index, '"*myfun(param1: Type1)*"')) == 1

    def test_case_variant_sensitive_regex_distinct_leaves(self, code_index):
        # ADVICE r3: (?-i:.*Type1.*) vs (?-i:.*type1.*) — lowercased dedup
        # keys collapsed these to ONE leaf, the second silently inheriting
        # the first's matches. Regex patterns must dedup/tag by RAW pattern.
        from veloci_spark.search import _parse_tree, search

        req = {"or": [
            {"search": {"terms": ["(?-i:.*Type1.*)"], "path": "line",
                        "is_regex": True}},
            {"search": {"terms": ["(?-i:.*type1.*)"], "path": "line",
                        "is_regex": True}},
        ]}
        leaves, dedup = [], {}
        tree = _parse_tree(req, leaves, dedup)
        assert len(leaves) == 2
        assert len({c["tag"] for c in tree["children"]}) == 2
        # only the Type1 leg hits; one-distinct-tag score (n=1, no n² bump)
        res = search(code_index, req)
        assert len(res["data"]) == 1
        solo = search(code_index, {
            "search": {"terms": ["(?-i:.*Type1.*)"], "path": "line",
                       "is_regex": True}})
        assert res["data"][0]["score"] == solo["data"][0]["score"]

    def test_tokenize_on_chars(self, code_index):
        # filepath splits on '/' only: "path" is a token, "all/the/path"
        # is the stored full text
        from veloci_spark.search import search

        res = search(code_index, {
            "search": {"terms": ["path"], "path": "filepath"}})
        assert len(res["data"]) == 1
        res2 = search(code_index, {
            "search": {"terms": ["all/the/path"], "path": "filepath"}})
        assert len(res2["data"]) == 1
