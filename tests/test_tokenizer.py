"""Tokenizer goldens — expectations from the reference tests
(/root/reference/src/tokenizer/mod.rs:51-89 and tests/all/test_why_found.rs)
as catalogued in FIXTURES.md §2.4."""

from veloci_spark.tokenizer import has_tokens, tokenize, tokenize_batch, word_tokens


def toks(text, seps=None):
    if seps is None:
        return [t for t, _ in tokenize(text)]
    return [t for t, _ in tokenize(text, seps)]


def test_grouped_control_sequences():
    assert toks("das \n ist ein txt, test") == [
        "das", " \n ", "ist", " ", "ein", " ", "txt", ", ", "test"]


def test_leading_separator():
    assert toks(" Taschenbuch (kartoniert)") == [
        " ", "Taschenbuch", " (", "kartoniert", ")"]


def test_single_char_token():
    assert toks("T oll") == ["T", " ", "oll"]


def test_grouped_dashes():
    assert toks("ok---nice") == ["ok", "---", "nice"]


def test_custom_separators_url():
    assert toks("https://github.com/PSeitz/veloci", "/:.") == [
        "https", "://", "github", ".", "com", "/", "PSeitz", "/", "veloci"]


def test_custom_separators_subset():
    assert toks("test§_ cool _", "§<") == ["test", "§", "_ cool _"]


def test_is_sep_flags():
    assert tokenize("ok---nice") == [("ok", False), ("---", True), ("nice", False)]


def test_has_tokens():
    assert not has_tokens("will")
    assert not has_tokens("")
    assert not has_tokens("   ")  # single separator run
    assert has_tokens("will testo")
    assert has_tokens(" x")


def test_word_tokens():
    assert word_tokens("die erbin, gut") == ["die", "erbin", "gut"]


def test_batch_positions_count_separators():
    [out] = tokenize_batch(["das \n ist"])
    assert out == [("das", False, 0), (" \n ", True, 1), ("ist", False, 2)]


def test_empty():
    assert tokenize("") == []
    assert tokenize_batch([""]) == [[]]


class TestSqlTokenizeParity:
    """The JVM-codegen tokenize path must emit exactly the Arrow kernels'
    rows (the engine default is sql; arrow is the reference semantics)."""

    def _docs(self, spark):
        rows = [
            (0, "Hello World, test… „quote“ (x)"),
            (1, "a a a b-b"),
            (2, ""),            # empty → nothing
            (3, None),          # null → nothing
            (4, "singlerun"),   # <2 runs → nothing
            (5, "ä Ö ü ß — dash…dots"),
            (6, "x " * 300),    # long repetitive
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_token_entries_parity(self, spark):
        from veloci_spark.build import token_entry_rows, token_entry_rows_sql
        from veloci_spark.config import DEFAULT_SEPARATORS

        docs = self._docs(spark)
        a = token_entry_rows(docs, "text", DEFAULT_SEPARATORS).toPandas()
        b = token_entry_rows_sql(docs, "text", DEFAULT_SEPARATORS).toPandas()
        key = ["doc_id", "token"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b[a.columns].sort_values(key).reset_index(drop=True)
        assert a.equals(b), (a, b)

    def test_pair_rows_parity(self, spark):
        from veloci_spark.build import pair_rows, pair_rows_sql
        from veloci_spark.config import DEFAULT_SEPARATORS

        docs = self._docs(spark)
        a = pair_rows(docs, "text", DEFAULT_SEPARATORS).toPandas()
        b = pair_rows_sql(docs, "text", DEFAULT_SEPARATORS).toPandas()
        sa = set(map(tuple, a.values.tolist()))
        sb = set(map(tuple, b.values.tolist()))
        assert sa == sb

    def test_value_pair_rows_parity(self, spark):
        # ROW MULTISETS must match — dedup is per VALUE in both engines, so
        # the same pair in N sibling values yields exactly N rows from each.
        from veloci_spark.build import value_pair_rows, value_pair_rows_sql
        from veloci_spark.config import DEFAULT_SEPARATORS

        vals = spark.createDataFrame(
            [(0, 0, "alpha beta gamma"), (0, 1, "alpha beta delta"),
             (0, 2, "alpha beta"),  # pair (alpha,beta) in 3 sibling values
             (1, 0, "one two one two"),  # repeated within one value → 1 row
             (1, 1, "one two"),
             (2, 0, "solo")],
            "doc_id long, pos int, value string")
        a = value_pair_rows(vals, DEFAULT_SEPARATORS).toPandas()
        b = value_pair_rows_sql(vals, DEFAULT_SEPARATORS).toPandas()
        key = ["doc_id", "tok_a", "tok_b"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b[a.columns].sort_values(key).reset_index(drop=True)
        assert a.equals(b), (a, b)
        # per-value dedup: 3 sibling rows survive, within-value repeat doesn't
        assert len(a[(a.doc_id == 0) & (a.tok_a == "alpha") & (a.tok_b == "beta")]) == 3
        assert len(a[(a.doc_id == 1) & (a.tok_a == "one") & (a.tok_b == "two")]) == 2

    def test_value_entries_parity(self, spark):
        from veloci_spark.build import (value_token_entry_rows,
                                        value_token_entry_rows_sql)
        from veloci_spark.config import DEFAULT_SEPARATORS

        vals = spark.createDataFrame(
            [(0, 0, "alpha beta alpha"), (0, 1, "gamma (delta)"),
             (1, 0, "one"), (1, 1, "two three")],
            "doc_id long, pos int, value string")
        a = value_token_entry_rows(vals, DEFAULT_SEPARATORS).toPandas()
        b = value_token_entry_rows_sql(vals, DEFAULT_SEPARATORS).toPandas()
        key = ["doc_id", "pos", "token"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b[a.columns].sort_values(key).reset_index(drop=True)
        assert a.equals(b)
