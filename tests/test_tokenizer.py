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
