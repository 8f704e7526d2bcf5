"""Grouped-separator tokenizer.

Semantics of the reference grouped tokenizer
(/root/reference/src/tokenizer/simple_tokenizer_group.rs:51-82): the text is
split into maximal runs of separator chars and maximal runs of
non-separator chars; *both* kinds are emitted as tokens, separator runs
flagged ``is_sep``. ``"ok---nice"`` → ``ok``, ``---``, ``nice``;
``" Taschenbuch (kartoniert)"`` → ``" "``, ``Taschenbuch``, ``" ("``,
``kartoniert``, ``")"``.

``has_tokens`` (simple_tokenizer_group.rs:10-15) is true iff the text splits
into ≥ 2 runs — a text that is a single run (e.g. a bare word, or pure
separators) produces *no* token postings, only its exact-text entry
(/root/reference/src/create.rs:225-280 gates the token loop on it).

The vectorized entry point is Arrow-batched (pandas Series in/out): the
per-row work is one compiled-regex ``findall`` — no per-row Python UDF row
marshalling, which keeps the build's hot loop at C speed.
"""

from __future__ import annotations

import re
from functools import lru_cache

from veloci_spark.config import DEFAULT_SEPARATORS


@lru_cache(maxsize=32)
def _runs_re(separators: str) -> "re.Pattern[str]":
    cls = re.escape(separators)
    # one alternation: a maximal separator run OR a maximal token run
    return re.compile(f"[{cls}]+|[^{cls}]+")


@lru_cache(maxsize=32)
def _sep_set(separators: str) -> frozenset:
    return frozenset(separators)


def tokenize(text: str, separators: str = DEFAULT_SEPARATORS) -> list[tuple[str, bool]]:
    """All runs of ``text`` as (token, is_sep) in order. Empty text → []."""
    if not text:
        return []
    seps = _sep_set(separators)
    return [(run, run[0] in seps) for run in _runs_re(separators).findall(text)]


def has_tokens(text: str, separators: str = DEFAULT_SEPARATORS) -> bool:
    """True iff the text splits into at least two runs."""
    if not text:
        return False
    it = _runs_re(separators).finditer(text)
    next(it, None)
    return next(it, None) is not None


def word_tokens(text: str, separators: str = DEFAULT_SEPARATORS) -> list[str]:
    """Non-separator tokens only (convenience for pipeline ops)."""
    return [t for t, is_sep in tokenize(text, separators) if not is_sep]


def tokenize_batch(texts, separators: str = DEFAULT_SEPARATORS):
    """Vectorized batch tokenize: iterable of str → list of token lists.

    Returns, per input text, a list of (token, is_sep, pos) with pos counting
    *every* run including separator runs (positions include separators —
    /root/reference/src/create.rs:232-249 increments the position for each
    emitted token).
    """
    findall = _runs_re(separators).findall
    seps = _sep_set(separators)
    out = []
    for text in texts:
        if not text:
            out.append([])
            continue
        runs = findall(text)
        out.append([(run, run[0] in seps, pos) for pos, run in enumerate(runs)])
    return out
