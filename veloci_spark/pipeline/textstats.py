"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All built-in-function (JVM/codegen) expressions
except where a rolling hash genuinely needs a vectorized kernel."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny deterministic n-gram/stopword language heuristic: score per language =
# count of its marker words present (whole-word). Not a real langid model —
# a deterministic, testable stand-in with the right dataflow shape.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "es": ["el", "la", "los", "las", "que", "por", "una", "con"],
    "fr": ["le", "les", "des", "est", "que", "pour", "dans", "une"],
}


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax over marker-word hit counts;
    ties → lexicographically first language; no hits → 'und' (undetermined)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\W+"), lambda w: w != "")
    scores = []
    for lang in sorted(_LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        cnt = F.size(F.filter(words, lambda w: F.array_contains(markers, w)))
        scores.append(F.struct(cnt.alias("score"), F.lit(lang).alias("lang")))
    # array_max on struct: max by (score, lang) — lang DESC on ties, so flip
    # via sort: pick max score, then first lang among maxes
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(s["score"] > acc["score"], s).otherwise(acc),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["score"].cast("int").alias("lang_score"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: lengths, word stats, punctuation / digit /
    uppercase ratios, stopword ratio, mean word length. One projection —
    whole-stage-codegen end to end."""
    text = F.col(text_col)
    words = F.filter(F.split(F.lower(text), r"\W+"), lambda w: w != "")
    n_chars = F.length(text)
    n_words = F.size(words)
    sw = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    total_word_chars = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_digit / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (n_upper / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
        (n_stop / F.greatest(n_words, F.lit(1))).alias("stopword_ratio"),
        (total_word_chars / F.greatest(n_words, F.lit(1))).alias("mean_word_len"),
    )


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (regex pieces: runs of
    letters / digits / single punctuation, ≈ GPT-style pre-tokenizer)."""
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda w: w != ""))
    pieces = F.size(F.regexp_extract_all(
        text, F.lit(r"[A-Za-zÀ-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÿ0-9]"), 0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("n_ws_tokens"),
        pieces.alias("n_subword_pieces"),
    )


# Winnowing fingerprint parameters. The hash is a polynomial over unicode
# code points mod a 30-bit prime: every intermediate fits in int64
# (codepoint < 2^21, power < 2^30, window-sum < 2^55), so the EXACT same
# arithmetic is expressible in plain SQL (the DuckDB oracle recomputes it).
FP_WINDOW = 8
FP_BASE = 131
FP_MOD = 1_000_000_007
FP_POWERS = [pow(FP_BASE, FP_WINDOW - 1 - j, FP_MOD) for j in range(FP_WINDOW)]


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 window: int = FP_WINDOW) -> DataFrame:
    """Winnowing-style document fingerprints as FLAT rows (doc_id, fp):
    polynomial rolling hash over the lowercased text's code points, min hash
    per non-overlapping block of ``window`` positions, distinct mins kept.
    Vectorized kernel (numpy sliding_window_view); one row per fingerprint so
    downstream joins (shared-fingerprint candidate pairs) need no explode."""
    powers = np.array([pow(FP_BASE, window - 1 - j, FP_MOD) for j in range(window)],
                      dtype=np.int64)
    out_schema = "doc_id long, fp long"

    def fp_rows(iterator):
        for pdf in iterator:
            ids_out, fp_out = [], []
            for doc_id, t in zip(pdf[id_col].values, pdf[text_col].values):
                if not t:
                    continue
                cps = np.array([ord(c) for c in t.lower()], dtype=np.int64)
                if len(cps) < window:
                    continue
                win = np.lib.stride_tricks.sliding_window_view(cps, window)
                hashes = (win * powers[None, :]).sum(axis=1) % FP_MOD
                mins = np.minimum.reduceat(
                    hashes, np.arange(0, len(hashes), window))
                uniq = sorted(set(int(m) for m in mins))
                ids_out.extend([doc_id] * len(uniq))
                fp_out.extend(uniq)
            yield pd.DataFrame({"doc_id": pd.Series(ids_out, dtype="int64"),
                                "fp": pd.Series(fp_out, dtype="int64")})

    return docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)) \
        .mapInPandas(fp_rows, schema=out_schema)
