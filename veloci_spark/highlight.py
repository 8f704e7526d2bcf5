"""Snippet/highlight generation (Q20) and why-found (Q21).

The reference highlights by walking a doc's token ids and grouping hits
within ``5*2`` tokens, wrapping hits in ``<b>…</b>`` and joining snippet
groups with `` ... `` (/root/reference/src/highlight_field.rs:234-316,
defaults /root/reference/src/search/request/snippet_info.rs:15-39). Our
storage keeps the source text, so we re-tokenize the string and apply the
same algorithm — a vectorized pandas UDF over the selected docs (only the
top-k docs are ever highlighted, so this is driver-adjacent small work).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from veloci_spark.config import DEFAULT_SEPARATORS
from veloci_spark.tokenizer import tokenize

SNIPPET_WINDOW = 5          # num_words_around_snippet
SNIPPET_CONNECTOR = " ... "
HIGHLIGHT_PRE = "<b>"
HIGHLIGHT_POST = "</b>"


def highlight_text(text: str, terms, separators: str = DEFAULT_SEPARATORS,
                   window: int = SNIPPET_WINDOW,
                   max_snippets: int | None = None) -> str | None:
    """Highlight occurrences of ``terms`` (case-insensitive token match) in
    ``text``; returns the snippet string or None when nothing matches."""
    if not text:
        return None
    term_set = {t.lower() for t in terms}
    runs = tokenize(text, separators)
    hits = [i for i, (tok, is_sep) in enumerate(runs)
            if not is_sep and tok.lower() in term_set]
    if not hits:
        return None
    # group hits within window*2 tokens of each other
    groups: list[list[int]] = [[hits[0]]]
    for h in hits[1:]:
        if h - groups[-1][-1] <= window * 2:
            groups[-1].append(h)
        else:
            groups.append([h])
    if max_snippets is not None:
        groups = groups[:max_snippets]
    parts = []
    hit_set = set(hits)
    for g in groups:
        start = max(0, g[0] - window)
        end = min(len(runs), g[-1] + window + 1)
        buf = []
        for i in range(start, end):
            tok = runs[i][0]
            if i in hit_set:
                buf.append(HIGHLIGHT_PRE + tok + HIGHLIGHT_POST)
            else:
                buf.append(tok)
        snippet = "".join(buf)
        if start > 0:
            snippet = SNIPPET_CONNECTOR.lstrip() + snippet if not parts else snippet
        parts.append(snippet)
    out = SNIPPET_CONNECTOR.join(parts)
    if groups and groups[-1][-1] + window + 1 < len(runs):
        out += SNIPPET_CONNECTOR.rstrip()
    return out


def highlight_series(texts: pd.Series, terms, separators: str = DEFAULT_SEPARATORS,
                     **kw) -> pd.Series:
    """Vectorized batch highlight (for pandas UDF use)."""
    return texts.map(lambda t: highlight_text(t, terms, separators, **kw))


def why_found(index, doc_ids: list[int], leaves) -> dict[int, dict[str, list[str]]]:
    """For each doc in ``doc_ids``: which matched dictionary terms hit which
    field (/root/reference/src/search/why_found.rs:11-49). Only the segments
    containing the requested docs are scanned (parquet partition pruning)."""
    from pyspark.sql import functions as F

    from veloci_spark.vbyte import unpack_postings

    if not doc_ids:
        return {}
    segment_docs = index.manifest["segment_docs"]
    segs = sorted({d // segment_docs for d in doc_ids})
    want = np.array(sorted(doc_ids), dtype=np.int64)

    # (field, term_id) → term string, per leaf (identity leaves have no
    # postings — matched is None — and are not reported here)
    tid_term: dict[tuple[str, int], str] = {}
    for leaf in leaves:
        if leaf.matched is None:
            continue
        for _, r in leaf.matched.iterrows():
            tid_term[(leaf.field, int(r["term_id"]))] = r["term"]
    if not tid_term:
        return {}
    fields = list({f for f, _ in tid_term})
    tids = list({t for _, t in tid_term})
    rows = (
        index.postings
        .where(F.col("segment").isin(segs))
        .where(F.col("field").isin(fields) & F.col("term_id").isin(tids))
        .select("field", "term_id", "segment", "docs_bin", "scores_bin")
        .toPandas()
    )
    out: dict[int, dict[str, list[str]]] = {int(d): {} for d in doc_ids}
    for _, r in rows.iterrows():
        term = tid_term.get((r["field"], int(r["term_id"])))
        if term is None:
            continue
        docs, _scores = unpack_postings(r["docs_bin"], r["scores_bin"])
        docs = docs + int(r["segment"]) * segment_docs  # stored segment-relative
        present = docs[np.isin(docs, want)]
        for d in present:
            out[int(d)].setdefault(r["field"], []).append(term)
    for d in out:
        for f in out[d]:
            out[d][f] = sorted(set(out[d][f]))
    return out
