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
                   max_snippets: int | None = None,
                   pre: str = HIGHLIGHT_PRE, post: str = HIGHLIGHT_POST,
                   connector: str = SNIPPET_CONNECTOR) -> str | None:
    """Highlight occurrences of ``terms`` (case-insensitive token match) in
    ``text``; returns the snippet string or None when nothing matches.
    ``window``/``pre``/``post``/``connector``/``max_snippets`` mirror the
    reference's SnippetInfo (snippet_info.rs:15-39)."""
    if not text:
        return None
    term_set = {t.lower() for t in terms}
    runs = tokenize(text, separators)
    # separator runs are ordinary tokens in the reference's stream — a
    # query for "§" highlights it (test_why_found.rs:98-107)
    hits = [i for i, (tok, _is_sep) in enumerate(runs)
            if tok.lower() in term_set]
    if not hits:
        return None
    # the reference token stream alternates token/separator, so
    # num_words_around_snippet words ≈ window*2 runs
    # (highlight_field.rs:285 "token seperator token seperator")
    around = window * 2
    # group hits: a new snippet group starts when the gap to the previous
    # hit reaches `around` runs (highlight_field.rs:17-35)
    groups: list[list[int]] = []
    prev = -around
    for h in hits:
        if h - prev >= around:
            groups.append([])
        prev = h
        groups[-1].append(h)
    if max_snippets is not None:
        groups = groups[:max_snippets]
    parts = []
    hit_set = set(hits)
    for g in groups:
        # window extent: first-around .. last+around+1 (:37-41)
        start = max(0, g[0] - around)
        end = min(len(runs), g[-1] + around + 1)
        buf = []
        for i in range(start, end):
            tok = runs[i][0]
            if i in hit_set:
                buf.append(pre + tok + post)
            else:
                buf.append(tok)
        parts.append("".join(buf))
    out = connector.join(parts)
    # ellipsis at the edges, connector verbatim (:68-83)
    if hits[0] > around:
        out = connector + out
    if hits[-1] < len(runs) - around:
        out = out + connector
    return out


def highlight_series(texts: pd.Series, terms, separators: str = DEFAULT_SEPARATORS,
                     **kw) -> pd.Series:
    """Vectorized batch highlight (for pandas UDF use)."""
    return texts.map(lambda t: highlight_text(t, terms, separators, **kw))


def why_found_terms(index, doc_ids: list[int], leaves) -> dict[int, dict[str, list[str]]]:
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


def why_found(index, doc_ids: list[int], leaves) -> dict[int, dict[str, list[str]]]:
    """Reference-shaped why-found: for each hit doc and each matched field,
    the SOURCE TEXTS with matched terms wrapped in ``<b>…</b>``, in text
    (pos) order (/root/reference/src/search/why_found.rs:51-84 resolves the
    hit token/text ids back to highlighted field texts; e.g.
    tests/all/test_why_found.rs:66-79 expects
    ``{"url": ["https://github.com/PSeitz/<b>veloci</b>"]}``).

    A matched term equal to the WHOLE text (an untokenized value, a
    storable full-text hit, or a regex that matched the complete entry)
    wraps the entire text; token matches highlight in place with the
    field's own separators. Texts that contain no match are omitted; long
    texts window to snippets exactly like :func:`highlight_text`."""
    from pyspark.sql import functions as F

    terms_by_doc = why_found_terms(index, doc_ids, leaves)
    if not terms_by_doc:
        return {}
    fields = sorted({f for per in terms_by_doc.values() for f in per})
    ids = [int(d) for d in doc_ids]

    texts: dict[str, dict[int, list[str]]] = {}
    flat = [f for f in fields if f not in index.values]
    if flat:
        rows = (index.docs.where(F.col("doc_id").isin(ids))
                .select("doc_id", *flat).collect())
        for r in rows:
            for f in flat:
                if r[f] is not None:
                    texts.setdefault(f, {})[r["doc_id"]] = [str(r[f])]
    for f in fields:
        if f not in index.values:
            continue
        vrows = (index.values[f].where(F.col("doc_id").isin(ids))
                 .orderBy("doc_id", "pos").collect())
        for r in vrows:
            if r["value"] is not None:
                texts.setdefault(f, {}).setdefault(r["doc_id"], []) \
                    .append(str(r["value"]))

    out: dict[int, dict[str, list[str]]] = {}
    for d, per_field in terms_by_doc.items():
        for f, terms in per_field.items():
            seps = index.fields.get(f, {}).get("separators",
                                               DEFAULT_SEPARATORS)
            lowered = {t.lower() for t in terms}
            highlighted = []
            for text in texts.get(f, {}).get(d, []):
                if text.lower() in lowered:
                    highlighted.append(HIGHLIGHT_PRE + text + HIGHLIGHT_POST)
                    continue
                h = highlight_text(text, terms, seps)
                if h is not None:
                    highlighted.append(h)
            if highlighted:
                out.setdefault(d, {})[f] = highlighted
    return out
