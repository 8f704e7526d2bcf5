"""Pure-Python in-memory model of the reference search semantics.

This is the *differential-test oracle*: a deliberately simple, single-node
implementation of the same data model and formulas (see SURVEY.md §2.4 with
file:line citations) that the distributed Spark pipeline must agree with on
any corpus. It is written from the documented semantics, not translated from
the reference sources.

Float arithmetic uses numpy float32 scalars to match the engine kernels.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from veloci_spark.config import IndexConfig
from veloci_spark.scoring import final_score, index_score_u32, levenshtein_batch, term_score
from veloci_spark.tokenizer import has_tokens, tokenize


@dataclass
class RefField:
    term_id: dict = field(default_factory=dict)          # term -> id (sorted position)
    terms: list = field(default_factory=list)            # id -> term
    occ: dict = field(default_factory=dict)              # term -> num_occurences
    postings: dict = field(default_factory=dict)         # term -> {doc_id: summed u32 score}
    token_texts: dict = field(default_factory=dict)      # term -> set(text_key)
    text_docs: dict = field(default_factory=dict)        # text_key -> sorted [doc_id]
    phrase_pairs: dict = field(default_factory=dict)     # (tok_a, tok_b) -> set(doc_id)


def _prefix_lev(t: str, q: str) -> int:
    """min over prefixes p of t of levenshtein(p, q) — the `.starts_with()`
    automaton semantics (any prefix of the key accepted within distance)."""
    nq = len(q)
    prev = list(range(nq + 1))
    best = prev[nq]
    for cs in t:
        cur = [prev[0] + 1]
        for k in range(1, nq + 1):
            cur.append(min(prev[k - 1] + (q[k - 1] != cs), prev[k] + 1, cur[k - 1] + 1))
        prev = cur
        if prev[nq] < best:
            best = prev[nq]
    return best


class RefIndex:
    """In-memory build of the index over (doc_id, {field: text}) rows."""

    def __init__(self, docs: list[dict], config: IndexConfig):
        self.config = config
        self.docs = docs
        self.fields: dict[str, RefField] = {}
        for fc in config.fields:
            self.fields[fc.name] = self._build_field(fc)

    def _build_field(self, fc) -> RefField:
        f = RefField()
        # pass 1: term counting — full texts (≤ max bytes) + every token run
        # (reference create_fulltext.rs:81-111)
        occ: dict[str, int] = defaultdict(int)
        for doc in self.docs:
            text = doc.get(fc.name)
            if text is None:
                continue
            if len(text.encode("utf-8")) <= fc.max_text_store_bytes:
                occ[text] += 1
            if fc.tokenize and has_tokens(text, fc.separators):
                for tok, _is_sep in tokenize(text, fc.separators):
                    occ[tok] += 1
        f.occ = dict(occ)
        f.terms = sorted(occ)
        f.term_id = {t: i for i, t in enumerate(f.terms)}

        # pass 2: postings with index-time scores
        postings: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
        for doc in self.docs:
            text = doc.get(fc.name)
            if text is None:
                continue
            doc_id = doc["doc_id"]
            storable = len(text.encode("utf-8")) <= fc.max_text_store_bytes
            if storable:
                s = int(index_score_u32([0], [occ[text]], [1], [True])[0])
                postings[text][doc_id] += s
                if fc.token_texts:
                    f.text_docs.setdefault(text, []).append(doc_id)
            if fc.tokenize and has_tokens(text, fc.separators):
                runs = tokenize(text, fc.separators)
                n_tokens = len(runs)
                best_pos: dict[str, int] = {}
                prev_tok = None
                for pos, (tok, is_sep) in enumerate(runs):
                    if tok not in best_pos:
                        best_pos[tok] = pos
                    if fc.token_texts:
                        f.token_texts.setdefault(tok, set()).add(text)
                    if not is_sep:
                        if fc.phrase_pairs and prev_tok is not None:
                            f.phrase_pairs.setdefault((prev_tok, tok), set()).add(doc_id)
                        prev_tok = tok
                for tok, pos in best_pos.items():
                    s = int(index_score_u32([pos], [occ[tok]], [n_tokens], [False])[0])
                    postings[tok][doc_id] += s
        f.postings = {t: dict(d) for t, d in postings.items()}
        for k in f.text_docs:
            f.text_docs[k].sort()
        return f

    # ---------------- query side ----------------

    def match_terms(self, fld: str, term: str, *, levenshtein: int = 0,
                    starts_with: bool = False, is_regex: bool = False,
                    top: int | None = None, skip: int = 0,
                    ignore_case: bool = True):
        """Dictionary match → [(term, term_id, score_f32)].

        Reference get_term_ids_in_field (search_field.rs:277-398): the query
        is lowercased; levenshtein distance capped to min(d, chars-1)
        (:287) and to 4 in the automaton (:87). Candidate selection is
        case-insensitive classic Levenshtein ≤ cap; with ``starts_with`` a
        term is selected if *some prefix* of it is within the cap. The score
        distance is the full classic distance (distance_dfa falls back to the
        DP, :689-700); ``prefix_matches`` (term startswith query after
        lowercasing, checked when starts_with or d≠0) switches the score to
        the prefix formula. When ``top`` is set, matched terms truncate to
        top+skip by (score desc, term_id desc) (:292-331, :373-376).
        """
        f = self.fields[fld]
        lower = term.lower() if ignore_case else term
        fold = (lambda s: s.lower()) if ignore_case else (lambda s: s)
        hits = []
        if is_regex:
            # dense DFA over the dictionary, case-insensitive by default
            # (search_field.rs:72-83); full-key match, prefix with starts_with
            rx = re.compile(term, re.IGNORECASE)
            for t in f.terms:
                if (rx.match(t) if starts_with else rx.fullmatch(t)):
                    tl = t.lower()
                    prefix = starts_with and tl.startswith(lower)
                    d = 0 if tl == lower else int(levenshtein_batch([tl], lower, 254)[0])
                    hits.append((t, f.term_id[t],
                                 np.float32(term_score([d], [prefix])[0])))
        else:
            n_chars = max(len(lower), 1)
            d_score_cap = min(levenshtein, n_chars - 1)
            d_auto = min(d_score_cap, 4)
            check_prefix = starts_with or levenshtein != 0
            for t in f.terms:
                tl = fold(t)
                prefix = check_prefix and tl.startswith(lower)
                if starts_with:
                    selected = prefix if d_auto == 0 else (
                        _prefix_lev(tl, lower) <= d_auto)
                else:
                    selected = (tl == lower) if d_auto == 0 else (
                        int(levenshtein_batch([tl], lower, d_auto)[0]) <= d_auto)
                if not selected:
                    continue
                d = 0 if tl == lower else int(levenshtein_batch([tl], lower, 254)[0])
                hits.append((t, f.term_id[t], np.float32(term_score([d], [prefix])[0])))
        if top is not None:
            hits.sort(key=lambda h: (-float(h[2]), -h[1]))
            hits = hits[: top + skip]
        return hits

    def resolve_leaf(self, fld: str, matched) -> dict[int, np.float32]:
        """Matched terms → per-doc score, dedup keep MAX
        (search_field.rs:400-502)."""
        out: dict[int, np.float32] = {}
        f = self.fields[fld]
        for t, _tid, ts in matched:
            plist = f.postings.get(t)
            if not plist:
                continue
            for doc_id, stored in plist.items():
                fs = np.float32(final_score([ts], [stored])[0])
                if doc_id not in out or fs > out[doc_id]:
                    out[doc_id] = fs
        return out

    def leaf_ids(self, fld: str, matched) -> set[int]:
        f = self.fields[fld]
        ids: set[int] = set()
        for t, _tid, _ts in matched:
            ids.update(f.postings.get(t, ()))
        return ids


def union_score(legs: list[tuple[str, dict[int, np.float32]]]) -> dict[int, np.float32]:
    """OR merge (set_op.rs:87-220): per doc, max score per distinct query-term
    string; sum those; × n_distinct² (terms with max ≥ 1e-5 count)."""
    if len(legs) == 1:
        return dict(legs[0][1])
    terms = sorted({t for t, _ in legs})
    per_doc: dict[int, dict[str, np.float32]] = defaultdict(dict)
    for term, hits in legs:
        for doc_id, s in hits.items():
            cur = per_doc[doc_id].get(term)
            if cur is None or s > cur:
                per_doc[doc_id][term] = s
    out = {}
    for doc_id, by_term in per_doc.items():
        vals = [by_term.get(t, np.float32(0.0)) for t in terms]
        n = np.float32(sum(1 for v in vals if float(v) >= 0.00001))
        total = np.float32(0.0)
        for v in vals:
            total = np.float32(total + v)
        out[doc_id] = np.float32(total * n * n)
    return out


def intersect_score(legs: list[dict[int, np.float32]]) -> dict[int, np.float32]:
    """AND merge (set_op.rs:368-446): docs present in all legs; score = sum."""
    if len(legs) == 1:
        return dict(legs[0])
    common = set(legs[0])
    for leg in legs[1:]:
        common &= set(leg)
    out = {}
    for doc_id in common:
        total = np.float32(0.0)
        for leg in legs:
            total = np.float32(total + leg[doc_id])
        out[doc_id] = total
    return out


def apply_boosts(hits: dict[int, np.float32], boost_lists: list[tuple[list[int], float]]):
    """Multiplicative boosts (boost.rs:146-195): for each boost list, every
    occurrence of a hit's id multiplies its score by the boost value."""
    for ids, val in boost_lists:
        v = np.float32(val)
        for i in ids:
            if i in hits:
                hits[i] = np.float32(hits[i] * v)
    return hits


def top_k(hits: dict[int, np.float32], top: int | None, skip: int = 0):
    """(score DESC, doc_id DESC) then skip/top (search.rs:128-135, :235-244)."""
    ranked = sorted(hits.items(), key=lambda kv: (-float(kv[1]), -kv[0]))
    if skip:
        ranked = ranked[skip:]
    if top is not None:
        ranked = ranked[:top]
    return ranked


# ---------------------------------------------------------------------------
# full request evaluation (independent counterpart of veloci_spark.search —
# deliberately NOT sharing code with the Spark engine, so differential tests
# exercise two implementations of the same documented semantics)


def _leaf_opts(leaf_req: dict) -> dict:
    return {
        "levenshtein": leaf_req.get("levenshtein_distance", 0),
        "starts_with": leaf_req.get("starts_with", False),
        "is_regex": leaf_req.get("is_regex", False),
        "top": leaf_req.get("top"),
        "skip": leaf_req.get("skip", 0),
        "ignore_case": leaf_req.get("ignore_case", True),
    }


def _tree_children(sub):
    """Both serde forms of a SearchTree (search_request.rs:20-26): the
    canonical ``{"queries": [...]}`` object and the bare-list shorthand."""
    return sub["queries"] if isinstance(sub, dict) else sub


def _leaf_terms_opts(leaf_req: dict):
    """(terms, opts) with the same normalization as the engine's parser:
    case-sensitive REGEX leaves scope sensitivity into the pattern
    (``(?-i:...)``); plain-term sensitivity rides opts["ignore_case"]."""
    terms = leaf_req.get("terms") or [leaf_req["term"]]
    opts = _leaf_opts(leaf_req)
    if opts["is_regex"] and opts["ignore_case"] is False:
        terms = [f"(?-i:{t})" for t in terms]
        opts["ignore_case"] = True
    return terms, opts


def _leaf_tag(t: str, opts: dict) -> str:
    # tag identity: lowercased term; regex patterns and case-sensitive
    # plain leaves keep the RAW term (lowering mutates pattern semantics;
    # folding would merge case-distinct sensitive queries)
    return (t if opts["is_regex"] or opts.get("ignore_case", True) is False
            else t.lower())


def _eval_scored(index: "RefIndex", node: dict) -> tuple[str, dict]:
    """Returns (tag, {doc_id: f32 score}) for a request subtree."""
    if "or" in node or "and" in node:
        op = "or" if "or" in node else "and"
        legs = [_eval_scored(index, c) for c in _tree_children(node[op])]
        tag = op + "(" + ",".join(t for t, _ in legs) + ")"
        if op == "or":
            return tag, union_score([(t, h) for t, h in legs])
        return tag, intersect_score([h for _, h in legs])
    leaf_req = node.get("search", node)
    field = leaf_req["path"]
    terms, opts = _leaf_terms_opts(leaf_req)
    boost = leaf_req.get("boost")
    # per-leg boost-by-field (reference options.boost, tests.rs:843-871):
    # specs applied to this leg's hits BEFORE the tree combine
    field_boosts = (leaf_req.get("options") or {}).get("boost")
    if isinstance(boost, (list, tuple)):
        field_boosts = (list(field_boosts) if field_boosts else []) + list(boost)
        boost = None
    legs = []
    for t in terms:
        matched = index.match_terms(field, t, **opts)
        hits = index.resolve_leaf(field, matched)
        if boost is not None:
            hits = {d: np.float32(s * np.float32(boost)) for d, s in hits.items()}
        for spec in field_boosts or []:
            _apply_field_boost(index, hits, spec)
        legs.append((_leaf_tag(t, opts), hits))
    if len(legs) == 1:
        return legs[0]
    tag = "or(" + ",".join(t for t, _ in legs) + ")"
    return tag, union_score(legs)


def _eval_ids(index: "RefIndex", node: dict) -> set:
    if "or" in node or "and" in node:
        op = "or" if "or" in node else "and"
        parts = [_eval_ids(index, c) for c in _tree_children(node[op])]
        out = parts[0]
        for p in parts[1:]:
            out = (out | p) if op == "or" else (out & p)
        return out
    leaf_req = node.get("search", node)
    field = leaf_req["path"]
    terms, opts = _leaf_terms_opts(leaf_req)
    ids: set = set()
    for t in terms:
        ids |= index.leaf_ids(field, index.match_terms(field, t, **opts))
    return ids


def _scored_leaves(index: "RefIndex", node: dict) -> list[tuple[str, set]]:
    """(tag, hit doc ids) for every scored leaf — for the locality boost."""
    if "or" in node or "and" in node:
        op = "or" if "or" in node else "and"
        out = []
        for c in _tree_children(node[op]):
            out.extend(_scored_leaves(index, c))
        return out
    leaf_req = node.get("search", node)
    field = leaf_req["path"]
    terms, opts = _leaf_terms_opts(leaf_req)
    return [(_leaf_tag(t, opts),
             index.leaf_ids(field, index.match_terms(field, t, **opts)))
            for t in terms]


def search_request(index: "RefIndex", request: dict):
    """Full request → ranked [(doc_id, f32 score)] (top/skip applied).

    Pipeline order matches the engine: tree → filter → phrase boosts (request
    order) → term boosts (request order) → text locality — all float32.
    """
    tree = request.get("search_req") or {
        k: request[k] for k in ("or", "and", "search") if k in request
    }
    _tag, hits = _eval_scored(index, tree)
    hits = dict(hits)

    if request.get("filter") is not None:
        allowed = _eval_ids(index, request["filter"])
        hits = {d: s for d, s in hits.items() if d in allowed}

    for pb in request.get("phrase_boosts", []):
        a = (pb.get("search1") or pb)["terms"][0]
        b = (pb.get("search2") or pb)["terms"][0]
        f = index.fields[pb["path"]]
        docs = f.phrase_pairs.get((a, b), set())
        for d in hits:
            if d in docs:
                hits[d] = np.float32(hits[d] * np.float32(5.0))

    for tb in request.get("boost_term", []):
        factor = np.float32(tb.get("boost", 2.0))
        ids: set = set()
        for t in tb.get("terms", []):
            ids |= index.leaf_ids(tb["path"], index.match_terms(tb["path"], t))
        for d in hits:
            if d in ids:
                hits[d] = np.float32(hits[d] * factor)

    if request.get("text_locality"):
        by_tag: dict[str, set] = {}
        for tag, ids in _scored_leaves(index, tree):
            by_tag.setdefault(tag, set()).update(ids)
        count: dict[int, int] = defaultdict(int)
        for ids in by_tag.values():
            for d in ids:
                count[d] += 1
        for d, n in count.items():
            if n >= 2 and d in hits:
                # the reference computes the factor FIRST ((2·n)·n, f32) and
                # multiplies the score once (boost.rs:70 Hit::new(id, 2.*n*n);
                # apply_boost_from_iter boost.rs:210 hit.score *= b.score) —
                # chaining ((s·2)·n)·n rounds differently by one ulp (caught
                # by the fuzz battery on a nested-OR + locality request)
                nf = np.float32(n)
                factor = np.float32(np.float32(2.0) * nf * nf)
                hits[d] = np.float32(hits[d] * factor)

    # anchor boost-by-field (Q13) — applied after kernel-side boosts, same
    # order as the engine (_apply_anchor_boosts runs post-kernel)
    for spec in request.get("boost", []):
        _apply_field_boost(index, hits, spec)

    return top_k(hits, request.get("top", 10), request.get("skip", 0))


def _apply_field_boost(index: "RefIndex", hits: dict, spec: dict) -> None:
    """Boost every hit by a flat doc-store column, in place (the model
    covers anchor-level paths; value-relative sibling boosts are asserted
    against closed-form expectations in the engine tests instead)."""
    from veloci_spark.scoring import boost_value_score, eval_boost_expression

    col = spec["path"]
    values_by_doc = {d["doc_id"]: d.get(col) for d in index.docs}
    for doc in list(hits):
        v = values_by_doc.get(doc)
        v = np.float64("nan") if v is None else float(v)
        if spec.get("expression") is not None:
            hits[doc] = np.float32(eval_boost_expression(
                spec["expression"], [hits[doc]], [v])[0])
        else:
            hits[doc] = np.float32(boost_value_score(
                [hits[doc]], [v], spec.get("boost_fun", "Log10"),
                float(spec.get("param", 0.0)))[0])
