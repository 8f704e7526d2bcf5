"""Query-string language → request dict.

Grammar per the reference parser (/root/reference/query_parser/src/parser.rs,
SURVEY.md §2.5), re-implemented from the documented semantics:

* whitespace between terms = implicit OR (parser.rs:114-118)
* ``AND`` / ``OR`` keywords, right-associative, **no precedence**
  (parser.rs:473): ``a OR b AND c`` ⇒ ``or(a, and(b, c))``
* parentheses group
* ``field:term`` restricts a term to one field
* ``term~N`` explicit Levenshtein distance
* quoted ``"multi word"`` is a single (exact-text) term
* trailing ``*`` ⇒ prefix match; a ``*`` anywhere else ⇒ the term becomes a
  regex — parts split on ``*``, each regex-escaped, joined with ``.*`` — and
  auto-Levenshtein is disabled (no fuzzy regex). A trailing ``*`` combined
  with an inner one keeps ``starts_with`` semantics (regex prefix match)
  (query_parser_to_veloci_request.rs:44-63).

Generator defaults (/root/reference/src/query_generator.rs:85-132,212-223):

* auto-Levenshtein by term length — 0–2 chars → 0, 3–5 → 1, ≥6 → 2 — capped
  by ``levenshtein_auto_limit`` (default 1)
* a bare term expands to an OR over all searchable fields (legs share the
  query-term tag, so the OR n² formula counts the term once)
* consecutive term pairs become phrase boosts on every tokenized field
* stopword removal: the reference removes a term when its lowercased text is
  in any requested language list (query_parser_to_veloci_request.rs:113-127).
  The lists below reproduce the reference's shipped lists
  (stopword_lists/{en,de}, loaded lowercased by
  /root/reference/src/search/stopwords.rs:1-23) word for word — 100 EN / 65
  DE entries; pass ``stopword_lists=["en"]`` etc. to select languages, or
  rely on ``remove_stopwords=True`` which uses EN∪DE.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# exact behavioral twins of the reference's stopword lists (lowercased, as
# stopwords.rs loads them): stopword_lists/en (100 words incl. "will", "one",
# "time", "can", "must", "mr", "i") and stopword_lists/de (65 distinct).
STOPWORDS_EN = frozenset(
    """a about after all an and any are as at be been before but by can could
    did do down first for from good great had has have he her him his i if in
    into is it its know like little made man may me men more mr much must my
    no not now of on one only or other our out over said see she should so
    some such than that the their them then there these they this time to two
    up upon us very was we were what when which who will with would you
    your""".split()
)
STOPWORDS_DE = frozenset(
    """aber als am an auch auf aus bei bezeichnet bis das dass dem den der des
    die durch ein eine einem einen einer eines er es für gibt haben hat ich im
    in ist kann man mir mit nach nicht noch nur oder sich sie siehe sind so um
    und unter vom von vor war werden wie wird wurde wurden zu zum zur zwischen
    über""".split()
)
STOPWORD_LISTS = {"en": STOPWORDS_EN, "de": STOPWORDS_DE}
STOPWORDS = STOPWORDS_EN | STOPWORDS_DE


def is_stopword(language: str, text: str) -> bool:
    """Reference-parity membership check (stopwords.rs:20-23): the list is
    lowercased at load, the caller passes the lowercased term."""
    return text in STOPWORD_LISTS[language.lower()]


# ---------------------------------------------------------------------------
# lexer + parser


@dataclass
class Term:
    text: str
    field: str | None = None
    levenshtein: int | None = None
    starts_with: bool = False
    quoted: bool = False
    is_regex: bool = False


@dataclass(frozen=True)
class QueryParserOptions:
    """Reference ``QueryParserOptions`` (query_generator.rs, used by the
    code-search tests): selectively disable parser features so pasted code
    survives as a literal query. The reference's field spelling
    ``no_levensthein`` is kept for API parity."""

    no_parentheses: bool = False
    no_attributes: bool = False
    no_levensthein: bool = False


_DEFAULT_PARSER_OPTIONS = QueryParserOptions()

_TOKEN_RE = re.compile(
    r'\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<quoted>"(?:[^"\\]|\\.)*")'
    r"|(?P<word>[^\s()]+))"
)

# no_parentheses: ( and ) are ordinary word characters
_TOKEN_RE_NOPAREN = re.compile(
    r'\s*(?:(?P<quoted>"(?:[^"\\]|\\.)*")|(?P<word>\S+))'
)


def _lex(q: str, options: QueryParserOptions = _DEFAULT_PARSER_OPTIONS) -> list:
    out = []
    pos = 0
    tok_re = _TOKEN_RE_NOPAREN if options.no_parentheses else _TOKEN_RE
    while pos < len(q):
        m = tok_re.match(q, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        if not options.no_parentheses and m.group("lparen"):
            out.append("(")
        elif not options.no_parentheses and m.group("rparen"):
            out.append(")")
        elif m.group("quoted") is not None:
            body = m.group("quoted")[1:-1].replace('\\"', '"')
            # wildcards inside quotes still pattern-match (the reference's
            # token_code_phrase_pattern case: quoting shields the PARSER,
            # not the wildcard expansion)
            if "*" in body:
                body, sw, rx = _apply_wildcards(body)
                out.append(Term(body, quoted=True, starts_with=sw,
                                is_regex=rx))
            else:
                out.append(Term(body, quoted=True))
        else:
            w = m.group("word")
            if w in ("AND", "OR"):
                out.append(w)
            else:
                out.append(_parse_word(w, options))
    return out


def _apply_wildcards(w: str):
    """Wildcard handling (query_parser_to_veloci_request.rs:44-63): a single
    TRAILING * → fuzzy-compatible prefix search; any REMAINING * → the term
    becomes a regex (escape the literal parts, join with .*) and fuzzy is
    off. starts_with survives alongside regex (regex prefix match)."""
    starts_with = False
    if w.endswith("*") and len(w) > 1:
        starts_with = True
        w = w[:-1]
    is_regex = "*" in w
    if is_regex:
        w = ".*".join(re.escape(p) for p in w.split("*"))
    return w, starts_with, is_regex


def _parse_word(w: str,
                options: QueryParserOptions = _DEFAULT_PARSER_OPTIONS) -> Term:
    field = None
    if ":" in w and not options.no_attributes:
        maybe_field, rest = w.split(":", 1)
        if maybe_field and rest:
            field, w = maybe_field, rest
    lev = None
    if not options.no_levensthein:
        m = re.search(r"~(\d+)$", w)
        if m:
            lev = int(m.group(1))
            w = w[: m.start()]
    w, starts_with, is_regex = _apply_wildcards(w)
    if is_regex:
        lev = None
    return Term(w, field=field, levenshtein=lev, starts_with=starts_with,
                is_regex=is_regex)


class _Parser:
    """Right-associative, precedence-free boolean parser: a sequence of
    operands is folded right-to-left with the operator between each pair
    (implicit operator = OR)."""

    def __init__(self, tokens: list):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def parse(self):
        node = self.operand()
        if node is None:
            return None
        nxt = self.peek()
        if nxt is None or nxt == ")":
            return node
        op = "or"
        if nxt in ("AND", "OR"):
            op = nxt.lower()
            self.i += 1
        rest = self.parse()  # right-associative
        if rest is None:
            return node
        return {op: [node, rest]}

    def operand(self):
        tok = self.peek()
        if tok is None or tok == ")":
            return None
        if tok == "(":
            self.i += 1
            node = self.parse()
            if self.peek() == ")":
                self.i += 1
            return node
        if tok in ("AND", "OR"):  # stray operator → treat as term
            self.i += 1
            return {"term": Term(tok.lower())}
        self.i += 1
        return {"term": tok}


def parse_query(q: str, options: QueryParserOptions | None = None):
    """Query string → AST of {"or"/"and": [..]} / {"term": Term} nodes."""
    return _Parser(_lex(q, options or _DEFAULT_PARSER_OPTIONS)).parse()


def _flatten(node):
    """Flatten nested same-op nodes (search_request.rs:29-68 simplify)."""
    if node is None or "term" in node:
        return node
    op = "or" if "or" in node else "and"
    kids = []
    for c in node[op]:
        c = _flatten(c)
        if c is None:
            continue
        if op in c:
            kids.extend(c[op])
        else:
            kids.append(c)
    if len(kids) == 1:
        return kids[0]
    return {op: kids}


# ---------------------------------------------------------------------------
# generator: AST → request


def auto_levenshtein(term: str, limit: int = 1, *,
                     wildcard: bool = False) -> int:
    """0–2 chars → 0, 3–5 → 1, ≥6 → 2; capped by ``limit``. Wildcard
    (trailing-``*`` prefix) terms use the reference's shifted band
    (≤3 → 0, 4–5 → 1, ≥6 → 2) — prefix search IS fuzzy-compatible
    (query_generator.rs:85-99,129-132; lev.starts_with() automaton in
    search_field.rs:90-95)."""
    n = len(term)
    if wildcard:
        d = 0 if n <= 3 else (1 if n <= 5 else 2)
    else:
        d = 0 if n <= 2 else (1 if n <= 5 else 2)
    return min(d, limit)


def _collect_terms(node, out):
    if node is None:
        return
    if "term" in node:
        out.append(node["term"])
        return
    for c in node.get("or", node.get("and", [])):
        _collect_terms(c, out)


def _strip_stopwords(node, stopwords: frozenset = STOPWORDS):
    """Remove stopword term leaves (lowercased membership, reference
    filter_stopwords semantics); a node whose children all vanish vanishes.
    If the whole query would vanish, keep it unchanged."""
    def strip(n):
        if n is None:
            return None
        if "term" in n:
            t = n["term"]
            if not t.quoted and t.field is None and t.text.lower() in stopwords:
                return None
            return n
        op = "or" if "or" in n else "and"
        kids = [strip(c) for c in n[op]]
        kids = [k for k in kids if k is not None]
        if not kids:
            return None
        if len(kids) == 1:
            return kids[0]
        return {op: kids}

    stripped = strip(node)
    return node if stripped is None else stripped


def query_to_request(q: str, *, search_fields: list[str],
                     phrase_fields: list[str] | None = None,
                     levenshtein_auto_limit: int = 1,
                     remove_stopwords: bool = True,
                     stopword_lists: list[str] | None = None,
                     top: int = 10, skip: int = 0,
                     facets: list | None = None,
                     boost_fields: dict[str, float] | None = None,
                     boost_terms: dict[str, float] | None = None,
                     filter_query: str | None = None,
                     ignore_case: bool = True,
                     parser_options: QueryParserOptions | None = None) -> dict:
    """Query string → engine request dict (SURVEY.md §2.5 generator).

    ``stopword_lists`` selects the reference's per-language lists (e.g.
    ``["en"]``); when None, ``remove_stopwords=True`` uses EN∪DE.

    Reference generator options (query_generator.rs SearchQueryGenerator-
    Parameters): ``boost_fields`` {field: factor} multiplies every leaf on
    that field (:85-132 boost per RequestSearchPart); ``boost_terms``
    {"term" or "field:term": factor} adds boost_term entries (:204-210);
    ``filter_query`` is parsed with levenshtein 0 and becomes the ids-only
    filter subtree (:225-233); ``ignore_case=False`` makes wildcard/regex
    patterns case-sensitive (:ignore_case, regex leaves only — plain terms
    match through the lowercased dictionary like the reference);
    ``parser_options`` disables parser features for pasted-code queries
    (QueryParserOptions, test_code_search.rs:124-146).
    """
    ast = parse_query(q, parser_options)
    if ast is None:
        raise ValueError(f"empty query: {q!r}")
    if stopword_lists is not None:
        sw = frozenset().union(*(STOPWORD_LISTS[lang.lower()]
                                 for lang in stopword_lists))
        ast = _strip_stopwords(ast, sw)
    elif remove_stopwords:
        ast = _strip_stopwords(ast)
    ast = _flatten(ast)

    bf = boost_fields or {}

    def leaf_for(leaf: dict, field: str) -> dict:
        out = {**leaf, "path": field}
        if field in bf:
            out["boost"] = float(bf[field])
        return out

    def to_req(node):
        if "term" in node:
            t: Term = node["term"]
            lev = t.levenshtein
            if lev is None and not t.quoted and not t.is_regex:
                lev = auto_levenshtein(t.text, levenshtein_auto_limit,
                                       wildcard=t.starts_with)
            leaf = {"terms": [t.text], "levenshtein_distance": lev or 0}
            if t.starts_with:
                leaf["starts_with"] = True
            if t.is_regex:
                leaf["is_regex"] = True
                if not ignore_case:
                    leaf["ignore_case"] = False
            if t.field is not None:
                return {"search": leaf_for(leaf, t.field)}
            fields = search_fields
            if len(fields) == 1:
                return {"search": leaf_for(leaf, fields[0])}
            # multi-field expansion: legs share the term tag so the OR n²
            # formula counts the query term once
            return {"or": [{"search": leaf_for(leaf, f)} for f in fields]}
        op = "or" if "or" in node else "and"
        return {op: [to_req(c) for c in node[op]]}

    request = {"search_req": to_req(ast), "top": top, "skip": skip}

    if boost_terms:
        bt = []
        for spec, factor in sorted(boost_terms.items()):
            if ":" in spec:
                fld, term = spec.split(":", 1)
                bt.append({"path": fld, "terms": [term], "boost": float(factor)})
            else:
                for f in search_fields:
                    bt.append({"path": f, "terms": [spec], "boost": float(factor)})
        request["boost_term"] = bt

    if filter_query:
        filter_ast = _flatten(parse_query(filter_query))
        if filter_ast is not None:
            def to_filter(node):
                if "term" in node:
                    t: Term = node["term"]
                    leaf = {"terms": [t.text], "levenshtein_distance": 0}
                    if t.starts_with:
                        leaf["starts_with"] = True
                    if t.field is not None:
                        return {"search": {**leaf, "path": t.field}}
                    if len(search_fields) == 1:
                        return {"search": {**leaf, "path": search_fields[0]}}
                    return {"or": [{"search": {**leaf, "path": f}}
                                   for f in search_fields]}
                op = "or" if "or" in node else "and"
                return {op: [to_filter(c) for c in node[op]]}

            request["filter"] = to_filter(filter_ast)

    # adjacent term pairs → phrase boosts (ast.rs:121-147, generator :212-223)
    terms: list[Term] = []
    _collect_terms(ast, terms)
    pfields = phrase_fields if phrase_fields is not None else search_fields
    phrase_boosts = []
    for a, b in zip(terms, terms[1:]):
        if (a.field is None and b.field is None and not a.quoted
                and not b.quoted and not a.is_regex and not b.is_regex):
            for f in pfields:
                phrase_boosts.append({
                    "path": f,
                    "search1": {"terms": [a.text], "path": f},
                    "search2": {"terms": [b.text], "path": f},
                })
    if phrase_boosts:
        request["phrase_boosts"] = phrase_boosts
    if facets:
        request["facets"] = facets
    return request


def search_query(index, q: str, **kw):
    """Convenience: parse + generate + execute against a FulltextIndex."""
    from veloci_spark.search import search

    fields = kw.pop("search_fields", None)
    if fields is None:
        fields = [f["name"] for f in index.manifest["fields"] if f["tokenize"]]
    phrase_fields = kw.pop("phrase_fields", None)
    if phrase_fields is None:
        phrase_fields = [f["name"] for f in index.manifest["fields"]
                         if f["tokenize"] and f.get("phrase_pairs")]
    req = query_to_request(q, search_fields=fields, phrase_fields=phrase_fields, **kw)
    return search(index, req)
