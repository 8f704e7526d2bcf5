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
  in any requested language list (query_parser_to_veloci_request.rs:113-127,
  the unit-tested semantics at :183-199 — note the integration call at :12
  DISCARDS the filtered ast, so the reference binary never actually strips;
  we implement the evident intent, additionally shielding quoted and
  field-attributed terms, which express explicit user intent).
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


class ParseError(ValueError):
    """Reference ``ParseError`` (query_parser/src/error.rs): raised where the
    reference parser returns Err — trailing/lone ``~``, a non-number after
    ``~``, a dangling ``attr:``, an attribute after an attribute
    (``field:what:ok``) — and where its unreachable match arms ``panic!``
    (an operand directly followed by ``(`` or ``~``)."""


@dataclass
class _Attr:
    """AttributeLiteral token: a (quoted or bare) literal immediately
    followed by ``:`` (lexer.rs:147-152,181-187)."""

    name: str


@dataclass
class _RawTerm:
    """Literal token, text verbatim (wildcard/levenshtein interpretation
    happens in the parser, like the reference generator)."""

    text: str
    quoted: bool = False


def _lex(q: str, options: QueryParserOptions = _DEFAULT_PARSER_OPTIONS) -> list:
    """Tokenizer mirroring the reference lexer (query_parser/src/lexer.rs):

    * ``(`` ``)`` ``~`` are single-char tokens; ``:`` is a separator that
      turns the *preceding* literal into an AttributeLiteral — each gated by
      its QueryParserOptions flag (is_seperator, lexer.rs:35-41).
    * ``AND`` / ``OR`` are operators only when PRECEDED by whitespace (not
      start-of-string) and FOLLOWED by a literal space (lexer.rs:114-127);
      anywhere else they lex as ordinary literals.
    * ``"…"`` quotes shield separators; a closing quote immediately followed
      by ``:`` is an attribute (``"field":x``, lexer.rs:131-158). Escaped
      ``\\"`` inside quotes is a small superset of the reference (which has
      no escapes).
    """
    out: list = []
    i, n = 0, len(q)

    def is_sep(c: str) -> bool:
        if c in "()" and not options.no_parentheses:
            return True
        if c == "~" and not options.no_levensthein:
            return True
        if c == ":" and not options.no_attributes:
            return True
        return False

    while i < n:
        while i < n and q[i].isspace():
            i += 1
        if i >= n:
            break
        prev_ws = i > 0 and q[i - 1].isspace()
        if prev_ws and q.startswith("AND ", i):
            out.append("AND")
            i += 3
            continue
        if prev_ws and q.startswith("OR ", i):
            out.append("OR")
            i += 2
            continue
        c = q[i]
        if c == '"':
            j = i + 1
            body: list = []
            while j < n:
                if q[j] == "\\" and j + 1 < n and q[j + 1] == '"':
                    body.append('"')
                    j += 2
                    continue
                if q[j] == '"':
                    break
                body.append(q[j])
                j += 1
            text = "".join(body)
            i = j + 1 if j < n else n
            if i < n and q[i] == ":" and not options.no_attributes:
                out.append(_Attr(text))
                i += 1
            else:
                out.append(_RawTerm(text, quoted=True))
            continue
        if c in "()" and not options.no_parentheses:
            out.append(c)
            i += 1
            continue
        if c == "~" and not options.no_levensthein:
            out.append("~")
            i += 1
            continue
        # literal: first char unconditionally, then until whitespace/sep
        # (lexer.rs:176-181)
        j = i + 1
        while j < n and not q[j].isspace() and not is_sep(q[j]):
            j += 1
        text = q[i:j]
        i = j
        if i < n and q[i] == ":" and not options.no_attributes:
            out.append(_Attr(text))
            i += 1
        else:
            out.append(_RawTerm(text))
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


def _apply_attr(node, name: str):
    """Reference ``UserAST::Attributed`` applied onto Term fields: the
    attribute covers its subtree, innermost attribute wins (ast.rs:103-118
    map_ast threads the CLOSEST enclosing attr) — so only terms without a
    field yet are stamped."""
    if node is None:
        return None
    if "term" in node:
        if node["term"].field is None:
            node["term"].field = name
        return node
    op = "or" if "or" in node else "and"
    node[op] = [_apply_attr(c, name) for c in node[op]]
    return node


class _Parser:
    """Recursive-descent twin of the reference parser
    (query_parser/src/parser.rs:135-184 ``_parse`` +
    :96-133 ``parse_sub_expression``): right-associative, precedence-free;
    implicit operator between adjacent operands = OR; an attribute covers
    the next literal, or — before ``(`` — the whole rest of the parse
    (parser.rs:139-160); stray ``)`` ends the current level and surplus
    trailing tokens are ignored (parser.rs:128, test_phrases)."""

    def __init__(self, tokens: list):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def parse(self):
        tok = self.peek()
        if tok is None:
            return None
        self.i += 1
        if isinstance(tok, _Attr):
            nxt = self.peek()
            if nxt == "(":
                # attribute over the parenthesized block — and, like the
                # reference (parser.rs:142-147 wraps the whole _parse()),
                # over everything the rest of this level parses
                return _apply_attr(self.parse(), tok.name)
            if isinstance(nxt, _RawTerm):
                self.i += 1
                term = self._make_term(nxt)
                if term.field is None:
                    term.field = tok.name
                return self.sub_expression({"term": term})
            raise ParseError(
                "only token or ( allowed after attribute ('attr:') ")
        if isinstance(tok, _RawTerm):
            return self.sub_expression({"term": self._make_term(tok)})
        if tok == "(":
            node = self.parse()
            if self.peek() != ")":
                raise ParseError("expected closing parenthesis")
            self.i += 1
            return self.sub_expression(node)
        # ")" / "~" / operator in operand position: the reference's
        # unreachable/unimplemented arms (parser.rs:173-181)
        raise ParseError(f"unexpected token {tok!r}")

    def sub_expression(self, curr):
        nxt = self.peek()
        if nxt is None or nxt == ")":
            return curr
        if isinstance(nxt, (_RawTerm, _Attr)):
            return {"or": [curr, self.parse()]}  # implicit OR
        if nxt == "OR":
            self.i += 1
            return {"or": [curr, self.parse()]}
        if nxt == "AND":
            self.i += 1
            return {"and": [curr, self.parse()]}
        # "(" or "~" directly after an operand: reference parser.rs:127
        # unimplemented arm
        raise ParseError(f"unexpected token {nxt!r} after operand")

    def _make_term(self, rt: _RawTerm) -> Term:
        """Literal (+ optional ``~N``) → Term: levenshtein from the token
        stream (parser.rs:78-94 parse_user_filter: the number must be a
        plain u8 literal), then wildcard interpretation on the raw text
        (regex terms drop fuzziness; quoting shields the parser only)."""
        lev = None
        if self.peek() == "~":
            self.i += 1
            nxt = self.peek()
            if (not isinstance(nxt, _RawTerm) or nxt.quoted
                    or not re.fullmatch(r"[0-9]+", nxt.text)
                    or int(nxt.text) > 255):
                raise ParseError(
                    "Expecting a levenshtein number after a '~' ")
            self.i += 1
            lev = int(nxt.text)
        text, starts_with, is_regex = (
            _apply_wildcards(rt.text) if "*" in rt.text
            else (rt.text, False, False))
        if is_regex:
            lev = None
        return Term(text, levenshtein=lev, starts_with=starts_with,
                    quoted=rt.quoted, is_regex=is_regex)


def parse_query(q: str, options: QueryParserOptions | None = None):
    """Query string → AST of {"or"/"and": [..]} / {"term": Term} nodes.
    Raises :class:`ParseError` exactly where the reference parser errors
    (dangling ``~`` / ``attr:``, chained attributes, operand-operand
    adjacency through ``(``)."""
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
                     stopwords: "set[str] | None" = None,
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
    if stopwords is not None:
        # user-defined stopword set (reference opt.stopwords,
        # query_parser_to_veloci_request.rs:119-120; config stopwords in
        # tests.rs:29)
        ast = _strip_stopwords(ast, frozenset(w.lower() for w in stopwords))
    elif stopword_lists is not None:
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
    # pairs are TEXT-only and chain THROUGH attributed terms: the reference
    # walk (ast.rs:127-147 _get_phrase_pairs) keeps last_term when entering
    # an attribute from unattributed context or the same attribute, so
    # `x myattr:y`, `myattr:y z` and even `a:x b:y` all pair — it resets
    # only on a nested different-attribute transition, which the flat
    # field-stamped AST here cannot even express. Quoted/regex leaves break
    # the chain (our documented divergence: the reference has no quoted
    # flag downstream and would thread the whole phrase text).
    for a, b in zip(terms, terms[1:]):
        if (not a.quoted and not b.quoted
                and not a.is_regex and not b.is_regex):
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
    """Convenience: parse + generate + execute against a FulltextIndex.
    Request-level flags the reference generator params carry (explain →
    per-hit derivation, why_found, text_locality, select,
    test_query_generator.rs:139-152) pass through to the request."""
    from veloci_spark.search import search

    fields = kw.pop("search_fields", None)
    if fields is None:
        fields = [f["name"] for f in index.manifest["fields"] if f["tokenize"]]
    phrase_fields = kw.pop("phrase_fields", None)
    if phrase_fields is None:
        phrase_fields = [f["name"] for f in index.manifest["fields"]
                         if f["tokenize"] and f.get("phrase_pairs")]
    extras = {k: kw.pop(k) for k in ("explain_hits", "why_found",
                                     "text_locality", "select", "boost")
              if k in kw}
    req = query_to_request(q, search_fields=fields, phrase_fields=phrase_fields, **kw)
    req.update(extras)
    return search(index, req)
