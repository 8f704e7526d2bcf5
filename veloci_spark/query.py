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
* trailing ``*`` ⇒ prefix match (query_parser_to_veloci_request.rs:44-63)

Generator defaults (/root/reference/src/query_generator.rs:85-132,212-223):

* auto-Levenshtein by term length — 0–2 chars → 0, 3–5 → 1, ≥6 → 2 — capped
  by ``levenshtein_auto_limit`` (default 1)
* a bare term expands to an OR over all searchable fields (legs share the
  query-term tag, so the OR n² formula counts the term once)
* consecutive term pairs become phrase boosts on every tokenized field
* stopwords are removed from the query (EN/DE lists; the reference ships
  99-word EN / 65-word DE lists — ours are the standard public lists with
  the same role, /root/reference/src/search/stopwords.rs:1-23)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# standard public stopword lists (role of the reference's stopword_lists/{en,de})
STOPWORDS_EN = frozenset(
    """a about above after again all am an and any are as at be because been
    before being below between both but by could did do does doing down during
    each few for from further had has have having he her here hers him his how
    i if in into is it its just me more most my no nor not of off on once only
    or other our ours out over own same she so some such than that the their
    them then there these they this those through to too under until up very
    was we were what when where which while who whom why with you your""".split()
)
STOPWORDS_DE = frozenset(
    """aber als am an auch auf aus bei bin bis bist da damit dann das dass dein
    deine dem den der des dessen die dies diese dir du durch ein eine einem
    einen einer es für hatte haben hier ich ihr ihre im in ist ja jede jedem
    jeden jeder jedes kann kein können mein mit muss nach nicht noch nun nur
    ob oder ohne sehr sein seine sich sie sind so über um und uns unser unter
    vom von vor war was weiter wenn werde werden wie wieder will wir wird zu
    zum zur""".split()
)
STOPWORDS = STOPWORDS_EN | STOPWORDS_DE


# ---------------------------------------------------------------------------
# lexer + parser


@dataclass
class Term:
    text: str
    field: str | None = None
    levenshtein: int | None = None
    starts_with: bool = False
    quoted: bool = False


_TOKEN_RE = re.compile(
    r'\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<quoted>"(?:[^"\\]|\\.)*")'
    r"|(?P<word>[^\s()]+))"
)


def _lex(q: str) -> list:
    out = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        if m.group("lparen"):
            out.append("(")
        elif m.group("rparen"):
            out.append(")")
        elif m.group("quoted") is not None:
            body = m.group("quoted")[1:-1].replace('\\"', '"')
            out.append(Term(body, quoted=True))
        else:
            w = m.group("word")
            if w in ("AND", "OR"):
                out.append(w)
            else:
                out.append(_parse_word(w))
    return out


def _parse_word(w: str) -> Term:
    field = None
    if ":" in w:
        maybe_field, rest = w.split(":", 1)
        if maybe_field and rest:
            field, w = maybe_field, rest
    lev = None
    m = re.search(r"~(\d+)$", w)
    if m:
        lev = int(m.group(1))
        w = w[: m.start()]
    starts_with = False
    if w.endswith("*") and len(w) > 1:
        starts_with = True
        w = w[:-1]
    return Term(w, field=field, levenshtein=lev, starts_with=starts_with)


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


def parse_query(q: str):
    """Query string → AST of {"or"/"and": [..]} / {"term": Term} nodes."""
    return _Parser(_lex(q)).parse()


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


def auto_levenshtein(term: str, limit: int = 1) -> int:
    """0–2 chars → 0, 3–5 → 1, ≥6 → 2; capped by ``limit``
    (query_generator.rs:85-99,129-132)."""
    n = len(term)
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


def _strip_stopwords(node):
    """Remove stopword term leaves; a node whose children all vanish
    vanishes. If the whole query would vanish, keep it unchanged."""
    def strip(n):
        if n is None:
            return None
        if "term" in n:
            t = n["term"]
            if not t.quoted and t.field is None and t.text.lower() in STOPWORDS:
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
                     top: int = 10, skip: int = 0,
                     facets: list | None = None) -> dict:
    """Query string → engine request dict (SURVEY.md §2.5 generator)."""
    ast = parse_query(q)
    if ast is None:
        raise ValueError(f"empty query: {q!r}")
    if remove_stopwords:
        ast = _strip_stopwords(ast)
    ast = _flatten(ast)

    def to_req(node):
        if "term" in node:
            t: Term = node["term"]
            lev = t.levenshtein
            if lev is None and not t.quoted and not t.starts_with:
                lev = auto_levenshtein(t.text, levenshtein_auto_limit)
            leaf = {"terms": [t.text], "levenshtein_distance": lev or 0}
            if t.starts_with:
                leaf["starts_with"] = True
            if t.field is not None:
                return {"search": {**leaf, "path": t.field}}
            fields = search_fields
            if len(fields) == 1:
                return {"search": {**leaf, "path": fields[0]}}
            # multi-field expansion: legs share the term tag so the OR n²
            # formula counts the query term once
            return {"or": [{"search": {**leaf, "path": f}} for f in fields]}
        op = "or" if "or" in node else "and"
        return {op: [to_req(c) for c in node[op]]}

    request = {"search_req": to_req(ast), "top": top, "skip": skip}

    # adjacent term pairs → phrase boosts (ast.rs:121-147, generator :212-223)
    terms: list[Term] = []
    _collect_terms(ast, terms)
    pfields = phrase_fields if phrase_fields is not None else search_fields
    phrase_boosts = []
    for a, b in zip(terms, terms[1:]):
        if a.field is None and b.field is None and not a.quoted and not b.quoted:
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
