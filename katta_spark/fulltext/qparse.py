"""Lucene-style query-string parser.

The reference parses full Lucene/Solr syntax via
``SolrPluginUtils.parseQueryStrings`` (katta-core/.../lib/lucene/
LuceneServer.java:1314-1353, exercised by katta-client/.../solr/
SolrQueryParseTest.java).  This module re-implements that front door
as a from-scratch recursive-descent parser producing a small AST the
engine evaluates (katta_spark/fulltext/luceval.py):

    query   := clause+                     # default operator OR
    clause  := [AND|OR|NOT] [+|-] atom [^boost]
    atom    := '(' query ')'               # nesting
             | '"' word+ '"'               # phrase
             | field ':' atom              # field scope
             | field ':' '[' a TO b ']'    # range ([] incl, {} excl)
             | term                        # analyzed term
             | wild*card | wild?card       # wildcard (not analyzed)
             | term~N | term~              # fuzzy (levenshtein <= N, ~ = 2)
             | atom^=N                     # constant score (all hits score N)
             | *:*                         # match-all

Binary semantics (the practical classic-Lucene reading): ``AND``
promotes both neighbours to MUST, ``OR`` leaves SHOULD, ``NOT``/``-``
makes the next clause MUST_NOT, ``+`` makes it MUST.  Bare terms run
through the engine analyzer (camelCase queries match their sub-tokens,
same as index time); a multi-token analysis becomes a nested OR.
Wildcard patterns and field values are lowercased but NOT analyzed.

Legacy surface: :func:`parse_query` (flat terms+filters) is kept for
callers that want the pre-AST behavior.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield

from katta_spark.tokenizer import py_tokenize

# ------------------------------------------------------------------- AST


@dataclass
class Term:
    """Analyzed scored term; ``field`` None = content field."""

    text: str
    field: str | None = None
    boost: float = 1.0


@dataclass
class Phrase:
    """Consecutive-token phrase on the content field (``slop`` > 0
    relaxes to ordered-within-window: span <= len(words)-1+slop, the
    ``"a b"~N`` proximity form), or (with a field) an exact-value
    match on a stored column."""

    words: list[str]
    field: str | None = None
    boost: float = 1.0
    slop: int = 0


@dataclass
class Wildcard:
    """``*``/``?`` pattern, lowercased, not analyzed."""

    pattern: str
    field: str | None = None
    boost: float = 1.0


@dataclass
class Fuzzy:
    """``term~N`` — edit-distance expansion (classic levenshtein;
    ``max_edits`` 0..2, bare ``term~`` = 2).  Lowercased, not
    analyzed.  Scored expand-and-score like :class:`Wildcard`; the
    distance is plain levenshtein, not Lucene's default
    Damerau-transposition variant (documented deviation — both the
    engine and the DuckDB oracle use the classic metric)."""

    text: str
    max_edits: int = 2
    field: str | None = None
    boost: float = 1.0


@dataclass
class Regex:
    """``/pattern/`` — Lucene RegexpQuery: the regex must match the
    WHOLE indexed term (Lucene anchors implicitly); lowercased, not
    analyzed.  Expand-and-score over the term catalog like
    :class:`Fuzzy` (regexes don't push to the parquet scan, so the
    catalog expansion + broadcast equi-join is the scalable shape)."""

    pattern: str
    field: str | None = None
    boost: float = 1.0


@dataclass
class RangeQ:
    """``field:[lo TO hi]`` — non-scoring range filter.  ``None``
    bound = open (``*``).  ``[]`` inclusive, ``{}`` exclusive."""

    field: str
    lo: str | None
    hi: str | None
    incl_lo: bool = True
    incl_hi: bool = True


@dataclass
class MatchAll:
    """``*:*`` — every document, constant score 1.0."""


@dataclass
class Bool:
    must: list = dfield(default_factory=list)
    should: list = dfield(default_factory=list)
    must_not: list = dfield(default_factory=list)
    boost: float = 1.0


@dataclass
class ConstScore:
    """``atom^=N`` — Lucene constant-score operator (LUCENE-6224 /
    classic ConstantScoreQuery): the wrapped query keeps its MATCH
    set but every hit scores exactly ``value`` — tf/idf and inner
    boosts are discarded, not multiplied."""

    child: object
    value: float = 1.0


Node = (Term | Phrase | Wildcard | Fuzzy | Regex | RangeQ | MatchAll | Bool
        | ConstScore)

# ----------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<regex>(?:\w+:)?/[^/\s]*/(?:\^\d+(?:\.\d+)?)?) |
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<quote>"(?P<qbody>[^"]*)") |
        (?P<range>[\[{](?P<rbody>[^\]}]*)[\]}]) |
        (?P<plus>\+) | (?P<minus>-) |
        (?P<word>[^\s()"\[\]{}+]+)
    )""",
    re.VERBOSE,
)

_RANGE_BODY_RE = re.compile(r"^\s*(\S+)\s+TO\s+(\S+)\s*$", re.IGNORECASE)
_BOOST_RE = re.compile(r"^(?P<body>.*?)\^(?P<boost>\d+(?:\.\d+)?)$")
# constant score attached to the word itself (term^=2); checked
# BEFORE _BOOST_RE so '^=' never half-matches as a boost
_CONST_RE = re.compile(r"^(?P<body>.*?)\^=(?P<val>\d+(?:\.\d+)?)$")
# fuzzy suffix on a WORD (never a bare "~N" token — those are phrase
# slop, consumed by _boosted): body~ (=2), body~0, body~1, body~2
_FUZZY_RE = re.compile(r"^(?P<body>.+?)~(?P<dist>[012])?$")


def _lex(q: str) -> list[tuple[str, str]]:
    """(kind, text) tokens.  Range brackets keep their bracket chars
    so the parser can recover inclusivity."""
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if m is None or m.end() == pos:
            break
        pos = m.end()
        if m.group("regex") is not None:
            # /pattern/ atoms lex whole (regex metachars like () []
            # would otherwise shatter on the operator rules)
            out.append(("regex", m.group("regex")))
        elif m.group("lparen"):
            out.append(("(", "("))
        elif m.group("rparen"):
            out.append((")", ")"))
        elif m.group("quote") is not None:
            out.append(("quote", m.group("qbody")))
        elif m.group("range") is not None:
            out.append(("range", m.group("range")))
        elif m.group("plus"):
            out.append(("+", "+"))
        elif m.group("minus"):
            out.append(("-", "-"))
        else:
            out.append(("word", m.group("word")))
    return out


# ---------------------------------------------------------------- parser


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    # clause sequence with AND/OR/NOT combination
    def parse_query(self, default_field: str | None = None) -> Node:
        items: list[list] = []  # [occur, node]; occur in {should,must,must_not}
        pending_op: str | None = None
        pending_mod: str | None = None
        while True:
            t = self.peek()
            if t is None or t[0] == ")":
                break
            kind, text = t
            up = text.upper()
            if kind == "word" and up in ("AND", "&&"):
                self.next()
                pending_op = "AND"
                continue
            if kind == "word" and up in ("OR", "||"):
                self.next()
                pending_op = "OR"
                continue
            if kind == "word" and up == "NOT":
                self.next()
                pending_mod = "-"
                continue
            if kind in ("+", "-"):
                self.next()
                pending_mod = kind
                continue
            node = self.parse_atom(default_field)
            if node is None:
                continue
            occur = {"+": "must", "-": "must_not"}.get(pending_mod, "should")
            if pending_op == "AND" and occur == "should":
                occur = "must"
            if pending_op == "AND" and items and items[-1][0] == "should":
                items[-1][0] = "must"  # AND promotes its left neighbour too
            items.append([occur, node])
            pending_op = None
            pending_mod = None
        b = Bool()
        for occur, node in items:
            getattr(b, occur).append(node)
        if not b.must and not b.must_not and len(b.should) == 1:
            return b.should[0]
        return b

    def parse_atom(self, default_field: str | None) -> Node | None:
        kind, text = self.next()
        if kind == "(":
            inner = self.parse_query(default_field)
            if self.peek() and self.peek()[0] == ")":
                self.next()
            return self._boosted(inner)
        if kind == "quote":
            return self._boosted(self._phrase(text, default_field))
        if kind == "range":
            if default_field is None:
                return None  # a bare range has no field to apply to
            return self._range(default_field, text)
        if kind == "regex":
            # (field:)?/pattern/(^boost)?
            m = re.match(
                r"^(?:(?P<fld>\w+):)?/(?P<body>[^/]*)/"
                r"(?:\^(?P<boost>\d+(?:\.\d+)?))?$",
                text,
            )
            if not m or not m.group("body"):
                return None
            node = Regex(
                pattern=m.group("body").lower(),
                field=m.group("fld") or default_field,
            )
            return self._apply_boost(
                node, float(m.group("boost") or 1.0)
            )
        if kind != "word":
            return None
        # constant score attached to the word itself (term^=2,
        # field:val^=2): parse the body as its own one-word atom,
        # then wrap — inner scoring is discarded at eval time
        cm = _CONST_RE.match(text)
        if cm and cm.group("body"):
            inner = _Parser([("word", cm.group("body"))]).parse_atom(
                default_field
            )
            if inner is None:
                return None
            return ConstScore(inner, float(cm.group("val")))
        # boost attached to the word itself (term^2)
        boost = 1.0
        bm = _BOOST_RE.match(text)
        if bm:
            text, boost = bm.group("body"), float(bm.group("boost"))
        if text == "*:*":
            return MatchAll()
        # field prefix: name:value  or  name: <atom>
        fm = re.match(r"^(\w+):(.*)$", text)
        if fm:
            fld, rest = fm.group(1), fm.group(2)
            if rest == "":
                nxt = self.peek()
                if nxt and nxt[0] in ("(", "quote", "range"):
                    node = self.parse_atom(fld)
                    return self._apply_boost(node, boost)
                return None
            return self._apply_boost(self._field_value(fld, rest), boost)
        node = self._term_or_wild(text, default_field)
        return self._apply_boost(node, boost)

    # trailing-modifiers on ), ": parse_atom of a '^n' / '~n' word
    # never occurs because _TOKEN_RE folds them into the preceding
    # word; for quoted / paren atoms they arrive as standalone tokens
    def _boosted(self, node: Node) -> Node:
        nxt = self.peek()
        if nxt and nxt[0] == "word":
            m = re.match(r"^~(\d+)(?:\^(\d+(?:\.\d+)?))?$", nxt[1])
            if m and isinstance(node, Phrase) and node.field is None:
                self.next()
                node.slop = int(m.group(1))
                if m.group(2):
                    node = self._apply_boost(node, float(m.group(2)))
                nxt = self.peek()
        if nxt and nxt[0] == "word" and re.match(r"^\^=\d+(\.\d+)?$", nxt[1]):
            self.next()
            return ConstScore(node, float(nxt[1][2:]))
        if nxt and nxt[0] == "word" and re.match(r"^\^\d+(\.\d+)?$", nxt[1]):
            self.next()
            return self._apply_boost(node, float(nxt[1][1:]))
        return node

    @staticmethod
    def _apply_boost(node: Node | None, boost: float) -> Node | None:
        if node is None or boost == 1.0:
            return node
        if isinstance(node, (Term, Phrase, Wildcard, Fuzzy, Regex, Bool)):
            node.boost = node.boost * boost
        elif isinstance(node, ConstScore):
            # boosting a constant-score query scales the constant
            node.value = node.value * boost
        return node

    def _field_value(self, fld: str, rest: str) -> Node | None:
        if len(rest) >= 2 and rest[0] == "/" and rest[-1] == "/":
            return Regex(pattern=rest[1:-1].lower(), field=fld)
        if "*" in rest or "?" in rest:
            return Wildcard(pattern=rest.lower(), field=fld)
        fm = _FUZZY_RE.match(rest)
        if fm:
            return Fuzzy(
                text=fm.group("body").lower(),
                max_edits=int(fm.group("dist") or 2),
                field=fld,
            )
        return Term(text=rest, field=fld)

    @staticmethod
    def _phrase(body: str, default_field: str | None) -> Node | None:
        if default_field is not None:
            # field-scoped quoted value on a stored column = exact match
            return Phrase(words=[body], field=default_field)
        words = py_tokenize(body)
        if not words:
            return None
        if len(words) == 1:
            return Term(text=words[0])
        return Phrase(words=words)

    @staticmethod
    def _range(fld: str, raw: str) -> Node | None:
        incl_lo = raw[0] == "["
        incl_hi = raw[-1] == "]"
        m = _RANGE_BODY_RE.match(raw[1:-1])
        if not m:
            return None
        lo, hi = m.group(1), m.group(2)
        return RangeQ(
            field=fld,
            lo=None if lo == "*" else lo,
            hi=None if hi == "*" else hi,
            incl_lo=incl_lo,
            incl_hi=incl_hi,
        )

    @staticmethod
    def _term_or_wild(text: str, default_field: str | None) -> Node | None:
        if len(text) >= 2 and text[0] == "/" and text[-1] == "/":
            return Regex(pattern=text[1:-1].lower(), field=default_field)
        if "*" in text or "?" in text:
            return Wildcard(pattern=text.lower(), field=default_field)
        fm = _FUZZY_RE.match(text)
        if fm:
            return Fuzzy(
                text=fm.group("body").lower(),
                max_edits=int(fm.group("dist") or 2),
                field=default_field,
            )
        toks = py_tokenize(text)
        if not toks:
            return None
        if len(toks) == 1:
            return Term(text=toks[0], field=default_field)
        # multi-token analysis (camelCase query): any sub-token matches,
        # scores sum — the OR ("synonym") expansion
        return Bool(should=[Term(text=t, field=default_field) for t in toks])


def parse_lucene(q: str) -> Node:
    """Parse a Lucene-style query string to the AST."""
    node = _Parser(_lex(q)).parse_query()
    if isinstance(node, Bool) and not (node.must or node.should or node.must_not):
        return MatchAll()
    return node


def combine_q_fq(q: str | None, fq: list[str] | None = None) -> Node:
    """The reference's q+fq combination: every parsed query joins one
    BooleanQuery as MUST (LuceneServer.java:1344-1352)."""
    parts: list[Node] = []
    if q is not None and q.strip():
        parts.append(parse_lucene(q))
    for f in fq or []:
        if f.strip():
            parts.append(parse_lucene(f))
    if not parts:
        raise ValueError("q or fq must not null.")  # LuceneServer.java:1341
    if len(parts) == 1:
        return parts[0]
    return Bool(must=parts)


# ------------------------------------------------------------ legacy API


@dataclass
class ParsedQuery:
    terms: list[str]
    mode: str = "or"
    filters: dict[str, object] = dfield(default_factory=dict)


def parse_query(q: str, default_mode: str = "or") -> ParsedQuery:
    """Flat legacy parse: terms, AND/OR, ``field:value`` equality
    filters.  Superseded by :func:`parse_lucene`."""
    mode = default_mode
    terms: list[str] = []
    filters: dict[str, object] = {}
    for raw in q.split():
        if raw.upper() == "AND":
            mode = "and"
            continue
        if raw.upper() == "OR":
            continue
        m = re.match(r"^(\w+):(.+)$", raw)
        if m:
            filters[m.group(1)] = m.group(2)
            continue
        terms.extend(py_tokenize(raw) or [raw.lower()])
    return ParsedQuery(terms=terms, mode=mode, filters=filters)
