"""Minimal query-string parser: the engine-facing analogue of
Katta's Solr query parse (q + fq conjunction,
katta-core/.../lib/lucene/LuceneServer.java:1314-1353).

Grammar (flat, no nesting — matches the reference's effective use):

    query   := clause (sep clause)*
    clause  := field ':' value        -> non-scoring filter (fq)
             | bare-term              -> scored term (analyzed)
    sep     := 'AND' | 'OR' | whitespace (defaults to the mode arg)

``AND`` anywhere makes the term conjunction conjunctive — exactly
the MUST-conjunction Katta builds from q+fq.  Bare terms are run
through the engine's analyzer (a camelCase query like
``getUserName`` matches its sub-tokens, same as at index time).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from katta_spark.tokenizer import py_tokenize

_FIELD_RE = re.compile(r"^(\w+):(.+)$")


@dataclass
class ParsedQuery:
    terms: list[str]
    mode: str = "or"
    filters: dict[str, object] = field(default_factory=dict)


def parse_query(q: str, default_mode: str = "or") -> ParsedQuery:
    mode = default_mode
    terms: list[str] = []
    filters: dict[str, object] = {}
    for raw in q.split():
        if raw.upper() == "AND":
            mode = "and"
            continue
        if raw.upper() == "OR":
            continue
        m = _FIELD_RE.match(raw)
        if m:
            filters[m.group(1)] = m.group(2)
            continue
        terms.extend(py_tokenize(raw) or [raw.lower()])
    return ParsedQuery(terms=terms, mode=mode, filters=filters)
