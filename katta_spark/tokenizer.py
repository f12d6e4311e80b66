"""Code-aware tokenizer — the analyzer of the engine.

Replaces Katta's per-collection Solr analyzer chain (reference:
katta-core/.../lib/lucene/SolrHandler.java:80-119 loads a SolrCore;
schema analyzers at data/solr/userindex/conf/schema.xml:306-378).
Contract (FIXTURES.md §3):

1. identifiers = maximal runs of ``[A-Za-z0-9_]+``;
2. each identifier splits on ``_`` and camelCase boundaries
   (``getUserName`` -> ``get,user,name``; ``HTTPRequest`` ->
   ``http,request``); sub-tokens are lowercased and those shorter
   than 2 chars are dropped;
3. when the split yields more than one part, the unsplit lowercase
   compound (``getusername``, ``read_file_chunk``) is ALSO emitted;
4. no stemming, no stopwords.

One source of truth: the regex constants below drive three identical
implementations — Spark Column expressions (JVM-side, whole-stage
codegen, zero Python in the hot path), a pure-Python mirror (the
pytest oracle), and a DuckDB SQL fragment (the driver's oracle).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IDENT_RE = r"[A-Za-z0-9_]+"
CAMEL1 = r"([a-z0-9])([A-Z])"  # aB  -> a B
CAMEL2 = r"([A-Z])([A-Z][a-z])"  # ABc -> A Bc
SEP_RE = r"[_ ]+"
MIN_TOKEN_LEN = 2

# path field analyzer: split on / . _ - (Katta indexes path-like Solr
# fields with a word-delimiter chain; see schema.xml:112-147)
PATH_SEP_RE = r"[/._\-]+"

# ------------------------------------------------ analyzer token filters
#
# Optional chain stages mirroring Lucene's ASCIIFoldingFilter and
# EnglishMinimalStemFilter (schema.xml analyzer plug points).  Each
# has the same three identical implementations as the tokenizer.
#
# ascii_fold runs BEFORE tokenization (the identifier regex is
# ASCII-only, so an unfolded 'café' would tokenize as 'caf');
# stem_plural runs per token AFTER tokenization (and after any
# StopFilter).  Both are restricted to the dialect-portable subset:
# translate() and a lookbehind-free regex exist identically in Spark
# (Java), Python, and DuckDB (RE2).

#: Latin-1 accent fold map (both cases — folding precedes lowercasing)
FOLD_SRC = ("ÀÁÂÃÄÅàáâãäåÈÉÊËèéêëÌÍÎÏìíîï"
            "ÒÓÔÕÖòóôõöÙÚÛÜùúûüÇçÑñÝýÿ")
FOLD_DST = ("AAAAAAaaaaaaEEEEeeeeIIIIiiii"
            "OOOOOoooooUUUUuuuuCcNnYyy")
assert len(FOLD_SRC) == len(FOLD_DST)

#: Harman S-stemmer first rule, portable subset: strip one final 's'
#: when the token is longer than 3 chars and the preceding char is
#: not s/u/i (keeps 'class', 'status', 'basis'; 'tables' -> 'table').
#: No lookbehind (RE2 has none): the preceding char is captured.
STEM_PLURAL_RE = r"^([a-z0-9_]*[abcdefghjklmnopqrtvwxyz0-9_])s$"
TOKEN_FILTERS = ("ascii_fold", "stem_plural")


def fold_text_col(text: Column) -> Column:
    return F.translate(text, FOLD_SRC, FOLD_DST)


def stem_token_col(tok: Column) -> Column:
    return F.when(
        F.length(tok) > 3,
        F.regexp_replace(tok, STEM_PLURAL_RE, r"$1"),
    ).otherwise(tok)


_FOLD_TABLE = str.maketrans(FOLD_SRC, FOLD_DST)
_stem_pat = re.compile(STEM_PLURAL_RE)


def py_fold_text(text: str) -> str:
    return (text or "").translate(_FOLD_TABLE)


def py_stem_token(tok: str) -> str:
    return _stem_pat.sub(r"\1", tok) if len(tok) > 3 else tok


def fold_text_sql(expr: str) -> str:
    return f"translate({expr}, '{FOLD_SRC}', '{FOLD_DST}')"


def stem_token_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 3 THEN "
        f"regexp_replace({expr}, '{STEM_PLURAL_RE}', '\\1') "
        f"ELSE {expr} END"
    )


# ---------------------------------------------------------------- Spark

def tokens_array(text: Column | str) -> Column:
    """array<string> of analyzed tokens for a text column.

    Pure built-in expression tree (regexp_extract_all / transform /
    flatten) — stays inside whole-stage codegen.
    """
    text = F.col(text) if isinstance(text, str) else text
    idents = F.regexp_extract_all(text, F.lit(IDENT_RE), F.lit(0))

    def expand(ident: Column) -> Column:
        norm = F.regexp_replace(
            F.regexp_replace(ident, CAMEL1, r"$1 $2"), CAMEL2, r"$1 $2"
        )
        parts = F.split(F.lower(norm), SEP_RE)
        keep = F.filter(parts, lambda x: F.length(x) >= MIN_TOKEN_LEN)
        nonempty = F.size(F.filter(parts, lambda x: x != F.lit("")))
        compound = F.when(
            (nonempty > 1) & (F.length(ident) >= MIN_TOKEN_LEN),
            F.array(F.lower(ident)),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(keep, compound)

    return F.flatten(F.transform(idents, expand))


def path_tokens_array(path: Column | str) -> Column:
    """array<string> tokens of a path-like keyword field."""
    path = F.col(path) if isinstance(path, str) else path
    return F.filter(
        F.split(F.lower(path), PATH_SEP_RE),
        lambda x: F.length(x) >= MIN_TOKEN_LEN,
    )


def explode_tokens(df: DataFrame, text_col: str, key_cols: list[str]) -> DataFrame:
    """(key_cols..., term) — one row per token occurrence."""
    return df.select(*key_cols, F.explode(tokens_array(text_col)).alias("term"))


# --------------------------------------------------------------- Python

_ident_pat = re.compile(IDENT_RE)
_camel1_pat = re.compile(CAMEL1)
_camel2_pat = re.compile(CAMEL2)
_sep_pat = re.compile(SEP_RE)
_path_sep_pat = re.compile(PATH_SEP_RE)


def py_tokenize(text: str) -> list[str]:
    """Pure-Python mirror of :func:`tokens_array` (test oracle)."""
    out: list[str] = []
    for ident in _ident_pat.findall(text or ""):
        norm = _camel2_pat.sub(r"\1 \2", _camel1_pat.sub(r"\1 \2", ident))
        parts = _sep_pat.split(norm.lower())
        out.extend(p for p in parts if len(p) >= MIN_TOKEN_LEN)
        if sum(1 for p in parts if p) > 1 and len(ident) >= MIN_TOKEN_LEN:
            out.append(ident.lower())
    return out


def py_path_tokenize(path: str) -> list[str]:
    return [
        p for p in _path_sep_pat.split((path or "").lower())
        if len(p) >= MIN_TOKEN_LEN
    ]


# --------------------------------------------------------------- DuckDB

def duckdb_tokens_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB SELECT producing (``id_col``, term) — one row per token
    occurrence — byte-identical in multiset to the Spark tokenizer.
    Used to build the driver's oracle SQL from the same constants.
    """
    return f"""
SELECT {id_col}, term FROM (
  SELECT {id_col}, unnest(list_concat(
    list_filter(parts, x -> length(x) >= {MIN_TOKEN_LEN}),
    CASE WHEN len(list_filter(parts, x -> x <> '')) > 1
          AND length(ident) >= {MIN_TOKEN_LEN}
         THEN [lower(ident)] ELSE [] END
  )) AS term
  FROM (
    SELECT {id_col}, ident,
      string_split_regex(
        lower(regexp_replace(regexp_replace(ident,
          '{CAMEL1}', '\\1 \\2', 'g'), '{CAMEL2}', '\\1 \\2', 'g')),
        '{SEP_RE}') AS parts
    FROM (
      SELECT {id_col},
             unnest(regexp_extract_all({text_col}, '{IDENT_RE}')) AS ident
      FROM {table}
    )
  )
)"""


def duckdb_tokens_list_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB SELECT producing (``id_col``, toks LIST) — the ORDERED
    token array per row, mirror of :func:`tokens_array` (needed by
    order-sensitive oracles: shingles, simhash)."""
    return f"""
SELECT {id_col}, flatten(list_transform(
  regexp_extract_all({text_col}, '{IDENT_RE}'),
  ident -> list_concat(
    list_filter(
      string_split_regex(lower(regexp_replace(regexp_replace(ident,
        '{CAMEL1}', '\\1 \\2', 'g'), '{CAMEL2}', '\\1 \\2', 'g')), '{SEP_RE}'),
      x -> length(x) >= {MIN_TOKEN_LEN}),
    CASE WHEN len(list_filter(
           string_split_regex(lower(regexp_replace(regexp_replace(ident,
             '{CAMEL1}', '\\1 \\2', 'g'), '{CAMEL2}', '\\1 \\2', 'g')), '{SEP_RE}'),
           x -> x <> '')) > 1
          AND length(ident) >= {MIN_TOKEN_LEN}
         THEN [lower(ident)] ELSE [] END
  ))) AS toks
FROM {table}"""
