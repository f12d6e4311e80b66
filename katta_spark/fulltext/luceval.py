"""Boolean-query evaluator: compiles the parsed Lucene AST
(katta_spark/fulltext/qparse.py) into a (doc_id, score) DataFrame
over a :class:`~katta_spark.index.search.PhysicalIndex`.

Scoring model (classic Lucene BooleanQuery):

- a doc matches a Bool node iff it matches ALL must clauses, at least
  one should clause when no must exists, and NO must_not clause;
- score = sum of the scores of the matching scoring clauses (must +
  should); non-scoring clauses (ranges / stored-column filters)
  contribute 0; MatchAll scores 1.0 (MatchAllDocsQuery);
- ``field:value`` is a SCORED term query when the field has postings
  (build_index(field_cols=...)) — the reference treats e.g.
  ``USER_FOLLOWINGS:0`` as a scored Lucene term
  (katta-client/.../node/KattaSearchTest.java:47) — and a
  non-scoring stored-column equality filter otherwise (Solr fq);
- wildcards expand against the index INSIDE the scan (a LIKE
  predicate pushed to parquet), never on the driver; matched terms
  score as a BM25 sum (expand-and-score, oracle-checkable — a
  deliberate deviation from Lucene's constant-score rewrite);
- a pure-negative query is evaluated Solr-style as (*:* minus the
  prohibited set).

Physical shape: every flat group of plain terms shares ONE pruned
postings scan (scored_docs batches them); nested sub-queries become
doc_id equi-joins of aggregated (doc_id, score) sets — shuffle keyed
on doc_id, no cross products anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from katta_spark.fulltext.qparse import (
    Bool,
    ConstScore,
    Fuzzy,
    MatchAll,
    Node,
    Phrase,
    RangeQ,
    Regex,
    Term,
    Wildcard,
)


def _is_number(s: str | None) -> bool:
    if s is None:
        return True
    try:
        float(s)
        return True
    except ValueError:
        return False


def _like_pattern(p: str) -> str:
    """Lucene wildcard -> SQL LIKE (escape %/_ first)."""
    return (
        p.replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
        .replace("?", "_")
    )


def strip_stops_node(stops: set[str], node: Node) -> Node | None:
    """Query-analyzer StopFilter symmetry: content terms the index
    dropped at build time vanish from the query tree (an AND with
    a stopword degrades to the remaining conjunction; an
    all-stopword clause list matches nothing).  Returns a NEW tree
    — parse results are never mutated.  Pure (no Spark), shared by
    the cluster evaluator and serve.LocalSearcher's node-local one."""
    if not stops:
        return node
    if isinstance(node, Term):
        if node.field is None and node.text in stops:
            return None
        return node
    if isinstance(node, Phrase):
        if node.field is not None:
            return node
        kept = [w for w in node.words if w not in stops]
        if not kept:
            return None
        if len(kept) == 1:
            return Term(text=kept[0], boost=node.boost)
        return Phrase(words=kept, boost=node.boost, slop=node.slop)
    if isinstance(node, Bool):
        must = [
            x for x in (strip_stops_node(stops, n) for n in node.must)
            if x is not None
        ]
        should = [
            x for x in (strip_stops_node(stops, n) for n in node.should)
            if x is not None
        ]
        must_not = [
            x for x in (strip_stops_node(stops, n) for n in node.must_not)
            if x is not None
        ]
        if not must and not should and not must_not:
            return None
        return Bool(must=must, should=should, must_not=must_not,
                    boost=node.boost)
    if isinstance(node, ConstScore):
        kept = strip_stops_node(stops, node.child)
        if kept is None:
            return None
        return ConstScore(kept, node.value)
    return node


def postings_term(fields: set[str], analyzers: dict[str, str],
                  t: Term) -> str | None:
    """The index-term a Term resolves to, or None when it is a
    stored-column filter instead (or needs analysis — see
    :func:`field_terms`).  Pure, shared across query tiers."""
    if t.field is None:
        return t.text
    if t.field in fields and analyzers.get(t.field, "keyword") == "keyword":
        return f"{t.field}:{t.text.lower()}"
    return None


def field_terms(fields: set[str], analyzers: dict[str, str],
                t: Term) -> list[str] | None:
    """Postings terms for a field whose analyzer tokenizes the
    value (per-field analyzer registry, schema.xml:306-378
    parity): the query value runs through the SAME analyzer as at
    index time; multiple tokens OR together (scores sum).  Pure,
    shared across query tiers."""
    if t.field not in fields:
        return None
    kind = analyzers.get(t.field, "keyword")
    if kind == "keyword":
        return [f"{t.field}:{t.text.lower()}"]
    if kind == "code":
        from katta_spark.tokenizer import py_tokenize

        toks = py_tokenize(t.text)
    else:  # path
        from katta_spark.tokenizer import py_path_tokenize

        toks = py_path_tokenize(t.text)
    return [f"{t.field}:{x}" for x in toks]


def fuse_spec(fields: set[str], analyzers: dict[str, str],
              synonyms: dict[str, list[str]],
              node: Node) -> tuple[list[str], tuple] | None:
    """Compile a boolean tree whose scoring leaves are ALL plain
    postings terms (content terms, synonym groups, keyword/analyzed
    field terms — boosts and ConstScore allowed) into ``(terms,
    spec)`` for :func:`katta_spark.index.search.make_bool_kernel` —
    the one-scan fused evaluation of an arbitrary nested query.

    Why one scan suffices: posting blocks are DOC-RANGE partitions
    (block_id = doc_id // block_range), so after the block_id
    exchange a kernel group holds EVERY query term's postings for its
    doc range — the whole tree evaluates per block with numpy masks,
    no joins.  Sound only when every matching doc is guaranteed to
    appear in the pruned scan, i.e. the tree REQUIRES at least one
    positive term at the root (checked below); trees that can match
    a doc containing none of the terms (MatchAll, pure-negative
    root/should) and leaves needing other data (phrases, wildcard /
    fuzzy / regex expansions, stored-column filters) return None and
    take the general join path.

    The spec is a nest of plain tuples (picklable into the kernel):
    ``("leaf", member_idxs, boost)`` — OR-sum of the member terms
    (a single term is a 1-member group; a synonym group or an
    analyzed field value is n members);
    ``("bool", must, should, must_not, boost)``;
    ``("const", child, value)``.
    """
    terms: dict[str, int] = {}

    def tid(t: str) -> int:
        return terms.setdefault(t, len(terms))

    def comp(n: Node) -> tuple | None:
        if isinstance(n, Term):
            if n.field is None and n.text in synonyms:
                group = sorted({n.text, *synonyms[n.text]})
                return ("leaf", tuple(tid(t) for t in group),
                        float(n.boost))
            pt = postings_term(fields, analyzers, n)
            if pt is not None:
                return ("leaf", (tid(pt),), float(n.boost))
            fts = field_terms(fields, analyzers, n)
            if fts is not None:  # analyzed field: OR of sub-tokens
                return ("leaf", tuple(tid(t) for t in fts),
                        float(n.boost))
            return None  # stored-column filter: needs the docs table
        if isinstance(n, Bool):
            must = [comp(c) for c in n.must]
            should = [comp(c) for c in n.should]
            nots = [comp(c) for c in n.must_not]
            if any(c is None for c in (*must, *should, *nots)):
                return None
            return ("bool", tuple(must), tuple(should), tuple(nots),
                    float(n.boost))
        if isinstance(n, ConstScore):
            child = comp(n.child)
            if child is None:
                return None
            return ("const", child, float(n.value))
        return None

    def positive(spec: tuple) -> bool:
        """True iff every doc matching ``spec`` must contain >=1 of
        the collected terms — the soundness condition for the pruned
        scan being the complete candidate universe."""
        kind = spec[0]
        if kind == "leaf":
            return len(spec[1]) > 0
        if kind == "const":
            return positive(spec[1])
        _, must, should, _nots, _ = spec
        if must:
            # all musts required -> one positive must suffices
            return any(positive(m) for m in must)
        # no must: >=1 should must match, so ALL shoulds must be
        # positive (a pure-negative should could admit a term-free doc)
        return bool(should) and all(positive(s) for s in should)

    spec = comp(node)
    if spec is None or not positive(spec):
        return None
    ordered = sorted(terms, key=terms.get)
    return ordered, spec


def flat_terms(node: Node) -> tuple[list[str], str] | None:
    """(terms, mode) when the tree is a flat OR or AND of plain
    unboosted content terms — the WAND-eligible shape."""
    if isinstance(node, Term) and node.field is None and node.boost == 1.0:
        return [node.text], "or"

    def plain(n: Node) -> bool:
        return isinstance(n, Term) and n.field is None and n.boost == 1.0

    if isinstance(node, Bool) and node.boost == 1.0 and not node.must_not:
        if node.should and not node.must and all(plain(n) for n in node.should):
            return [n.text for n in node.should], "or"
        if node.must and not node.should and all(plain(n) for n in node.must):
            return [n.text for n in node.must], "and"
    return None


class LuceneEvaluator:
    """Evaluate an AST against a PhysicalIndex."""

    def __init__(self, idx, synonyms: dict[str, list[str]] | None = None):
        self.idx = idx
        self.fields: set[str] = set(idx.stats.get("indexed_fields", []))
        self.analyzers: dict[str, str] = idx.stats.get("field_analyzers", {})
        # analyzer-chain config (schema.xml:306-378): stopwords come
        # from the index (they are an index-side invariant); synonyms
        # default from the index stats but a query-time override wins
        # (Solr applies SynonymFilter at query time)
        self.stops: set[str] = set(idx.stats.get("stopwords") or [])
        src = (
            synonyms if synonyms is not None
            else idx.stats.get("synonyms") or {}
        )
        self.synonyms: dict[str, list[str]] = {
            k.lower(): sorted({x.lower() for x in v}) for k, v in src.items()
        }

    # ------------------------------------------------------------ public

    def eval_query(self, node: Node) -> DataFrame:
        """(doc_id, score) of every matching doc, unranked.  Trees
        whose scoring leaves are all plain postings terms fuse into
        ONE pruned scan (:func:`fuse_spec` +
        ``PhysicalIndex.bool_scored``) — a nested boolean costs the
        same plan as a flat OR; everything else (phrases, expansions,
        stored filters, MatchAll) takes the general join path."""
        stripped = self._strip_stops(node)
        if stripped is None:
            return self._empty()
        if hasattr(self.idx, "bool_scored"):
            fused = fuse_spec(self.fields, self.analyzers,
                              self.synonyms, stripped)
            if fused is not None:
                return self.idx.bool_scored(*fused)
        return self._eval(stripped)

    # ------------------------------------------------- stopword stripping

    def _strip_stops(self, node: Node) -> Node | None:
        return strip_stops_node(self.stops, node)

    # ------------------------------------------------------------- nodes

    def _eval(self, node: Node) -> DataFrame:
        if isinstance(node, Bool):
            return self._eval_bool(node)
        if isinstance(node, Term):
            return self._eval_term(node)
        if isinstance(node, Phrase):
            return self._eval_phrase(node)
        if isinstance(node, Wildcard):
            return self._eval_wildcard(node)
        if isinstance(node, Fuzzy):
            return self._eval_fuzzy(node)
        if isinstance(node, Regex):
            return self._eval_regex(node)
        if isinstance(node, RangeQ):
            return self._eval_range(node)
        if isinstance(node, MatchAll):
            return self.idx.docs.select(
                "doc_id", F.lit(1.0).alias("score")
            )
        if isinstance(node, ConstScore):
            # ConstantScoreQuery: keep the child's match SET, replace
            # every score with the constant (inner scoring discarded)
            return self._eval(node.child).select(
                "doc_id", F.lit(float(node.value)).alias("score")
            )
        raise TypeError(f"unknown query node {node!r}")

    def _empty(self) -> DataFrame:
        return self.idx.docs.select(
            "doc_id", F.lit(0.0).alias("score")
        ).filter(F.lit(False))

    def _boost(self, df: DataFrame, boost: float) -> DataFrame:
        if boost == 1.0:
            return df
        return df.select(
            "doc_id", (F.col("score") * F.lit(float(boost))).alias("score")
        )

    def _postings_term(self, t: Term) -> str | None:
        return postings_term(self.fields, self.analyzers, t)

    def _field_terms(self, t: Term) -> list[str] | None:
        return field_terms(self.fields, self.analyzers, t)

    def _stored_filter(self, field: str, cond: Column) -> DataFrame:
        if field not in self.idx.docs.columns:
            return self._empty()
        return self.idx.docs.filter(cond).select(
            "doc_id", F.lit(0.0).alias("score")
        )

    def _eval_term(self, t: Term) -> DataFrame:
        if t.field is None and t.text in self.synonyms:
            # SynonymFilter expansion: the term and its synonym group
            # score as one OR clause (scores sum over the members
            # present — a documented deviation from Lucene's
            # SynonymQuery blended-df scoring, chosen because the sum
            # is exactly SQL-oracle-checkable)
            group = sorted({t.text, *self.synonyms[t.text]})
            return self._boost(self.idx.scored_docs(group, "or"), t.boost)
        pt = self._postings_term(t)
        if pt is not None:
            return self._boost(self.idx.scored_docs([pt]), t.boost)
        fts = self._field_terms(t)
        if fts is not None:  # analyzed field: OR of the sub-tokens
            if not fts:
                return self._empty()
            return self._boost(self.idx.scored_docs(fts, "or"), t.boost)
        return self._stored_filter(
            t.field, F.col(t.field).cast("string") == F.lit(t.text)
        )

    def _eval_phrase(self, p: Phrase) -> DataFrame:
        if p.field is None:
            return self._boost(
                self.idx.phrase_scored(p.words, slop=p.slop), p.boost
            )
        # field-scoped quoted value on a stored column = exact match
        return self._stored_filter(
            p.field, F.col(p.field).cast("string") == F.lit(p.words[0])
        )

    def _eval_wildcard(self, w: Wildcard) -> DataFrame:
        if w.field is None or w.field in self.fields:
            prefix = "" if w.field is None else f"{w.field}:"
            like = _like_pattern(prefix) + _like_pattern(w.pattern)
            cond = F.col("term").like(like)
            if w.field is None:
                # content terms never contain ':' — exclude the
                # field/path postings sharing the term space
                cond = cond & ~F.col("term").contains(":")
            return self._boost(self.idx.scored_docs_pred(cond), w.boost)
        return self._stored_filter(
            w.field,
            F.lower(F.col(w.field).cast("string")).like(
                _like_pattern(w.pattern)
            ),
        )

    def _eval_fuzzy(self, fz: Fuzzy) -> DataFrame:
        """``term~N``: expand against the term catalog by classic
        levenshtein distance (the FuzzyQuery term-dictionary rewrite),
        then score the matched term set as a BM25 sum — the same
        expand-and-score convention as wildcards.  The distance
        predicate runs on the CATALOG only (one row per distinct
        term); the postings scan is pruned by a broadcast equi-join
        (scored_docs_expanded), never by a per-posting-row
        levenshtein.  On a field without postings: a non-scoring
        stored-column edit-distance filter."""
        d = int(fz.max_edits)
        if fz.field is None or fz.field in self.fields:
            prefix = "" if fz.field is None else f"{fz.field}:"
            if prefix:
                body = F.substring(
                    F.col("term"), len(prefix) + 1, 2_147_483_647
                )
                cond = F.col("term").startswith(prefix)
            else:
                # content terms never contain ':' (field/path postings
                # share the term space behind a "<field>:" prefix)
                body = F.col("term")
                cond = ~F.col("term").contains(":")
            cond = (
                cond
                # cheap length band first: |len(t)| within d of the
                # target short-circuits levenshtein on most of the
                # catalog (Lucene's FuzzyQuery length pre-filter)
                & (F.abs(F.length(body) - F.lit(len(fz.text))) <= F.lit(d))
                & (F.levenshtein(body, F.lit(fz.text)) <= F.lit(d))
            )
            return self._boost(self.idx.scored_docs_expanded(cond), fz.boost)
        return self._stored_filter(
            fz.field,
            F.levenshtein(
                F.lower(F.col(fz.field).cast("string")), F.lit(fz.text)
            )
            <= F.lit(d),
        )

    def _eval_regex(self, rx: Regex) -> DataFrame:
        """``/pattern/``: Lucene RegexpQuery — the pattern must match
        the WHOLE term (Lucene's implicit anchoring), expanded on the
        term CATALOG (one row per distinct term) and scored through
        the broadcast equi-join pruned postings scan, exactly like
        fuzzy.  Regexes never push to the parquet scan, so the
        catalog expansion is the scalable shape.  On a field without
        postings: a non-scoring stored-column full-match filter."""
        anchored = f"^(?:{rx.pattern})$"
        if rx.field is None or rx.field in self.fields:
            prefix = "" if rx.field is None else f"{rx.field}:"
            if prefix:
                body = F.substring(
                    F.col("term"), len(prefix) + 1, 2_147_483_647
                )
                cond = F.col("term").startswith(prefix)
            else:
                # content terms never contain ':' (field/path postings
                # share the term space behind a "<field>:" prefix)
                body = F.col("term")
                cond = ~F.col("term").contains(":")
            cond = cond & body.rlike(anchored)
            return self._boost(self.idx.scored_docs_expanded(cond), rx.boost)
        return self._stored_filter(
            rx.field,
            F.lower(F.col(rx.field).cast("string")).rlike(anchored),
        )

    def _eval_range(self, r: RangeQ) -> DataFrame:
        if r.field not in self.idx.docs.columns:
            return self._empty()
        numeric = _is_number(r.lo) and _is_number(r.hi)
        col = (
            F.col(r.field).cast("double")
            if numeric
            else F.col(r.field).cast("string")
        )

        def lit(v: str) -> Column:
            return F.lit(float(v)) if numeric else F.lit(v)

        cond = F.lit(True)
        if r.lo is not None:
            cond = cond & (col >= lit(r.lo) if r.incl_lo else col > lit(r.lo))
        if r.hi is not None:
            cond = cond & (col <= lit(r.hi) if r.incl_hi else col < lit(r.hi))
        return self._stored_filter(r.field, cond)

    # -------------------------------------------------------------- bool

    def _batch_and_rest(
        self, nodes: list[Node]
    ) -> tuple[list[str], list[Node]]:
        """Split child nodes into batchable plain postings terms (one
        shared scan) and everything else."""
        terms: list[str] = []
        rest: list[Node] = []
        for n in nodes:
            pt = self._postings_term(n) if isinstance(n, Term) else None
            if (
                pt is not None
                and n.boost == 1.0
                and not (n.field is None and n.text in self.synonyms)
            ):
                terms.append(pt)
            else:
                rest.append(n)
        return terms, rest

    def _sum_union(self, dfs: list[DataFrame]) -> DataFrame | None:
        """Union (doc_id, score) sets, summing scores per doc."""
        if not dfs:
            return None
        if len(dfs) == 1:
            return dfs[0]
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d)
        return u.groupBy("doc_id").agg(F.sum("score").alias("score"))

    def _eval_bool(self, b: Bool) -> DataFrame:
        # --- should side: one batched scan for plain terms + the rest
        sh_terms, sh_rest = self._batch_and_rest(b.should)
        sh_dfs = []
        if sh_terms:
            sh_dfs.append(self.idx.scored_docs(sh_terms, "or"))
        sh_dfs.extend(self._eval(n) for n in sh_rest)
        should_df = self._sum_union(sh_dfs)

        # --- must side: batched AND scan + per-node inner joins
        mu_terms, mu_rest = self._batch_and_rest(b.must)
        base: DataFrame | None = None
        if mu_terms:
            base = self.idx.scored_docs(mu_terms, "and")
        for n in mu_rest:
            d = self._eval(n).withColumnRenamed("score", "_s2")
            if base is None:
                base = d.withColumnRenamed("_s2", "score")
            else:
                base = base.join(d, "doc_id").select(
                    "doc_id",
                    (F.col("score") + F.col("_s2")).alias("score"),
                )

        if base is not None:
            if should_df is not None:
                s2 = should_df.withColumnRenamed("score", "_ss")
                base = base.join(s2, "doc_id", "left").select(
                    "doc_id",
                    (
                        F.col("score")
                        + F.coalesce(F.col("_ss"), F.lit(0.0))
                    ).alias("score"),
                )
        elif should_df is not None:
            base = should_df
        else:
            # pure-negative query: Solr's implicit *:*
            base = self.idx.docs.select("doc_id", F.lit(1.0).alias("score"))

        # must_not: plain terms batch into ONE pruned scan; other
        # nodes evaluate individually; a single anti-join applies all
        nt_terms, nt_rest = self._batch_and_rest(b.must_not)
        nots: DataFrame | None = None
        if nt_terms:
            nots = self.idx.scored_docs(nt_terms, "or").select("doc_id")
        for n in nt_rest:
            d = self._eval(n).select("doc_id")
            nots = d if nots is None else nots.unionByName(d)
        if nots is not None:
            base = base.join(nots, "doc_id", "left_anti")
        return self._boost(base, b.boost)
