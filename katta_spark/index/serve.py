"""Serving-tier searcher over the on-disk index — no Spark in the
query path.

Katta's architecture splits BUILD from SERVE: Hadoop builds Lucene
shard indexes, but queries are answered by nodes that serve their
assigned shards LOCALLY (katta-core/.../node/Node.java deploys
shards to a node-local work dir; LuceneServer.search answers from
the local IndexSearcher — a query is an RPC, never a MapReduce job).
``PhysicalIndex`` is the cluster tier here (build + heavy analytics
through Spark); :class:`LocalSearcher` is the node tier: it opens
the SAME parquet index layout with pyarrow, prunes row groups by
term (postings files are term-sorted at write, so parquet min/max
stats skip everything but the query's terms), and scores through
numpy-native scans (:func:`_wand_scan` / :func:`_exhaustive_scan`)
that mirror the Spark kernels' decode, accumulation order, skip
rule, and tie-break exactly (rank-identity tested query-by-query;
the positional phrase path still runs the shared
:func:`make_phrase_kernel`) — at RPC-class latency: no job
scheduling, no shuffle, no executor round-trip, and no per-row
pandas overhead in the hot loop.

100 TB shape: a fleet of stateless searcher processes each opens its
assigned shard directories (Katta's shard->node assignment, done by
any ordinary service scheduler); the global df catalog + corpus
stats ride in ``stats.json`` / ``terms`` parquet exactly as the
reference distributes ``getDocFreqs()`` (LuceneServer.java:76-82),
so node-local scores equal cluster scores.  Per-query work is
O(query-term posting blocks), independent of corpus size.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow.dataset as pa_ds

from katta_spark.index.search import (
    make_phrase_kernel,
    strip_stops,
)

_BLOCK_COLS = ["term", "block_id", "max_tf", "min_dl",
               "doc_gaps", "tfs", "dls"]
_POS_COLS = _BLOCK_COLS + ["pos_lens", "pos_deltas"]

Res = tuple[np.ndarray, np.ndarray]  # (sorted unique doc_ids, scores)

# calendar-unit -> pandas period freq, the node-tier mirror of the
# Spark tier's DATE_UNITS/date_trunc map (ops/timeseries.py:20-23)
_DATE_FREQ = {
    "YEAR": "Y", "MONTH": "M", "DAY": "D",
    "HOUR": "h", "MINUTE": "min", "SECOND": "s",
}


def _field_sort(df: pd.DataFrame,
                sort_cols: list[tuple[str, str]]) -> pd.DataFrame:
    """Stable multi-key field sort with EXACTLY Spark's orderBy
    semantics — asc puts nulls FIRST, desc puts nulls LAST (Spark's
    default null ordering), doc_id asc breaks ties (the reference's
    FieldSortComparator falls back to shard-doc order the same way,
    FieldSortComparator.java:44-87).  Implemented as a reversed chain
    of stable sorts so each key keeps its own direction AND its own
    null position (pandas sort_values has one na_position for all
    keys)."""
    out = df.sort_values("doc_id", kind="mergesort")
    for col, direction in reversed(sort_cols):
        asc = direction == "asc"
        out = out.sort_values(
            col, ascending=asc, kind="mergesort",
            na_position="first" if asc else "last",
        )
    return out


def _wc_regex(pattern: str):
    """Lucene wildcard -> anchored regex translating ONLY ``*`` and
    ``?`` (every other character is escaped) — the exact semantics of
    the Spark tier's LIKE mapping (luceval._like_pattern maps */? to
    %/_ and leaves ``[`` literal).  fnmatch.translate would
    additionally honor [seq] character classes, so a pattern like
    ``te[xs]t`` would match different docs on the two tiers."""
    import re

    body = "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pattern
    )
    # inline (?s) + \Z so the SAME semantics survive when only the
    # .pattern string is handed to pandas str.match (stored-field
    # path): full anchored match, '.' crossing newlines like LIKE '%'
    return re.compile(f"(?s)^(?:{body})\\Z")


def _levenshtein(a: str, b: str) -> int:
    """Classic edit distance — the SAME metric the cluster tier's
    F.levenshtein uses (not Damerau), so fuzzy expansion sets match."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _catalog_match_rows(cat: pd.DataFrame, field: str | None,
                        match_body) -> pd.DataFrame:
    """Multi-term rewrite against a (term, df) catalog: rows whose
    un-prefixed term body satisfies ``match_body`` — content terms
    when ``field`` is None (never containing ':'), else the field's
    prefixed slice.  Shared by the single-node evaluator and the
    scatter-gather df exchange (both must match the SAME term set)."""
    terms = cat["term"].astype(str)
    if field is None:
        cand = ~terms.str.contains(":", regex=False)
        bodies = terms
    else:
        prefix = f"{field}:"
        cand = terms.str.startswith(prefix)
        bodies = terms.str.slice(len(prefix))
    sel = cand.to_numpy() & np.array(
        [match_body(x) for x in bodies], dtype=bool
    )
    return cat[sel]


def _iter_expansions(fields: set, node):
    """Yield (key, field, match_body) for every catalog-expansion
    node (Wildcard/Fuzzy/Regex over content or an indexed field) in
    the tree.  The key is the node's SEMANTIC identity — two
    identical patterns share one expansion — so the df-exchange
    phase and the eval phase agree without positional bookkeeping."""
    import re

    from katta_spark.fulltext.qparse import (
        Bool, ConstScore, Fuzzy, Regex, Wildcard,
    )

    if isinstance(node, Bool):
        for c in (*node.must, *node.should, *node.must_not):
            yield from _iter_expansions(fields, c)
        return
    if isinstance(node, ConstScore):
        yield from _iter_expansions(fields, node.child)
        return
    if isinstance(node, Wildcard) and (node.field is None
                                       or node.field in fields):
        rx = _wc_regex(node.pattern)
        yield (("wc", node.field, node.pattern), node.field,
               lambda s, rx=rx: bool(rx.match(s)))
    elif isinstance(node, Fuzzy) and (node.field is None
                                      or node.field in fields):
        d, t = int(node.max_edits), node.text
        yield (("fz", node.field, t, d), node.field,
               lambda s, t=t, d=d: (abs(len(s) - len(t)) <= d
                                    and _levenshtein(s, t) <= d))
    elif isinstance(node, Regex) and (node.field is None
                                      or node.field in fields):
        rx = re.compile(f"^(?:{node.pattern})$")
        yield (("rx", node.field, node.pattern), node.field,
               lambda s, rx=rx: bool(rx.match(s)))


def _collect_plain_terms(stats: dict, fields: set, analyzers: dict,
                         synonyms: dict, node) -> set[str]:
    """Every postings term the evaluator would score for ``node``
    EXCEPT catalog expansions (collected separately) — mirrors the
    _LocalEval paths exactly: synonym groups, analyzed field terms,
    phrase words, all run through the same strip_stops rewrite."""
    from katta_spark.fulltext.luceval import field_terms, postings_term
    from katta_spark.fulltext.qparse import Bool, ConstScore, Phrase, Term

    out: set[str] = set()

    def add(ts):
        out.update(strip_stops(stats, list(ts)))

    def walk(n):
        if isinstance(n, Term):
            if n.field is None and n.text in synonyms:
                add(sorted({n.text, *synonyms[n.text]}))
                return
            pt = postings_term(fields, analyzers, n)
            if pt is not None:
                add([pt])
                return
            fts = field_terms(fields, analyzers, n)
            if fts:
                add(fts)
            return
        if isinstance(n, Phrase):
            if n.field is None:
                add(list(n.words))
            return
        if isinstance(n, Bool):
            for c in (*n.must, *n.should, *n.must_not):
                walk(c)
            return
        if isinstance(n, ConstScore):
            walk(n.child)

    walk(node)
    return out


def _np_cols(blocks: pd.DataFrame):
    """Columns of a (block_id, term)-sorted blocks frame as plain
    numpy arrays — the serving scan avoids ALL per-row pandas access
    (profiling: itertuples/iloc dominated the kernel 4:1 over the
    actual varint decode)."""
    return (
        blocks["term"].to_numpy(),
        blocks["block_id"].to_numpy(),
        blocks["df"].to_numpy(),
        blocks["doc_gaps"].to_numpy(),
        blocks["tfs"].to_numpy(),
        blocks["dls"].to_numpy(),
    )


class QueryTimeout(TimeoutError):
    """A node-local query exceeded its deadline — the Lucene
    TimeLimitingCollector contract the reference wraps every shard
    search in (LuceneServer.java:1555-1564): the collector aborts
    between doc collections rather than running to completion.
    Here the numpy kernels check the deadline between posting-block
    decodes (the same granularity: work already decoded is
    abandoned, no partial ranking is returned — a shard result is
    exact or absent).  Subclasses :class:`TimeoutError` so a budgeted
    query under ``complete=True`` raises ONE exception type whether
    the worker kernel aborts first (QueryTimeout) or the parent's
    budget race wins (TimeoutError) — callers catch TimeoutError."""


#: check the clock only every N block decodes — a monotonic read is
#: ~40 ns but the decode loop is hot; N=32 bounds overshoot to a few
#: hundred microseconds of block work
_DEADLINE_STRIDE = 32

#: process-wide kernel deadline for a scatter WORKER — armed by
#: _deadline_task around a budgeted shard task so a runaway scan
#: aborts inside the worker (freeing it for the shard's next query)
#: even though the task functions don't thread a deadline through
_WORKER_DEADLINE: float | None = None


def _check_deadline(deadline: float | None, i: int) -> None:
    if deadline is None:
        deadline = _WORKER_DEADLINE
    if deadline is not None and (i % _DEADLINE_STRIDE) == 0:
        import time

        if time.monotonic() > deadline:
            raise QueryTimeout("query deadline exceeded in kernel")


def _payload_dir(p) -> str:
    """Every scatter payload leads with its shard's index dir."""
    return p[0] if isinstance(p, tuple) else str(p)


def _swap_payload_dir(p, d: str):
    """Re-target a scatter payload at a replica dir (replicas hold
    byte-identical shard content, so the rest of the payload —
    offsets, merged catalog, query — carries over unchanged)."""
    return (d,) + tuple(p[1:]) if isinstance(p, tuple) else d


def _is_infra_failure(exc: BaseException) -> bool:
    """True for failures that mean THIS COPY of the shard is
    unreachable/unreadable (missing dir, I/O error, corrupt parquet)
    rather than the query being bad — only these are eligible for
    replica re-dispatch, mirroring NodeInteraction.java:141-205
    (shard-access errors retry on another node; deterministic query
    errors never do).  TimeoutError (hence QueryTimeout) is excluded:
    OSError is its base in Python 3 but timeouts have their own
    budget-aware failover rule in _scatter."""
    import pyarrow as pa

    if isinstance(exc, TimeoutError):
        return False
    return isinstance(exc, (OSError, pa.ArrowException))


def _deadline_task(args: tuple):
    """Run a shard task with the worker-side kernel deadline armed at
    75% of the client budget remaining at dispatch (the reference's
    collector fraction) — see _scatter's failure policy."""
    import time

    fn, payload, budget_ms = args
    global _WORKER_DEADLINE
    _WORKER_DEADLINE = time.monotonic() + 0.75 * float(budget_ms) / 1000.0
    try:
        return fn(payload)
    finally:
        _WORKER_DEADLINE = None


def _exhaustive_scan(blocks: pd.DataFrame, n_docs: float, avgdl: float,
                     k1: float, b: float, block_range: int,
                     deadline: float | None = None
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_id, score, nt) over every posting row — numpy-native
    mirror of make_exhaustive_kernel.  Score accumulation order is
    the row order of the (block_id, term)-sorted frame, which is the
    per-doc sorted-term order _score_group uses, so scores are
    IDENTICAL to the Spark tier (a doc lives in exactly one block,
    its contributions are term-sorted rows)."""
    from katta_spark.index import codec

    terms, bids, dfs, gaps, tfs, dls = _np_cols(blocks)
    if not len(bids):
        return (np.empty(0, np.int64), np.empty(0, np.float64),
                np.empty(0, np.int64))
    all_ids, all_scores = [], []
    for i in range(len(bids)):
        _check_deadline(deadline, i)
        ids, tf, dl = codec.decode_block(
            gaps[i], tfs[i], dls[i], int(bids[i]), block_range
        )
        idf = codec.bm25_idf(float(dfs[i]), n_docs)
        all_ids.append(ids)
        all_scores.append(idf * codec.bm25_tfnorm(tf, dl, avgdl, k1, b))
    ids = np.concatenate(all_ids)
    scores = np.concatenate(all_scores)
    uniq, inv = np.unique(ids, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(summed, inv, scores)
    nt = np.bincount(inv, minlength=uniq.size).astype(np.int64)
    return uniq, summed, nt


def _wand_scan(blocks: pd.DataFrame, n_docs: float, avgdl: float,
               k1: float, b: float, block_range: int, k: int,
               n_terms: int, mode: str, min_match: int | None = None,
               deadline: float | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND top-k — numpy-native mirror of
    make_wand_kernel: per-row upper bounds are computed VECTORIZED
    up front, group iteration touches only integer boundaries, and a
    doc-range group decodes only when its bound can beat the running
    k-th score.  Same skip rule, same merge, same tie-break — so the
    result set is identical to both the Spark WAND kernel and the
    exhaustive scan (tested)."""
    from katta_spark.index import codec
    from katta_spark.index.search import _topk_merge

    required = n_terms if mode == "and" else max(1, int(min_match or 1))
    terms, bids, dfs, gaps, tfs, dls = _np_cols(blocks)
    if not len(bids):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    mt = blocks["max_tf"].to_numpy().astype(np.float64)
    md = blocks["min_dl"].to_numpy().astype(np.float64)
    dfv = dfs.astype(np.float64)
    idf_v = np.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
    ub_v = idf_v * (mt * (k1 + 1.0)
                    / (mt + k1 * (1.0 - b + b * md / avgdl)))
    bounds = np.nonzero(bids[1:] != bids[:-1])[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(bids)]))
    top: tuple[np.ndarray, np.ndarray] | None = None
    threshold = -np.inf
    for gi, (s, e) in enumerate(zip(starts, ends)):
        _check_deadline(deadline, gi)
        if required > 1 and len(set(terms[s:e])) < required:
            continue
        if float(ub_v[s:e].sum()) < threshold:
            continue
        g_ids, g_scores = [], []
        bid = int(bids[s])
        for i in range(s, e):
            ids, tf, dl = codec.decode_block(
                gaps[i], tfs[i], dls[i], bid, block_range
            )
            g_ids.append(ids)
            g_scores.append(
                float(idf_v[i]) * codec.bm25_tfnorm(tf, dl, avgdl, k1, b)
            )
        ids = np.concatenate(g_ids)
        scores = np.concatenate(g_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        summed = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(summed, inv, scores)
        if required > 1:
            nt = np.bincount(inv, minlength=uniq.size)
            keep = nt >= required
            uniq, summed = uniq[keep], summed[keep]
            if not uniq.size:
                continue
        top = _topk_merge(top, uniq, summed, k)
        if top[0].size >= k:
            threshold = float(top[1][-1])
    if top is None:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return top


class _ResultCache:
    """In-memory LRU query-result cache — the node side of Solr's
    queryResultCache (the reference's embedded per-shard Solr cores
    serve repeated queries from it and flush on a new searcher,
    LuceneServer.java:327-332 node caches).  Values are the tiny
    final results (top-k lists / counts), never posting data, so a
    full cache is a few MB.  Invalidation is structural: refresh()
    re-runs __init__, which builds a fresh empty cache (the
    new-searcher flush)."""

    _MISS = object()

    def __init__(self, maxsize: int = 256):
        from collections import OrderedDict

        self._d: "OrderedDict" = OrderedDict()
        self.maxsize = int(maxsize)
        self.hits = 0
        self.misses = 0

    def get(self, key):
        v = self._d.get(key, self._MISS)
        if v is self._MISS:
            self.misses += 1
        else:
            self.hits += 1
            self._d.move_to_end(key)
        return v

    def put(self, key, val) -> None:
        self._d[key] = val
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)


class LocalSearcher:
    """Node-local query handle over one built index directory.

    Rank-identity contract: ``topk``/``count`` return exactly what
    ``PhysicalIndex.topk``/``count`` return on the same directory
    (tested), because both feed the same posting blocks through the
    same kernels with the same global stats.
    """

    # cross-shard scoring plumbing (ShardedSearcher.query): a
    # _global_view overlay sets these so the SAME eval code scores a
    # shard's postings with corpus-wide df / n_docs / avgdl — the
    # reference's getDocFreqs() exchange (LuceneServer.java:76-82)
    _df_override: dict[str, int] | None = None
    _cache_host: "LocalSearcher | None" = None
    #: active kernel deadline (monotonic seconds) — set by _budget()
    #: for the duration of one timed query; every scoring path funnels
    #: through _scored / _wand_scan, which check it between block
    #: decodes (TimeLimitingCollector parity)
    _deadline: float | None = None

    def _budget(self, timeout_ms: float | None):
        """Context manager arming the kernel deadline at 75% of the
        client budget — the reference's fraction
        (LuceneServer.java:435-437: the collector gets 75% of the
        client timeout so the node can still serialize a reply
        inside it; client budget LuceneClient.java:182)."""
        import contextlib
        import time

        @contextlib.contextmanager
        def cm():
            if timeout_ms is None:
                yield
                return
            self._deadline = (
                time.monotonic() + 0.75 * float(timeout_ms) / 1000.0
            )
            try:
                yield
            finally:
                self._deadline = None

        return cm()

    def _checked_table(self, ds, columns=None, filter=None):
        """Stored-field / postings / catalog scan with deadline
        checks BETWEEN record batches — TimeLimitingCollector parity
        for the NON-kernel surfaces (round 5; the reference bounds
        every collector including facet/group calls,
        LuceneServer.java:1555-1564).  The round-4 deadline only
        covered the scoring kernels, so a budgeted significant_terms
        or a huge stored-field read could wedge a scatter worker
        until the scan ended; this aborts it in-worker at the same
        75%-of-budget deadline.  With no deadline armed (the common
        case) it is ONE to_table call — zero overhead."""
        if self._deadline is None and _WORKER_DEADLINE is None:
            return ds.to_table(columns=columns, filter=filter)
        import pyarrow as pa

        scanner = ds.scanner(columns=columns, filter=filter,
                             batch_size=16384)
        batches = []
        for b in scanner.to_batches():
            _check_deadline(self._deadline, 0)
            batches.append(b)
        return pa.Table.from_batches(
            batches, schema=scanner.projected_schema
        )

    def __init__(self, index_dir: str,
                 commits: list[str] | None = None,
                 qcache_size: int = 256):
        root = Path(index_dir)
        self.index_dir = index_dir
        # fresh (empty) result cache per searcher generation — the
        # queryResultCache new-searcher flush; qcache_size=0 disables
        self._qcache_size = int(qcache_size)
        self._qcache = (
            _ResultCache(self._qcache_size) if qcache_size else None
        )
        self.stats = json.loads((root / "stats.json").read_text())
        self._postings = pa_ds.dataset(
            str(root / "postings"), partitioning="hive"
        )
        self._docs = pa_ds.dataset(str(root / "docs"), partitioning="hive")
        self._terms = pa_ds.dataset(str(root / "terms"))
        self._tomb = self._load_tombstones(root)
        # lazy caches MUST reset here so refresh() (which re-runs
        # __init__) invalidates them — a handle that answered '*:*'
        # or a wildcard before a delete+commit would otherwise keep
        # serving the pre-refresh doc set / term catalog forever
        self._all_ids_cache: np.ndarray | None = None
        self._catalog_cache: pd.DataFrame | None = None
        self._commits = sorted(set(commits)) if commits else None
        if self._commits:
            self._snapshot(root)

    def _snapshot(self, root: Path) -> None:
        """Point-in-time read pinned to ``commits`` (the node-tier
        mirror of PhysicalIndex(commits=...)): datasets restrict to
        the commit partitions, the term catalog is recomputed from
        the PINNED postings at query time (the global terms parquet
        spans all commits), stats come from the manifest's per-group
        lineage, and tombstones are ignored — a snapshot predates
        later deletes, same rule as the Spark tier."""
        from katta_spark.index.build import load_manifest

        known = set(self.stats.get("commits") or [])
        missing = [c for c in self._commits if c not in known]
        if missing:
            raise ValueError(
                f"unknown commit(s) {missing}; index has {sorted(known)}"
            )
        cf = pa_ds.field("commit").isin(self._commits)
        self._postings = self._postings.filter(cf)
        self._docs = self._docs.filter(cf)
        self._tomb = None
        rows = [m for m in load_manifest(self.index_dir)
                if m.get("status") == "done"
                and m.get("commit") in set(self._commits)]
        if rows and all("sdl_group" in m for m in rows):
            n = sum(int(m["n_docs_group"]) for m in rows)
            sdl = sum(int(m["sdl_group"]) for m in rows)
        else:  # pre-sdl_group manifest: one column-pruned read
            t = self._docs.to_table(columns=["dl"])
            n = t.num_rows
            sdl = int(pd.Series(t["dl"].to_numpy()).fillna(0).sum())
        self.stats = dict(
            self.stats, n_docs=n, avgdl=(sdl / n if n else 0.0),
            commits=self._commits,
        )

    def refresh(self) -> "LocalSearcher":
        """Searcher REOPEN (Katta's IndexUpdateListener →
        DefaultSearcherFactory.reopenIndex, LuceneServer.java:362-369):
        a LocalSearcher binds the dataset listing, stats and
        tombstones seen at open; after a new commit, delete, or
        compaction, refresh() re-opens them so the new state becomes
        visible (tested).  NOTE: unlike a true Lucene point-in-time
        reader, an un-refreshed handle is not guaranteed to keep
        serving the old snapshot after a commit — the terms catalog
        is rewritten in place, so catalog-dependent queries may fail
        until refresh (the same staleness rule as the Spark tier).
        A commit-pinned handle re-pins to the SAME commits."""
        self.__init__(self.index_dir, self._commits,
                      qcache_size=self._qcache_size)
        return self

    def node_metrics(self) -> dict:
        """Per-node operational counters — the reference nodes report
        query throughput and cache stats to a metrics registry
        (Katta's node metrics + Solr cache MBeans).  Pure in-memory
        reads, no I/O."""
        c = self._qcache
        total = (c.hits + c.misses) if c else 0
        return {
            "index_dir": self.index_dir,
            "n_docs": int(self.stats["n_docs"]),
            "commits": list(self.stats.get("commits") or []),
            "pinned_commits": list(self._commits or []),
            "tombstones": int(self._tomb.size) if self._tomb is not None
            else 0,
            "qcache_hits": c.hits if c else 0,
            "qcache_misses": c.misses if c else 0,
            "qcache_hit_rate": round(c.hits / total, 4) if total else 0.0,
            "qcache_entries": len(c._d) if c else 0,
        }

    def _cached(self, key: tuple, compute):
        """Serve ``key`` from the result cache, else compute + fill.
        Overlays (_global_view) bypass entirely: their results depend
        on the per-query df exchange, not just this index's state."""
        c = self._qcache
        if (c is None or self._df_override is not None
                or self._cache_host is not None):
            return compute()
        v = c.get(key)
        if v is _ResultCache._MISS:
            v = compute()
            c.put(key, v)
        return v

    def _global_view(self, n_docs: float, avgdl: float,
                     df_map: dict[str, int]) -> "LocalSearcher":
        """A shallow overlay of this handle that scores with GLOBAL
        corpus stats and per-term dfs (the scatter side of
        ShardedSearcher.query).  Datasets, tombstones and lazy caches
        are shared with the underlying handle; only the scoring
        inputs differ."""
        import copy

        v = copy.copy(self)
        v.stats = dict(self.stats, n_docs=n_docs, avgdl=avgdl)
        v._df_override = df_map
        v._cache_host = self
        return v

    @staticmethod
    def _load_tombstones(root: Path) -> np.ndarray | None:
        from katta_spark.index.delete import tombstone_dir

        d = tombstone_dir(str(root))
        if not d.exists() or not any(d.glob("*.parquet")):
            return None
        t = pa_ds.dataset(str(d)).to_table(columns=["doc_id"])
        return np.unique(t["doc_id"].to_numpy())

    # ---------------------------------------------------------- plumbing

    def _blocks(self, terms: list[str]) -> pd.DataFrame:
        """Posting blocks of the query terms + their global df —
        one row-group-pruned read of postings, one of the catalog;
        ordered (block_id, term) exactly like the Spark path's
        sortWithinPartitions so the shared kernels see identical
        group boundaries."""
        if not terms:
            return pd.DataFrame(columns=_BLOCK_COLS + ["df"])
        pred = pa_ds.field("term").isin(terms)
        cols = _BLOCK_COLS + (["n"] if self._commits else [])
        pdf = self._postings.to_table(
            columns=cols, filter=pred
        ).to_pandas()
        if self._commits:
            # snapshot df: the global terms parquet spans ALL commits,
            # so the pinned catalog is the sum of the pinned blocks'
            # per-block doc counts (exactly the Spark tier's rule)
            cat = pdf.groupby("term", as_index=False)["n"].sum().rename(
                columns={"n": "df"}
            )
            pdf = pdf.drop(columns=["n"])
        else:
            cat = self._terms.to_table(
                columns=["term", "df"], filter=pred
            ).to_pandas()
        if self._df_override is not None and len(cat):
            # cross-shard scoring: the merged corpus-wide df REPLACES
            # the shard-local df (terms the exchange missed keep the
            # local value — a visible-fallback, never a crash)
            ov = cat["term"].map(self._df_override)
            cat["df"] = ov.fillna(cat["df"]).astype("int64")
        out = pdf.merge(cat, on="term")
        return out.sort_values(["block_id", "term"],
                               kind="mergesort", ignore_index=True)

    def _mask_tomb(self, ids: np.ndarray,
                   *others: np.ndarray) -> tuple[np.ndarray, ...]:
        if self._tomb is None or not ids.size:
            return (ids, *others)
        keep = ~np.isin(ids, self._tomb)
        return (ids[keep], *(o[keep] for o in others))

    def _scored(self, terms: list[str]) -> tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
        """(doc_id, score, nt) for every matching live doc — the
        exhaustive path (numpy scan, score-identical to the Spark
        kernel)."""
        ids, scores, nt = _exhaustive_scan(
            self._blocks(terms), float(self.stats["n_docs"]),
            self.stats["avgdl"], self.stats["k1"], self.stats["b"],
            self.stats["block_range"], deadline=self._deadline,
        )
        return self._mask_tomb(ids, scores, nt)

    # ------------------------------------------------------------ queries

    def topk(self, qterms: list[str], k: int = 10, mode: str = "or",
             min_match: int | None = None, offset: int = 0,
             timeout_ms: float | None = None
             ) -> list[tuple[int, float]]:
        """BM25 top-k [(doc_id, score)], tie-break score desc /
        doc_id asc, sliced [offset, offset+k) — block-max WAND unless
        tombstones force the exhaustive path (same rule as
        PhysicalIndex.topk).  ``timeout_ms`` arms the kernel deadline
        (raises :class:`QueryTimeout` past 75% of the budget).
        Repeated queries hit the result cache (a timed-out query
        caches nothing — only completed results enter)."""
        def compute():
            with self._budget(timeout_ms):
                terms = sorted(set(strip_stops(self.stats, qterms)))
                if self._tomb is None:
                    ids, scores = _wand_scan(
                        self._blocks(terms), float(self.stats["n_docs"]),
                        self.stats["avgdl"], self.stats["k1"],
                        self.stats["b"], self.stats["block_range"],
                        offset + k, len(terms), mode,
                        min_match=min_match, deadline=self._deadline,
                    )
                else:
                    ids, scores, nt = self._scored(terms)
                    req = (len(terms) if mode == "and"
                           else max(1, int(min_match or 1)))
                    if req > 1:
                        keep = nt >= req
                        ids, scores = ids[keep], scores[keep]
            order = np.lexsort((ids, -scores))[offset:offset + k]
            return [(int(ids[i]), float(scores[i])) for i in order]

        key = ("topk", tuple(qterms), int(k), mode, min_match,
               int(offset))
        return list(self._cached(key, compute))

    def count(self, qterms: list[str], mode: str = "or") -> int:
        """totalHits — number of live matching docs (result-cached)."""
        return self._cached(
            ("count", tuple(qterms), mode),
            lambda: self.count_raw(
                sorted(set(strip_stops(self.stats, qterms))), mode
            ),
        )

    def count_raw(self, terms: list[str], mode: str = "or") -> int:
        """Count for pre-stripped terms.  Fast path: per-term doc-id
        bitsets (the ``id_bits`` postings column) — one column-pruned
        read of ~block_range/8 bytes per block, bitwise union /
        intersection, popcount; tfs/dls/positions never decoded.
        Indexes built before the bitset column (or mixed with one)
        fall back to the exhaustive decode, same answer."""
        if not terms:
            return 0
        if "id_bits" in set(self._postings.schema.names):
            pdf = self._checked_table(
                self._postings,
                columns=["term", "block_id", "id_bits"],
                filter=pa_ds.field("term").isin(terms),
            ).to_pandas()
            if not pdf["id_bits"].isna().any():
                from katta_spark.index.codec import bit_count_frame

                return bit_count_frame(
                    pdf, len(terms), mode, self._tomb,
                    int(self.stats["block_range"]),
                )
        ids, _, nt = self._scored(terms)
        if mode == "and" and len(terms) > 1:
            return int(np.count_nonzero(nt == len(terms)))
        return int(ids.size)

    def fetch(self, doc_ids: list[int],
              fields: list[str]) -> pd.DataFrame:
        """Stored-field lookup for a hit list (the doc-fetch RPC) —
        one row-group-pruned read of the docs parquet.  ``doc_id``
        always rides along (deduped if requested)."""
        tbl = self._docs.to_table(
            columns=["doc_id"] + [f for f in fields if f != "doc_id"],
            filter=pa_ds.field("doc_id").isin([int(d) for d in doc_ids]),
        )
        out = tbl.to_pandas()
        order = {int(d): i for i, d in enumerate(doc_ids)}
        return out.sort_values(
            "doc_id", key=lambda s: s.map(order), ignore_index=True
        )

    def facet(self, qterms: list[str], field: str, n: int = 10,
              mode: str = "or", missing: bool = False,
              sort: str = "count", prefix: str | None = None,
              mincount: int = 0,
              timeout_ms: float | None = None) -> list[tuple[object, int]]:
        """Value facet over the match set with full Solr facet.field
        options — ``missing`` (NULL bucket, nulls-last), ``sort``
        ("count" = cnt desc value asc, "index" = value asc),
        ``prefix`` (bucket filter; the NULL bucket never survives a
        prefix), ``mincount`` — node-local: matched ids from the
        pruned postings read, one column-pruned docs read, a
        value_counts.  Mirrors PhysicalIndex.facet option-for-option
        (tested).  ``timeout_ms`` arms the 75% deadline over the
        postings AND stored-field scans (round-5 non-kernel deadline
        coverage)."""
        with self._budget(timeout_ms):
            ids = self._matched_ids(qterms, mode)
            tbl = self._docs_subset(ids, [field])
        cnt = tbl[field].value_counts(dropna=False)
        items = [(None if pd.isna(v) else v, int(c))
                 for v, c in cnt.items()]
        return _facet_rank(items, n, missing, sort, prefix, mincount)

    def _matched_ids(self, qterms: list[str], mode: str = "or") -> np.ndarray:
        """Live matching doc_ids (sorted) — the non-scoring match set
        every stored-field surface (facet / sort / range facet /
        stats / pivot) starts from.  Membership is idf-free, so
        shard-local dfs suffice even under a ShardedSearcher scatter
        (same argument as count).  Fast path: the ``id_bits`` doc-id
        bitsets (union/intersect + bit unpack — tfs/dls never
        decoded); pre-bitset layouts fall back to the exhaustive
        decode, same answer (tested)."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        if not terms:
            return np.empty(0, dtype=np.int64)
        if "id_bits" in set(self._postings.schema.names):
            pdf = self._checked_table(
                self._postings,
                columns=["term", "block_id", "id_bits"],
                filter=pa_ds.field("term").isin(terms),
            ).to_pandas()
            if not pdf["id_bits"].isna().any():
                from katta_spark.index.codec import bit_matched_frame

                return bit_matched_frame(
                    pdf, len(terms), mode, self._tomb,
                    int(self.stats["block_range"]),
                )
        ids, _, nt = self._scored(terms)
        if mode == "and" and len(terms) > 1:
            ids = ids[nt == len(terms)]
        return np.sort(ids)

    def _docs_subset(self, ids: np.ndarray,
                     cols: list[str]) -> pd.DataFrame:
        """Stored columns of the given (unique) match-set doc_ids —
        the one docs read every stored-field surface (facet / sort /
        stats / pivot / range / grouping) starts from.

        Selectivity switch (round 4): a SMALL match set pushes
        ``doc_id isin(...)`` into the parquet scan — matched ids are
        block-clustered by construction, so row-group statistics
        prune the untouched ranges and a rare-term facet at 10M docs
        reads a few row groups instead of the whole column.  A big
        match set full-scans the pruned columns and filters
        vectorized (an isin filter with millions of values costs
        more than the read).  Same rows either way (file order)."""
        ids = np.asarray(ids, dtype=np.int64)
        need = ["doc_id"] + [c for c in cols if c != "doc_id"]
        n_docs = max(1, int(self.stats["n_docs"]))
        if ids.size < max(65_536, int(0.1 * n_docs)):
            import pyarrow as pa

            return self._checked_table(
                self._docs,
                columns=need,
                filter=pa_ds.field("doc_id").isin(pa.array(ids)),
            ).to_pandas()
        tbl = self._checked_table(self._docs, columns=need).to_pandas()
        hit = np.isin(tbl["doc_id"].to_numpy(), ids,
                      assume_unique=True)
        return tbl[hit]

    def sorted_query(self, qterms: list[str],
                     sort_cols: list[tuple[str, str]],
                     fields: list[str], limit: int, offset: int = 0,
                     mode: str = "or",
                     timeout_ms: float | None = None) -> pd.DataFrame:
        """Field-sorted top-k at node latency — the reference's
        TopFieldCollector node RPC (LuceneServer.java:1629-1636; sort
        construction :931-961): match set from the pruned postings
        read, ONE column-pruned docs read of the sort/output columns,
        a stable multi-key sort.  Mirrors PhysicalIndex.sorted_query
        exactly, including Spark's null rule (asc -> nulls FIRST,
        desc -> nulls LAST) and the doc_id-asc tie-break (tested)."""
        with self._budget(timeout_ms):
            ids = self._matched_ids(qterms, mode)
            need = ["doc_id"] + sorted(
                {c for c, _ in sort_cols}
                | {f for f in fields if f != "doc_id"}
            )
            tbl = self._docs_subset(ids, need)
        out = _field_sort(tbl, sort_cols)
        return out.iloc[offset:offset + limit][list(fields)].reset_index(
            drop=True
        )

    def range_facet(self, qterms: list[str], field: str, start: float,
                    end: float, gap: float, min_count: int = 1,
                    mode: str = "or",
                    timeout_ms: float | None = None) -> list[tuple[float, int]]:
        """Numeric facetByRange at node latency (the reference's
        FacetRangeCall node RPC, LuceneServer.java:1197-1258 /
        :2022-2065): gap buckets over [start, end) among the matches.
        Mirrors PhysicalIndex.range_facet — same bucket_start values
        (start + floor((v-start)/gap)*gap), same [start, end) bounds,
        min_count applied after counting (tested)."""
        with self._budget(timeout_ms):
            hist = self._range_hist(qterms, field, start, end, gap, mode)
        rows = [(b, c) for b, c in sorted(hist.items())
                if c >= int(min_count)]
        return [(float(b), int(c)) for b, c in rows]

    def _range_hist(self, qterms: list[str], field: str, start: float,
                    end: float, gap: float,
                    mode: str) -> dict[float, int]:
        """Full (bucket_start -> count) histogram, no min_count cut —
        the scatter unit: shards own disjoint doc sets, so summing
        full histograms then cutting is exact (the same argument as
        the value-facet merge)."""
        v = self._matched_values(qterms, field, mode)
        v = v[(v >= float(start)) & (v < float(end))]
        bucket = float(start) + np.floor(
            (v - float(start)) / float(gap)
        ) * float(gap)
        val, cnt = np.unique(bucket, return_counts=True)
        return {float(b): int(c) for b, c in zip(val, cnt)}

    def _matched_values(self, qterms: list[str], field: str,
                        mode: str) -> np.ndarray:
        ids = self._matched_ids(qterms, mode)
        tbl = self._docs_subset(ids, [field])
        return pd.to_numeric(tbl[field], errors="coerce").dropna() \
            .to_numpy(dtype=np.float64)

    def range_facet_other(self, qterms: list[str], field: str,
                          start: float, end: float,
                          mode: str = "or") -> tuple[int, int, int]:
        """facet.range.other=all — (before, between, after) counts
        around [start, end), node-locally.  Mirrors
        PhysicalIndex.range_facet_other (tested)."""
        v = self._matched_values(qterms, field, mode)
        lo, hi = float(start), float(end)
        return (
            int(np.count_nonzero(v < lo)),
            int(np.count_nonzero((v >= lo) & (v < hi))),
            int(np.count_nonzero(v >= hi)),
        )

    def date_range_facet(self, qterms: list[str], field: str, unit: str,
                         min_count: int = 1,
                         mode: str = "or") -> list[tuple[object, int]]:
        """Date facetByRange at calendar units — the reference's
        DateRangeFactory buckets (DateRangeFactory.java:43-77):
        matches truncated to YEAR/MONTH/DAY/HOUR/MINUTE/SECOND,
        counted per bucket start.  Same truncation as the Spark
        tier's date_trunc (ops/timeseries.py DATE_UNITS)."""
        hist = self._date_hist(qterms, field, unit, mode)
        return [(b, int(c)) for b, c in sorted(hist.items())
                if c >= int(min_count)]

    def _date_hist(self, qterms: list[str], field: str, unit: str,
                   mode: str) -> dict:
        from katta_spark.ops.timeseries import gap_unit

        freq = _DATE_FREQ[gap_unit(unit)]
        ids = self._matched_ids(qterms, mode)
        tbl = self._docs_subset(ids, [field])
        ts = pd.to_datetime(tbl[field]).dropna()
        buckets = ts.dt.to_period(freq).dt.start_time
        return {b.to_pydatetime(): int(c)
                for b, c in buckets.value_counts().items()}

    def group_score_topk(self, qterms: list[str], group_field: str,
                         score_mode: str = "sum", k: int = 10,
                         mode: str = "or") -> pd.DataFrame:
        """has_child/ToParentBlockJoin score_mode group ranking at
        node latency — mirrors PhysicalIndex.group_score_topk
        (tested)."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        return _gscore_finalize(
            _gscore_partials(self, terms, group_field, mode),
            group_field, score_mode, k,
        )

    def ngroups(self, qterms: list[str], group_field: str,
                mode: str = "or") -> tuple[int, int]:
        """(n_groups, n_hits) — Solr group.ngroups at node latency
        (distinct non-NULL group values among the matches, Spark's
        countDistinct rule).  Mirrors PhysicalIndex.ngroups
        (tested)."""
        ids = self._matched_ids(qterms, mode)
        vals = self._doc_values(ids, [group_field])[group_field]
        return int(vals.dropna().nunique()), int(ids.size)

    def expand_topk(self, qterms: list[str], collapse_field: str,
                    k: int = 10, n_expand: int = 2,
                    mode: str = "or") -> pd.DataFrame:
        """Solr ExpandComponent at node latency: the next
        ``n_expand`` hidden members of each group whose head made the
        collapsed top-k.  Mirrors PhysicalIndex.expand_topk
        (tested)."""
        return _expand_from_ranked(
            self.group_topk(qterms, collapse_field,
                            k_per_group=n_expand + 1, mode=mode),
            collapse_field, k, n_expand,
        )

    def _term_tf(self, doc_ids: list[int]) -> pd.DataFrame:
        """(doc_id, term, tf) from the STORED token arrays of the
        given docs — the shard-local unit of term_vectors (df/tfidf
        need corpus-wide stats, so they attach AFTER any scatter)."""
        rows = self._docs.to_table(
            columns=["doc_id", "toks"],
            filter=pa_ds.field("doc_id").isin(
                [int(d) for d in doc_ids]
            ),
        ).to_pandas()
        recs = []
        for did, toks in zip(rows["doc_id"], rows["toks"]):
            for t, c in pd.Series(list(toks)).value_counts().items():
                recs.append((int(did), t, int(c)))
        return pd.DataFrame(recs, columns=["doc_id", "term", "tf"])

    def term_vectors(self, doc_ids: list[int]) -> pd.DataFrame:
        """(doc_id, term, tf, df, tfidf) — the Lucene/Solr
        TermVectorComponent surface at node latency: tf from the
        stored token arrays, df from the catalog, rows (doc_id, term)
        asc.  Mirrors PhysicalIndex.term_vectors (tested)."""
        tf = self._term_tf(doc_ids)
        return _term_vectors_attach(
            tf, self._df_for(sorted(tf["term"].unique())),
            float(self.stats["n_docs"]),
        )

    def adjacency_matrix(self, queries_map: dict[str, list[str]],
                         mode: str = "or") -> list[tuple]:
        """ES adjacency_matrix at node latency: (key1, key2, cnt) for
        every named filter and every pairwise intersection, empty
        intersections omitted, (key1, key2) asc.  Each filter's match
        set rides the bitset membership path; intersections are
        sorted-array intersects.  Mirrors
        PhysicalIndex.adjacency_matrix (tested)."""
        items = [(label, self._matched_ids(terms, mode))
                 for label, terms in sorted(queries_map.items())]
        out = []
        for i, (k1, s1) in enumerate(items):
            for k2, s2 in items[i:]:
                c = (int(s1.size) if k1 == k2 else
                     int(np.intersect1d(s1, s2,
                                        assume_unique=True).size))
                if c:
                    out.append((k1, k2, c))
        return out

    def diversified_sampler(self, qterms: list[str], key_field: str,
                            max_per_key: int = 1,
                            shard_size: int = 100,
                            mode: str = "or") -> pd.DataFrame:
        """ES diversified_sampler at node latency: the best-scoring
        sample of at most ``shard_size`` hits with at most
        ``max_per_key`` docs per value of ``key_field`` — same
        deterministic definition as the Spark tier (per-key rank by
        (score desc, doc_id asc), then the global cut by the same
        order).  Columns (doc_id, score, key_field, rank_in_key)."""
        ranked = self.group_topk(qterms, key_field,
                                 k_per_group=max_per_key, mode=mode)
        out = ranked.rename(columns={"rank": "rank_in_key"})
        out = out.sort_values(["score", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(int(shard_size))
        return out[["doc_id", "score", key_field,
                    "rank_in_key"]].reset_index(drop=True)

    def rare_terms(self, qterms: list[str], field: str,
                   max_count: int = 1, n: int = 10,
                   mode: str = "or") -> list[tuple[object, int]]:
        """ES rare_terms at node latency: the LONG TAIL of a field —
        buckets with cnt <= max_count among the matches, (cnt asc,
        value asc), NULLs excluded.  Exact (no CuckooFilter sketch
        needed node-side).  Mirrors PhysicalIndex.rare_terms
        (tested)."""
        ids = self._matched_ids(qterms, mode)
        tbl = self._docs_subset(ids, [field])
        cnt = tbl[field].dropna().value_counts()
        rows = [(v, int(c)) for v, c in cnt.items()
                if c <= int(max_count)]
        return sorted(rows, key=lambda x: (x[1], x[0]))[:n]

    def facet_stats(self, qterms: list[str], facet_field: str,
                    stat_field: str, mode: str = "or") -> pd.DataFrame:
        """Solr stats.facet at node latency: the field_stats summary
        per value of ``facet_field`` — one matched read, one pandas
        groupby.  Columns (facet_field, n, min_v, max_v, sum_v,
        mean_v), facet-value asc (nulls first, Spark's asc rule).
        Mirrors PhysicalIndex.facet_stats (tested)."""
        parts = self._facet_stats_partials(qterms, facet_field,
                                           stat_field, mode)
        return _facet_stats_finalize(parts, facet_field)

    def _facet_stats_partials(self, qterms: list[str],
                              facet_field: str, stat_field: str,
                              mode: str) -> pd.DataFrame:
        """Per-facet-value (n, min, max, sum) partials — UNROUNDED
        (associative over disjoint doc sets; a scatter merges them
        exactly, then rounds once)."""
        ids = self._matched_ids(qterms, mode)
        tbl = self._docs_subset(ids, [facet_field, stat_field])
        sub = tbl
        v = pd.to_numeric(sub[stat_field], errors="coerce")
        return (
            sub.assign(_v=v.astype(float))
            .groupby(facet_field, dropna=False)["_v"]
            .agg(n="count", min_v="min", max_v="max", sum_v="sum")
            .reset_index()
        )

    def interval_facet(self, qterms: list[str], field: str,
                       intervals: list[tuple],
                       mode: str = "or") -> list[tuple[str, int]]:
        """Solr facet.interval at node latency: arbitrary — possibly
        overlapping — intervals over a numeric field, a matching doc
        counted in EVERY containing interval.  One matched-values
        read, one numpy comparison per interval; rows label-asc.
        Mirrors PhysicalIndex.interval_facet (tested)."""
        counts = _interval_counts(
            self._matched_values(qterms, field, mode), intervals
        )
        return sorted(
            (str(iv[0]), c) for iv, c in zip(intervals, counts)
        )

    def facet_queries(self, queries_map: dict[str, list[str]],
                      mode: str = "or") -> list[tuple[str, int]]:
        """Solr facet.query at node latency: hit counts of arbitrary
        sub-queries, zero rows kept, label-asc — each count rides the
        bitset fast path.  Mirrors PhysicalIndex.facet_queries
        (tested)."""
        return [(label, self.count(terms, mode))
                for label, terms in sorted(queries_map.items())]

    def suggest(self, prefix: str, n: int = 10) -> list[tuple[str, int]]:
        """[(term, df)] — autocomplete at node latency: the n
        highest-df content terms with the prefix, from one
        row-group-pruned catalog read (the term-sorted files make the
        startswith range two binary searches over row-group stats).
        Mirrors PhysicalIndex.suggest (tested).  On a commit-pinned
        handle the dfs come from the PIT catalog (recomputed from the
        pinned postings — see _catalog), not the live terms parquet."""
        p = prefix.lower()
        if self._commits:
            cat = self._catalog()
            cat = cat[cat["term"] >= p]
        else:
            pred = ((pa_ds.field("term") >= p)
                    & (pa_ds.field("term") < p + "￿"))
            cat = self._terms.to_table(
                columns=["term", "df"], filter=pred
            ).to_pandas()
        keep = cat["term"].str.startswith(p)
        if ":" not in p:
            keep &= ~cat["term"].str.contains(":", regex=False)
        rows = sorted(
            zip(cat["term"][keep], cat["df"][keep]),
            key=lambda x: (-int(x[1]), x[0]),
        )[:n]
        return [(str(t), int(d)) for t, d in rows]

    def highlight(self, hits: list[tuple[int, float]],
                  terms: list[str], width: int = 80,
                  text_col: str = "content", pre: str = "<em>",
                  post: str = "</em>") -> pd.DataFrame:
        """(doc_id, score, snippet) — the Solr Highlighter surface at
        node latency, an EXACT mirror of PhysicalIndex.highlight's
        JVM expressions (1-based locate/substring semantics, window
        anchored width//3 before the first case-insensitive term
        occurrence, every in-window occurrence wrapped) over one
        shard-local stored-field fetch (tested)."""
        return _highlight_frame(self.fetch, hits, terms, width,
                                text_col, pre, post)

    def _stats_partial(self, qterms: list[str], field: str,
                       mode: str = "or") -> tuple:
        """(n, min, max, sum) over the matches — the shard-local
        partial a StatsComponent scatter merges exactly (all four
        are associative; mean is derived after the merge)."""
        ids = self._matched_ids(qterms, mode)
        tbl = self._docs_subset(ids, [field])
        v = pd.to_numeric(tbl[field],
                          errors="coerce").astype(float).dropna()
        if not len(v):
            return 0, None, None, None
        return (int(len(v)), float(v.min()), float(v.max()),
                float(v.sum()))

    def field_stats(self, qterms: list[str], field: str,
                    mode: str = "or") -> dict:
        """Solr StatsComponent (stats.field) at node latency:
        count / min / max / sum / mean of a numeric field over the
        matching docs — mirrors PhysicalIndex.field_stats (one
        pruned postings read + one column-pruned docs read)."""
        return _stats_finalize([self._stats_partial(qterms, field,
                                                    mode)])

    def _pivot_pairs(self, qterms: list[str], field1: str,
                     field2: str, mode: str = "or") -> pd.DataFrame:
        """FULL (field1, field2) match-count histogram — bounded by
        value-pair cardinality, the unit a pivot scatter sums."""
        ids = self._matched_ids(qterms, mode)
        tbl = self._docs_subset(ids, [field1, field2])
        return (
            tbl[[field1, field2]]
            .groupby([field1, field2], dropna=False)
            .size().reset_index(name="cnt")
        )

    def pivot_facet(self, qterms: list[str], field1: str,
                    field2: str, n1: int = 5, n2: int = 3,
                    mode: str = "or") -> list[tuple]:
        """Two-level pivot facet (Solr facet.pivot) at node latency —
        same ranking and tie-breaks as PhysicalIndex.pivot_facet
        (tested)."""
        return _pivot_rank(
            self._pivot_pairs(qterms, field1, field2, mode),
            field1, field2, n1, n2,
        )

    def _doc_values(self, ids: np.ndarray,
                    fields: list[str]) -> pd.DataFrame:
        """Stored columns of the given (sorted, unique) doc_ids —
        one column-pruned docs read shared by the grouping/MLT
        surfaces."""
        return self._docs_subset(ids, fields)

    def _scored_filtered(self, qterms: list[str], mode: str = "or"
                         ) -> tuple[np.ndarray, np.ndarray]:
        """(ids, scores) of live matches honoring or/and — the scored
        analogue of _matched_ids (scores DO need df, so this is the
        exhaustive decode; under a scatter the df override makes the
        scores corpus-wide)."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        ids, scores, nt = self._scored(terms)
        if mode == "and" and len(terms) > 1:
            keep = nt == len(terms)
            ids, scores = ids[keep], scores[keep]
        return ids, scores

    def _df_for(self, terms: list[str]) -> pd.DataFrame:
        """(term, df) for arbitrary terms under this handle's rules —
        the same catalog source _blocks uses: global terms parquet
        normally, per-block doc-count sums on a commit-pinned (PIT)
        handle, the merged-catalog override under a scatter."""
        if not terms:
            return pd.DataFrame(columns=["term", "df"])
        if len(terms) > 4096 and not self._commits:
            # big-vocab path (significant_terms foregrounds): the
            # full two-column catalog read + a pandas hash filter
            # beats an isin scan filter with 10^5 values
            t = self._terms.to_table(columns=["term", "df"]).to_pandas()
            cat = t[t["term"].isin(set(terms))].copy()
            if self._df_override is not None and len(cat):
                ov = cat["term"].map(self._df_override)
                cat["df"] = ov.fillna(cat["df"]).astype("int64")
            return cat
        pred = pa_ds.field("term").isin(terms)
        if self._commits:
            pdf = self._postings.to_table(
                columns=["term", "n"], filter=pred
            ).to_pandas()
            cat = pdf.groupby("term", as_index=False)["n"].sum().rename(
                columns={"n": "df"}
            )
        else:
            cat = self._terms.to_table(
                columns=["term", "df"], filter=pred
            ).to_pandas()
        if self._df_override is not None and len(cat):
            ov = cat["term"].map(self._df_override)
            cat["df"] = ov.fillna(cat["df"]).astype("int64")
        return cat

    def _collapse_heads(self, qterms: list[str], field: str,
                        mode: str = "or") -> pd.DataFrame:
        """Best (score desc, doc_id asc) doc per value of ``field``
        over the match set — the per-shard unit of the collapse
        scatter (a FULL per-value map, bounded by value cardinality
        like the facet histogram, so the cross-shard merge can never
        miss a group's true head).  NULL values form one group (Solr
        nullPolicy=collapse)."""
        ids, scores = self._scored_filtered(qterms, mode)
        vals = self._doc_values(np.sort(ids), [field])
        df = pd.DataFrame({"doc_id": ids, "score": scores}).merge(
            vals, on="doc_id"
        )
        df = df.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort")
        return df.drop_duplicates(subset=[field], keep="first")

    def collapse_topk(self, qterms: list[str], collapse_field: str,
                      k: int = 10, mode: str = "or") -> pd.DataFrame:
        """(doc_id, score, value) — Solr's CollapsingQParserPlugin at
        node latency: one doc per value of ``collapse_field`` (the
        highest-scoring, tie doc_id asc), collapsed set ranked
        globally, cut to top-k.  Mirrors PhysicalIndex.collapse_topk
        (tested)."""
        heads = self._collapse_heads(qterms, collapse_field, mode)
        out = heads.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return out[["doc_id", "score", collapse_field]].reset_index(
            drop=True
        )

    def group_topk(self, qterms: list[str], group_field: str,
                   k_per_group: int = 3, mode: str = "or"
                   ) -> pd.DataFrame:
        """(value, doc_id, score, rank) — Solr result grouping
        (group.field / group.limit) at node latency: the top
        ``k_per_group`` hits WITHIN each value of ``group_field``,
        ranked (score desc, doc_id asc).  Mirrors
        PhysicalIndex.group_topk (tested); rows ordered
        (value, rank)."""
        ids, scores = self._scored_filtered(qterms, mode)
        vals = self._doc_values(np.sort(ids), [group_field])
        df = pd.DataFrame({"doc_id": ids, "score": scores}).merge(
            vals, on="doc_id"
        )
        df = df.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort")
        df["rank"] = df.groupby(group_field, dropna=False,
                                sort=False).cumcount() + 1
        df = df[df["rank"] <= int(k_per_group)]
        out = df.sort_values([group_field, "rank"], kind="mergesort")
        return out[[group_field, "doc_id", "score",
                    "rank"]].reset_index(drop=True)

    def _sigterms_fg(self, qterms: list[str], mode: str = "or",
                     max_fg: int | None = None
                     ) -> tuple[pd.Series, int]:
        """(foreground df histogram over the STORED token arrays,
        n_fg) — the per-shard unit of a significant_terms scatter
        (disjoint doc sets sum exactly).  Distinct-per-doc, same as
        the Spark tier's array_distinct explode.  The whole kernel is
        Arrow C++: the matched rows' token lists flatten with parent
        indices, (term, doc) dedupes and counts in two hash
        group-bys — never a pandas explode of object lists (measured
        ~10x on a hot-term foreground at 1M docs).

        ``max_fg`` bounds the foreground the way ES's sampler
        aggregation does: a deterministic hash-uniform subset of the
        matched docs (splitmix-style integer hash, no RNG state), so
        cost is O(max_fg), the estimate is unbiased, and repeated
        calls see the same sample."""
        tbl, n = self._sigterms_fg_tbl(qterms, mode, max_fg)
        out = tbl.to_pandas()
        return (pd.Series(out["df_fg"].to_numpy(dtype="int64"),
                          index=out["term"]), n)

    def _fg_hist_bits(self, ids: np.ndarray):
        """(term, df_fg) foreground histogram from the ``id_bits``
        postings bitsets instead of the stored token arrays (round 5
        — the significant_terms exact-mode floor fix):
        df_fg(term) = Σ_blocks popcount(id_bits[term, block] &
        matched_bits[block]) — the number of MATCHED docs containing
        the term.  Identical to the distinct-per-doc stored count (a
        doc lives in exactly one block; a term's rows across commits
        hold disjoint doc subsets, so the popcount sum is exact), and
        tombstones are already cleared from ``ids``.

        Cost is O(total id_bits bytes) regardless of foreground size
        — measured at 1M docs: 13 MB of bitsets (one column-pruned
        read + flat numpy AND/popcount) vs the 100 MB stored-token
        scan it replaces (1.5 s AND / 6.2 s hot-OR); see
        BENCH/BASELINE.md round-5 notes.  Returns ``None`` when the
        layout lacks a complete id_bits column (pre-bitset commits) —
        callers fall back to the stored-token scan, same answer.

        Field-prefixed terms (``lang:en``) live in the postings but
        NOT in the stored content-token arrays, so they are dropped
        to keep the histogram identical to the stored path."""
        import pyarrow as pa

        if "id_bits" not in set(self._postings.schema.names):
            return None
        tb = self._checked_table(
            self._postings, columns=["term", "block_id", "id_bits"]
        )
        if tb.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df_fg": pa.array([], pa.int64())})
        col = tb["id_bits"].combine_chunks()
        if col.null_count:
            return None
        br = int(self.stats["block_range"])
        nbytes = br // 8
        bids = tb["block_id"].to_numpy().astype(np.int64)
        # one flat bitset over the whole doc-id space (n_docs/8
        # bytes), sized to cover every block the postings touch
        span_bytes = (int(bids.max()) + 1) * nbytes
        bits = np.zeros(span_bytes * 8, dtype=np.uint8)
        bits[ids] = 1
        full = np.packbits(bits, bitorder="little")
        # flat view of the binary column: offsets + data buffers
        if pa.types.is_large_binary(col.type):
            odt = np.int64
        else:
            odt = np.int32
        offs = np.frombuffer(col.buffers()[1], dtype=odt)[
            col.offset: col.offset + len(col) + 1
        ].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        all_lens = offs[1:] - offs[:-1]
        # prefilter: rows in blocks with NO matched doc contribute 0
        # (a rare foreground touches a handful of blocks — this cuts
        # the byte stream to ~its posting geometry)
        mblk = np.zeros(int(bids.max()) + 1, dtype=bool)
        mblk[(ids // br).astype(np.int64)] = True
        keep = mblk[bids]
        terms_pd = tb["term"].to_pandas()[keep]
        bids_k, lens, starts = bids[keep], all_lens[keep], offs[:-1][keep]
        total = int(lens.sum())
        if total:
            # per-byte mask index = arange + repeat(combined offset):
            # block base minus the row's position in the output
            # stream (one repeat instead of row_of + within)
            out_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
            gidx = np.arange(total, dtype=np.int64) + np.repeat(
                bids_k * nbytes - out_start, lens
            )
            # gather the rows' bytes (rows are no longer contiguous
            # after the prefilter)
            vidx = np.arange(total, dtype=np.int64) + np.repeat(
                starts - out_start, lens
            )
            masked = data[vidx] & full[gidx]
            # per-BYTE popcount via uint64 SWAR (each byte lane ends
            # up holding its own bit count — 3 vector ops instead of
            # a 13 MB table gather)
            pad = (-masked.size) % 8
            if pad:
                masked = np.concatenate(
                    [masked, np.zeros(pad, np.uint8)]
                )
            v = masked.view(np.uint64)
            v = v - ((v >> np.uint64(1))
                     & np.uint64(0x5555555555555555))
            v = ((v & np.uint64(0x3333333333333333))
                 + ((v >> np.uint64(2))
                    & np.uint64(0x3333333333333333)))
            v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
            bytepop = v.view(np.uint8)[: total].astype(np.int32)
            per_row = np.add.reduceat(
                bytepop, np.minimum(out_start, total - 1)
            )
            # reduceat quirk: a zero-length row repeats its
            # neighbour's slice — zero them explicitly
            per_row[lens == 0] = 0
        else:
            per_row = np.zeros(len(lens), dtype=np.int32)
        cand = pd.DataFrame({
            "term": terms_pd.to_numpy(), "df_fg": per_row,
        })
        cand = cand[cand["df_fg"] > 0]
        # drop field-prefixed terms: not content tokens
        for f in self.stats.get("indexed_fields") or []:
            cand = cand[~cand["term"].str.startswith(f + ":")]
        cand = cand.groupby("term", as_index=False)["df_fg"].sum()
        return pa.table({
            "term": pa.array(cand["term"], pa.string()),
            "df_fg": pa.array(cand["df_fg"], pa.int64()),
        })

    def _sigterms_fg_tbl(self, qterms: list[str], mode: str = "or",
                         max_fg: int | None = None,
                         shard_min_df: int = 1,
                         shard_size: int | None = None):
        """Arrow-table form of :meth:`_sigterms_fg` — (pa.Table
        (term, df_fg), n_fg).  The sharded scatter ships THIS across
        the process boundary: a pyarrow Table pickles via Arrow IPC
        buffers (columnar, no per-string cost), where a pandas
        object-dtype frame pickles string by string — measured as the
        dominant cost of the 8-shard scatter at 1M docs."""
        import pyarrow as pa
        import pyarrow.compute as pc

        ids = self._matched_ids(qterms, mode)
        if max_fg is not None and ids.size > int(max_fg):
            h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xC2B2AE3D27D4EB4F)
            h ^= h >> np.uint64(29)
            ids = np.sort(ids[np.argpartition(h, int(max_fg))
                              [: int(max_fg)]])
        if not ids.size:
            return pa.table({"term": pa.array([], pa.string()),
                             "df_fg": pa.array([], pa.int64())}), 0
        out = self._fg_hist_bits(ids)
        if out is None:
            # pre-bitset layout: the stored-token fallback (same
            # distinct-per-doc histogram, measured ~10-40x slower at
            # 1M docs — see _fg_hist_bits)
            toks = self._checked_table(
                self._docs,
                columns=["toks"],
                filter=pa_ds.field("doc_id").isin(pa.array(ids)),
            )["toks"].combine_chunks()
            pairs = pa.table({
                "p": pc.list_parent_indices(toks),
                "term": pc.list_flatten(toks),
            })
            counts = (
                pairs.group_by(["term", "p"]).aggregate([])
                .group_by("term").aggregate([("p", "count")])
            )
            out = counts.select(["term", "p_count"]).rename_columns(
                ["term", "df_fg"]
            ).cast(
                pa.schema([("term", pa.string()),
                           ("df_fg", pa.int64())])
            )
        if shard_min_df > 1:
            # ES shard_min_doc_count semantics: prune this node's
            # candidate list before the exchange.  APPROXIMATE when
            # shard_min_df > 1 and min_df <= shards * (shard_min_df-1):
            # a term below the bar on every shard vanishes, and a
            # surviving term loses sub-bar contributions from other
            # shards.  The win: on a code corpus the singleton tail
            # (per-doc unique identifiers) IS the bulk of the
            # vocabulary, so shard_min_df=2 collapses the exchange.
            out = out.filter(
                pc.greater_equal(out["df_fg"], pa.scalar(shard_min_df))
            )
        if shard_size is not None and out.num_rows > int(shard_size):
            # ES shard_size semantics: each shard sends only its top
            # candidates by SHARD-LOCAL significance (same lift
            # formula over this shard's own bg dfs / n_docs — the
            # stats a Lucene shard has for free), coordinator merges.
            # APPROXIMATE: a term outside some shard's shortlist
            # loses that shard's df_fg contribution — exactly the ES
            # trade; at 10M docs the exact exchange itself (not the
            # tail filter) dominates, and this is the knob that
            # collapses it.  The cut is deterministic (lift desc,
            # df_fg desc, term asc — the ranker's own tie-break).
            cand = out.to_pandas()
            n_local = int(ids.size)
            bg = self._df_for(sorted(cand["term"].tolist()))
            cand = cand.merge(bg.rename(columns={"df": "df_bg"}),
                              on="term")
            raw = ((cand["df_fg"] / float(max(n_local, 1)))
                   / (cand["df_bg"] / float(self.stats["n_docs"])))
            cand = cand.assign(_raw=raw).sort_values(
                ["_raw", "df_fg", "term"],
                ascending=[False, False, True], kind="mergesort",
            ).head(int(shard_size))
            out = pa.table({
                "term": pa.array(cand["term"], pa.string()),
                "df_fg": pa.array(cand["df_fg"], pa.int64()),
            })
        return out, int(ids.size)

    def significant_terms(self, qterms: list[str], m_terms: int = 10,
                          mode: str = "or", min_df: int = 2,
                          max_fg: int | None = None,
                          timeout_ms: float | None = None) -> pd.DataFrame:
        """(term, df_fg, df_bg, lift) — the ES significant_terms
        aggregation at node latency: content terms overrepresented in
        the matching docs vs the whole index, ranked by
        lift = (df_fg/n_fg)/(df_bg/n_docs), ties df_fg desc / term
        asc, query terms excluded.  Mirrors
        PhysicalIndex.significant_terms (tested).  ``max_fg`` caps
        the foreground with a deterministic hash-uniform sample (the
        ES sampler-agg analogue) — cost becomes O(max_fg) instead of
        O(match count); df_fg/lift are then unbiased estimates."""
        qset = sorted(set(strip_stops(self.stats, qterms)))
        with self._budget(timeout_ms):
            vc, n_fg = self._sigterms_fg(qterms, mode, max_fg=max_fg)
        return _sigterms_rank(vc, n_fg, qset, self._df_for,
                              float(self.stats["n_docs"]), m_terms,
                              min_df)

    def more_like_this(self, doc_id: int, m_terms: int = 5,
                       k: int = 10) -> list[tuple[int, float]]:
        """Top-k docs similar to ``doc_id`` — the Lucene/Solr
        MoreLikeThis surface at node latency: representative terms =
        the source doc's top ``m_terms`` stored tokens by tf·idf (tie
        term asc), then a BM25 OR query over them, source excluded.
        Mirrors PhysicalIndex.more_like_this (tested); a tombstoned
        source returns [] — never recommend from a deleted doc (the
        delete-semantics rule get_docs documents)."""
        if self._tomb is not None and bool(
            np.isin(int(doc_id), self._tomb)
        ):
            return []
        row = self._docs.to_table(
            columns=["doc_id", "toks"],
            filter=pa_ds.field("doc_id") == int(doc_id),
        ).to_pandas()
        if row.empty:
            return []
        tf = pd.Series(row["toks"].iloc[0]).value_counts()
        rep = _mlt_rep_terms(tf, self._df_for(sorted(tf.index)),
                             float(self.stats["n_docs"]), m_terms)
        ids, scores, _ = self._scored(rep)
        keep = ids != int(doc_id)
        ids, scores = ids[keep], scores[keep]
        order = np.lexsort((ids, -scores))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    def _suggest_candidates(self, kind: str,
                            arg: str) -> pd.DataFrame:
        """FULL (term, df) candidate set for a regex / infix
        suggester — uncut, so a scatter's cross-shard df sums are
        exact (the spellcheck rule).  Regex is whole-term anchored
        (Lucene TermsComponent terms.regex); infix is substring
        containment (AnalyzingInfixSuggester)."""
        cat = self._catalog()
        if ":" not in arg:
            cat = cat[~cat["term"].str.contains(":", regex=False)]
        if kind == "regex":
            import re

            # Compile the ORIGINAL pattern case-insensitively:
            # lowercasing the pattern would invert shorthand classes
            # (\S -> \s, \D -> \d); Lucene TermsComponent never
            # rewrites terms.regex.
            rx = re.compile(f"(?:{arg})", re.IGNORECASE)
            keep = np.fromiter(
                (bool(rx.fullmatch(t)) for t in cat["term"]),
                dtype=bool, count=len(cat),
            )
            sub = cat[keep]
        else:
            sub = cat[cat["term"].str.contains(arg.lower(),
                                               regex=False)]
        return sub[["term", "df"]]

    def suggest_regex(self, pattern: str,
                      n: int = 10) -> list[tuple[str, int]]:
        """Solr TermsComponent terms.regex at node latency — mirrors
        PhysicalIndex.suggest_regex (tested)."""
        return _suggest_rank(self._suggest_candidates("regex",
                                                      pattern), n)

    def suggest_infix(self, fragment: str,
                      n: int = 10) -> list[tuple[str, int]]:
        """Lucene AnalyzingInfixSuggester at node latency — mirrors
        PhysicalIndex.suggest_infix (tested)."""
        return _suggest_rank(self._suggest_candidates("infix",
                                                      fragment), n)

    def _fmetric_partials(self, qterms: list[str], facet_field: str,
                          metric_field: str,
                          mode: str) -> pd.DataFrame:
        """Per-facet-value (cnt, unrounded metric sum) partials —
        associative over disjoint doc sets."""
        ids = self._matched_ids(qterms, mode)
        tbl = self._docs_subset(ids, [facet_field, metric_field])
        sub = tbl
        v = pd.to_numeric(sub[metric_field], errors="coerce")
        g = sub.assign(_v=v.astype(float)).groupby(facet_field,
                                                   dropna=False)
        # n_v (non-null metric count) travels with the partial so an
        # all-NULL bucket merges to NULL, not 0.0 — Spark's F.sum
        # returns NULL over all-null input; pandas sum returns 0.0.
        return pd.DataFrame({
            facet_field: g.size().index,
            "cnt": g.size().to_numpy(),
            "sum_v": g["_v"].sum().to_numpy(),
            "n_v": g["_v"].count().to_numpy(),
        })

    def facet_by_metric(self, qterms: list[str], facet_field: str,
                        metric_field: str, n: int = 5,
                        mode: str = "or") -> pd.DataFrame:
        """ES terms agg ordered by a sub-aggregation (avg of a
        stored numeric field) at node latency — mirrors
        PhysicalIndex.facet_by_metric (tested)."""
        return _fmetric_finalize(
            self._fmetric_partials(qterms, facet_field, metric_field,
                                   mode),
            facet_field, n,
        )

    def _spell_candidates(self, word: str,
                          max_edits: int) -> pd.DataFrame:
        """ALL content terms within ``max_edits`` of ``word`` —
        (term, dist, df), unranked and uncut.  Shared by the local
        top-n and the sharded exact merge (a shard must contribute
        every candidate, not its own page, so cross-shard df sums
        are exact).  Length-window prune |len(t)-len(w)| <= max_edits
        runs before the levenshtein, same as the Spark tier."""
        w = word.lower()
        cat = self._catalog()
        sub = cat[
            ~cat["term"].str.contains(":", regex=False)
            & ((cat["term"].str.len() - len(w)).abs() <= max_edits)
        ]
        dists = np.fromiter(
            (_levenshtein(t, w) for t in sub["term"]),
            dtype=np.int64, count=len(sub),
        )
        keep = (dists <= max_edits) & (dists > 0)
        out = sub.loc[keep, ["term", "df"]].copy()
        out["dist"] = dists[keep]
        return out[["term", "dist", "df"]]

    def spellcheck(self, word: str, max_edits: int = 2,
                   n: int = 5) -> list[tuple[str, int, int]]:
        """[(term, dist, df)] — the Solr SpellCheckComponent surface
        at node latency: the ``n`` closest content terms by (edit
        distance asc, df desc, term asc), evaluated on the cached
        term catalog.  Mirrors PhysicalIndex.spellcheck exactly
        (tested); on a commit-pinned handle the dfs come from the
        PIT catalog."""
        cand = self._spell_candidates(word, max_edits)
        rows = sorted(
            zip(cand["term"], cand["dist"], cand["df"]),
            key=lambda x: (int(x[1]), -int(x[2]), x[0]),
        )[:n]
        return [(str(t), int(d), int(df)) for t, d, df in rows]

    # ------------------------------------------- Lucene-string front door

    def _all_ids(self) -> np.ndarray:
        """All live doc_ids (MatchAll / pure-negative base), cached on
        the underlying handle (a _global_view overlay shares its
        host's cache — same datasets, same tombstones)."""
        host = self._cache_host or self
        if getattr(host, "_all_ids_cache", None) is None:
            ids = np.unique(
                self._checked_table(
                    host._docs, columns=["doc_id"]
                )["doc_id"].to_numpy()
            )
            ids, = host._mask_tomb(ids)
            host._all_ids_cache = ids
        return host._all_ids_cache

    def _catalog(self) -> pd.DataFrame:
        """(term, df) catalog, cached — the multi-term expansion
        dictionary (FuzzyQuery/Wildcard rewrite runs here, one row
        per distinct term, never over postings).  Refuses on a
        commit-pinned handle: the global terms parquet spans ALL
        commits, so its dfs would silently leak post-snapshot state
        into expansion scoring (term queries recompute the pinned df
        from the pruned blocks instead — see _blocks)."""
        host = self._cache_host or self
        if getattr(host, "_catalog_cache", None) is None:
            if host._commits:
                # PIT catalog: the global terms parquet spans ALL
                # commits, so the snapshot catalog is recomputed from
                # the PINNED postings' per-block doc counts — one
                # (term, n) column read of the pruned partitions, the
                # same device _blocks uses per-query, amortized here
                # across every expansion the pinned handle answers
                t = self._checked_table(
                    host._postings, columns=["term", "n"]
                ).to_pandas()
                host._catalog_cache = (
                    t.groupby("term", as_index=False)["n"].sum()
                    .rename(columns={"n": "df"})
                )
            else:
                host._catalog_cache = self._checked_table(
                    host._terms, columns=["term", "df"]
                ).to_pandas()
        return host._catalog_cache

    def scored_set(self, qterms: list[str], mode: str = "or",
                   min_match: int | None = None) -> Res:
        """Node-local mirror of PhysicalIndex.scored_docs: strip the
        analyzer chain, batch ALL terms through one pruned read +
        kernel pass, apply the mode/min_match floor."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        ids, scores, nt = self._scored(terms)
        req = (len(terms) if mode == "and"
               else max(1, int(min_match or 1)))
        if req > 1:
            keep = nt >= req
            ids, scores = ids[keep], scores[keep]
        order = np.argsort(ids)
        return ids[order], scores[order]

    def phrase_set(self, words: list[str], slop: int = 0) -> Res:
        """Node-local mirror of PhysicalIndex.phrase_scored
        (positional path): the same phrase kernel over one batch of
        position-carrying blocks."""
        words = strip_stops(self.stats, list(words))
        if not words:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if len(words) == 1:
            return self.scored_set(words)
        if not self.stats.get("positions"):
            raise ValueError("phrase serving needs positional postings")
        terms = sorted(set(words))
        tpred = pa_ds.field("term").isin(terms)
        # bitset pre-filter (round 4): a phrase needs ALL words in
        # the SAME doc, so only blocks where the words' doc-bitsets
        # intersect can produce a match — restrict the (expensive)
        # positional read + decode to those blocks.  _matched_ids
        # takes the id_bits fast path and already applies tombstones;
        # on rare co-occurrence this skips almost every block.
        cand = self._matched_ids(terms, "and")
        if not cand.size:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        br = int(self.stats["block_range"])
        blocks_ok = np.unique(cand // br)
        # only pay the isin when it actually prunes: on a HOT
        # co-occurring pair nearly every block is a candidate and a
        # thousands-entry isin costs more than the rows it skips
        # (measured +16% on `parse request`; -34% on `order fast`)
        n_blocks = -(-int(self.stats["n_docs"]) // br)
        pred = tpred
        if blocks_ok.size < 0.3 * n_blocks:
            pred = tpred & pa_ds.field("block_id").isin(
                [int(b) for b in blocks_ok]
            )
        pdf = self._postings.to_table(
            columns=_POS_COLS, filter=pred
        ).to_pandas()
        cat = self._terms.to_table(
            columns=["term", "df"], filter=tpred
        ).to_pandas()
        if self._df_override is not None and len(cat):
            ov = cat["term"].map(self._df_override)
            cat["df"] = ov.fillna(cat["df"]).astype("int64")
        blocks = pdf.merge(cat, on="term").sort_values(
            ["block_id", "term"], kind="mergesort", ignore_index=True
        )
        kern = make_phrase_kernel(
            list(words), float(self.stats["n_docs"]), self.stats["avgdl"],
            self.stats["k1"], self.stats["b"], self.stats["block_range"],
            slop=slop,
        )
        parts = list(kern(iter([blocks])))
        ids = np.concatenate([p["doc_id"].to_numpy() for p in parts])
        scores = np.concatenate([p["score"].to_numpy() for p in parts])
        ids, scores = self._mask_tomb(ids, scores)
        order = np.argsort(ids)
        return ids[order], scores[order]

    def stored_filter(self, field: str, op, value) -> np.ndarray:
        """doc_ids where ``op(column, value)`` holds — a non-scoring
        stored-column filter (Solr fq): one column-pruned read of the
        docs parquet (the cluster tier's docs scan, node-local)."""
        cols = self._checked_table(
            self._docs, columns=["doc_id", field]
        ).to_pandas()
        col = cols[field]
        keep = op(col, value)
        ids = np.unique(cols["doc_id"].to_numpy()[keep.to_numpy()])
        ids, = self._mask_tomb(ids)
        return ids

    def query(self, q: str, k: int = 10, offset: int = 0,
              fq: list[str] | None = None,
              synonyms: dict[str, list[str]] | None = None,
              timeout_ms: float | None = None
              ) -> list[tuple[int, float]]:
        """Full Lucene-syntax query string answered node-locally —
        the reference's actual front door (`LuceneServer.search` over
        SolrPluginUtils-parsed q+fq, LuceneServer.java:1314-1353)
        served without a cluster: the SAME parser (qparse) and the
        same boolean/scoring semantics as PhysicalIndex.query
        (rank-identity tested across the full syntax battery)."""
        from katta_spark.fulltext.qparse import combine_q_fq

        def compute():
            node = combine_q_fq(q, fq)
            with self._budget(timeout_ms):
                ids, scores = _LocalEval(self, synonyms).eval_query(node)
            order = np.lexsort((ids, -scores))[offset:offset + k]
            return [(int(ids[i]), float(scores[i])) for i in order]

        key = ("query", q, int(k), int(offset), tuple(fq or ()),
               json.dumps(synonyms, sort_keys=True) if synonyms
               else None)
        return list(self._cached(key, compute))

    def search(self, qterms: list[str], k: int = 10, mode: str = "or",
               fields: list[str] | None = None,
               timeout_ms: float | None = None) -> dict:
        """One-call serving surface: hits + numFound + maxScore +
        qTime (QueryResponse.java:27-192 parity), optionally joined
        with stored fields."""
        import time

        t0 = time.monotonic()
        terms = sorted(set(strip_stops(self.stats, qterms)))
        with self._budget(timeout_ms):
            ids, scores, nt = self._scored(terms)
        if mode == "and" and len(terms) > 1:
            keep = nt == len(terms)
            ids, scores = ids[keep], scores[keep]
        order = np.lexsort((ids, -scores))[:k]
        hits = [(int(ids[i]), float(scores[i])) for i in order]
        if fields:
            detail = self.fetch([d for d, _ in hits], fields)
            detail["score"] = [s for _, s in hits]
        else:
            detail = pd.DataFrame(hits, columns=["doc_id", "score"])
        return {
            "hits": detail,
            "num_found": int(ids.size),
            "max_score": float(scores.max()) if ids.size else None,
            "qtime_ms": int((time.monotonic() - t0) * 1000),
        }


# ---------------------------------------------------------------------------
# Node-local boolean evaluator — numpy mirror of fulltext.luceval
# ---------------------------------------------------------------------------

def _stats_finalize(partials: list[tuple]) -> dict:
    """Merge (n, min, max, sum) shard partials into the
    StatsComponent row — exact: every component is associative over
    disjoint doc sets, mean derived last."""
    live = [p for p in partials if p[0]]
    if not live:
        return {"n": 0, "min_v": None, "max_v": None,
                "sum_v": None, "mean_v": None}
    n = sum(p[0] for p in live)
    s = sum(p[3] for p in live)
    return {
        "n": n,
        "min_v": min(p[1] for p in live),
        "max_v": max(p[2] for p in live),
        "sum_v": s,
        "mean_v": s / n,
    }


def _pivot_rank(pairs: pd.DataFrame, field1: str, field2: str,
                n1: int, n2: int) -> list[tuple]:
    """Rank a (field1, field2, cnt) histogram exactly like
    PhysicalIndex.pivot_facet: top-n1 parents by (total desc, value
    asc), top-n2 children within each by (cnt desc, value asc),
    output ordered (parent_cnt desc, field1 asc, cnt desc, field2
    asc)."""
    if not len(pairs):
        return []
    totals = pairs.groupby(field1, dropna=False)["cnt"].sum()
    parents = sorted(
        totals.items(), key=lambda x: (-int(x[1]), str(x[0]))
    )[:n1]
    out = []
    for pv, ptot in parents:
        sub = pairs[pairs[field1] == pv]
        kids = sorted(
            zip(sub[field2], sub["cnt"]),
            key=lambda x: (-int(x[1]), str(x[0])),
        )[:n2]
        for cv, c in kids:
            out.append((pv, int(ptot), cv, int(c)))
    out.sort(key=lambda r: (-r[1], str(r[0]), -r[3], str(r[2])))
    return out


def _suggest_rank(cand: pd.DataFrame, n: int) -> list[tuple]:
    """(df desc, term asc) top-n cut of a suggester candidate set —
    shared by both node tiers."""
    rows = sorted(zip(cand["term"], cand["df"]),
                  key=lambda x: (-int(x[1]), x[0]))[:n]
    return [(str(t), int(d)) for t, d in rows]


def _fmetric_finalize(parts: pd.DataFrame, facet_field: str,
                      n: int) -> pd.DataFrame:
    """Merge facet-by-metric partials and rank exactly like
    PhysicalIndex.facet_by_metric: the merged sum rounds to 6dp
    BEFORE the division (engine agreement), buckets by
    (metric_avg desc, value asc)."""
    g = parts.groupby(facet_field, dropna=False).agg(
        cnt=("cnt", "sum"), sum_v=("sum_v", "sum"),
        n_v=("n_v", "sum"),
    ).reset_index()
    g["metric_avg"] = (g["sum_v"].round(6) / g["cnt"]).round(6)
    # A bucket with zero non-null metric values gets NULL (Spark's
    # F.sum over all-null), ranked LAST (desc_nulls_last parity).
    g.loc[g["n_v"] == 0, "metric_avg"] = np.nan
    out = g[[facet_field, "cnt", "metric_avg"]].sort_values(
        ["metric_avg", facet_field], ascending=[False, True],
        na_position="last", kind="mergesort",
    ).head(int(n))
    out["cnt"] = out["cnt"].astype("int64")
    return out.reset_index(drop=True)


def _gscore_partials(handle: "LocalSearcher", terms: list[str],
                     field: str, mode: str) -> pd.DataFrame:
    """Per-group (n, sum, min, max) over per-hit scores rounded 6dp
    BEFORE aggregation (the Spark tier's rule, so accumulation order
    can never flip ranks) — associative partials a scatter merges
    exactly."""
    ids, scores = handle._scored_filtered(terms, mode)
    vals = handle._doc_values(np.sort(ids), [field])
    df = pd.DataFrame(
        {"doc_id": ids, "score": np.round(scores, 6)}
    ).merge(vals, on="doc_id")
    g = df.groupby(field, dropna=False)["score"]
    return pd.DataFrame({
        field: g.size().index, "n": g.size().to_numpy(),
        "sum_v": g.sum().to_numpy(), "min_v": g.min().to_numpy(),
        "max_v": g.max().to_numpy(),
    })


def _gscore_finalize(parts: pd.DataFrame, field: str,
                     score_mode: str, k: int) -> pd.DataFrame:
    """Merge group-score partials and rank: (field, n_hits, score),
    (score desc, value asc) top-k — identical to
    PhysicalIndex.group_score_topk."""
    if score_mode not in ("sum", "max", "min", "avg"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    g = parts.groupby(field, dropna=False).agg(
        n=("n", "sum"), sum_v=("sum_v", "sum"),
        min_v=("min_v", "min"), max_v=("max_v", "max"),
    ).reset_index()
    score = {
        "sum": g["sum_v"], "max": g["max_v"], "min": g["min_v"],
        "avg": g["sum_v"] / g["n"],
    }[score_mode].round(6)
    out = pd.DataFrame({
        field: g[field], "n_hits": g["n"].astype("int64"),
        "score": score,
    })
    out = out.sort_values(["score", field],
                          ascending=[False, True],
                          na_position="first",
                          kind="mergesort").head(int(k))
    return out.reset_index(drop=True)


def _expand_from_ranked(ranked: pd.DataFrame, field: str, k: int,
                        n_expand: int) -> pd.DataFrame:
    """Solr ExpandComponent rows from a group_topk frame ranked to
    n_expand+1 per group: heads (rank 1, global score order, top-k)
    pick the groups; ranks 2..n+1 become the expand rows,
    (field, exp_rank) asc — the same single ranked pass the Spark
    tier reuses for collapse + expand."""
    heads = (
        ranked[ranked["rank"] == 1]
        .sort_values(["score", "doc_id"], ascending=[False, True],
                     kind="mergesort")
        .head(int(k))[field]
    )
    out = ranked[
        ranked[field].isin(set(heads.dropna()))
        & (ranked["rank"] >= 2)
    ].copy()
    out["exp_rank"] = (out["rank"] - 1).astype("int32")
    out = out[[field, "doc_id", "score", "exp_rank"]]
    return out.sort_values([field, "exp_rank"],
                           kind="mergesort").reset_index(drop=True)


def _term_vectors_attach(tf: pd.DataFrame, cat: pd.DataFrame,
                         n_docs: float) -> pd.DataFrame:
    """Join (doc_id, term, tf) rows with (term, df) and attach the
    Lucene BM25 idf-weighted tfidf — identical formula to the Spark
    tier; rows (doc_id, term) asc."""
    out = tf.merge(cat, on="term")
    df = out["df"].to_numpy(dtype=np.float64)
    out["tfidf"] = out["tf"].to_numpy(dtype=np.float64) * np.log(
        1.0 + (n_docs - df + 0.5) / (df + 0.5)
    )
    return out.sort_values(["doc_id", "term"],
                           kind="mergesort").reset_index(drop=True)


def _facet_stats_finalize(parts: pd.DataFrame,
                          facet_field: str) -> pd.DataFrame:
    """Merge per-facet-value (n, min, max, sum) partials (one or many
    shards' worth concatenated) into the stats.facet rows exactly
    like PhysicalIndex.facet_stats: every component associative, mean
    derived after the merge, sums/means rounded 6dp, facet-value asc
    nulls first."""
    g = parts.groupby(facet_field, dropna=False)
    out = g.agg(
        n=("n", "sum"), min_v=("min_v", "min"),
        max_v=("max_v", "max"), sum_v=("sum_v", "sum"),
    ).reset_index()
    out["mean_v"] = (out["sum_v"] / out["n"]).round(6)
    out["sum_v"] = out["sum_v"].round(6)
    # an all-NULL stat group: Spark reports NULL sum/avg where pandas
    # sums an empty group to 0.0 — normalize to the Spark rule
    zero = out["n"] == 0
    out.loc[zero, ["min_v", "max_v", "sum_v", "mean_v"]] = np.nan
    return out.sort_values(
        facet_field, na_position="first", kind="mergesort"
    ).reset_index(drop=True)


def _facet_rank(items: list[tuple], n: int, missing: bool, sort: str,
                prefix: str | None, mincount: int) -> list[tuple]:
    """Apply the Solr facet.field options to a merged (value, count)
    histogram (value None = the NULL bucket) exactly like
    PhysicalIndex.facet: prefix drops the NULL bucket and filters
    values (Spark's startswith), missing=False drops NULLs, mincount
    cuts buckets, sort "count" = (cnt desc, value asc, nulls last) /
    "index" = (value asc, nulls last), limit n.  Shared by both node
    tiers."""
    rows = []
    for v, c in items:
        if v is None:
            if missing and prefix is None:
                rows.append((None, int(c)))
        elif prefix is None or str(v).startswith(prefix):
            rows.append((v, int(c)))
    if mincount > 0:
        rows = [(v, c) for v, c in rows if c >= int(mincount)]
    if sort == "index":
        key = (lambda x: (x[0] is None,
                          "" if x[0] is None else x[0]))
    else:
        key = (lambda x: (-x[1], x[0] is None,
                          "" if x[0] is None else x[0]))
    return sorted(rows, key=key)[:n]


def _sigterms_rank(vc: pd.Series, n_fg: int, qset: list[str],
                   df_for, n_docs: float, m_terms: int,
                   min_df: int) -> pd.DataFrame:
    """Rank a foreground df histogram against background dfs exactly
    like PhysicalIndex.significant_terms: lift = (df_fg/n_fg) /
    (df_bg/n_docs), sort on the UNROUNDED lift (ties df_fg desc,
    term asc), round to 6dp only in the output.  ``df_for`` maps a
    term list to a (term, df) frame — shard-local catalog on a node,
    the merged catalog under a scatter.  Shared by both node tiers."""
    vc = vc[vc >= int(min_df)]
    if len(qset):
        vc = vc[~vc.index.isin(qset)]
    if not len(vc) or not n_fg:
        return pd.DataFrame(columns=["term", "df_fg", "df_bg", "lift"])
    bg = df_for(sorted(vc.index.tolist()))
    out = pd.DataFrame(
        {"term": vc.index, "df_fg": vc.to_numpy()}
    ).merge(bg.rename(columns={"df": "df_bg"}), on="term")
    raw = (out["df_fg"] / float(n_fg)) / (out["df_bg"] / float(n_docs))
    out["_raw"] = raw
    out = out.sort_values(["_raw", "df_fg", "term"],
                          ascending=[False, False, True],
                          kind="mergesort").head(int(m_terms))
    out["lift"] = out["_raw"].round(6)
    return out[["term", "df_fg", "df_bg", "lift"]].reset_index(drop=True)


def _mlt_rep_terms(tf: pd.Series, cat: pd.DataFrame, n_docs: float,
                   m_terms: int) -> list[str]:
    """MoreLikeThis representative-term pick, identical to the Spark
    tier: w = tf * ln(1 + (N - df + 0.5)/(df + 0.5)), top m_terms by
    (w desc, term asc); returns them sorted for the kernels."""
    if not len(cat):
        return []
    cat = cat.copy()
    df = cat["df"].to_numpy(dtype=np.float64)
    cat["_w"] = tf.reindex(cat["term"]).to_numpy(dtype=np.float64) * \
        np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    rep = cat.sort_values(["_w", "term"], ascending=[False, True],
                          kind="mergesort").head(int(m_terms))
    return sorted(rep["term"].tolist())


def _highlight_frame(fetch_fn, hits: list[tuple[int, float]],
                     terms: list[str], width: int, text_col: str,
                     pre: str, post: str) -> pd.DataFrame:
    """Shared snippet kernel for both node tiers — mirrors the Spark
    tier's locate/substring/regexp_replace semantics exactly."""
    import re as _re

    lows = sorted({t.lower() for t in terms})
    # no terms -> plain leading snippets, no markers (the pattern
    # "()" would otherwise match the empty string at every position
    # and interleave pre/post between every character)
    pat = _re.compile(
        "(" + "|".join(_re.escape(t) for t in lows) + ")", _re.I
    ) if lows else None
    docs = fetch_fn([d for d, _ in hits], [text_col])
    texts = dict(zip(docs["doc_id"], docs[text_col]))
    rows = []
    for d, s in hits:
        text = str(texts.get(d, ""))
        low = text.lower()
        founds = [i + 1 for i in
                  (low.find(t) for t in lows) if i >= 0]
        first = min(founds) if founds else 1
        start = max(first - max(width // 3, 0), 1)
        snippet = text[start - 1:start - 1 + width]
        rows.append((d, s, pat.sub(rf"{pre}\1{post}", snippet)
                     if pat else snippet))
    return pd.DataFrame(rows, columns=["doc_id", "score", "snippet"])


def _empty_res() -> Res:
    return np.empty(0, np.int64), np.empty(0, np.float64)


def _merge_sum(a: Res, b: Res) -> Res:
    """Union of two (sorted unique) result sets, scores summing."""
    ids = np.concatenate([a[0], b[0]])
    sc = np.concatenate([a[1], b[1]])
    u, inv = np.unique(ids, return_inverse=True)
    s = np.zeros(u.size, dtype=np.float64)
    np.add.at(s, inv, sc)
    return u, s


def _must_join(a: Res, b: Res) -> Res:
    """Intersection, scores summing (BooleanQuery must-chain)."""
    common, ia, ib = np.intersect1d(
        a[0], b[0], assume_unique=True, return_indices=True
    )
    return common, a[1][ia] + b[1][ib]


def _add_should(base: Res, sh: Res) -> Res:
    """Left-join add: base keeps its match set, docs also in the
    should set add that score (BooleanQuery should-alongside-must)."""
    if not base[0].size or not sh[0].size:
        return base
    pos = np.searchsorted(sh[0], base[0])
    pos_c = np.minimum(pos, sh[0].size - 1)
    hit = sh[0][pos_c] == base[0]
    out = base[1].copy()
    out[hit] += sh[1][pos_c[hit]]
    return base[0], out


def _anti(base: Res, not_ids: np.ndarray) -> Res:
    if not base[0].size or not not_ids.size:
        return base
    keep = ~np.isin(base[0], not_ids)
    return base[0][keep], base[1][keep]


class _LocalEval:
    """Numpy mirror of :class:`katta_spark.fulltext.luceval.
    LuceneEvaluator` — same AST, same scoring model (classic
    BooleanQuery: must sum + should add + must_not anti; non-scoring
    filters contribute 0; MatchAll scores 1.0), same analyzer-chain
    symmetry (shared strip_stops_node / postings_term / field_terms
    helpers), evaluated over node-local arrays instead of DataFrames.
    Semantics drift is caught by the rank-identity test battery in
    tests/test_serve.py."""

    def __init__(self, srv: LocalSearcher,
                 synonyms: dict[str, list[str]] | None = None,
                 pinned: dict[tuple, list[str]] | None = None):
        self.srv = srv
        self.fields = set(srv.stats.get("indexed_fields", []))
        self.analyzers = srv.stats.get("field_analyzers", {})
        self.stops = set(srv.stats.get("stopwords") or [])
        src = (synonyms if synonyms is not None
               else srv.stats.get("synonyms") or {})
        self.synonyms = {
            k.lower(): sorted({x.lower() for x in v}) for k, v in src.items()
        }
        # cross-shard expansion pinning: {semantic key: matched terms
        # across ALL shards} from the df-exchange phase — the rewrite
        # happened once, against the union catalog; terms this shard
        # lacks simply contribute no postings
        self.pinned = pinned
        self._doc_cols: set[str] | None = None

    def eval_query(self, node) -> Res:
        from katta_spark.fulltext.luceval import strip_stops_node

        stripped = strip_stops_node(self.stops, node)
        if stripped is None:
            return _empty_res()
        return self._eval(stripped)

    # ------------------------------------------------------------- nodes

    def _eval(self, node) -> Res:
        from katta_spark.fulltext.qparse import (
            Bool, ConstScore, Fuzzy, MatchAll, Phrase, RangeQ, Regex,
            Term, Wildcard,
        )

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
            ids = self.srv._all_ids()
            return ids, np.ones(ids.size, dtype=np.float64)
        if isinstance(node, ConstScore):
            ids, _ = self._eval(node.child)
            return ids, np.full(ids.size, float(node.value))
        raise TypeError(f"unknown query node {node!r}")

    def _boost(self, r: Res, boost: float) -> Res:
        if boost == 1.0:
            return r
        return r[0], r[1] * float(boost)

    def _has_col(self, field: str) -> bool:
        if self._doc_cols is None:
            self._doc_cols = set(self.srv._docs.schema.names)
        return field in self._doc_cols

    def _stored_eq(self, field: str, value: str, lower: bool = False) -> Res:
        if not self._has_col(field):
            return _empty_res()
        if lower:
            ids = self.srv.stored_filter(
                field, lambda c, v: c.astype(str).str.lower() == v, value
            )
        else:
            ids = self.srv.stored_filter(
                field, lambda c, v: c.astype(str) == v, value
            )
        return ids, np.zeros(ids.size, dtype=np.float64)

    def _eval_term(self, t) -> Res:
        from katta_spark.fulltext.luceval import field_terms, postings_term

        if t.field is None and t.text in self.synonyms:
            group = sorted({t.text, *self.synonyms[t.text]})
            return self._boost(self.srv.scored_set(group, "or"), t.boost)
        pt = postings_term(self.fields, self.analyzers, t)
        if pt is not None:
            return self._boost(self.srv.scored_set([pt]), t.boost)
        fts = field_terms(self.fields, self.analyzers, t)
        if fts is not None:
            if not fts:
                return _empty_res()
            return self._boost(self.srv.scored_set(fts, "or"), t.boost)
        return self._stored_eq(t.field, t.text)

    def _eval_phrase(self, p) -> Res:
        if p.field is None:
            return self._boost(self.srv.phrase_set(p.words, p.slop), p.boost)
        return self._stored_eq(p.field, p.words[0])

    def _score_terms(self, matched: list[str]) -> Res:
        """Score a rewritten term set as one batched OR
        (expand-and-score — the same convention as the cluster
        tier)."""
        if not matched:
            return _empty_res()
        ids, scores, _ = self.srv._scored(sorted(matched))
        order = np.argsort(ids)
        return ids[order], scores[order]

    def _expand_catalog(self, field: str | None, match_body,
                        key: tuple | None = None) -> Res:
        """Multi-term rewrite: the pinned cross-shard expansion when
        the df-exchange phase supplied one (ShardedSearcher.query),
        else this handle's own (term, df) catalog filtered with
        ``match_body``."""
        if self.pinned is not None and key is not None and key in self.pinned:
            return self._score_terms(self.pinned[key])
        cat = _catalog_match_rows(self.srv._catalog(), field, match_body)
        return self._score_terms(list(cat["term"].astype(str)))

    def _eval_wildcard(self, w) -> Res:
        rx = _wc_regex(w.pattern)
        if w.field is None or w.field in self.fields:
            fld = None if w.field is None else w.field
            return self._boost(
                self._expand_catalog(fld, lambda s: bool(rx.match(s)),
                                     key=("wc", w.field, w.pattern)),
                w.boost,
            )
        if not self._has_col(w.field):
            return _empty_res()
        ids = self.srv.stored_filter(
            w.field,
            lambda c, v: c.astype(str).str.lower().str.match(v),
            rx.pattern,
        )
        return ids, np.zeros(ids.size, dtype=np.float64)

    def _eval_fuzzy(self, fz) -> Res:
        d = int(fz.max_edits)
        if fz.field is None or fz.field in self.fields:
            fld = None if fz.field is None else fz.field

            def match(s: str) -> bool:
                return (abs(len(s) - len(fz.text)) <= d
                        and _levenshtein(s, fz.text) <= d)

            return self._boost(
                self._expand_catalog(fld, match,
                                     key=("fz", fz.field, fz.text, d)),
                fz.boost,
            )
        if not self._has_col(fz.field):
            return _empty_res()
        ids = self.srv.stored_filter(
            fz.field,
            lambda c, v: c.astype(str).str.lower().map(
                lambda s: _levenshtein(s, v) <= d
            ),
            fz.text,
        )
        return ids, np.zeros(ids.size, dtype=np.float64)

    def _eval_regex(self, rx_node) -> Res:
        import re

        rx = re.compile(f"^(?:{rx_node.pattern})$")
        if rx_node.field is None or rx_node.field in self.fields:
            fld = None if rx_node.field is None else rx_node.field
            return self._boost(
                self._expand_catalog(
                    fld, lambda s: bool(rx.match(s)),
                    key=("rx", rx_node.field, rx_node.pattern),
                ),
                rx_node.boost,
            )
        if not self._has_col(rx_node.field):
            return _empty_res()
        ids = self.srv.stored_filter(
            rx_node.field,
            lambda c, v: c.astype(str).str.lower().str.match(v),
            rx.pattern,
        )
        return ids, np.zeros(ids.size, dtype=np.float64)

    def _eval_range(self, r) -> Res:
        from katta_spark.fulltext.luceval import _is_number

        if not self._has_col(r.field):
            return _empty_res()
        numeric = _is_number(r.lo) and _is_number(r.hi)

        def pred(col, _v):
            c = (pd.to_numeric(col, errors="coerce") if numeric
                 else col.astype(str))
            keep = pd.Series(True, index=col.index)
            if r.lo is not None:
                lo = float(r.lo) if numeric else r.lo
                keep &= (c >= lo) if r.incl_lo else (c > lo)
            if r.hi is not None:
                hi = float(r.hi) if numeric else r.hi
                keep &= (c <= hi) if r.incl_hi else (c < hi)
            return keep

        ids = self.srv.stored_filter(r.field, pred, None)
        return ids, np.zeros(ids.size, dtype=np.float64)

    # -------------------------------------------------------------- bool

    def _batch_and_rest(self, nodes) -> tuple[list[str], list]:
        from katta_spark.fulltext.luceval import postings_term
        from katta_spark.fulltext.qparse import Term

        terms, rest = [], []
        for n in nodes:
            pt = postings_term(self.fields, self.analyzers, n) \
                if isinstance(n, Term) else None
            if (pt is not None and n.boost == 1.0
                    and not (n.field is None and n.text in self.synonyms)):
                terms.append(pt)
            else:
                rest.append(n)
        return terms, rest

    def _eval_bool(self, b) -> Res:
        sh_terms, sh_rest = self._batch_and_rest(b.should)
        sh_dfs = []
        if sh_terms:
            sh_dfs.append(self.srv.scored_set(sh_terms, "or"))
        sh_dfs.extend(self._eval(n) for n in sh_rest)
        should_res: Res | None = None
        for r in sh_dfs:
            should_res = r if should_res is None else _merge_sum(should_res, r)

        mu_terms, mu_rest = self._batch_and_rest(b.must)
        base: Res | None = None
        if mu_terms:
            base = self.srv.scored_set(mu_terms, "and")
        for n in mu_rest:
            r = self._eval(n)
            base = r if base is None else _must_join(base, r)

        if base is not None:
            if should_res is not None:
                base = _add_should(base, should_res)
        elif should_res is not None:
            base = should_res
        else:
            ids = self.srv._all_ids()
            base = (ids, np.ones(ids.size, dtype=np.float64))

        nt_terms, nt_rest = self._batch_and_rest(b.must_not)
        nots: np.ndarray | None = None
        if nt_terms:
            nots = self.srv.scored_set(nt_terms, "or")[0]
        for n in nt_rest:
            ids = self._eval(n)[0]
            nots = ids if nots is None else np.union1d(nots, ids)
        if nots is not None:
            base = _anti(base, nots)
        return self._boost(base, b.boost)


# ---------------------------------------------------------------------------
# Scatter-gather client over many shard directories (Client.java parity)
# ---------------------------------------------------------------------------

# per-worker-process shard handle cache ("a node keeps its searcher open")
_SHARD_CACHE: dict[str, "LocalSearcher"] = {}


def _worker_cap_threads(n_workers: int) -> None:
    """Pool initializer: divide the machine's cores among the forked
    shard workers.  Each worker's Arrow compute kernels (the
    significant_terms group-bys, dataset filters) otherwise spawn the
    FULL default thread pool — n_workers x n_cores threads thrashing
    one machine (the process-pool analogue of the GIL convoy the
    scatter replaced)."""
    import os

    import pyarrow as pa

    share = max(2, (os.cpu_count() or 8) // max(1, n_workers))
    pa.set_cpu_count(share)
    pa.set_io_thread_count(share)


def _shard_handle(d: str) -> "LocalSearcher":
    s = _SHARD_CACHE.get(d)
    if s is None:
        s = _SHARD_CACHE[d] = LocalSearcher(d)
    return s


def _shard_blocks_for(s: "LocalSearcher", off: int, terms: list[str],
                      cat_rows: list[tuple], block_range: int
                      ) -> pd.DataFrame:
    """One shard's namespaced posting blocks carrying the GLOBAL df
    (block_id shifts by the shard offset, so the gap decode emits
    namespaced doc ids with no re-encode)."""
    pdf = s._postings.to_table(
        columns=_BLOCK_COLS, filter=pa_ds.field("term").isin(terms)
    ).to_pandas()
    pdf["block_id"] = pdf["block_id"] + off // block_range
    cat = pd.DataFrame(cat_rows, columns=["term", "df"])
    return pdf.merge(cat, on="term").sort_values(
        ["block_id", "term"], kind="mergesort", ignore_index=True
    )


def _shard_topk_task(payload: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Per-shard top-k — runs INSIDE a worker process (the node)."""
    d, off, p = payload
    s = _shard_handle(d)
    blocks = _shard_blocks_for(s, off, p["terms"], p["cat"],
                               p["block_range"])
    if s._tomb is None:
        return _wand_scan(
            blocks, p["n_docs"], p["avgdl"], p["k1"], p["b"],
            p["block_range"], p["k"], len(p["terms"]), p["mode"],
            min_match=p["min_match"],
        )
    ids, sc, nt = _exhaustive_scan(
        blocks, p["n_docs"], p["avgdl"], p["k1"], p["b"],
        p["block_range"])
    keep = ~np.isin(ids, s._tomb + off)
    ids, sc, nt = ids[keep], sc[keep], nt[keep]
    req = (len(p["terms"]) if p["mode"] == "and"
           else max(1, int(p["min_match"] or 1)))
    if req > 1:
        m = nt >= req
        ids, sc = ids[m], sc[m]
    return ids, sc


def _shard_facet_task(payload: tuple) -> list[tuple[object, int]]:
    """Per-shard FULL value histogram over the match set — runs
    inside a worker process; local doc ids suffice (values, not ids,
    travel back)."""
    d, _off, p = payload
    s = _shard_handle(d)
    ids, _, nt = _exhaustive_scan(
        _shard_blocks_for(s, 0, p["terms"], p["cat"], p["block_range"]),
        p["n_docs"], p["avgdl"], p["k1"], p["b"], p["block_range"])
    if s._tomb is not None and ids.size:
        keep = ~np.isin(ids, s._tomb)
        ids, nt = ids[keep], nt[keep]
    if p["mode"] == "and" and len(p["terms"]) > 1:
        ids = ids[nt == len(p["terms"])]
    ids = np.sort(ids)
    tbl = s._docs_subset(ids, [p["field"]])
    cnt = tbl[p["field"]].value_counts(dropna=False)
    return [(None if pd.isna(v) else v, int(c))
            for v, c in cnt.items()]


def _shard_count_task(payload: tuple) -> int:
    """Per-shard live-match count — runs inside a worker process.
    Counting needs NO df exchange (idf never changes membership), so
    each shard answers from its own doc-id bitsets; the client just
    sums (shards own disjoint doc sets)."""
    d, p = payload
    return _shard_handle(d).count_raw(p["terms"], p["mode"])


def _shard_sorted_task(payload: tuple) -> pd.DataFrame:
    """Per-shard field-sorted top rows — runs inside a worker
    process.  Field sorting needs NO df exchange (membership is
    idf-free), so the scatter is one round; the shard returns its
    own top (offset+limit) rows INCLUDING the sort columns so the
    client-side merge re-applies the same comparator."""
    d, off, p = payload
    out = _shard_handle(d).sorted_query(
        p["terms"], p["sort_cols"], p["cols"], p["k"], mode=p["mode"],
    )
    out["doc_id"] = out["doc_id"] + off
    return out


def _shard_range_task(payload: tuple):
    """Per-shard FULL range histogram (numeric gap buckets or date
    units) / other=all triple — min_count is applied client-side
    AFTER summation so mid-ranked buckets can never be undercut."""
    d, _off, p = payload
    s = _shard_handle(d)
    if p["kind"] == "date":
        return s._date_hist(p["terms"], p["field"], p["unit"], p["mode"])
    if p["kind"] == "other":
        return s.range_facet_other(
            p["terms"], p["field"], p["start"], p["end"], p["mode"]
        )
    return s._range_hist(
        p["terms"], p["field"], p["start"], p["end"], p["gap"], p["mode"]
    )


def _shard_grouping_task(payload: tuple) -> pd.DataFrame:
    """Per-shard grouping unit — runs inside a worker process.  The
    shard scores with the merged-catalog dfs (a _global_view overlay:
    the getDocFreqs exchange), so per-shard heads/ranks are already
    on the corpus-wide score scale and the client merge is a pure
    re-sort.  op=collapse returns the FULL per-value head map
    (bounded by value cardinality — the merge can never miss a
    group's true head); op=group returns per-value top k_per_group
    (a global per-group top-k is a top-k of the union of per-shard
    per-group top-ks)."""
    d, off, p = payload
    s = _shard_handle(d)
    v = s._global_view(p["n_docs"], p["avgdl"], dict(p["cat"]))
    if p["op"] == "collapse":
        out = v._collapse_heads(p["terms"], p["field"], p["mode"])
        out = out[["doc_id", "score", p["field"]]]
    else:
        out = v.group_topk(p["terms"], p["field"], p["k_per_group"],
                           p["mode"])
    out = out.copy()
    out["doc_id"] = out["doc_id"] + off
    return out


def _shard_spell_task(payload: tuple) -> pd.DataFrame:
    """Per-shard FULL spell candidate set — pure-Python levenshtein
    over the shard's whole term catalog, i.e. exactly the CPU-bound
    work the GIL serializes under threads, so it runs in the
    process pool."""
    d, _off, p = payload
    return _shard_handle(d)._spell_candidates(p["word"], p["max_edits"])


def _shard_stats_task(payload: tuple) -> tuple:
    """Per-shard (n, min, max, sum) stats partial — pandas/numpy
    CPU, process pool."""
    d, _off, p = payload
    return _shard_handle(d)._stats_partial(p["terms"], p["field"],
                                           p["mode"])


def _shard_pivot_task(payload: tuple) -> pd.DataFrame:
    """Per-shard FULL (field1, field2) histogram — pandas CPU,
    process pool."""
    d, _off, p = payload
    return _shard_handle(d)._pivot_pairs(p["terms"], p["field1"],
                                         p["field2"], p["mode"])


def _interval_counts(vals: np.ndarray,
                     intervals: list[tuple]) -> list[int]:
    """Counts per interval IN INTERVAL ORDER (not label-sorted) — the
    positional unit both tiers share, so the scatter merge can sum
    element-wise and duplicate labels stay distinct rows."""
    out = []
    for _label, lo, hi, lo_incl, hi_incl in intervals:
        c = (vals >= lo) if lo_incl else (vals > lo)
        c &= (vals <= hi) if hi_incl else (vals < hi)
        out.append(int(np.count_nonzero(c)))
    return out


def _shard_interval_task(payload: tuple) -> list[int]:
    """Per-shard facet.interval counts, interval order — numpy CPU,
    process pool."""
    d, _off, p = payload
    s = _shard_handle(d)
    return _interval_counts(
        s._matched_values(p["terms"], p["field"], p["mode"]),
        p["intervals"],
    )


def _shard_suggest_task(payload: tuple) -> pd.DataFrame:
    """Per-shard FULL regex/infix suggester candidates — Python
    regex CPU over the catalog, process pool."""
    d, _off, p = payload
    return _shard_handle(d)._suggest_candidates(p["kind"], p["arg"])


def _shard_fmetric_task(payload: tuple) -> pd.DataFrame:
    """Per-shard facet-by-metric partials — pandas CPU, process
    pool."""
    d, _off, p = payload
    return _shard_handle(d)._fmetric_partials(
        p["terms"], p["facet_field"], p["metric_field"], p["mode"]
    )


def _shard_gscore_task(payload: tuple) -> pd.DataFrame:
    """Per-shard group-score partials on the corpus-wide score scale
    (a _global_view overlay carries the merged-catalog dfs)."""
    d, _off, p = payload
    s = _shard_handle(d)
    v = s._global_view(p["n_docs"], p["avgdl"], dict(p["cat"]))
    return _gscore_partials(v, p["terms"], p["field"], p["mode"])


def _shard_ngroups_task(payload: tuple) -> tuple[list, int]:
    """Per-shard (distinct non-NULL group values, n_hits)."""
    d, _off, p = payload
    s = _shard_handle(d)
    ids = s._matched_ids(p["terms"], p["mode"])
    vals = s._doc_values(ids, [p["field"]])[p["field"]]
    return sorted(vals.dropna().unique().tolist()), int(ids.size)


def _shard_adjacency_task(payload: tuple) -> list[tuple]:
    """Per-shard adjacency matrix (labels pre-stripped) — bitset
    match sets + sorted intersects, process pool.  Zero pairs are
    kept here (another shard may fill them); the client omits
    all-empty pairs after summation."""
    d, _off, p = payload
    s = _shard_handle(d)
    items = [(label, s._matched_ids(terms, p["mode"]))
             for label, terms in p["qmap"]]
    out = []
    for i, (k1, s1) in enumerate(items):
        for k2, s2 in items[i:]:
            c = (int(s1.size) if k1 == k2 else
                 int(np.intersect1d(s1, s2, assume_unique=True).size))
            out.append((k1, k2, c))
    return out


def _shard_facet_stats_task(payload: tuple) -> pd.DataFrame:
    """Per-shard stats.facet partials — pandas CPU, process pool."""
    d, _off, p = payload
    return _shard_handle(d)._facet_stats_partials(
        p["terms"], p["facet_field"], p["stat_field"], p["mode"]
    )


def _shard_search_task(payload: tuple):
    """Per-shard search-envelope unit: the shard's top-k page AND its
    bitset match count in ONE scatter round (LocalSearcher.search
    derives numFound from the same pass for the same reason)."""
    ids, sc = _shard_topk_task(payload)
    d, _off, p = payload
    n = _shard_handle(d).count_raw(p["terms"], p["mode"])
    return ids, sc, n


def _shard_facet_queries_task(payload: tuple) -> list[tuple[str, int]]:
    """Per-shard facet.query counts for ALL labels in ONE scatter
    round (each label rides the bitset count path)."""
    d, _off, p = payload
    s = _shard_handle(d)
    return [(label, s.count(terms, p["mode"]))
            for label, terms in p["qmap"]]


def _shard_sigterms_task(payload: tuple):
    """Per-shard significant_terms foreground: (pa.Table (term,
    df_fg), n_fg) — disjoint doc sets, so the client-side sums are
    exact.  The histogram travels back as a pyarrow Table (pickled
    via Arrow IPC buffers — columnar, no per-string cost) and the
    client merges with an Arrow group-by.  Background dfs come from
    a second (threaded, pyarrow-only) merged-catalog read over the
    union foreground vocabulary."""
    d, _off, p = payload
    s = _shard_handle(d)
    return s._sigterms_fg_tbl(p["terms"], p["mode"],
                              max_fg=p.get("max_fg"),
                              shard_min_df=p.get("shard_min_df", 1),
                              shard_size=p.get("shard_size"))


def _parse_stripped(s: "LocalSearcher", q, fq):
    """Parse q+fq and apply this index's stopword rewrite — shared by
    both query-scatter phases so they see the SAME tree."""
    from katta_spark.fulltext.luceval import strip_stops_node
    from katta_spark.fulltext.qparse import combine_q_fq

    node = combine_q_fq(q, fq)
    return strip_stops_node(set(s.stats.get("stopwords") or []), node)


def _shard_collect_task(payload: tuple):
    """Phase 1 of the cross-shard query — the getDocFreqs() exchange
    (LuceneServer.java:76-82) generalized to the full query grammar:
    this shard's (term, local df) rows for every plain postings term
    the query scores, plus its catalog matches for every
    wildcard/fuzzy/regex expansion.  Runs inside a worker process
    (fuzzy matching is Python CPU over the whole catalog)."""
    d, _off, p = payload
    s = _shard_handle(d)
    node = _parse_stripped(s, p["q"], p["fq"])
    if node is None:
        return [], {}
    fields = set(s.stats.get("indexed_fields", []))
    analyzers = s.stats.get("field_analyzers", {})
    src = (p["synonyms"] if p["synonyms"] is not None
           else s.stats.get("synonyms") or {})
    synonyms = {k.lower(): sorted({x.lower() for x in v})
                for k, v in src.items()}
    plain = _collect_plain_terms(s.stats, fields, analyzers, synonyms, node)
    rows: list[tuple[str, int]] = []
    if plain:
        cat = s._terms.to_table(
            columns=["term", "df"],
            filter=pa_ds.field("term").isin(sorted(plain)),
        ).to_pandas()
        rows = list(zip(cat["term"].tolist(), [int(x) for x in cat["df"]]))
    exp: dict[tuple, list[tuple[str, int]]] = {}
    for key, fld, matcher in _iter_expansions(fields, node):
        if key in exp:
            continue
        m = _catalog_match_rows(s._catalog(), fld, matcher)
        exp[key] = list(zip(m["term"].astype(str).tolist(),
                            [int(x) for x in m["df"]]))
    return rows, exp


def _shard_query_task(payload: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Phase 2 — evaluate the FULL q+fq AST on this shard with global
    stats/dfs and pinned expansions (LuceneServer.search per node,
    LuceneServer.java:661-690).  Exact per shard because shards own
    disjoint doc sets: boolean algebra distributes over the disjoint
    union, so the per-shard result IS the union-index result
    restricted to this shard's docs.  Returns the shard's top
    (offset+k) only — sufficient for the global cut, tiny IPC."""
    d, off, p = payload
    s = _shard_handle(d)
    view = s._global_view(p["n_docs"], p["avgdl"], dict(p["df_map"]))
    node = _parse_stripped(s, p["q"], p["fq"])
    if node is None:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    ids, scores = _LocalEval(view, p["synonyms"],
                             pinned=p["pinned"]).eval_query(node)
    order = np.lexsort((ids, -scores))[:p["need"]]
    return ids[order] + off, scores[order]


class ShardedSearcher:
    """Katta CLIENT scatter-gather, node-side: one query handle over
    MANY shard index directories (the reference client expands index
    patterns to shard sets and fans a query out —
    katta-client/.../client/Client.java:672-703 — after a global
    doc-frequency exchange, ``getDocFreqs()``
    LuceneServer.java:76-82, so every shard scores with corpus-wide
    idf).

    Here the df exchange is a per-query merge of the shards' term
    catalogs (summed df overrides each shard's local df column before
    the kernels run), doc/block ids namespace by the same cumulative
    block-aligned offsets as ``PhysicalIndex.open_many``, and the
    merged posting blocks run through the SHARED kernels — so the
    ranking is identical to a single index built over the union of
    the corpora, and identical to the Spark tier's open_many handle
    (both tested).

    100 TB shape: per-shard reads stay term-pruned (row-group stats),
    the merge is O(query terms × shards) catalog rows + the posting
    blocks of the query terms only; shards can live on different
    machines behind any RPC fan-out — this class is the per-node
    compute each of them runs plus the client-side merge."""

    def __init__(self, dirs: list[str], timeout_ms: float | None = None,
                 complete: bool = True,
                 replicas: dict[str, list[str]] | None = None,
                 scache_size: int = 256):
        """``timeout_ms``: default scatter budget per query — a shard
        that hasn't answered inside it is treated as failed (the
        client-side budget, LuceneClient.java:182).  ``complete``:
        True (default) raises on any failed shard (exact-results
        contract); False returns the merge of the shards that DID
        answer and records the rest in ``self.shards_failed`` — the
        reference's partial-result policy
        (ClientResultReceiver.java:147-166, Solr shards.tolerant).

        ``replicas``: optional ``{shard_dir: [alternate_dirs]}`` —
        byte-identical copies of a shard's index (the reference's
        replication level, IndexMetaData + distribution
        DefaultDistributionPolicy.java:69-147).  A shard task that
        dies, hits an unreadable/corrupt copy, or times out with
        budget remaining is re-dispatched to the next replica before
        the shard is declared failed (NodeInteraction.java:141-205);
        a replica that answers is PROMOTED — subsequent queries go to
        it directly and the dead copy leaves the rotation
        (ShuffleNodeSelectionPolicy.java:25-40 removes failed
        nodes).  ``shards_failed`` lists a shard only when every
        replica is exhausted."""
        import threading

        if not dirs:
            raise ValueError("no shard directories")
        self.timeout_ms = timeout_ms
        self.complete = bool(complete)
        self.replicas: dict[str, list[str]] = {
            str(k): [str(x) for x in v]
            for k, v in (replicas or {}).items()
        }
        #: shard dirs that failed/timed out in the LAST scatter —
        #: reset per query; feeds the search() envelope
        self.shards_failed: list[str] = []
        # lifetime scatter counters (metrics())
        self._n_scatters = 0
        self._n_retries = 0
        self._n_failures = 0
        self._n_failovers = 0
        self._fo_lock = threading.Lock()
        #: scatter-tier result cache (round 5): repeated identical
        #: scatters skip fan-out + merge entirely.  Keys include the
        #: per-shard COMMIT FINGERPRINTS, so a replica promotion or a
        #: commit-pinned change can never serve a stale hit;
        #: refresh() rebuilds the handle (fresh empty cache — the
        #: same new-searcher flush as the node tier).  Staleness rule
        #: mirrors LocalSearcher: mutations require refresh().
        #: ``scache_size=0`` disables (benches measure cold scatters).
        self._scache_size = int(scache_size)
        self._scache = (
            _ResultCache(self._scache_size) if scache_size else None
        )
        # opening a shard is itself replica-aware: a copy whose files
        # are gone/corrupt at open time fails over like a scatter-time
        # failure would (refresh() re-enters here after a copy dies)
        self.shards = [self._open_with_failover(d) for d in dirs]
        base = self.shards[0].stats
        br = base["block_range"]
        for s in self.shards[1:]:
            if s.stats["block_range"] != br:
                raise ValueError("block_range differs across indexes")
            if (s.stats["k1"], s.stats["b"]) != (base["k1"], base["b"]):
                raise ValueError("BM25 parameters differ across indexes")
            if s.stats.get("stopwords", []) != base.get("stopwords", []):
                raise ValueError("stopword sets differ across indexes")
        self.offsets: list[int] = []
        offset, n_total, dl_total = 0, 0, 0.0
        for s in self.shards:
            self.offsets.append(offset)
            ids = s._docs.to_table(columns=["doc_id"])["doc_id"].to_numpy()
            span = int(ids.max()) + 1 if ids.size else 0
            offset += (-(-span // br)) * br  # ceil to a block boundary
            n_total += int(s.stats["n_docs"])
            dl_total += float(s.stats["avgdl"]) * int(s.stats["n_docs"])
        self.stats = dict(
            base,
            n_docs=n_total,
            avgdl=(dl_total / n_total) if n_total else 0.0,
        )
    def close(self) -> None:
        """Shut down the scatter worker pool (safe to call twice)."""
        if getattr(self, "_pool", None) is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def refresh(self) -> "ShardedSearcher":
        """Reopen every shard AND restart the scatter pool: forked
        workers cache a LocalSearcher per directory for the life of
        the pool (the staleness rule LocalSearcher.refresh documents),
        so after a new commit, delete, or compaction the pool must be
        recreated for scattered queries to see the new state.  The
        parent's inline-path cache entries are dropped too (forked
        children inherit the parent's module globals)."""
        dirs = [s.index_dir for s in self.shards]
        keep = (self._n_scatters, self._n_retries, self._n_failures,
                self._n_failovers)
        self.close()
        for d in dirs:
            _SHARD_CACHE.pop(d, None)
        # replicas key by CURRENT serving dir, so promotions survive
        self.__init__(dirs, timeout_ms=self.timeout_ms,
                      complete=self.complete, replicas=self.replicas,
                      scache_size=self._scache_size)
        # lifetime counters survive the reopen (metrics contract);
        # ADD the kept values — the reopen itself may have failed
        # over a dead copy and counted it
        self._n_scatters += keep[0]
        self._n_retries += keep[1]
        self._n_failures += keep[2]
        self._n_failovers += keep[3]
        return self

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    def _ensure_pool(self):
        import multiprocessing as mp
        import os
        from concurrent.futures import ProcessPoolExecutor

        if getattr(self, "_pool", None) is None:
            n_workers = min(len(self.shards), os.cpu_count() or 8)
            self._pool = ProcessPoolExecutor(
                max_workers=n_workers,
                mp_context=mp.get_context("fork"),
                initializer=_worker_cap_threads,
                initargs=(n_workers,),
            )
        return self._pool

    def _scatter(self, task_fn, payloads: list,
                 timeout_ms: float | None = None) -> list:
        """Fan a per-shard task out to a PROCESS pool — the honest
        one-node-per-shard model (a Katta node is its own JVM): the
        per-shard work is small-array numpy/pandas that the GIL
        serializes under threads (measured 15x CONVOY slowdown with a
        thread pool), so real parallelism needs real processes.  The
        forked workers cache a LocalSearcher per shard dir across
        queries; results (top-k arrays / counts) are tiny, so IPC
        cost is microseconds.  Single shard runs inline (no budget).

        Failure policy (NodeInteraction.java:141-205 +
        ClientResultReceiver.java:147-166), by failure class:

        - DEAD worker (BrokenProcessPool, e.g. OOM-kill): the pool is
          rebuilt and that shard's task re-dispatched ONCE; twice-dead
          drops from the merge (or raises under ``complete=True``).
        - TIMEOUT: dropped, never retried (it would just time out
          again inside the same budget).  When a budget is set the
          worker also arms the KERNEL deadline (75% of the remaining
          budget), so a runaway scan aborts in the worker and frees
          it — without this a wedged worker would queue the shard's
          next queries behind it and cascade timeouts onto healthy
          requests (with-budget test covers the return path; the
          worker-side abort mirrors LuceneServer's collector).
        - TASK EXCEPTION (bad query, unknown field, in-kernel
          QueryTimeout): deterministic — never retried, never tears
          the healthy pool down; raised immediately under
          ``complete=True``, dropped under ``complete=False``.

        REPLICA FAILOVER (NodeInteraction.java:141-205): when the
        handle carries replica dirs for a shard, a DEAD-worker retry
        that dies again, an infra task failure (unreadable/corrupt
        copy — :func:`_is_infra_failure`), or a TIMEOUT with budget
        remaining re-dispatches the shard's task to the next replica
        instead of failing it; the shard joins ``shards_failed`` only
        when every replica is exhausted.  A replica that answers is
        promoted for subsequent queries (failed copies leave the
        rotation, ShuffleNodeSelectionPolicy.java:25-40).

        Even under ``complete=False``, ZERO surviving shards raises
        (Solr shards.tolerant does the same): there is no meaningful
        partial result, and returning [] would push confusing
        empty-concat errors into every merge surface."""
        import time
        from concurrent.futures import TimeoutError as FutTimeout
        from concurrent.futures.process import BrokenProcessPool

        budget = self.timeout_ms if timeout_ms is None else timeout_ms
        self.shards_failed = []
        self._n_scatters += 1
        cur = list(payloads)
        reps = {i: list(self.replicas.get(_payload_dir(p), []))
                for i, p in enumerate(payloads)}
        if len(payloads) == 1 and budget is None:
            # inline fast path — still replica-aware
            while True:
                try:
                    out = [task_fn(cur[0])]
                except Exception as e:
                    if _is_infra_failure(e) and reps[0]:
                        self._n_failovers += 1
                        cur[0] = _swap_payload_dir(cur[0],
                                                   reps[0].pop(0))
                        continue
                    raise
                self._promote_successes(payloads, cur, reps, {0: None})
                return out
        deadline = (None if budget is None
                    else time.monotonic() + float(budget) / 1000.0)
        results: dict[int, object] = {}
        pending = list(range(len(payloads)))
        first_exc: BaseException | None = None
        pool_dead_once: set[int] = set()
        max_rounds = 2 + max((len(r) for r in reps.values()), default=0)
        for rnd in range(max_rounds):
            pool = self._ensure_pool()
            left_ms = (None if deadline is None else
                       max(0.0, (deadline - time.monotonic()) * 1000.0))
            try:
                if left_ms is None:
                    futs = {i: pool.submit(task_fn, cur[i])
                            for i in pending}
                else:
                    futs = {i: pool.submit(
                        _deadline_task, (task_fn, cur[i], left_ms))
                        for i in pending}
            except BrokenProcessPool:
                self.close()
                if rnd == max_rounds - 1:
                    break
                continue
            timed_out, broken, err_det = [], [], []
            err_infra: dict[int, BaseException] = {}
            for i, fut in futs.items():
                left = (None if deadline is None
                        else max(0.0, deadline - time.monotonic()))
                try:
                    results[i] = fut.result(timeout=left)
                except FutTimeout:
                    fut.cancel()
                    timed_out.append(i)
                except BrokenProcessPool:
                    broken.append(i)
                except Exception as e:
                    if _is_infra_failure(e):
                        err_infra[i] = e
                    else:
                        # deterministic task failure: no retry, pool
                        # is healthy — do NOT tear it down (the
                        # workers' warm shard-handle caches survive)
                        if first_exc is None:
                            first_exc = e
                        err_det.append(i)
            nxt: list[int] = []
            failed_now = list(err_det)
            for i in timed_out:
                lf = (None if deadline is None
                      else deadline - time.monotonic())
                # a replica attempt needs real budget left to be
                # worth dispatching
                if reps[i] and (lf is None or lf > 0.05):
                    self._n_failovers += 1
                    cur[i] = _swap_payload_dir(cur[i], reps[i].pop(0))
                    nxt.append(i)
                else:
                    failed_now.append(i)
            for i, e in err_infra.items():
                if reps[i]:
                    self._n_failovers += 1
                    cur[i] = _swap_payload_dir(cur[i], reps[i].pop(0))
                    nxt.append(i)
                else:
                    if first_exc is None:
                        first_exc = e
                    failed_now.append(i)
            for i in broken:
                if i not in pool_dead_once:
                    # dead fork-pool: restart it, re-dispatch ONCE to
                    # the same copy
                    pool_dead_once.add(i)
                    self._n_retries += 1
                    nxt.append(i)
                elif reps[i]:
                    # twice-dead on this copy: next replica (which
                    # gets its own single dead-worker retry)
                    self._n_failovers += 1
                    cur[i] = _swap_payload_dir(cur[i], reps[i].pop(0))
                    pool_dead_once.discard(i)
                    nxt.append(i)
                else:
                    failed_now.append(i)
            if broken:
                self.close()
            # mark BEFORE any complete=True raise so shards_failed,
            # _n_failures and metrics() stay consistent across all
            # failure classes
            self._mark_failed(failed_now, payloads)
            if err_det and self.complete:
                raise first_exc
            pending = nxt
            if not pending:
                break
        if pending:
            self._mark_failed(pending, payloads)
        self._promote_successes(payloads, cur, reps, results)
        if self.shards_failed and self.complete:
            if first_exc is not None and not isinstance(
                    first_exc, BrokenProcessPool):
                raise first_exc
            raise TimeoutError(
                f"shards failed within budget: {self.shards_failed}"
            )
        if payloads and not results:
            raise TimeoutError(
                f"all shards failed within budget: {self.shards_failed}"
            )
        return [results[i] for i in sorted(results)]

    def metrics(self) -> dict:
        """Scatter-client counters + per-shard node metrics — the
        client-side view of the reference's node metrics registry.
        Lifetime counters survive refresh().  ``per_shard`` reads
        THIS process's shard handles (the inline / single-shard
        path); scattered queries run in forked workers whose own
        result caches are per-worker-process and not aggregated
        here — worker cache behavior is measured by the loadtest's
        serve tier, not this snapshot."""
        return {
            "shards_total": len(self.shards),
            "n_scatters": self._n_scatters,
            "n_retries": self._n_retries,
            "n_replica_failovers": self._n_failovers,
            "n_shard_failures": self._n_failures,
            "scache_hits": self._scache.hits if self._scache else 0,
            "scache_misses": (self._scache.misses
                              if self._scache else 0),
            "last_shards_failed": list(self.shards_failed),
            "per_shard": [s.node_metrics() for s in self.shards],
        }

    def _mark_failed(self, idxs: list[int], payloads: list) -> None:
        # every scatter payload leads with its shard's index_dir, so
        # the payload itself names the failed shard (payload lists
        # are not always 1:1 with self.shards — e.g. the evaluation
        # round of query() excludes shards that missed the df
        # exchange)
        for i in idxs:
            p = payloads[i]
            d = p[0] if isinstance(p, tuple) else str(p)
            if d not in self.shards_failed:
                self.shards_failed.append(d)
                self._n_failures += 1

    def _sfingerprint(self) -> tuple:
        """Per-shard commit fingerprints — the cache-key component
        that pins a scatter result to the EXACT index state it was
        computed from: serving dir (changes on replica promotion),
        commit set, doc count, tombstone count.  Computed from
        in-memory handle state (no I/O)."""
        return tuple(
            (s.index_dir,
             tuple(s.stats.get("commits") or []),
             int(s.stats["n_docs"]),
             0 if s._tomb is None else int(s._tomb.size))
            for s in self.shards
        )

    def _scached(self, key: tuple, compute):
        """Scatter-tier queryResultCache wrapper: a hit skips the
        whole fan-out + merge (rank-identical by construction — the
        key pins query AND per-shard state).  PARTIAL results are
        never cached: a later retry must re-scatter, not replay the
        degraded answer."""
        if self._scache is None:
            return compute()
        full_key = (self._sfingerprint(), key)
        hit = self._scache.get(full_key)
        if hit is not self._scache._MISS:
            self.shards_failed = []
            return hit
        out = compute()
        if not self.shards_failed:
            self._scache.put(full_key, out)
        return out

    def _promote_successes(self, payloads: list, cur: list,
                           reps: dict, results: dict) -> None:
        """After a scatter, promote every replica that ANSWERED for a
        payload whose original copy failed: subsequent queries go to
        the surviving copy directly and the dead copy leaves the
        rotation (the reference's node-selection policy removes
        failed nodes, ShuffleNodeSelectionPolicy.java:25-40)."""
        for i in results:
            od, nd = _payload_dir(payloads[i]), _payload_dir(cur[i])
            if nd != od:
                self._promote(od, nd, reps[i])

    def _open_with_failover(self, d: str) -> "LocalSearcher":
        """Open a shard dir, walking its replica rotation when the
        copy is unreadable (infra failures only — see
        :func:`_is_infra_failure`)."""
        while True:
            try:
                return LocalSearcher(d)
            except Exception as e:
                alts = self.replicas.get(d, [])
                if not _is_infra_failure(e) or not alts:
                    raise
                self._n_failovers += 1
                nd = alts[0]
                self.replicas.pop(d, None)
                self.replicas[nd] = [x for x in alts[1:] if x != nd]
                d = nd

    def _promote(self, old_dir: str, new_dir: str,
                 remaining: list[str]) -> None:
        """Point the shard that served from ``old_dir`` at
        ``new_dir``; ``remaining`` is the replica rotation left for
        it (copies already tried-and-failed this query are out)."""
        with self._fo_lock:
            self.replicas.pop(old_dir, None)
            self.replicas[new_dir] = [
                d for d in remaining if d != new_dir
            ]
            for j, s in enumerate(self.shards):
                if s.index_dir == old_dir:
                    # identical content => identical span/stats; the
                    # precomputed offsets stay valid
                    self.shards[j] = LocalSearcher(new_dir)
                    break

    def _robust_read(self, j: int, fn):
        """Parent-side (inline, non-scatter) shard read with replica
        failover: surfaces like the df exchange, suggest, and fetch
        read shard files from the client process; an unreadable copy
        fails over to — and promotes — the next replica, matching
        the scatter path's policy."""
        while True:
            s = self.shards[j]
            try:
                return fn(s)
            except Exception as e:
                with self._fo_lock:
                    alts = list(self.replicas.get(s.index_dir, []))
                if not _is_infra_failure(e) or not alts:
                    raise
                self._n_failovers += 1
                self._promote(s.index_dir, alts[0], alts[1:])

    def _merged_cat(self, terms: list[str]) -> pd.DataFrame:
        """The getDocFreqs() exchange: per-shard catalog reads for
        the query terms (pure pyarrow scans — these DO parallelize
        under threads), df summed corpus-wide.  Past a few thousand
        terms (a significant_terms foreground vocabulary, not a
        query) the isin scan filter costs more than the data: read
        the full two-column catalog and hash-filter in pandas
        instead — measured the difference at 4M docs where the
        big-vocab exchange dominated the scatter."""
        big = len(terms) > 4096
        if big:
            import pyarrow as pa
            import pyarrow.compute as pc

            vset = pa.array(sorted(set(terms)))

            def one(s: "LocalSearcher"):
                t = s._terms.to_table(columns=["term", "df"])
                return t.filter(
                    pc.is_in(t["term"], value_set=vset)
                ).to_pandas()
        else:
            pred = pa_ds.field("term").isin(terms)

            def one(s: "LocalSearcher") -> pd.DataFrame:
                return s._terms.to_table(
                    columns=["term", "df"], filter=pred).to_pandas()

        if len(self.shards) == 1:
            cats = [self._robust_read(0, one)]
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(len(self.shards), 32)
            ) as ex:
                cats = list(ex.map(
                    lambda j: self._robust_read(j, one),
                    range(len(self.shards)),
                ))
        return pd.concat(cats).groupby("term", as_index=False)["df"].sum()

    def _payloads(self, terms: list[str], cat: pd.DataFrame,
                  extra: dict) -> list[tuple]:
        base = {
            "terms": terms,
            "cat": list(zip(cat["term"].tolist(),
                            [int(x) for x in cat["df"]])),
            "n_docs": float(self.stats["n_docs"]),
            "avgdl": self.stats["avgdl"],
            "k1": self.stats["k1"],
            "b": self.stats["b"],
            "block_range": self.stats["block_range"],
            **extra,
        }
        return [
            (s.index_dir, off, base)
            for s, off in zip(self.shards, self.offsets)
        ]

    def topk(self, qterms: list[str], k: int = 10, mode: str = "or",
             min_match: int | None = None, offset: int = 0,
             timeout_ms: float | None = None) -> list[tuple[int, float]]:
        """Global BM25 top-k across all shards — PARALLEL per-shard
        WAND heaps (each shard keeps its own threshold, its own
        process) merged client-side by (score desc, doc_id asc) (the
        reference's scatter + Hit.compareTo merge), corpus-wide idf
        via the merged catalog, namespaced doc ids."""
        terms = sorted(set(strip_stops(self.stats, qterms)))

        def compute():
            cat = self._merged_cat(terms)
            pairs = self._scatter(
                _shard_topk_task,
                self._payloads(terms, cat, {
                    "k": offset + k, "mode": mode,
                    "min_match": min_match,
                }),
                timeout_ms=timeout_ms,
            )
            if not pairs:
                return []
            ids = np.concatenate([p[0] for p in pairs])
            scores = np.concatenate([p[1] for p in pairs])
            order = np.lexsort((ids, -scores))[offset:offset + k]
            return [(int(ids[i]), float(scores[i])) for i in order]

        key = ("topk", tuple(terms), int(k), mode, min_match,
               int(offset))
        return list(self._scached(key, compute))

    def query(self, q: str, k: int = 10, offset: int = 0,
              fq: list[str] | None = None,
              synonyms: dict[str, list[str]] | None = None,
              timeout_ms: float | None = None
              ) -> list[tuple[int, float]]:
        """Full Lucene-syntax q+fq scattered across ALL shards — the
        reference's primary search RPC (Client.java:562-649 scatter;
        LuceneServer.java:661-690 parse+search per node), previously
        single-shard only.

        Two scatter rounds: (1) the df exchange — each shard reports
        local dfs for the query's plain terms and its catalog matches
        for every wildcard/fuzzy/regex expansion; the client sums dfs
        per term (disjoint doc sets) and unions the expansion sets;
        (2) evaluation — each shard runs the SAME boolean evaluator
        with global n_docs/avgdl/dfs and the pinned expansions, and
        returns its top (offset+k).  The merge is the reference's
        Hit.compareTo order (score desc, namespaced doc_id asc).
        Rank-identical to LocalSearcher.query on the union-built
        index and PhysicalIndex.query on the open_many handle
        (tested).  Per-query work is O(query-term posting blocks) per
        shard, in parallel — never corpus-size.

        ``timeout_ms`` (or the handle default) spans BOTH scatter
        rounds — one client budget, like the reference's single RPC
        deadline — but the df exchange is capped at HALF of it, so a
        shard that hangs in round 1 can never starve the evaluation
        round (the same shape as the reference's 75% collector
        fraction: an earlier phase must leave the later one time to
        answer).  Under ``complete=False``, a shard that missed the
        df exchange is excluded from the evaluation round too: its
        dfs are absent from the merged catalog, so letting it score
        round 2 would rank with inconsistent idf."""
        import time

        def compute():
            budget = (self.timeout_ms if timeout_ms is None
                      else timeout_ms)
            t_end = (None if budget is None
                     else time.monotonic() + float(budget) / 1000.0)

            def left():
                return (None if t_end is None else
                        max(0.0, (t_end - time.monotonic()) * 1000.0))

            p1 = {"q": q, "fq": fq, "synonyms": synonyms}
            payloads = [(s.index_dir, off, p1)
                        for s, off in zip(self.shards, self.offsets)]
            df_map: dict[str, int] = {}
            pinned: dict[tuple, set[str]] = {}
            r1_budget = (None if budget is None
                         else float(budget) / 2.0)
            return self._query_rounds(q, k, offset, payloads, df_map,
                                      pinned, left, r1_budget)

        key = ("query", q, int(k), int(offset), tuple(fq or ()),
               json.dumps(synonyms, sort_keys=True) if synonyms
               else None)
        return list(self._scached(key, compute))

    def _query_rounds(self, q, k, offset, payloads, df_map, pinned,
                      left, r1_budget):
        for rows, exp in self._scatter(_shard_collect_task, payloads,
                                       timeout_ms=r1_budget):
            # dedupe within the shard first: a term can be BOTH a
            # plain query term and an expansion match (query
            # `import im*`) — its local df must count exactly once
            local = dict(rows)
            for key, trs in exp.items():
                bucket = pinned.setdefault(key, set())
                for t, d in trs:
                    bucket.add(t)
                    local[t] = d
            for t, d in local.items():
                df_map[t] = df_map.get(t, 0) + d
        p2 = {
            **payloads[0][2],
            "df_map": sorted(df_map.items()),
            "pinned": {key: sorted(v) for key, v in pinned.items()},
            "n_docs": float(self.stats["n_docs"]),
            "avgdl": self.stats["avgdl"],
            "need": offset + k,
        }
        failed1 = list(self.shards_failed)
        alive = [(s, off) for s, off in zip(self.shards, self.offsets)
                 if s.index_dir not in failed1]
        pairs = self._scatter(
            _shard_query_task,
            [(s.index_dir, off, p2) for s, off in alive],
            timeout_ms=left(),
        )
        for d in failed1:
            if d not in self.shards_failed:
                self.shards_failed.append(d)
        if not pairs:
            return []
        ids = np.concatenate([p[0] for p in pairs])
        scores = np.concatenate([p[1] for p in pairs])
        order = np.lexsort((ids, -scores))[offset:offset + k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    def count(self, qterms: list[str], mode: str = "or",
              timeout_ms: float | None = None) -> int:
        """totalHits — parallel per-shard counts SUMMED (shards own
        disjoint doc sets, so the sum is exact — the reference's
        scatter-gather count, its one published latency number).  No
        df exchange: membership is idf-free, so the scatter is ONE
        round of per-shard bitset counts.

        Under ``complete=False`` a timed-out shard drops out and the
        sum covers the SURVIVORS only — check ``self.shards_failed``
        (or use search(k=0) for the envelope with completeness
        fields) before trusting a partial count."""
        terms = sorted(set(strip_stops(self.stats, qterms)))

        def compute():
            return sum(self._scatter(
                _shard_count_task,
                [(s.index_dir, {"terms": terms, "mode": mode})
                 for s in self.shards],
                timeout_ms=timeout_ms,
            ))

        return self._scached(("count", tuple(terms), mode), compute)

    def facet(self, qterms: list[str], field: str, n: int = 10,
              mode: str = "or", missing: bool = False,
              sort: str = "count", prefix: str | None = None,
              mincount: int = 0) -> list[tuple[object, int]]:
        """Scatter-gather value facet: per-shard FULL value counts
        merged by summation (shards own disjoint doc sets), then one
        global top-n cut — EXACT by construction.  The reference
        family's distributed-facet pitfall (per-shard top-n
        truncation undercounting values that are mid-ranked
        everywhere, which Solr patches with a refinement round-trip)
        cannot occur because shards return their whole bounded value
        histogram, not a truncated page.  Solr facet options
        (missing/sort/prefix/mincount) apply at the merge — exact,
        since the full histograms are present."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        cat = self._merged_cat(terms)
        counts = self._scatter(
            _shard_facet_task,
            self._payloads(terms, cat, {"mode": mode, "field": field}),
        )
        total: dict = {}
        for c in counts:
            for v, k in c:
                total[v] = total.get(v, 0) + k
        return _facet_rank(list(total.items()), n, missing, sort,
                           prefix, mincount)

    def sorted_query(self, qterms: list[str],
                     sort_cols: list[tuple[str, str]],
                     fields: list[str], limit: int, offset: int = 0,
                     mode: str = "or") -> pd.DataFrame:
        """Cross-shard field-sorted top-k — the reference's
        TopFieldCollector scatter with the client-side
        FieldSortComparator merge (LuceneServer.java:1629-1636;
        Hits.fieldSort, FieldSortComparator.java:44-87): each shard
        returns its own top (offset+limit) rows WITH the sort
        columns, the client re-applies the identical comparator over
        the union and cuts once.  Exact because shards own disjoint
        doc sets — the global top (offset+limit) rows are each in
        their shard's top (offset+limit).  One scatter round (no df
        exchange: membership is idf-free)."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        cols = ["doc_id"] + sorted(
            {c for c, _ in sort_cols}
            | {f for f in fields if f != "doc_id"}
        )
        frames = self._scatter(
            _shard_sorted_task,
            [(s.index_dir, off, {
                "terms": terms, "sort_cols": sort_cols, "cols": cols,
                "k": offset + limit, "mode": mode,
            }) for s, off in zip(self.shards, self.offsets)],
        )
        merged = _field_sort(pd.concat(frames, ignore_index=True),
                             sort_cols)
        return merged.iloc[offset:offset + limit][list(fields)] \
            .reset_index(drop=True)

    def range_facet(self, qterms: list[str], field: str, start: float,
                    end: float, gap: float, min_count: int = 1,
                    mode: str = "or") -> list[tuple[float, int]]:
        """Scatter-gather numeric facetByRange (FacetRangeCall
        scatter, LuceneServer.java:1197-1258): per-shard FULL gap
        histograms summed over disjoint doc sets, min_count applied
        ONCE after summation — exact by construction, same argument
        as the value-facet merge."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        hists = self._scatter(_shard_range_task, [
            (s.index_dir, 0, {
                "kind": "num", "terms": terms, "field": field,
                "start": float(start), "end": float(end),
                "gap": float(gap), "mode": mode,
            }) for s in self.shards
        ])
        total: dict[float, int] = {}
        for h in hists:
            for b, c in h.items():
                total[b] = total.get(b, 0) + c
        return [(float(b), int(c)) for b, c in sorted(total.items())
                if c >= int(min_count)]

    def range_facet_other(self, qterms: list[str], field: str,
                          start: float, end: float,
                          mode: str = "or") -> tuple[int, int, int]:
        """facet.range.other=all across shards: per-shard (before,
        between, after) triples summed — exact over disjoint doc
        sets."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        triples = self._scatter(_shard_range_task, [
            (s.index_dir, 0, {
                "kind": "other", "terms": terms, "field": field,
                "start": float(start), "end": float(end), "mode": mode,
            }) for s in self.shards
        ])
        return (
            sum(t[0] for t in triples),
            sum(t[1] for t in triples),
            sum(t[2] for t in triples),
        )

    def date_range_facet(self, qterms: list[str], field: str, unit: str,
                         min_count: int = 1,
                         mode: str = "or") -> list[tuple[object, int]]:
        """Scatter-gather date facetByRange (DateRangeFactory
        buckets, DateRangeFactory.java:43-77): per-shard full
        calendar-unit histograms summed, min_count after the sum."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        hists = self._scatter(_shard_range_task, [
            (s.index_dir, 0, {
                "kind": "date", "terms": terms, "field": field,
                "unit": unit, "mode": mode,
            }) for s in self.shards
        ])
        total: dict = {}
        for h in hists:
            for b, c in h.items():
                total[b] = total.get(b, 0) + c
        return [(b, int(c)) for b, c in sorted(total.items())
                if c >= int(min_count)]

    def interval_facet(self, qterms: list[str], field: str,
                       intervals: list[tuple],
                       mode: str = "or") -> list[tuple[str, int]]:
        """Scatter-gather facet.interval, EXACT: per-shard interval
        counts summed over disjoint doc sets (membership is idf-free,
        one round on the process pool)."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        rows = self._scatter(
            _shard_interval_task,
            [(s.index_dir, off,
              {"terms": terms, "field": field,
               "intervals": list(intervals), "mode": mode})
             for s, off in zip(self.shards, self.offsets)],
        )
        sums = [sum(part[i] for part in rows)
                for i in range(len(intervals))]
        return sorted(
            (str(iv[0]), c) for iv, c in zip(intervals, sums)
        )

    def group_score_topk(self, qterms: list[str], group_field: str,
                         score_mode: str = "sum", k: int = 10,
                         mode: str = "or") -> pd.DataFrame:
        """Scatter-gather group-score ranking, EXACT: per-shard
        per-group (n, sum, min, max) partials over GLOBALLY-scored
        hits (df exchange) — all four associative over disjoint doc
        sets — merged and ranked once."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        cat = self._merged_cat(terms)
        parts = self._scatter(
            _shard_gscore_task,
            self._payloads(terms, cat, {
                "field": group_field, "mode": mode,
            }),
        )
        return _gscore_finalize(
            pd.concat(parts, ignore_index=True), group_field,
            score_mode, k,
        )

    def ngroups(self, qterms: list[str], group_field: str,
                mode: str = "or") -> tuple[int, int]:
        """group.ngroups across shards: per-shard distinct value SETS
        (bounded by value cardinality) union exactly; hit counts sum
        over disjoint doc sets."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        rows = self._scatter(
            _shard_ngroups_task,
            [(s.index_dir, off,
              {"terms": terms, "field": group_field, "mode": mode})
             for s, off in zip(self.shards, self.offsets)],
        )
        vals: set = set()
        n_hits = 0
        for vset, n in rows:
            vals.update(vset)
            n_hits += n
        return len(vals), n_hits

    def expand_topk(self, qterms: list[str], collapse_field: str,
                    k: int = 10, n_expand: int = 2,
                    mode: str = "or") -> pd.DataFrame:
        """Solr ExpandComponent across shards: one group_topk scatter
        ranked to n_expand+1 per group (exact by the per-group
        union argument), heads + expand rows cut client-side."""
        return _expand_from_ranked(
            self.group_topk(qterms, collapse_field,
                            k_per_group=n_expand + 1, mode=mode),
            collapse_field, k, n_expand,
        )

    def term_vectors(self, doc_ids: list[int]) -> pd.DataFrame:
        """TermVectorComponent across shards: tf from each id's
        OWNING shard (namespaced routing), df/tfidf attached from the
        merged corpus-wide catalog."""
        import bisect

        per_shard: dict[int, list[int]] = {}
        for d in doc_ids:
            i = bisect.bisect_right(self.offsets, int(d)) - 1
            per_shard.setdefault(i, []).append(int(d))
        frames = []
        for i, ids in per_shard.items():
            f = self.shards[i]._term_tf(
                [d - self.offsets[i] for d in ids]
            )
            f["doc_id"] = f["doc_id"] + self.offsets[i]
            frames.append(f)
        tf = pd.concat(frames, ignore_index=True) if frames else             pd.DataFrame(columns=["doc_id", "term", "tf"])
        cat = self._merged_cat(sorted(tf["term"].unique()))
        return _term_vectors_attach(tf, cat,
                                    float(self.stats["n_docs"]))

    def adjacency_matrix(self, queries_map: dict[str, list[str]],
                         mode: str = "or") -> list[tuple]:
        """ES adjacency_matrix across shards, EXACT: per-shard
        matrices (bitset match sets, one scatter round) summed over
        disjoint doc sets; a pair empty on one shard but matched on
        another survives, all-empty pairs are omitted."""
        qmap = [
            (label, sorted(set(strip_stops(self.stats, terms))))
            for label, terms in sorted(queries_map.items())
        ]
        rows = self._scatter(
            _shard_adjacency_task,
            [(s.index_dir, off, {"qmap": qmap, "mode": mode})
             for s, off in zip(self.shards, self.offsets)],
        )
        total: dict = {}
        for part in rows:
            for k1, k2, c in part:
                total[(k1, k2)] = total.get((k1, k2), 0) + c
        return [(k1, k2, c)
                for (k1, k2), c in sorted(total.items()) if c]

    def diversified_sampler(self, qterms: list[str], key_field: str,
                            max_per_key: int = 1,
                            shard_size: int = 100,
                            mode: str = "or") -> pd.DataFrame:
        """ES diversified_sampler across shards: the per-key rank
        merge is the group_topk scatter (a key's global top
        max_per_key is a top-k of the union of per-shard per-key
        top-ks), then one global (score desc, doc_id asc) cut."""
        ranked = self.group_topk(qterms, key_field,
                                 k_per_group=max_per_key, mode=mode)
        out = ranked.rename(columns={"rank": "rank_in_key"})
        out = out.sort_values(["score", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(int(shard_size))
        return out[["doc_id", "score", key_field,
                    "rank_in_key"]].reset_index(drop=True)

    def rare_terms(self, qterms: list[str], field: str,
                   max_count: int = 1, n: int = 10,
                   mode: str = "or") -> list[tuple[object, int]]:
        """ES rare_terms across shards, EXACT: full per-shard value
        histograms summed over disjoint doc sets (the same scatter
        unit as the value facet — a value locally rare on every shard
        but globally common can never slip under max_count), then one
        global filter + (cnt asc, value asc) cut."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        cat = self._merged_cat(terms)
        counts = self._scatter(
            _shard_facet_task,
            self._payloads(terms, cat, {"mode": mode, "field": field}),
        )
        total: dict = {}
        for part in counts:
            for v, c in part:
                if v is not None:
                    total[v] = total.get(v, 0) + c
        rows = [(v, c) for v, c in total.items()
                if c <= int(max_count)]
        return sorted(rows, key=lambda x: (x[1], x[0]))[:n]

    def facet_stats(self, qterms: list[str], facet_field: str,
                    stat_field: str, mode: str = "or") -> pd.DataFrame:
        """Scatter-gather stats.facet, EXACT: per-shard per-value
        (n, min, max, sum) partials — associative over disjoint doc
        sets — merged and rounded once."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        parts = self._scatter(
            _shard_facet_stats_task,
            [(s.index_dir, off,
              {"terms": terms, "facet_field": facet_field,
               "stat_field": stat_field, "mode": mode})
             for s, off in zip(self.shards, self.offsets)],
        )
        return _facet_stats_finalize(
            pd.concat(parts, ignore_index=True), facet_field
        )

    def facet_queries(self, queries_map: dict[str, list[str]],
                      mode: str = "or") -> list[tuple[str, int]]:
        """Solr facet.query across shards: ALL labels in ONE scatter
        round (a per-label self.count would pay one pool round-trip
        per label); per-shard bitset counts sum over disjoint doc
        sets — zero rows kept, label-asc."""
        qmap = [
            (label, sorted(set(strip_stops(self.stats, terms))))
            for label, terms in sorted(queries_map.items())
        ]
        rows = self._scatter(
            _shard_facet_queries_task,
            [(s.index_dir, off, {"qmap": qmap, "mode": mode})
             for s, off in zip(self.shards, self.offsets)],
        )
        total: dict = {label: 0 for label, _ in qmap}
        for part in rows:
            for label, c in part:
                total[label] += c
        return sorted(total.items())

    def suggest(self, prefix: str, n: int = 10) -> list[tuple[str, int]]:
        """Scatter-gather autocomplete: per-shard prefix slices of
        the term catalogs (threaded — pure pyarrow scans), dfs summed
        per term (disjoint doc sets), one global (df desc, term asc)
        cut — identical to the union index's suggest (tested)."""
        from concurrent.futures import ThreadPoolExecutor

        p = prefix.lower()
        pred = (pa_ds.field("term") >= p) & (pa_ds.field("term") < p + "￿")

        def one(s: LocalSearcher) -> pd.DataFrame:
            return s._terms.to_table(
                columns=["term", "df"], filter=pred
            ).to_pandas()

        if len(self.shards) == 1:
            cats = [self._robust_read(0, one)]
        else:
            with ThreadPoolExecutor(
                max_workers=min(len(self.shards), 32)
            ) as ex:
                cats = list(ex.map(
                    lambda j: self._robust_read(j, one),
                    range(len(self.shards)),
                ))
        cat = pd.concat(cats)
        keep = cat["term"].str.startswith(p)
        if ":" not in p:
            keep &= ~cat["term"].str.contains(":", regex=False)
        merged = cat[keep].groupby("term", as_index=False)["df"].sum()
        rows = sorted(
            zip(merged["term"], merged["df"]),
            key=lambda x: (-int(x[1]), x[0]),
        )[:n]
        return [(str(t), int(d)) for t, d in rows]

    def suggest_regex(self, pattern: str,
                      n: int = 10) -> list[tuple[str, int]]:
        """terms.regex across shards: FULL per-shard candidate sets
        (regex CPU on the process pool), dfs summed per term over
        disjoint doc sets, one global cut."""
        cands = self._scatter(
            _shard_suggest_task,
            [(s.index_dir, off, {"kind": "regex", "arg": pattern})
             for s, off in zip(self.shards, self.offsets)],
        )
        merged = pd.concat(cands).groupby(
            "term", as_index=False)["df"].sum()
        return _suggest_rank(merged, n)

    def suggest_infix(self, fragment: str,
                      n: int = 10) -> list[tuple[str, int]]:
        """AnalyzingInfixSuggester across shards — same exact merge
        as suggest_regex."""
        cands = self._scatter(
            _shard_suggest_task,
            [(s.index_dir, off, {"kind": "infix", "arg": fragment})
             for s, off in zip(self.shards, self.offsets)],
        )
        merged = pd.concat(cands).groupby(
            "term", as_index=False)["df"].sum()
        return _suggest_rank(merged, n)

    def facet_by_metric(self, qterms: list[str], facet_field: str,
                        metric_field: str, n: int = 5,
                        mode: str = "or") -> pd.DataFrame:
        """Scatter-gather facet-by-metric, EXACT: per-shard (cnt,
        unrounded sum) partials merged, rounded once, ranked once
        (membership is idf-free — one round)."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        parts = self._scatter(
            _shard_fmetric_task,
            [(s.index_dir, off,
              {"terms": terms, "facet_field": facet_field,
               "metric_field": metric_field, "mode": mode})
             for s, off in zip(self.shards, self.offsets)],
        )
        return _fmetric_finalize(
            pd.concat(parts, ignore_index=True), facet_field, n
        )

    def spellcheck(self, word: str, max_edits: int = 2,
                   n: int = 5) -> list[tuple[str, int, int]]:
        """Scatter-gather spellcheck: each shard contributes its FULL
        within-max_edits candidate set (distance is shard-invariant;
        the bounded set is what makes the scatter cheap), dfs summed
        per term over disjoint doc sets, one global (dist asc, df
        desc, term asc) cut — identical to the union index's
        spellcheck (tested).  The per-shard candidate scan is
        pure-Python levenshtein over the whole catalog — CPU the GIL
        would serialize — so it scatters on the PROCESS pool."""
        cands = self._scatter(
            _shard_spell_task,
            [(s.index_dir, off, {"word": word, "max_edits": max_edits})
             for s, off in zip(self.shards, self.offsets)],
        )
        cat = pd.concat(cands)
        merged = cat.groupby(["term", "dist"], as_index=False)["df"].sum()
        rows = sorted(
            zip(merged["term"], merged["dist"], merged["df"]),
            key=lambda x: (int(x[1]), -int(x[2]), x[0]),
        )[:n]
        return [(str(t), int(d), int(df)) for t, d, df in rows]

    def highlight(self, hits: list[tuple[int, float]],
                  terms: list[str], width: int = 80,
                  text_col: str = "content", pre: str = "<em>",
                  post: str = "</em>") -> pd.DataFrame:
        """Scatter highlight: same snippet kernel over the
        shard-routed fetch — snippets are per-document, so the merge
        is just the routed stored-field lookup (tested vs the union
        index)."""
        return _highlight_frame(self.fetch, hits, terms, width,
                                text_col, pre, post)

    def field_stats(self, qterms: list[str], field: str,
                    mode: str = "or") -> dict:
        """Scatter-gather StatsComponent: per-shard (n, min, max,
        sum) partials merged exactly (associative over disjoint doc
        sets), mean derived after the merge — equals the union
        index's stats (tested).  Membership is idf-free, so the
        scatter is one round, on the process pool."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        return _stats_finalize(self._scatter(
            _shard_stats_task,
            [(s.index_dir, off,
              {"terms": terms, "field": field, "mode": mode})
             for s, off in zip(self.shards, self.offsets)],
        ))

    def pivot_facet(self, qterms: list[str], field1: str,
                    field2: str, n1: int = 5, n2: int = 3,
                    mode: str = "or") -> list[tuple]:
        """Scatter-gather pivot facet, EXACT: each shard returns its
        FULL (field1, field2) histogram (bounded by value-pair
        cardinality, not corpus size), counts summed over disjoint
        doc sets, ONE global rank — no Solr-style refinement
        round-trip needed, same argument as the value-facet merge;
        the per-shard pandas work runs on the process pool."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        cat = pd.concat(self._scatter(
            _shard_pivot_task,
            [(s.index_dir, off,
              {"terms": terms, "field1": field1, "field2": field2,
               "mode": mode})
             for s, off in zip(self.shards, self.offsets)],
        ))
        merged = cat.groupby([field1, field2],
                             dropna=False)["cnt"].sum().reset_index()
        return _pivot_rank(merged, field1, field2, n1, n2)

    def collapse_topk(self, qterms: list[str], collapse_field: str,
                      k: int = 10, mode: str = "or") -> pd.DataFrame:
        """Scatter-gather field collapse, EXACT: each shard returns
        its FULL per-value head map scored with the merged-catalog
        dfs (the getDocFreqs exchange — scores are corpus-wide), the
        client re-collapses per value by (score desc, doc_id asc)
        over disjoint doc sets and cuts top-k.  Rank-identical to the
        union-built index (tested)."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        cat = self._merged_cat(terms)
        frames = self._scatter(
            _shard_grouping_task,
            self._payloads(terms, cat, {
                "op": "collapse", "field": collapse_field, "mode": mode,
            }),
        )
        allh = pd.concat(frames, ignore_index=True)
        allh = allh.sort_values(["score", "doc_id"],
                                ascending=[False, True], kind="mergesort")
        heads = allh.drop_duplicates(subset=[collapse_field],
                                     keep="first")
        return heads.head(k)[["doc_id", "score",
                              collapse_field]].reset_index(drop=True)

    def group_topk(self, qterms: list[str], group_field: str,
                   k_per_group: int = 3, mode: str = "or"
                   ) -> pd.DataFrame:
        """Scatter-gather result grouping, EXACT: each shard returns
        its per-value top ``k_per_group`` on the corpus-wide score
        scale; a group's global top-k is the top-k of the union of
        its per-shard top-ks, so the client just re-ranks within each
        value and keeps ranks <= k_per_group."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        cat = self._merged_cat(terms)
        frames = self._scatter(
            _shard_grouping_task,
            self._payloads(terms, cat, {
                "op": "group", "field": group_field,
                "k_per_group": k_per_group, "mode": mode,
            }),
        )
        alld = pd.concat(frames, ignore_index=True).drop(columns=["rank"])
        alld = alld.sort_values(["score", "doc_id"],
                                ascending=[False, True], kind="mergesort")
        alld["rank"] = alld.groupby(group_field, dropna=False,
                                    sort=False).cumcount() + 1
        alld = alld[alld["rank"] <= int(k_per_group)]
        out = alld.sort_values([group_field, "rank"], kind="mergesort")
        return out[[group_field, "doc_id", "score",
                    "rank"]].reset_index(drop=True)

    def significant_terms(self, qterms: list[str], m_terms: int = 10,
                          mode: str = "or", min_df: int = 2,
                          max_fg: int | None = None,
                          shard_min_df: int = 1,
                          shard_size: int | None = None) -> pd.DataFrame:
        """Scatter-gather significant_terms, EXACT in two rounds:
        (1) per-shard foreground histograms + n_fg summed over
        disjoint doc sets; (2) background dfs for the union
        foreground vocabulary via the merged catalog (threaded
        pyarrow reads).  One global rank — no per-shard shortlist
        truncation, so no ES-style approximation error.  ``max_fg``
        caps EACH shard's foreground with the deterministic sampler
        (so the total sample is <= shards * max_fg).

        ``shard_min_df`` is ES's shard_min_doc_count: each shard
        prunes candidates below it BEFORE the exchange.  1 (default)
        keeps the scatter exact; 2 trades the long singleton tail —
        on code corpora the bulk of the vocabulary (per-doc unique
        identifiers), hence the bulk of the exchange cost — for the
        documented ES approximation.

        ``shard_size`` is ES's shard_size: each shard ships only its
        top candidates by SHARD-LOCAL significance; the coordinator
        merges and re-ranks the union exactly.  Approximate (a term
        outside a shard's shortlist loses that shard's df_fg), but
        the knob that collapses the exchange at 10M+ docs where the
        candidate volume itself — not the tail filter — dominates.
        Setting it raises the local floor to ``min_df`` (unless
        ``shard_min_df`` is set higher): lift ranks a shard's
        singleton tail FIRST (df_bg=1 terms have the maximal ratio),
        so an unfloored shortlist would be all sub-``min_df`` noise
        the coordinator then discards — ES documents the same
        shard_min_doc_count guidance for exactly this reason."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        local_floor = (max(int(shard_min_df), int(min_df))
                       if shard_size is not None else int(shard_min_df))
        res = self._scatter(
            _shard_sigterms_task,
            [(s.index_dir, off,
              {"terms": terms, "mode": mode, "max_fg": max_fg,
               "shard_min_df": local_floor,
               "shard_size": shard_size})
             for s, off in zip(self.shards, self.offsets)],
        )
        import pyarrow as pa

        n_fg = sum(n for _, n in res)
        merged = (
            pa.concat_tables([t for t, _ in res])
            .group_by("term").aggregate([("df_fg", "sum")])
            .to_pandas()
        )
        vc = pd.Series(merged["df_fg_sum"].to_numpy(dtype="int64"),
                       index=merged["term"])
        return _sigterms_rank(vc, n_fg, terms, self._merged_cat,
                              float(self.stats["n_docs"]), m_terms,
                              min_df)

    def more_like_this(self, doc_id: int, m_terms: int = 5,
                       k: int = 10) -> list[tuple[int, float]]:
        """Scatter-gather MoreLikeThis: the source doc's stored
        tokens come from its OWNING shard (namespaced-id routing),
        representative terms are picked with corpus-wide dfs (merged
        catalog) and global n_docs, then the rep-term OR query runs
        as a normal sharded top-k (each shard asked for k+1 so the
        source doc's own slot can never displace a true hit)."""
        import bisect

        did = int(doc_id)
        si = bisect.bisect_right(self.offsets, did) - 1
        s = self.shards[si]
        local = did - self.offsets[si]
        if s._tomb is not None and bool(np.isin(local, s._tomb)):
            return []
        row = s._docs.to_table(
            columns=["doc_id", "toks"],
            filter=pa_ds.field("doc_id") == local,
        ).to_pandas()
        if row.empty:
            return []
        tf = pd.Series(row["toks"].iloc[0]).value_counts()
        cat = self._merged_cat(sorted(tf.index.tolist()))
        rep = _mlt_rep_terms(tf, cat, float(self.stats["n_docs"]),
                             m_terms)
        if not rep:
            return []
        repcat = cat[cat["term"].isin(rep)]
        pairs = self._scatter(
            _shard_topk_task,
            self._payloads(rep, repcat, {
                "k": k + 1, "mode": "or", "min_match": None,
            }),
        )
        ids = np.concatenate([p[0] for p in pairs])
        scores = np.concatenate([p[1] for p in pairs])
        keep = ids != did
        ids, scores = ids[keep], scores[keep]
        order = np.lexsort((ids, -scores))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    def search(self, qterms: list[str], k: int = 10, mode: str = "or",
               fields: list[str] | None = None,
               timeout_ms: float | None = None) -> dict:
        """One-call scatter surface: hits + numFound + maxScore +
        qTime — the full client RPC (Client.java fan-out +
        QueryResponse.java:27-192 envelope): per-shard WAND top-k
        with the df exchange, numFound from the bitset count sum
        (disjoint doc sets), stored fields via the shard-routed
        fetch.  Mirrors LocalSearcher.search (tested).

        Completeness fields (ClientResult.isComplete /
        getMissingShards parity): ``shards_total``, ``shards_failed``
        (dir list — empty when every shard answered), ``complete``.
        With ``complete=False`` on the handle, a timed-out/dead shard
        drops out of the merge instead of raising."""
        import time

        t0 = time.monotonic()
        terms = sorted(set(strip_stops(self.stats, qterms)))
        cat = self._merged_cat(terms)
        parts = self._scatter(
            _shard_search_task,
            self._payloads(terms, cat, {
                # k or 1: a k=0 envelope still reports maxScore (the
                # LocalSearcher rule — its max is over the match set)
                "k": max(k, 1), "mode": mode, "min_match": None,
            }),
            timeout_ms=timeout_ms,
        )
        if parts:
            ids = np.concatenate([x[0] for x in parts])
            scores = np.concatenate([x[1] for x in parts])
        else:
            ids = np.empty(0, np.int64)
            scores = np.empty(0, np.float64)
        n = sum(int(x[2]) for x in parts)
        order = np.lexsort((ids, -scores))
        max_score = float(scores[order[0]]) if order.size else None
        order = order[:k]
        hits = [(int(ids[i]), float(scores[i])) for i in order]
        if fields:
            detail = self.fetch([d for d, _ in hits], fields)
            detail["score"] = [s for _, s in hits]
        else:
            detail = pd.DataFrame(hits, columns=["doc_id", "score"])
        return {
            "hits": detail,
            "num_found": int(n),
            "max_score": max_score,
            "qtime_ms": int((time.monotonic() - t0) * 1000),
            "shards_total": len(self.shards),
            "shards_failed": list(self.shards_failed),
            "complete": not self.shards_failed,
        }

    def fetch(self, doc_ids: list[int],
              fields: list[str]) -> pd.DataFrame:
        """Stored-field lookup routing each namespaced id back to its
        owning shard (Client.getDetails scatter)."""
        if not doc_ids:
            # typed empty frame with the requested columns (the
            # envelope's fields=... path on a no-hit query)
            return self.shards[0].fetch([], fields)
        bounds = self.offsets + [self.offsets[-1] + (1 << 62)]
        per_shard: dict[int, list[int]] = {}
        for d in doc_ids:
            i = int(np.searchsorted(np.asarray(bounds), int(d),
                                    side="right")) - 1
            per_shard.setdefault(i, []).append(int(d))
        frames = []
        for i, ids in per_shard.items():
            local = [d - self.offsets[i] for d in ids]
            f = self._robust_read(
                i, lambda s, loc=local: s.fetch(loc, fields))
            f["doc_id"] = f["doc_id"] + self.offsets[i]
            frames.append(f)
        out = pd.concat(frames, ignore_index=True)
        order = {int(d): i for i, d in enumerate(doc_ids)}
        return out.sort_values(
            "doc_id", key=lambda s: s.map(order), ignore_index=True
        )
