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
stats skip everything but the query's terms), and runs the SAME
numpy kernels (:func:`make_wand_kernel` /
:func:`make_exhaustive_kernel`) over one in-process batch —
rank-identical to the Spark path BY CONSTRUCTION (shared code, not
re-implementation), at RPC-class latency: no job scheduling, no
shuffle, no executor round-trip.

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
    make_exhaustive_kernel,
    make_wand_kernel,
    strip_stops,
)

_BLOCK_COLS = ["term", "block_id", "max_tf", "min_dl",
               "doc_gaps", "tfs", "dls"]


class LocalSearcher:
    """Node-local query handle over one built index directory.

    Rank-identity contract: ``topk``/``count`` return exactly what
    ``PhysicalIndex.topk``/``count`` return on the same directory
    (tested), because both feed the same posting blocks through the
    same kernels with the same global stats.
    """

    def __init__(self, index_dir: str):
        root = Path(index_dir)
        self.index_dir = index_dir
        self.stats = json.loads((root / "stats.json").read_text())
        self._postings = pa_ds.dataset(
            str(root / "postings"), partitioning="hive"
        )
        self._docs = pa_ds.dataset(str(root / "docs"), partitioning="hive")
        self._terms = pa_ds.dataset(str(root / "terms"))
        self._tomb = self._load_tombstones(root)

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
        pdf = self._postings.to_table(
            columns=_BLOCK_COLS, filter=pred
        ).to_pandas()
        cat = self._terms.to_table(
            columns=["term", "df"], filter=pred
        ).to_pandas()
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
        exhaustive path (shared kernel, one batch)."""
        blocks = self._blocks(terms)
        kern = make_exhaustive_kernel(
            float(self.stats["n_docs"]), self.stats["avgdl"],
            self.stats["k1"], self.stats["b"], self.stats["block_range"],
        )
        parts = list(kern(iter([blocks])))
        ids = np.concatenate([p["doc_id"].to_numpy() for p in parts])
        scores = np.concatenate([p["score"].to_numpy() for p in parts])
        nt = np.concatenate([p["nt"].to_numpy() for p in parts])
        return self._mask_tomb(ids, scores, nt)

    # ------------------------------------------------------------ queries

    def topk(self, qterms: list[str], k: int = 10, mode: str = "or",
             min_match: int | None = None,
             offset: int = 0) -> list[tuple[int, float]]:
        """BM25 top-k [(doc_id, score)], tie-break score desc /
        doc_id asc, sliced [offset, offset+k) — block-max WAND unless
        tombstones force the exhaustive path (same rule as
        PhysicalIndex.topk)."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        if self._tomb is None:
            kern = make_wand_kernel(
                float(self.stats["n_docs"]), self.stats["avgdl"],
                self.stats["k1"], self.stats["b"],
                offset + k, len(terms), mode,
                self.stats["block_range"], min_match=min_match,
            )
            parts = list(kern(iter([self._blocks(terms)])))
            ids = np.concatenate([p["doc_id"].to_numpy() for p in parts])
            scores = np.concatenate([p["score"].to_numpy() for p in parts])
        else:
            ids, scores, nt = self._scored(terms)
            req = (len(terms) if mode == "and"
                   else max(1, int(min_match or 1)))
            if req > 1:
                keep = nt >= req
                ids, scores = ids[keep], scores[keep]
        order = np.lexsort((ids, -scores))[offset:offset + k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    def count(self, qterms: list[str], mode: str = "or") -> int:
        """totalHits — number of live matching docs."""
        terms = sorted(set(strip_stops(self.stats, qterms)))
        ids, _, nt = self._scored(terms)
        if mode == "and" and len(terms) > 1:
            return int(np.count_nonzero(nt == len(terms)))
        return int(ids.size)

    def fetch(self, doc_ids: list[int],
              fields: list[str]) -> pd.DataFrame:
        """Stored-field lookup for a hit list (the doc-fetch RPC) —
        one row-group-pruned read of the docs parquet."""
        tbl = self._docs.to_table(
            columns=["doc_id"] + list(fields),
            filter=pa_ds.field("doc_id").isin([int(d) for d in doc_ids]),
        )
        out = tbl.to_pandas()
        order = {int(d): i for i, d in enumerate(doc_ids)}
        return out.sort_values(
            "doc_id", key=lambda s: s.map(order), ignore_index=True
        )

    def search(self, qterms: list[str], k: int = 10, mode: str = "or",
               fields: list[str] | None = None) -> dict:
        """One-call serving surface: hits + numFound + maxScore +
        qTime (QueryResponse.java:27-192 parity), optionally joined
        with stored fields."""
        import time

        t0 = time.monotonic()
        terms = sorted(set(strip_stops(self.stats, qterms)))
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
