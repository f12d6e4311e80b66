"""Query-result cache — Solr's queryResultCache re-expressed for a
Spark engine.

Reference parity: Katta's embedded Solr cores serve repeated queries
from the queryResultCache and flush it when a new searcher opens
(solrconfig.xml cache sections; the reference's per-shard Solr
embedding).  Here the cache is a MATERIALIZED parquet result keyed by
(query signature × index state), so it is shared by every executor
and survives the driver — and "new searcher invalidation" falls out
structurally: the key includes the commit-manifest fingerprint, so a
new commit/expunge/compact changes the key and the stale entry is
simply never read again (no flush machinery to get wrong).

Scale shape: a hit is a partition-pruned read of a tiny top-k
parquet; a miss pays the normal query plus one small write.  Nothing
here touches per-row data paths."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

from pyspark.sql import DataFrame

from katta_spark.index.build import load_manifest
from katta_spark.index.search import PhysicalIndex


class QueryCache:
    def __init__(self, index: PhysicalIndex, cache_dir: str):
        self.index = index
        self.root = Path(cache_dir)
        self.root.mkdir(parents=True, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _state_fingerprint(self) -> str:
        """The 'searcher generation': manifest rows + tombstone count
        — any commit, delete, expunge or compact changes it."""
        man = sorted(
            (m["commit"], m["group"], m.get("n_docs_group", 0),
             m.get("n_postings", 0))
            for m in load_manifest(self.index.index_dir)
        )
        tomb = (
            self.index.tombstones.count()
            if self.index.tombstones is not None else 0
        )
        return hashlib.sha256(
            json.dumps([man, tomb]).encode()
        ).hexdigest()[:16]

    def _key(self, op: str, **params) -> str:
        payload = json.dumps(
            [op, sorted(params.items()), self._state_fingerprint()],
            default=str,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:24]

    def topk(self, qterms: list[str], k: int = 10,
             mode: str = "or") -> DataFrame:
        """Cached :meth:`PhysicalIndex.topk`: first call materializes
        the result, later calls with the same query AND the same
        index state read it back; any index mutation re-keys."""
        key = self._key("topk", qterms=sorted(qterms), k=int(k),
                        mode=mode)
        d = self.root / key
        spark = self.index.spark
        if not (d / "_SUCCESS").exists():
            self.misses += 1
            self.index.topk(qterms, mode=mode, k=k).write.mode(
                "overwrite"
            ).parquet(str(d))
        else:
            self.hits += 1
        from pyspark.sql import functions as F

        return spark.read.parquet(str(d)).orderBy(
            F.desc("score"), F.asc("doc_id")
        )
