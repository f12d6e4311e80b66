"""ES data-stream / ILM rollover-lite over physical indexes.

Reference parity: Elasticsearch data streams write to the newest
backing index and roll over to a fresh generation when the active one
crosses a size threshold (`_rollover` with ``max_docs``); searches
fan out over every generation.  Katta's analog is its multi-index
client search (katta-client/.../client/Client.java:672-703) over
time-named indexes.

Spark-first shape: a generation IS a normal :func:`build_index`
directory — rollover is pure driver-side metadata (pick the target
generation dir), the write itself is the ordinary distributed build /
incremental commit, and search is :meth:`PhysicalIndex.open_many`,
whose merged catalogs make scores identical to one index built over
the union of the corpora.  Nothing here touches per-row data, so the
100 TB story is whatever the build and open_many already guarantee.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from katta_spark.index.build import build_index, load_manifest
from katta_spark.index.search import PhysicalIndex


class DataStream:
    """Append-only stream of documents over rolling index
    generations (``gen-000001``, ``gen-000002``, …).

    ``append`` targets the active (highest) generation; if the active
    generation already holds ``max_docs`` or more docs, the batch
    opens the next generation instead — ES rollover-on-write
    semantics (the threshold is checked BEFORE the write, so a
    generation may exceed ``max_docs`` by at most one batch, exactly
    like ES's post-hoc rollover check)."""

    def __init__(self, spark: SparkSession, root: str,
                 max_docs: int, **build_kwargs):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.max_docs = int(max_docs)
        self.build_kwargs = dict(build_kwargs)

    # -- generation bookkeeping (driver-side metadata only) --------

    def generations(self) -> list[Path]:
        return sorted(
            d for d in self.root.glob("gen-*")
            if (d / "stats.json").exists()
        )

    @staticmethod
    def _gen_docs(gen: Path) -> int:
        return int(json.loads((gen / "stats.json").read_text())["n_docs"])

    def _active(self) -> tuple[Path, int]:
        """(target generation dir, commit ordinal within it)."""
        gens = self.generations()
        if not gens:
            return self.root / "gen-000001", 0
        last = gens[-1]
        if self._gen_docs(last) >= self.max_docs:
            nxt = int(last.name.split("-")[1]) + 1
            return self.root / f"gen-{nxt:06d}", 0
        commits = {m["commit"] for m in load_manifest(str(last))}
        return last, len(commits)

    # -- public surface ---------------------------------------------

    def append(self, docs: DataFrame) -> dict:
        """Write one batch: ordinary incremental commit into the
        active generation (or the first commit of a fresh one)."""
        gen, n_commits = self._active()
        report = build_index(
            self.spark, docs, str(gen),
            commit=f"c{n_commits}", **self.build_kwargs,
        )
        report["generation"] = gen.name
        return report

    def search_handle(self) -> PhysicalIndex:
        """One search handle over every generation (score-identical
        to a single index over the union — open_many contract)."""
        return PhysicalIndex.open_many(
            self.spark, str(self.root / "gen-*")
        )
