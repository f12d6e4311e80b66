"""Verify a training-shard dataset against its content manifest.

    python tools/verify_shards.py /data/shards

Recomputes each shard's row count and order-insensitive
xor-of-xxhash64 key digest and compares with ``_manifest.json`` (the
writer's done-marker).  Exit 0 = every shard verifies; 1 = any
mismatch or a missing manifest — the check a training job runs before
trusting a resumed/mirrored dataset.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from katta_spark.session import get_spark  # noqa: E402


def verify(out_dir: str, spark=None) -> dict:
    mpath = Path(out_dir) / "_manifest.json"
    if not mpath.exists():
        return {"ok": False, "error": "missing _manifest.json"}
    manifest = json.loads(mpath.read_text())
    spark = spark or get_spark("verify_shards", master="local[8]",
                               shuffle_partitions=8)
    fmt = manifest.get("format", "parquet")
    reader = spark.read.json if fmt == "json" else spark.read.parquet
    df = reader(out_dir)
    key = manifest["key_col"]
    got = {
        int(r["shard"]): (int(r["rows"]), int(r["digest"]))
        for r in df.groupBy("shard").agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(F.xxhash64(F.col(key).cast("string"))).alias("digest"),
        ).collect()
    }
    want = {
        int(s): (int(v["rows"]), int(v["digest"]))
        for s, v in manifest["shards"].items()
    }
    bad = sorted(
        s for s in set(got) | set(want) if got.get(s) != want.get(s)
    )
    return {"ok": not bad, "n_shards": len(want), "mismatched": bad}


if __name__ == "__main__":
    res = verify(sys.argv[1])
    print(json.dumps(res))
    raise SystemExit(0 if res["ok"] else 1)
