"""spark-submit entry point: build (or resume / incrementally extend)
a physical index.

    spark-submit --py-files katta_spark.zip tools/build_index_job.py \
        --input /data/corpus_parquet --output /data/idx \
        --n-groups 64 --commit c0

    # synthetic corpus (deterministic, BASELINE.json input shape):
    python tools/build_index_job.py --input synthetic:100000 --output /tmp/idx

The reference analogue is the MapReduce index-build driver
(katta-hadoop/.../hadoop/LuceneDocumentOutputFormat.java:51-86) and
the CLI `createIndex`/`generateIndex`
(katta-client/.../client/Katta.java:729-1074).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from katta_spark.corpus import synthetic_corpus  # noqa: E402
from katta_spark.index import build_index  # noqa: E402
from katta_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path of the corpus, or synthetic:<n_docs>")
    ap.add_argument("--output", required=True, help="index directory")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--n-groups", type=int, default=4)
    ap.add_argument("--commit", default="c0")
    ap.add_argument("--block-range", type=int, default=4096)
    ap.add_argument("--doc-id-method", default="rank", choices=["rank", "hash"])
    ap.add_argument("--path-col", default=None,
                    help="column indexed as path: field postings")
    ap.add_argument("--field-cols", default=None,
                    help="comma-separated columns indexed as scored "
                         "field postings (field:value queries)")
    ap.add_argument("--field-analyzers", default=None,
                    help="field=analyzer pairs, e.g. path=path,tag=code "
                         "(default keyword)")
    ap.add_argument("--no-positions", action="store_true",
                    help="skip positional postings (no phrase index)")
    ap.add_argument("--stopwords", default=None,
                    help="comma-separated stopwords dropped at analysis "
                         "(index-wide invariant, inherited by commits)")
    ap.add_argument("--synonyms", default=None,
                    help="query-time synonym groups, e.g. "
                         "sort=order|rank,fast=quick")
    args = ap.parse_args()

    spark = get_spark(app_name=f"katta-build-{args.commit}")
    if args.input.startswith("synthetic:"):
        corpus = synthetic_corpus(spark, int(args.input.split(":", 1)[1]))
    else:
        corpus = spark.read.parquet(args.input)

    fanalyzers = None
    if args.field_analyzers:
        fanalyzers = dict(
            kv.split("=", 1) for kv in args.field_analyzers.split(",")
        )
    report = build_index(
        spark,
        corpus,
        args.output,
        text_col=args.text_col,
        n_groups=args.n_groups,
        commit=args.commit,
        block_range=args.block_range,
        doc_id_method=args.doc_id_method,
        path_col=args.path_col,
        field_cols=args.field_cols.split(",") if args.field_cols else None,
        field_analyzers=fanalyzers,
        stopwords=args.stopwords.split(",") if args.stopwords else None,
        synonyms=(
            {
                kv.split("=", 1)[0]: kv.split("=", 1)[1].split("|")
                for kv in args.synonyms.split(",")
            }
            if args.synonyms
            else None
        ),
        store_positions=not args.no_positions,
    )
    report.pop("manifest", None)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
