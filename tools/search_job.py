"""spark-submit entry point: query a built index.

    spark-submit --py-files katta_spark.zip tools/search_job.py \
        --index /data/idx --terms import,return --mode or --k 10

Supports the full reference query surface: top-k (BM25, WAND), count,
group, facet, range facet, sorted pagination, fetch — the CLI
analogue of ILuceneClient
(katta-client/.../client/ILuceneClient.java) search/count and the
group/facet RPCs (katta-core/.../lib/lucene/LuceneServer.java).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from katta_spark.index import PhysicalIndex  # noqa: E402
from katta_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--terms", help="comma-separated query terms (pre-analyzed)")
    ap.add_argument("--q", help="query string, e.g. 'parse AND request lang:py'")
    ap.add_argument("--op", default="topk",
                    choices=["topk", "count", "group", "facet", "range_facet",
                             "sorted", "export", "suggest", "explain"])
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--filter", action="append", default=[],
                    help="field=value (repeatable; AND semantics)")
    ap.add_argument("--field", help="field for group/facet/range_facet")
    ap.add_argument("--range", help="start,end,gap for range_facet")
    ap.add_argument("--sort", help="col:asc|desc[,col:dir...] for sorted")
    ap.add_argument("--fields", default="doc_id",
                    help="projection for sorted/fetch")
    ap.add_argument("--fetch", action="store_true",
                    help="join top-k hits back to stored fields")
    ap.add_argument("--no-wand", action="store_true")
    ap.add_argument("--doc", type=int, help="doc_id for --op explain")
    args = ap.parse_args()

    spark = get_spark(app_name="katta-search")
    idx = PhysicalIndex(spark, args.index)
    filters = dict(f.split("=", 1) for f in args.filter) or None
    terms = [t for t in (args.terms or "").split(",") if t]
    if args.q and args.op != "topk":
        # non-topk ops take pre-analyzed terms; run the legacy flat
        # parse for its terms/filters
        from katta_spark.fulltext.qparse import parse_query

        p = parse_query(args.q, args.mode)
        terms, args.mode = p.terms, p.mode
        filters = {**(filters or {}), **p.filters} or None

    if args.op == "topk":
        if args.q:
            # full Lucene grammar front door (NOT, ranges, phrases,
            # wildcards, fuzzy, boosts, ^=, fields) — parity with the
            # reference's q+fq parse
            out = idx.query(args.q, k=args.k, offset=args.offset)
        else:
            out = idx.topk(terms, k=args.k, mode=args.mode,
                           filters=filters, offset=args.offset,
                           use_wand=not args.no_wand)
        if args.fetch:
            out = idx.fetch_details(out, args.fields.split(","))
    elif args.op == "count":
        out = idx.count(terms, mode=args.mode, filters=filters)
    elif args.op == "group":
        out = idx.group_values(terms, args.field, mode=args.mode, filters=filters)
    elif args.op == "facet":
        out = idx.facet(terms, args.field, n=args.k, mode=args.mode,
                        filters=filters)
    elif args.op == "range_facet":
        start, end, gap = (float(x) for x in args.range.split(","))
        out = idx.range_facet(terms, args.field, start, end, gap,
                              mode=args.mode, filters=filters)
    elif args.op == "suggest":
        out = idx.suggest(terms[0] if terms else "", n=args.k)
    elif args.op == "explain":
        out = idx.explain_score(args.doc, terms)
    elif args.op == "export":
        out = idx.export(terms, args.fields.split(","), mode=args.mode,
                         filters=filters)
    else:  # sorted
        sort_cols = [tuple(s.split(":")) for s in args.sort.split(",")]
        out = idx.sorted_query(terms, sort_cols, args.fields.split(","),
                               limit=args.k, offset=args.offset,
                               mode=args.mode, filters=filters)

    rows = out.toLocalIterator() if args.op == "export" else out.collect()
    for row in rows:
        print(json.dumps(row.asDict(), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
