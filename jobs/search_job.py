"""spark-submit entry point for ranked search against a built index — the
Spark-native twin of the reference's CLI search surface
(/root/reference/veloci_bins/src/bin/ — the `create_index` binary's sibling
workflow: build once, query from any process that can see the index dir).

Usage::

    python tools/make_pyfiles_zip.py            # → /tmp/veloci_spark.zip
    spark-submit --master local[8] \
        --py-files /tmp/veloci_spark.zip \
        jobs/search_job.py \
        --index /tmp/idx --query "search engine" \
        [--top 10] [--skip 0] [--levenshtein 1] [--facets lang] \
        [--fields text] [--suggest-prefix sea]

Prints ONE JSON line per request: the reference-shaped result
(num_hits, num_hits_exact, data[{doc_id, score}], facets, execution_time_ms)
so the output is pipeline-consumable (jq etc.).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--query", default=None,
                    help="query string (veloci query language: quoted "
                         "phrases, AND/OR, trailing * wildcard)")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--skip", type=int, default=0)
    ap.add_argument("--levenshtein", type=int, default=None,
                    help="fuzzy distance override (default: auto by length)")
    ap.add_argument("--fields", default=None,
                    help="comma-separated search fields (default: all "
                         "tokenized fields)")
    ap.add_argument("--facets", default=None,
                    help="comma-separated facet fields to count")
    ap.add_argument("--suggest-prefix", default=None,
                    help="also run a suggest for this prefix")
    args = ap.parse_args(argv)
    if args.query is None and args.suggest_prefix is None:
        ap.error("need --query and/or --suggest-prefix")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("veloci-search").getOrCreate()

    from veloci_spark.query import search_query
    from veloci_spark.search import FulltextIndex, suggest_multi

    index = FulltextIndex(spark, args.index)
    if args.query is not None:
        kw = {"top": args.top, "skip": args.skip}
        if args.levenshtein is not None:
            kw["levenshtein_auto_limit"] = args.levenshtein
        if args.fields:
            kw["search_fields"] = args.fields.split(",")
        if args.facets:
            kw["facets"] = [{"field": f} for f in args.facets.split(",")]
        res = search_query(index, args.query, **kw)
        json.dump(res, sys.stdout)
        print()
    if args.suggest_prefix is not None:
        fields = (args.fields.split(",") if args.fields
                  else [f["name"] for f in index.manifest["fields"]
                        if f["tokenize"]])
        sug = suggest_multi(index, fields, args.suggest_prefix, top=args.top)
        json.dump({"suggest": sug}, sys.stdout)
        print()
    spark.stop()


if __name__ == "__main__":
    main()
