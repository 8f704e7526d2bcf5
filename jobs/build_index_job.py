"""spark-submit entry point for the index build (north_rule: the pipeline
runs via ``spark-submit --py-files`` on a multi-executor cluster).

Usage::

    python tools/make_pyfiles_zip.py            # → /tmp/veloci_spark.zip
    spark-submit --master local[8] \
        --py-files /tmp/veloci_spark.zip \
        jobs/build_index_job.py \
        --input /path/to/webtext_parquet --output /tmp/idx \
        [--doc-id-col doc_id] [--segment-docs 1048576]

The job is resumable: re-submitting with the same ``--output`` skips
completed stages (stage markers) and the checkpoints/ directory carries the
per-task lineage + metrics from every attempt.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir of webtext docs")
    ap.add_argument("--output", required=True, help="index directory")
    ap.add_argument("--doc-id-col", default=None,
                    help="pre-existing doc id column (else ids derive from --order-col)")
    ap.add_argument("--order-col", default="url")
    ap.add_argument("--segment-docs", type=int, default=1 << 20)
    ap.add_argument("--fields", default="text",
                    help="comma-separated tokenized fields")
    ap.add_argument("--facet-fields", default="lang",
                    help="comma-separated untokenized fields")
    ap.add_argument("--config", default=None,
                    help="reference-format fields config file (JSON or "
                         "TOML, the create_index shape); overrides "
                         "--fields/--facet-fields")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("veloci-build-index").getOrCreate()

    from veloci_spark.build import build_index
    from veloci_spark.config import FieldConfig, IndexConfig

    docs = spark.read.parquet(args.input)
    if args.config is not None:
        from veloci_spark.fields_config import (discover_paths,
                                                index_config_from_string)

        with open(args.config) as fh:
            cfg_text = fh.read()
        paths = discover_paths(docs.schema)
        fields = index_config_from_string(cfg_text, paths).fields
    else:
        fields = tuple(
            [FieldConfig(f) for f in args.fields.split(",") if f]
            + [FieldConfig(f, tokenize=False, phrase_pairs=False,
                           token_texts=False)
               for f in args.facet_fields.split(",") if f]
        )
    doc_id_col = args.doc_id_col
    if doc_id_col is None and args.order_col not in docs.columns:
        # out-of-the-box on inputs without the default order column: a
        # pre-existing doc_id column wins; else fail with the column list
        if "doc_id" in docs.columns:
            doc_id_col = "doc_id"
        else:
            ap.error(f"--order-col {args.order_col!r} not in input columns "
                     f"{docs.columns}; pass --order-col or --doc-id-col")
    config = IndexConfig(fields=fields, doc_id_col=doc_id_col,
                         order_col=args.order_col, segment_docs=args.segment_docs)
    manifest = build_index(spark, docs, config, args.output)
    json.dump(manifest, sys.stdout, indent=2)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
