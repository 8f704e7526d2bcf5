"""Input sources / converters (SURVEY.md §2.1).

The reference's three-pass NDJSON ingestion (S1), JSON→NDJSON converter (S2)
and CSV source (S2b) map to single declarative Spark reads — Spark's
parallel scan + schema inference replaces the custom pipelined readers
(S2c), and one cached DataFrame replaces the three passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the fixed webtext input shape (BASELINE.json input_hint)
WEBTEXT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def read_ndjson(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Line-delimited JSON scan (S1) — one doc per line
    (reference src/create.rs:945-975; Spark's parallel json reader)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_any_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Arbitrary JSON (incl. a top-level array) → one row per document —
    the role of the reference NDJSON converter (S2,
    src/create.rs:731-747). ``multiLine`` handles pretty-printed files and
    top-level arrays; the result is already "line-delimited" semantically."""
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """Header-mapped CSV rows → documents (S2b,
    reference src/create_from_csv.rs:5-19)."""
    options.setdefault("header", True)
    options.setdefault("inferSchema", True)
    return spark.read.options(**options).csv(path)


def read_webtext(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Schema-checked read of the webtext table; raises if the input_hint
    columns are missing. ``fmt``: parquet | json (NDJSON) | iceberg (when a
    catalog is configured)."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "json":
        df = read_ndjson(spark, path)
        if "warc_ts" in df.columns:
            df = df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        if "html" in df.columns:
            df = df.withColumn("html", F.col("html").cast("binary"))
    elif fmt == "iceberg":
        df = spark.read.format("iceberg").load(path)
    else:
        raise ValueError(f"unknown format: {fmt}")
    missing = [c for c in ("url", "text", "lang") if c not in df.columns]
    if missing:
        raise ValueError(f"webtext input missing columns: {missing}")
    return df


def to_ndjson(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write documents as line-delimited JSON (binary columns base64-encoded
    by Spark's JSON writer)."""
    out = df
    if num_files:
        out = out.repartition(num_files)
    out.write.mode("overwrite").json(path)
