"""Nested-document field paths — veloci's ``sub_objects[].description``
syntax mapped onto Spark nested types.

The reference flattens arbitrary JSON with a DFS visitor that assigns value
ids per path (/root/reference/json_converter/src/lib.rs:77-168,
README.md:47-64). Spark already stores nested data natively
(`StructType`/`ArrayType`); the visitor's role collapses to `explode` along
each `[]` segment. These helpers resolve a veloci path against a DataFrame
and produce the flat `(doc_id, value)` relation the indexer consumes — so a
nested corpus indexes by declaring `FieldConfig("meanings.ger[]")` and
pre-flattening with :func:`explode_path`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_path(df: DataFrame, path: str, id_col: str = "doc_id") -> DataFrame:
    """Resolve a veloci field path against nested columns.

    ``a.b`` walks structs; ``a[]`` explodes an array; combinations nest:
    ``sub_objects[].description`` → one row per array element per doc.
    Returns (id_col, value). Null structs/arrays produce no rows (veloci's
    visitor emits nothing for missing paths).
    """
    out = df.select(id_col, *[c for c in df.columns if c != id_col])
    expr = None
    for seg in path.split("."):
        is_array = seg.endswith("[]")
        name = seg[:-2] if is_array else seg
        expr = F.col(name) if expr is None else expr.getField(name)
        if is_array:
            out = out.select(id_col, F.explode(expr).alias("_v"))
            expr = F.col("_v")
    return out.select(F.col(id_col), expr.alias("value")).where(F.col("value").isNotNull())


def value_rows(df: DataFrame, path: str, id_col: str = "doc_id") -> DataFrame:
    """Per-VALUE rows with positional identity: (doc_id, pos, value).

    The reference assigns every 1:n value its own text id
    (json_converter DFS value ids); ``(doc_id, pos)`` is our composite text
    identity — unique per value, ordered, and derivable without a global id
    shuffle. Supports one ``[]`` per path (``a.b[]``, ``a[].b``); a flat path
    yields pos = 0 per doc.
    """
    n_arrays = path.count("[]")
    if n_arrays > 1:
        raise NotImplementedError(
            f"one [] per path supported, got {path!r} (nest via pre-flatten)")
    out = df.select(id_col, *[c for c in df.columns if c != id_col])
    expr = None
    pos_col = F.lit(0)
    for seg in path.split("."):
        is_array = seg.endswith("[]")
        name = seg[:-2] if is_array else seg
        expr = F.col(name) if expr is None else expr.getField(name)
        if is_array:
            out = out.select(id_col, F.posexplode(expr).alias("_pos", "_v"))
            expr = F.col("_v")
            pos_col = F.col("_pos")
    return (
        out.select(F.col(id_col).alias("doc_id"),
                   pos_col.cast("int").alias("pos"),
                   expr.cast("string").alias("value"))
        .where(F.col("value").isNotNull())
    )


def safe_path_name(path: str) -> str:
    """Directory-safe name for a nested path: ``meanings.eng[]`` → ``meanings_eng``."""
    return path.replace("[]", "").replace(".", "_").strip("_")


def flatten_for_index(df: DataFrame, paths: list[str],
                      id_col: str = "doc_id") -> DataFrame:
    """Multiple nested paths → one wide flat DataFrame with a column per
    path (arrays concatenated with a space — 1:n texts become one text per
    value row in a full implementation; this helper covers the common
    index-every-value case by exploding each path independently and
    re-joining on the doc id)."""
    out = df.select(id_col)
    for p in paths:
        flat = (
            explode_path(df, p, id_col)
            .groupBy(id_col)
            .agg(F.concat_ws(" ", F.collect_list(F.col("value").cast("string")))
                 .alias(p.replace("[]", "").replace(".", "_")))
        )
        out = out.join(flat, on=id_col, how="left")
    return out
