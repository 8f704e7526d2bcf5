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


def path_depth(path: str) -> int:
    """Number of 1:n (``[]``) levels in a veloci field path."""
    return path.count("[]")


def pos_pack_bits(depth: int) -> int:
    """Bits per level in the packed scalar ``pos`` identity. Depth ≤ 1 is
    unpacked (pos = the single array position); deeper paths split 62 bits
    evenly, so lexicographic order of (pos_0, …, pos_{d-1}) == numeric order
    of the packed value — DFS document order is preserved."""
    return 62 // depth if depth >= 2 else 62


def pos_level_cols(pos, depth: int) -> list:
    """Decode a packed ``pos`` column back into per-level position columns
    (inverse of the packing in :func:`value_rows`) — plain shift/mask
    expressions, fully JVM-side."""
    pos = F.col(pos) if isinstance(pos, str) else pos
    if depth <= 1:
        return [pos.cast("int")]
    bits = pos_pack_bits(depth)
    mask = (1 << bits) - 1
    return [
        F.shiftright(pos, bits * (depth - 1 - i)).bitwiseAND(F.lit(mask))
        .cast("int")
        for i in range(depth)
    ]


def value_rows(df: DataFrame, path: str, id_col: str = "doc_id") -> DataFrame:
    """Per-VALUE rows with positional identity:
    ``(doc_id, pos, value, pos_0 … pos_{d-1})``.

    The reference assigns every 1:n value its own text id per path, chained
    to its parents (json_converter DFS value ids,
    /root/reference/json_converter/src/lib.rs:77-168). Our identity is the
    composite of the array positions along the path — unique per value,
    DFS-ordered, derivable per-doc with zero shuffles:

    * ``pos_i`` (int) — position within the level-``i`` array. The shared
      prefix ``pos_0 … pos_{k-1}`` IS the parent identity at level ``k``,
      which is what sibling-subfield joins (value-relative boost) and the
      read-tree reconstruction key on.
    * ``pos`` (long) — the per-level positions packed into one scalar
      (``62 // d`` bits per level, lexicographic ⇒ DFS order), so every
      consumer that only needs *a* value identity (postings pack dedup,
      tokentexts, locality grouping, facet counting) keeps a single flat
      column. Arrays longer than ``2^(62//d)`` elements raise (fail-loud,
      never silent truncation).

    Depth 1 packs nothing (pos == pos_0); a flat path yields pos = 0.
    """
    depth = path_depth(path)
    out = df.select(id_col, *[c for c in df.columns if c != id_col])
    expr = None
    level = 0
    for seg in path.split("."):
        is_array = seg.endswith("[]")
        name = seg[:-2] if is_array else seg
        expr = F.col(name) if expr is None else expr.getField(name)
        if is_array:
            keep = [id_col] + [f"_p{j}" for j in range(level)]
            out = out.select(*keep, F.posexplode(expr).alias(f"_p{level}", "_v"))
            expr = F.col("_v")
            level += 1
    if depth == 0:
        pos_col = F.lit(0).cast("long")
    elif depth == 1:
        pos_col = F.col("_p0").cast("long")
    else:
        bits = pos_pack_bits(depth)
        lim = 1 << bits
        # fail-loud overflow guard: a level position must fit its bit field
        guarded = [
            F.when(F.col(f"_p{i}") < lim, F.col(f"_p{i}").cast("long"))
            .otherwise(F.raise_error(F.lit(
                f"array position >= 2^{bits} at level {i} of {path!r} — "
                f"too deep/wide for the packed pos identity")))
            for i in range(depth)
        ]
        pos_col = guarded[0]
        for g in guarded[1:]:
            pos_col = F.shiftleft(pos_col, bits) + g
    return (
        out.select(F.col(id_col).alias("doc_id"),
                   pos_col.alias("pos"),
                   expr.cast("string").alias("value"),
                   *[F.col(f"_p{i}").cast("int").alias(f"pos_{i}")
                     for i in range(depth)])
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
