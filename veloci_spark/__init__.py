"""veloci_spark — a from-scratch PySpark-native fulltext index + ranked-search engine.

Re-expresses the query/data semantics of the reference engine (phideg/veloci,
a single-node Rust fulltext engine) as an idiomatic Spark design:

* **Write path** (``veloci_spark.build``): tokenize → global term stats →
  scalable term-id assignment (range-partition + prefix-sum, no single-node
  window) → per-(term, doc) index-time scores → doc-partitioned *segments* of
  delta+VByte-packed posting blocks with per-block max-score metadata
  (block-max WAND-ready), written as parquet with a JSON manifest and
  per-partition checkpoint/metrics files (resumable).
* **Read path** (``veloci_spark.search``): term matching against the sorted
  term dictionary (exact / Levenshtein / prefix / regex), then a single
  scatter-gather: matched postings are grouped by segment and the whole
  boolean/boost request tree is evaluated per-segment in one Arrow kernel,
  followed by a global top-k merge — the shape that scales to a
  1000-executor cluster because every per-doc operation is segment-local.

Scoring is rank-identical to the reference formulas (float32 arithmetic,
u32-truncated index scores, f16-quantized stored scores; see
``veloci_spark.scoring`` for the formulas with reference citations).
"""

__version__ = "0.1.0"

from veloci_spark.config import FieldConfig, IndexConfig  # noqa: F401
