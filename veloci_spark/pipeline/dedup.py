"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (the whole point of these shapes):

* exact — one hash-groupBy; partial aggregation makes the common case
  (unique doc) map-side only.
* MinHash+LSH — shingle → k minhashes → band buckets → *bucket join*: the
  only shuffle is by (band, bucket-hash); candidate pairs are verified with
  the real Jaccard estimate. All-pairs comparison never happens.
* SimHash — 64-bit fingerprint; near-dup = identical fingerprint per
  rotation band (Hamming ≤ k via k+1 block split, pigeonhole).
* n-gram Jaccard — inverted shingle index join; pairs sharing ≥1 shingle
  only, then exact Jaccard via intersection counts (no UDF in the join).
* embedding cosine — unit-normalize + LSH by random-hyperplane sign bits,
  verify candidates with the true cosine.

All hashing is deterministic (xxhash-free: Spark's ``hash``/``crc32`` and
explicit polynomial hashes) so results are stable across runs/cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (canonical_id, doc_id) for every doc in
    a duplicate group, canonical = min id. One hash-partial-agg shuffle."""
    groups = (
        docs.groupBy(text_col)
        .agg(F.min(id_col).alias("canonical_id"),
             F.sort_array(F.collect_list(id_col)).alias("members"),
             F.count("*").alias("group_size"))
        .where(F.col("group_size") > 1)
    )
    return (
        groups.select("canonical_id", F.explode("members").alias(id_col))
        .orderBy("canonical_id", id_col)
    )


def distinct_docs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Keep one doc (min id) per distinct text — the dedup *apply* step."""
    w = Window.partitionBy(text_col).orderBy(id_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1).drop("_rn")
    )


# ---------------------------------------------------------------------------
# shingles (shared by minhash / jaccard)


def shingle_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle string)."""
    words = F.split(F.lower(F.col(text_col)), r"\W+")
    words = F.filter(words, lambda w: w != "")
    # sliding window of n words via transform over indices
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(shingles: DataFrame, num_hashes: int = 64,
                       seed: int = 7) -> DataFrame:
    """(doc_id, signature: array<long>) — k independent minhashes per doc.

    Shingle → base hash with Spark's 64-bit ``xxhash64`` (JVM-side), then the
    k permutations (a·x+b mod p) and the per-doc min are computed in one
    vectorized Arrow kernel over the grouped shingle hashes.
    """
    a, b = _minhash_params(num_hashes, seed)
    hashed = shingles.withColumn("h", F.xxhash64("shingle"))
    grouped = hashed.groupBy("doc_id").agg(F.collect_list("h").alias("hs"))

    @F.pandas_udf("array<long>")
    def sig(hs: pd.Series) -> pd.Series:
        out = []
        for arr in hs:
            x = np.asarray(arr, dtype=np.int64).astype(np.uint64) % _MERSENNE
            # (k, n) permuted hashes → min over n
            perm = (a.astype(np.uint64)[:, None] * x[None, :] + b.astype(np.uint64)[:, None]) % _MERSENNE
            out.append(perm.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return grouped.select("doc_id", sig("hs").alias("signature"))


def minhash_candidates(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs
    (doc_a < doc_b). The only shuffle is the groupBy on (band, bucket)."""
    sig_len_col = F.size("signature")
    rows_per_band = F.floor(sig_len_col / bands).cast("int")
    banded = (
        signatures.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
            "signature")
        .select(
            "doc_id", "band",
            F.hash(F.slice("signature",
                           F.col("band") * rows_per_band + 1, rows_per_band),
                   F.col("band")).alias("bucket"))
    )
    grouped = banded.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_set("doc_id")).alias("members"))
    pairs = (
        grouped.where(F.size("members") > 1)
        .select(F.explode(_pairs_expr("members")).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    return pairs


def _pairs_expr(members_col: str):
    """array<struct<a,b>> of all ordered pairs within a (small) bucket."""
    m = F.col(members_col)
    return F.flatten(F.transform(
        m, lambda x, i: F.transform(
            F.slice(m, i + 2, F.size(m)), lambda y: F.struct(x.alias("a"), y.alias("b")))
    ))


def minhash_near_duplicates(docs: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id", n: int = 3,
                            num_hashes: int = 64, bands: int = 16,
                            threshold: float = 0.8) -> DataFrame:
    """Full MinHash+LSH pipeline: candidates verified by signature-estimated
    Jaccard ≥ threshold. Returns (doc_a, doc_b, est_jaccard)."""
    sh = shingle_df(docs, text_col, id_col, n)
    sigs = minhash_signatures(sh, num_hashes).cache()
    cands = minhash_candidates(sigs, bands)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v
    ) / F.size("sig_a")
    return (
        cands.join(a, "doc_a").join(b, "doc_b")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash_fingerprints(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens: sign of per-bit weighted sums of
    token hashes. Vectorized Arrow kernel (bit matrix via numpy unpackbits)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\W+"), lambda w: w != "")
    tok = docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w"))
    hashed = tok.withColumn("h", F.xxhash64("w")).groupBy("doc_id").agg(
        F.collect_list("h").alias("hs"))

    @F.pandas_udf("long")
    def simhash(hs: pd.Series) -> pd.Series:
        out = np.empty(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            x = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for bpos in np.flatnonzero(votes > 0):
                fp |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    return hashed.select("doc_id", simhash("hs").alias("fingerprint"))


def simhash_near_duplicates(docs: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id", hamming: int = 3) -> DataFrame:
    """Pairs with Hamming(fp_a, fp_b) ≤ hamming. Pigeonhole: split the 64-bit
    fingerprint into hamming+1 blocks; any pair within distance must agree on
    ≥1 block → bucket-join per block, verify with bit_count."""
    fps = simhash_fingerprints(docs, text_col, id_col).cache()
    k = hamming + 1
    block_bits = 64 // k
    blocked = fps.select(
        "doc_id", "fingerprint",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("blk"),
    ).withColumn(
        "key", F.expr(f"shiftrightunsigned(fingerprint, blk * {block_bits})")
               .bitwiseAND(F.lit((1 << block_bits) - 1))
    )
    grouped = blocked.groupBy("blk", "key").agg(
        F.sort_array(F.collect_set(F.struct("doc_id", "fingerprint"))).alias("members"))
    pairs = (
        grouped.where(F.size("members") > 1)
        .select(F.explode(_pairs_expr("members")).alias("p"))
        .select(F.col("p.a.doc_id").alias("doc_a"),
                F.col("p.a.fingerprint").alias("fp_a"),
                F.col("p.b.doc_id").alias("doc_b"),
                F.col("p.b.fingerprint").alias("fp_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .where(F.col("hamming") <= hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )
    return pairs


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index join, no estimation)


def ngram_jaccard_pairs(docs: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets for pairs sharing ≥1
    shingle: |A∩B| from the inverted join, |A|,|B| from per-doc counts —
    pure joins + aggregations, fully JVM-side."""
    sh = shingle_df(docs, text_col, id_col, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard",
                    F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def embedding_near_duplicates(emb: DataFrame, *, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              threshold: float = 0.95,
                              planes: int = 16, seed: int = 11) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold. Random-hyperplane LSH
    buckets (sign-bit key) prune candidates; true cosine verifies. Returns
    (id_a, id_b, cosine)."""
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return emb.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double")
    dim = first["d"]
    rng = np.random.RandomState(seed)
    h = rng.normal(size=(planes, dim))

    @F.pandas_udf("long")
    def bucket(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.values).astype(np.float64)
        signs = (mat @ h.T) > 0
        keys = np.zeros(len(vs), dtype=np.int64)
        for b in range(planes):
            keys |= signs[:, b].astype(np.int64) << b
        return pd.Series(keys)

    with_b = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v")) \
                .withColumn("key", bucket("v"))
    grouped = with_b.groupBy("key").agg(
        F.sort_array(F.collect_list(F.struct("doc_id"))).alias("members"))
    cand = (
        grouped.where(F.size("members") > 1)
        .select(F.explode(_pairs_expr("members")).alias("p"))
        .select(F.col("p.a.doc_id").alias("id_a"), F.col("p.b.doc_id").alias("id_b"))
        .distinct()
    )
    va = with_b.select(F.col("doc_id").alias("id_a"), F.col("v").alias("va"))
    vb = with_b.select(F.col("doc_id").alias("id_b"), F.col("v").alias("vb"))

    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(c), lambda x: x * x),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine", dot / (norm("va") * norm("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )
