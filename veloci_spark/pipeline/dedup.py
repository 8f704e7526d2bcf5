"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (the whole point of these shapes):

* exact — one hash-groupBy for the canonical ids, then a join back on the
  text hash: a 10M-duplicate boilerplate page stays 10M flat rows, never one
  10M-element array cell.
* MinHash+LSH — shingle → k minhashes → band buckets → *bucket join*: the
  only shuffle is by (band, bucket-hash). Candidate pairs are then verified
  with the **exact** n-gram Jaccard (computed over the candidates only), so
  the emitted pair set equals the brute-force answer whenever LSH recall is
  1 — which the default banding (32 bands × 2 rows at threshold 0.8 →
  miss probability ≈ 0.36³² ≈ 10⁻¹⁴ per qualifying pair) makes effectively
  certain. All-pairs comparison never happens.
* SimHash — 60-bit fingerprint from portable polynomial word hashes (exact
  SQL twin exists); near-dup = identical fingerprint per block (Hamming ≤ k
  via k+1 block split, pigeonhole — exhaustive, not probabilistic).
* n-gram Jaccard — inverted shingle index join; pairs sharing ≥1 shingle
  only, then exact Jaccard via intersection counts (no UDF in the join).
  Shingles above ``max_shingle_df`` docs ("click here to…" boilerplate) are
  excluded from the index — they would create a quadratic hot-key join.
* embedding cosine — unit-normalize + multi-table random-hyperplane LSH
  (L tables × b sign bits, candidates unioned across tables), verify with
  the true cosine. One table alone has ~8% recall at cos 0.9; the default
  24×6 tables push the per-pair miss probability below 10⁻⁵.

All hashing is deterministic and seed-stable across runs/cluster sizes; the
minhash permutations use Spark's ``xxhash64`` base hash (JVM-side), the
simhash word hash is a modular polynomial that plain SQL reproduces.

Hot-bucket safety: every bucket-join operator caps its bucket size
(``max_bucket``); buckets above the cap (all-identical boilerplate, empty
docs) are dropped from *candidate generation* — run ``exact_duplicates``
first, which handles identical texts at linear cost.
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
    a duplicate group, canonical = min id.

    One hash-partial-agg shuffle to find (text-hash → canonical, size), then
    a join back to the docs — group membership stays one ROW per member, so a
    single text duplicated 10M times produces 10M join rows spread over the
    cluster, not one 10M-element ``collect_list`` cell on one executor.
    Joining on the 64-bit text hash (not the full text) keeps the shuffle
    narrow; a hash collision would merge two groups, so the join re-checks
    the text itself.
    """
    h = F.xxhash64(F.col(text_col))
    groups = (
        docs.groupBy(h.alias("_th"), F.col(text_col).alias("_t"))
        .agg(F.min(id_col).alias("canonical_id"),
             F.count("*").alias("group_size"))
        .where(F.col("group_size") > 1)
    )
    return (
        docs.select(F.col(id_col), F.col(text_col), h.alias("_th"))
        .join(groups, on="_th", how="inner")
        .where(F.col(text_col) == F.col("_t"))
        .select("canonical_id", id_col)
        .orderBy("canonical_id", id_col)
    )


def distinct_docs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Keep one doc (min id) per distinct text — the dedup *apply* step.

    Shape: groupBy(text-hash, text).min(id) + broadcast-eligible semi-join
    back on (hash, id) — the same skew-safe plan as
    :func:`exact_duplicates`. NOT ``Window.partitionBy(text)``: a window
    funnels every duplicate of one text into a single task, so one
    10M-duplicate boilerplate page becomes one straggler partition; the
    groupBy's map-side partial aggregation collapses duplicates before the
    shuffle instead. The semi-join keys on (xxhash64(text), min-id) — a
    doc's id is unique, so a hash collision cannot select a wrong row.
    """
    h = F.xxhash64(F.col(text_col))
    keep = (
        docs.groupBy(h.alias("_kh"), F.col(text_col).alias("_t"))
        .agg(F.min(id_col).alias("_keep_id"))
        .select("_kh", "_keep_id")
    )
    with_h = docs.withColumn("_th", h)
    return (
        with_h.join(keep, on=[with_h[id_col] == keep["_keep_id"],
                              with_h["_th"] == keep["_kh"]], how="left_semi")
        .drop("_th")
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


def _filter_hot_shingles(sh: DataFrame, max_shingle_df: int | None) -> DataFrame:
    """Drop shingles whose doc frequency exceeds the cap — the quadratic
    hot keys of any shingle join. Boilerplate phrases shared by millions of
    docs carry almost no Jaccard information but dominate the join cost."""
    if max_shingle_df is None:
        return sh
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    keep = dfreq.where(F.col("_df") <= max_shingle_df).select("shingle")
    return sh.join(keep, "shingle", "left_semi")


def _exact_jaccard_for_pairs(cands: DataFrame, sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidates → exact shingle-set Jaccard columns.
    Shuffles only the candidate pairs + their shingle rows."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard",
                    F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")))
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


def minhash_candidates(signatures: DataFrame, bands: int = 32,
                       max_bucket: int = 1000) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs
    (doc_a < doc_b). The only shuffle is the groupBy on (band, bucket).
    Buckets larger than ``max_bucket`` are dropped (hot-bucket guard)."""
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
        grouped.where((F.size("members") > 1) & (F.size("members") <= max_bucket))
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
                            num_hashes: int = 64, bands: int = 32,
                            threshold: float = 0.8,
                            max_shingle_df: int | None = 10_000,
                            max_bucket: int = 1000) -> DataFrame:
    """Full MinHash+LSH pipeline: band-bucket candidates verified with the
    EXACT n-gram Jaccard (recomputed over the candidate pairs only).
    Returns (doc_a, doc_b, inter, size_a, size_b, jaccard), jaccard ≥
    threshold.

    Because verification is exact, the output equals brute-force n-gram
    Jaccard whenever LSH recall is 1; the default 32 bands × 2 rows give a
    qualifying pair at j=0.8 a miss probability of (1-0.8²)³² ≈ 10⁻¹⁴.
    """
    sh = _filter_hot_shingles(shingle_df(docs, text_col, id_col, n),
                              max_shingle_df).cache()
    sigs = minhash_signatures(sh, num_hashes)
    cands = minhash_candidates(sigs, bands, max_bucket)
    return (
        _exact_jaccard_for_pairs(cands, sh)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash (portable fingerprint: exact SQL twin exists)

# Two independent 30-bit modular polynomial hashes per word, concatenated to
# a 60-bit fingerprint space. Horner form h = (h*B + codepoint) mod P — every
# intermediate fits in int64, so DuckDB/ANSI SQL reproduces it bit-for-bit
# (no xxhash64 dependency on the fingerprint path).
SIMHASH_BITS = 60
_SH_B1, _SH_P1 = 131, 1_000_000_007
_SH_B2, _SH_P2 = 137, 998_244_353


def _word_hash60(word: str) -> int:
    h1 = 0
    h2 = 0
    for c in word:
        cp = ord(c)
        h1 = (h1 * _SH_B1 + cp) % _SH_P1
        h2 = (h2 * _SH_B2 + cp) % _SH_P2
    return ((h1 % (1 << 30)) << 30) | (h2 % (1 << 30))


def simhash_fingerprints(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over word tokens: sign of per-bit weighted sums of
    portable word hashes. Vectorized Arrow kernel; word hashes are memoized
    per batch (vocabulary ≪ token count)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\W+"), lambda w: w != "")
    tok = docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w"))
    hashed_words = tok.groupBy("doc_id").agg(F.collect_list("w").alias("ws"))

    @F.pandas_udf("long")
    def simhash(ws: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = np.empty(len(ws), dtype=np.int64)
        bit_range = np.arange(SIMHASH_BITS, dtype=np.uint64)
        for i, words_arr in enumerate(ws):
            hs = np.empty(len(words_arr), dtype=np.uint64)
            for j, w in enumerate(words_arr):
                h = memo.get(w)
                if h is None:
                    h = _word_hash60(w)
                    memo[w] = h
                hs[j] = h
            bits = ((hs[:, None] >> bit_range[None, :]) & 1).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for bpos in np.flatnonzero(votes > 0):
                fp |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(fp)
        return pd.Series(out)

    return hashed_words.select("doc_id", simhash("ws").alias("fingerprint"))


def simhash_near_duplicates(docs: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id", hamming: int = 3,
                            max_bucket: int = 1000) -> DataFrame:
    """Pairs with Hamming(fp_a, fp_b) ≤ hamming. Pigeonhole: split the 60-bit
    fingerprint into hamming+1 blocks; any pair within distance must agree on
    ≥1 block → bucket-join per block, verify with bit_count. Exhaustive (the
    pair set equals brute force) as long as no bucket exceeds ``max_bucket``;
    over-cap buckets (identical boilerplate) are dropped — run
    ``exact_duplicates`` first for those."""
    fps = simhash_fingerprints(docs, text_col, id_col)
    k = hamming + 1
    block_bits = SIMHASH_BITS // k
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
        grouped.where((F.size("members") > 1) & (F.size("members") <= max_bucket))
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
                        threshold: float = 0.5,
                        max_shingle_df: int | None = 10_000) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets for pairs sharing ≥1
    shingle: |A∩B| from the inverted join, |A|,|B| from per-doc counts —
    pure joins + aggregations, fully JVM-side. Shingles in more than
    ``max_shingle_df`` docs are excluded (hot-key quadratic-join guard).
    The default matches :func:`minhash_near_duplicates` (10k) so the two
    operators see the same shingle universe; pass a tighter cap explicitly
    to trade exactness for join size (ADVICE r3: the tightening must be the
    caller's visible choice, not a silent default change to an operator
    documented as EXACT).

    This operator is EXACT but inherently quadratic per shared shingle —
    use it for verification and modest corpora. The 100 TB path is
    :func:`near_duplicates` (MinHash+LSH): linear in docs, probabilistic
    recall ≈ 1, and its candidate pairs can be re-checked with this exact
    Jaccard on the (tiny) candidate set."""
    sh = _filter_hot_shingles(shingle_df(docs, text_col, id_col, n),
                              max_shingle_df).cache()
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
                              planes: int = 6, tables: int = 24,
                              seed: int = 11,
                              max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold. Multi-table
    random-hyperplane LSH: ``tables`` independent tables of ``planes`` sign
    bits each; candidates = pairs sharing any table bucket, unioned, then
    verified with the true cosine. Returns (id_a, id_b, cosine).

    Recall: a pair at cosine θ agrees on one plane with probability
    1 − acos(θ)/π (≈0.857 at θ=0.9); the default 24 tables × 6 planes give a
    per-pair miss probability (1 − 0.857⁶)²⁴ ≈ 6·10⁻⁶ — one 16-plane table
    (the naive single-table key) would miss ~92% of such pairs.
    """
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return emb.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double")
    dim = first["d"]
    rng = np.random.RandomState(seed)
    h = rng.normal(size=(tables, planes, dim))

    @F.pandas_udf("array<long>")
    def bucket_keys(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.values).astype(np.float64)
        out = np.empty((len(vs), tables), dtype=np.int64)
        for t in range(tables):
            signs = (mat @ h[t].T) > 0  # (n, planes)
            keys = np.zeros(len(vs), dtype=np.int64)
            for b in range(planes):
                keys |= signs[:, b].astype(np.int64) << b
            out[:, t] = keys
        return pd.Series(list(out))

    with_b = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v")) \
                .withColumn("keys", bucket_keys("v"))
    exploded = with_b.select(
        "doc_id", F.posexplode("keys").alias("table", "key"))
    grouped = exploded.groupBy("table", "key").agg(
        F.sort_array(F.collect_set("doc_id")).alias("members"))
    cand = (
        grouped.where((F.size("members") > 1) & (F.size("members") <= max_bucket))
        .select(F.explode(_pairs_expr("members")).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )
    va = with_b.select(F.col("doc_id").alias("id_a"), F.col("v").alias("va"))
    vb = with_b.select(F.col("doc_id").alias("id_b"), F.col("v").alias("vb"))

    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y:
                                 x.cast("double") * y.cast("double")),
                      F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine", dot / (norm("va") * norm("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components) + keep-one


def cluster_near_duplicates(pairs: DataFrame, *, id_a: str = "doc_a",
                            id_b: str = "doc_b",
                            max_iter: int = 25) -> DataFrame:
    """Near-duplicate PAIRS → connected components:
    ``(doc_id, cluster_id)`` where ``cluster_id`` is the smallest doc id in
    the component (the canonical survivor). Only docs that appear in some
    pair get a row — singletons are their own implicit cluster.

    Iterative min-label propagation: each round is one join + min-agg (the
    minimum label flows one hop along edges), so rounds = component
    DIAMETER. LSH near-dup components are clique-shaped (every member
    pairs with most others), so real corpora converge in 2-4 rounds —
    a handful of shuffles at 100 TB, each size O(|pairs|), with a
    convergence check (one `limit(1).count()` probe) per round.
    ``max_iter`` exceeded raises (fail-loud, never a silently-partial
    clustering)."""
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (e.unionByName(e.select(F.col("b").alias("a"),
                                    F.col("a").alias("b")))
             .distinct().cache())
    labels = (edges.select(F.col("a").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")).cache())
    try:
        for _ in range(max_iter):
            nmin = (
                edges.join(labels.select(F.col("doc_id").alias("b"),
                                         F.col("label").alias("_bl")), on="b")
                .groupBy("a").agg(F.min("_bl").alias("_nmin"))
                .select(F.col("a").alias("doc_id"), "_nmin"))
            new = (
                labels.join(nmin, on="doc_id", how="left")
                .select("doc_id",
                        F.least(F.col("label"),
                                F.coalesce("_nmin", F.col("label")))
                        .alias("label"))
                .cache())
            changed = (
                new.join(labels.select("doc_id", F.col("label").alias("_old")),
                         on="doc_id")
                .where(F.col("label") != F.col("_old")).limit(1).count())
            labels.unpersist()
            labels = new
            if changed == 0:
                return labels.select("doc_id",
                                     F.col("label").alias("cluster_id"))
        raise RuntimeError(
            f"near-dup clustering did not converge in {max_iter} rounds "
            f"(component diameter > {max_iter}?)")
    finally:
        edges.unpersist()


def distinct_by_cluster(docs: DataFrame, clusters: DataFrame, *,
                        id_col: str = "doc_id") -> DataFrame:
    """Keep ONE doc per near-dup cluster (the canonical min-id member):
    anti-join the non-canonical members — no window, no skew-sensitive
    per-cluster partitioning."""
    losers = (clusters.where(F.col("doc_id") != F.col("cluster_id"))
              .select(F.col("doc_id").alias(id_col)))
    return docs.join(losers, on=id_col, how="left_anti")
