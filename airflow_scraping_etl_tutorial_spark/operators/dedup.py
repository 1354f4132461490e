"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale doctrine shared by all of them:
- never shuffle raw text: hash first (32-hex md5 / 8-byte xxhash), move
  the digest;
- never all-pairs: candidate pairs come from shared keys (content hash,
  LSH band bucket, shared shingle) so join cost is O(sum(bucket^2));
- everything below is built-in column expressions — shingling, hashing,
  banding and Jaccard all run inside whole-stage codegen, no UDFs.

Hash choice: md5 where the DuckDB oracle must reproduce the value
bit-for-bit (exact_dedup's content hash — md5 is identical in both
engines); xxhash64 for MinHash/SimHash internals (engine-only values:
~8 bytes/hash JVM-side vs 32-hex strings, an order of magnitude cheaper
at 100 TB, and still fully deterministic across runs/machines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import fan_out
from .text import tokens


def exact_dedup(df: DataFrame, key: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: (md5(key), representative id, copy
    count). The groupBy key is the 32-hex digest, so the shuffle carries
    ~40 bytes/row regardless of document size."""
    return df.groupBy(F.md5(F.col(key)).alias(f"{key}_md5")).agg(
        F.min(id_col).alias(f"keep_{id_col}"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def word_shingles(text: Column, k: int) -> Column:
    """Distinct k-word shingles as array<string> (empty when < k words).

    Built with sequence+transform+slice — one codegen expression, no
    explode (the array stays row-local until a consumer needs rows).
    """
    words = tokens(text)
    n = F.size(words)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hashes(text: Column, k: int) -> Column:
    """Distinct k-word shingles pre-hashed to int64 (array<long>).

    The string shingle is hashed ONCE (xxhash64); every downstream
    MinHash function then re-hashes the 8-byte long, not the string —
    profiling at sf0.1 shows ~8x over per-seed string hashing. Hash
    collisions merely merge two shingles (negligible at 2^-64) — the
    standard shingle-fingerprint trade."""
    return F.transform(word_shingles(text, k), lambda s: F.xxhash64(s))


def _minhash_cols(hash_col: Column, n_hashes: int) -> list[Column]:
    """n_hashes MinHash values: min over pre-hashed shingles of
    xxhash64(seed, h). min over int64 is a valid MinHash; the whole
    signature is 8*n_hashes bytes per doc."""
    return [
        F.array_min(F.transform(hash_col, lambda h: F.xxhash64(F.lit(j), h))).alias(
            f"mh_{j}"
        )
        for j in range(n_hashes)
    ]


def minhash_signatures(
    df: DataFrame, n_hashes: int = 8, shingle_size: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document MinHash signature (mh_0..mh_{n-1}). Pure map work.

    Two-step projection on purpose: materializing `hs` as its own
    column keeps Catalyst from re-inlining the shingle pipeline into
    each of the n_hashes min-expressions (CollapseProject skips
    expensive multiply-referenced expressions) — measured ~17x at sf0.1.
    """
    pre = fan_out(df).select(
        F.col(id_col), shingle_hashes(F.col("text"), shingle_size).alias("hs")
    )
    return pre.select(F.col(id_col), *_minhash_cols(F.col("hs"), n_hashes))


def minhash_near_duplicates(
    df: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Stages (the MMDS banding scheme):
      1. signature: n_hashes MinHashes per doc (map-only);
      2. banding: r = n_hashes/bands rows per band -> band bucket key =
         xxhash64(band_idx, mh_i..mh_j); explode to (band, bucket, id);
      3. candidate pairs: self-join on (band, bucket), id_a < id_b,
         distinct — cost O(sum over buckets of bucket^2), never O(n^2);
      4. verify: exact Jaccard on the candidates' shingle sets only.

    Probability a pair with true Jaccard s becomes a candidate:
    1 - (1 - s^r)^bands — tune (n_hashes, bands) for the recall target.
    """
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes")
    r = n_hashes // bands

    # Two-step projection (see minhash_signatures) + persist: the LSH
    # self-join and the two shingle-set lookups would otherwise recompute
    # shingling+hashing three times. The exact-Jaccard verify runs on the
    # hashed shingle sets, so raw text never shuffles.
    pre = fan_out(df).select(
        F.col(id_col), shingle_hashes(F.col("text"), shingle_size).alias("shingles")
    )
    sig = pre.select(
        F.col(id_col), F.col("shingles"), *_minhash_cols(F.col("shingles"), n_hashes)
    ).persist()

    band_keys = F.array(
        *[
            F.xxhash64(F.lit(b), *[F.col(f"mh_{b * r + i}") for i in range(r)])
            for b in range(bands)
        ]
    )
    buckets = sig.select(
        F.col(id_col), F.posexplode(band_keys).alias("band", "bucket")
    )

    left = buckets.alias("a")
    right = buckets.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
        )
        .distinct()
    )

    sh_a = sig.select(F.col(id_col).alias("doc_id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sig.select(F.col(id_col).alias("doc_id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sh_a, "doc_id_a")
        .join(sh_b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def simhash(df: DataFrame, n_bits: int = 60, id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: xxhash64 per-token hash, bitwise vote,
    sign -> fingerprint bit. Near-dups have low Hamming distance.

    n_bits=60 (of the 64) keeps the reassembled fingerprint positive in
    a signed long. The bit votes are n_bits aggregate expressions over
    the exploded token stream — partial aggregation collapses them
    map-side, so the shuffle carries n_bits longs per doc, not per token.
    """
    tok = (
        fan_out(df)
        .select(F.col(id_col), F.explode(tokens(F.col("text"))).alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v_{b}")
        for b in range(n_bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes, F.count(F.lit(1)).alias("n_tokens"))
    fp = None
    for b in range(n_bits):
        bit = F.when(F.col(f"v_{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp + term
    return agg.select(F.col(id_col), fp.alias("simhash"), "n_tokens")


def simhash_near_duplicates(
    df: DataFrame, max_hamming: int = 3, n_bits: int = 60, id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup pairs via block candidate generation: split the
    fingerprint into (max_hamming+1) blocks — any pair within the Hamming
    radius shares at least one identical block (pigeonhole), so the
    self-join is on block values, never all-pairs."""
    fps = simhash(df, n_bits=n_bits, id_col=id_col)
    n_blocks = max_hamming + 1
    width = n_bits // n_blocks
    blocks = F.array(
        *[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for i in range(n_blocks)
        ]
    )
    keyed = fps.select(
        F.col(id_col), F.col("simhash"), F.posexplode(blocks).alias("blk", "blk_val")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.select(
        "doc_id_a", "doc_id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame, shingle_size: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing >= 1 shingle.

    Candidate generation is an inverted-index self-join: explode distinct
    shingles to (shingle, id), join on shingle, count shared shingles per
    pair — pairs with zero overlap never materialize. At 100 TB add a
    document-frequency cap on hot shingles (stop-shingle pruning) to
    bound the worst bucket.
    """
    # persist: sizes + BOTH sides of the inverted-index self-join read
    # the shingle sets — without it the shingling map runs three times
    sh = fan_out(df).select(
        F.col(id_col), shingle_hashes(F.col("text"), shingle_size).alias("shingles")
    ).persist()
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("n_sh"))
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
