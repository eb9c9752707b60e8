"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Spark-first shapes:
* exact        — one hash-groupBy on a md5 fingerprint (map-side combine).
* minhash_lsh  — shingle -> 64 minhashes (native higher-order-function
                 exprs, JVM-side) -> band buckets -> self-join *within
                 buckets only* -> exact-Jaccard verify. The band join is
                 the scale path: candidate pairs ~ O(collisions), never
                 O(n²).
* simhash      — 64-bit fingerprint as a pure Catalyst expression
                 (xxhash64 token hashes, higher-order-function bit
                 counting — JVM codegen, no Python); near-dup candidates
                 via 4×16-bit chunk buckets (Hamming<=3 ⇒ some chunk
                 equal by pigeonhole).
* ngram_jaccard— exact Jaccard on shingle sets for candidate pairs.

At 100 TB: every stage shuffles on a bounded key (fingerprint, band
hash, chunk value); no cross join appears anywhere; skewed buckets
(boilerplate shingles) are capped via ``max_bucket`` to bound the
within-bucket quadratic term — the standard MinHash-LSH production
guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# deterministic 64 hash-function params. Modulus 2^31-1 keeps every
# intermediate product < 2^62 (ANSI-safe: no int64 overflow in h*a+b).
_MERSENNE = (1 << 31) - 1
_N_MINHASH = 64
_AS = [(2 * i + 1) * 0x9E3779B97F4A7C15 % _MERSENNE or 1 for i in range(1, _N_MINHASH + 1)]
_BS = [(i * 0xC2B2AE3D27D4EB4F) % _MERSENNE for i in range(1, _N_MINHASH + 1)]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: one row per distinct normalized text, keeping
    the min-id representative + duplicate count."""
    return (
        df.withColumn("fp", F.md5(F.lower(F.trim(F.col(text_col)))))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 3,
             out: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles as an array column — native exprs:
    split -> sequence -> transform(slice) -> array_distinct."""
    words = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    df = df.withColumn("_w", words)
    sh = F.when(
        F.size("_w") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("_w") - n),
                lambda i: F.concat_ws(" ", F.slice("_w", i + 1, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", "_w")))
    return df.withColumn(out, sh).drop("_w")


def minhash_signature(df: DataFrame, shingle_col: str = "shingles",
                      out: str = "minhash") -> DataFrame:
    """64-wide MinHash signature. Shingles are hashed once (xxhash64);
    each of the 64 permutations is min(a_i*h+b_i mod p) computed with
    native aggregate() lambdas — stays inside codegen, no Python."""
    hashed = F.transform(F.col(shingle_col), lambda s: F.abs(F.xxhash64(s)) % _MERSENNE)
    df = df.withColumn("_sh", hashed)

    def _perm(a: int, b: int):
        return lambda h: (h * a + b) % _MERSENNE

    sig = F.array(*[
        F.array_min(F.transform(F.col("_sh"), _perm(a, b)))
        for a, b in zip(_AS, _BS)
    ])
    return df.withColumn(out, sig).drop("_sh")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    bands×rows decomposition of the 64-signature; a pair colliding in any
    band becomes a candidate; exact shingle Jaccard verifies. Bucket-size
    cap bounds the quadratic within-bucket join against boilerplate skew.
    """
    rows_per_band = _N_MINHASH // bands
    base = minhash_signature(shingles(df.select(id_col, text_col), text_col, n=n))
    bandrows = base.select(
        F.col(id_col).alias("id"),
        F.col("shingles"),
        F.posexplode(
            F.array(*[
                F.xxhash64(F.concat_ws(",", *[
                    F.col("minhash")[b * rows_per_band + r].cast("string")
                    for r in range(rows_per_band)
                ]))
                for b in range(bands)
            ])
        ).alias("band", "band_hash"),
    )
    # cap pathological buckets (boilerplate): keep smallest max_bucket ids
    w_rank = F.row_number().over(
        Window.partitionBy("band", "band_hash").orderBy("id")
    )
    bandrows = bandrows.withColumn("_rk", w_rank).filter(F.col("_rk") <= max_bucket)

    a = bandrows.select("band", "band_hash", F.col("id").alias("id_a"),
                        F.col("shingles").alias("sh_a"))
    b = bandrows.select("band", "band_hash", F.col("id").alias("id_b"),
                        F.col("shingles").alias("sh_b"))
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    # threshold on the RAW ratio (rounding only in the projection) so the
    # cut matches an exact-SQL oracle bit-for-bit at the boundary.
    return (
        cand.withColumn("_j", inter / union)
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join on
    shared shingles (never a cross join): explode shingles, self-join on
    shingle, count shared, |A∪B| = |A|+|B|-shared."""
    base = shingles(df.select(id_col, text_col), text_col, n=n)
    sized = base.withColumn("n_sh", F.size("shingles"))
    ex = sized.select(F.col(id_col).alias("id"), "n_sh",
                      F.explode("shingles").alias("sh"))
    a = ex.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"), "sh")
    b = ex.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        shared.withColumn("_j", jac)
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
    )


# powers of two as signed-64 literals; bit 63 = min-long keeps the sum a
# valid two's-complement bit pattern (bits are distinct, so sum == OR).
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def simhash64(text_col) -> F.Column:
    """64-bit SimHash fingerprint — pure Catalyst expression (token hash
    = xxhash64, JVM-side, whole-stage-codegen; no Python in the path).

    counts[i] = sum over tokens of (bit i of xxhash64(token) ? +1 : -1);
    fingerprint bit i set iff counts[i] > 0.
    """
    toks = F.split(F.lower(F.trim(text_col)), "\\s+")
    hs = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_signs(h):
        # unrolled: shift amounts must be literals
        return F.array(*[
            F.when(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            for i in range(64)
        ])

    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bit_signs(h), lambda a, b: a + b),
    )
    powers = F.array(*[F.lit(p).cast("long") for p in _POW2])
    return F.aggregate(
        F.zip_with(counts, powers,
                   lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on each of the 4 16-bit chunks
    (pigeonhole: hamming<=3 over 64 bits ⇒ at least one of 4 chunks is
    identical), verify Hamming distance with bit_count."""
    fp = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("fp"))
    fp = fp.filter(F.col("fp").isNotNull())
    chunks = fp.select(
        "id", "fp",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("fp"), 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("chunk", "chunk_val"),
    )
    a = chunks.select(F.col("id").alias("id_a"), F.col("fp").alias("fp_a"), "chunk", "chunk_val")
    b = chunks.select(F.col("id").alias("id_b"), F.col("fp").alias("fp_b"), "chunk", "chunk_val")
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
