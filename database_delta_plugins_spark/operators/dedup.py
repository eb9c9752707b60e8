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
                 equal by pigeonhole); optional exact-Jaccard verify.
* ngram_jaccard— exact Jaccard for pairs found via a (cappable)
                 inverted shingle index.

At 100 TB every candidate generator is guarded against skew the same
way: a per-bucket postings cap (``row_number() <= cap``) bounds the
within-bucket quadratic term against boilerplate shingles / common
simhash chunks / popular minhash bands — the standard production LSH
guard. Capping only affects RECALL (candidates), never precision:
every emitted pair is verified with exact Jaccard computed from the
full shingle sets, fetched by a post-candidate join (arrays are never
dragged through the exploded index). ``*_dropped_postings`` exposes
what a cap discarded so pipelines can audit the recall trade.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType
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
             out: str = "shingles", impl: str = "arrow") -> DataFrame:
    """Distinct word n-gram shingles as an array column (first-occurrence
    order). ``impl='arrow'`` (default): JVM split, then ONE Arrow batch
    kernel doing the window joins — measured 5.7× faster than the pure
    expression at sf0.1 (the Catalyst form pays a concat_ws+slice array
    allocation per position). ``impl='catalyst'``: native exprs
    (split -> sequence -> transform(slice) -> array_distinct), zero
    Python. Output strings are IDENTICAL across impls (parity-tested),
    so every downstream oracle is impl-agnostic."""
    if impl not in ("arrow", "catalyst"):
        raise ValueError(f"impl must be arrow|catalyst, got {impl!r}")
    words = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    if impl == "arrow":
        @pandas_udf("array<string>")
        def _sh(ws: pd.Series) -> pd.Series:
            def go(w):
                if w is None:
                    return None
                w = list(w)
                if len(w) < n:
                    return [" ".join(w)]
                # dict.fromkeys = dedupe preserving first occurrence,
                # matching array_distinct
                return list(dict.fromkeys(
                    " ".join(w[i:i + n]) for i in range(len(w) - n + 1)))
            return ws.map(go)

        return df.withColumn(out, _sh(words))
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


def minhash_signature_arrow(df: DataFrame, shingle_col: str = "shingles",
                            out: str = "minhash") -> DataFrame:
    """MinHash signature, Arrow-vectorized (same pattern as
    ``simhash64_arrow``): shingles are hashed JVM-side (xxhash64 in the
    plan), the 64 permutation-mins run as one numpy batch kernel —
    (total_shingles × 64) broadcast multiply-add mod p, then a
    minimum.reduceat per doc. Bit-identical to ``minhash_signature``
    (identical modular arithmetic; products < 2^62 so int64-exact)."""

    @pandas_udf("array<long>")
    def _sig(hs: pd.Series) -> pd.Series:
        lens = hs.map(lambda a: 0 if a is None else len(a)).to_numpy()
        valid = lens > 0
        out_arr = np.empty(len(hs), dtype=object)
        out_arr[~valid] = None
        if valid.any():
            A = np.asarray(_AS, dtype=np.int64)
            B = np.asarray(_BS, dtype=np.int64)
            vi = np.flatnonzero(valid)
            vlens = lens[valid]
            # block over docs so the (shingles × 64) permutation matrix
            # stays cache-resident (~20 MB/block): one whole-batch
            # materialization is O(total_shingles × 64 × 8 B) — hundreds
            # of MB written+read through the shared memory controller,
            # which made the kernel bandwidth-bound (measured r4)
            block = 256
            for s in range(0, len(vi), block):
                bi = vi[s:s + block]
                bl = vlens[s:s + block]
                flat = np.concatenate(
                    [np.asarray(hs.iloc[i], dtype=np.int64) for i in bi])
                perm = (flat[:, None] * A[None, :] + B[None, :]) % _MERSENNE
                offsets = np.zeros(len(bi), dtype=np.int64)
                np.cumsum(bl[:-1], out=offsets[1:])
                sigs = np.minimum.reduceat(perm, offsets, axis=0)
                for j, i in enumerate(bi):
                    out_arr[i] = sigs[j]
        return pd.Series(out_arr)

    hashed = F.transform(F.col(shingle_col),
                         lambda s: F.abs(F.xxhash64(s)) % _MERSENNE)
    return df.withColumn(out, _sig(hashed))


def _cap_postings(postings: DataFrame, bucket_cols: list[str],
                  cap: int | None) -> DataFrame:
    """Production skew guard: keep only the ``cap`` smallest ids per
    bucket — bounds the within-bucket self-join at cap² regardless of
    how pathological the corpus (boilerplate shingles, constant simhash
    chunks). Affects candidate RECALL only; emitted pairs are always
    exact-verified downstream."""
    if cap is None:
        return postings
    rk = F.row_number().over(Window.partitionBy(*bucket_cols).orderBy("id"))
    return postings.withColumn("_rk", rk).filter(F.col("_rk") <= cap).drop("_rk")


def dropped_postings(postings: DataFrame, bucket_cols: list[str],
                     cap: int) -> DataFrame:
    """Audit view of what _cap_postings discards: one row per
    over-cap bucket with its posting count (count > cap)."""
    return (
        postings.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("postings"))
        .filter(F.col("postings") > cap)
    )


def _verify_exact_jaccard(cand: DataFrame, df: DataFrame, id_col: str,
                          text_col: str, n: int,
                          threshold: float,
                          broadcast_ids: bool = True) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to their full shingle sets
    and keep exact Jaccard >= threshold. Threshold on the RAW ratio;
    rounding only in the projection (oracle boundary parity).

    100-TB shape: the candidate pair set is checkpointed (tiny — pairs
    only; computed ONCE even though three plan branches consume it), and
    the shingle sets are recomputed ONLY for documents that appear in a
    candidate pair (semi-join on raw docs BEFORE the shingle
    projection). Without the explicit prune, Catalyst keeps the
    id-joins above the shingle projection and the full-corpus shingle
    compute runs twice more just to feed the verifier."""
    cand = cand.localCheckpoint(eager=False)
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .dropDuplicates([id_col])
    )
    # ``broadcast_ids`` (default): ship the candidate-doc id set to
    # every executor — the prune is a map-side broadcast semi, the
    # corpus text column is never shuffled to be verified. NOTE the id
    # set size is the GLOBAL count of docs in any candidate pair (the
    # bucket caps bound per-bucket pairs, not this union); at corpus
    # scales where that exceeds broadcast limits (~10^8 candidate docs)
    # pass broadcast_ids=False for a shuffle semi join instead.
    # The pruned base is checkpointed too: sa and sb below are two plan
    # branches of it, and Catalyst has no cross-join common-subtree
    # reuse — uncheckpointed, the scan+shingle pass would run twice.
    idrel = F.broadcast(ids) if broadcast_ids else ids
    base = _shingle_base(df.join(idrel, id_col, "semi"),
                         id_col, text_col, n).localCheckpoint(eager=False)
    sa = base.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"),
                     F.col("n_sh").alias("na"))
    sb = base.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"),
                     F.col("n_sh").alias("nb"))
    j = cand.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        j.withColumn("_j", jac)
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
    )


def _shingle_base(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return (
        shingles(df.select(id_col, text_col), text_col, n=n)
        .select(F.col(id_col).alias("id"), "shingles")
        .withColumn("n_sh", F.size("shingles").cast("double"))
    )


def _band_rows(sigs: DataFrame, bands: int) -> DataFrame:
    """(id, band, band_hash) rows from a 64-minhash signature relation —
    the shared banding step of the batch pair-finder and the persisted
    dedup index (r5). One xxhash64 per band over that band's
    ``rows_per_band`` signature slots."""
    rows_per_band = _N_MINHASH // bands
    return sigs.select(
        "id",
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


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 50,
    impl: str = "arrow",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact jaccard >= threshold).

    bands×rows decomposition of the 64-signature; a pair colliding in any
    band becomes a candidate; exact shingle Jaccard verifies. Bucket-size
    cap bounds the quadratic within-bucket join against boilerplate skew.
    ``impl``: 'arrow' (default — numpy batch signature kernel) or
    'catalyst' (pure-JVM exprs); identical signatures either way.
    """
    if impl not in ("arrow", "catalyst"):
        raise ValueError(f"impl must be arrow|catalyst, got {impl!r}")
    if bands < 1 or _N_MINHASH % bands:
        # bands=128 would make rows_per_band=0 -> ONE global bucket and
        # (capped) near-zero candidates with no error; fail loudly like
        # simhash's n_chunks guard
        raise ValueError(f"bands must divide {_N_MINHASH}, got {bands}")
    base = _shingle_base(df, id_col, text_col, n)
    sigs = (minhash_signature_arrow if impl == "arrow"
            else minhash_signature)(base)
    bandrows = _band_rows(sigs, bands)
    # the band self-join consumes bandrows TWICE (a and b sides); without
    # a checkpoint the whole shingle->signature kernel chain runs twice
    # (r3 VERDICT: minhash_lsh +22%). Materialized rows are narrow
    # (id, band, band_hash — 3 longs x bands per doc), spillable.
    bandrows = _cap_postings(bandrows, ["band", "band_hash"], max_bucket)
    bandrows = bandrows.localCheckpoint(eager=False)
    a = bandrows.select("band", "band_hash", F.col("id").alias("id_a"))
    b = bandrows.select("band", "band_hash", F.col("id").alias("id_b"))
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_exact_jaccard(cand, df, id_col, text_col, n, threshold)


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = 1000) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index join on
    shared shingles (never a cross join).

    The intersection size is AGGREGATED out of the index join itself —
    shingles are distinct per doc, so count(*) per (id_a, id_b) over the
    shared-shingle rows IS |A ∩ B| (hash aggregate with map-side
    combine), and jaccard = shared / (|A| + |B| - shared) needs only a
    join to the tiny per-doc size table. No pair ever drags shingle
    ARRAYS through a shuffle, and the formerly-dominant
    dropDuplicates-then-array-intersect pass over every candidate
    (everything sharing ≥1 shingle — quadratic-ish at low thresholds)
    disappears.

    ``max_df`` caps each shingle's postings list (document frequency) —
    a stop-word shingle appearing in every document would otherwise make
    the index self-join quadratic in corpus size. Capping a shingle
    undercounts intersections that contained it, so the cap trades
    RECALL only (scores can only deflate — never a false positive);
    audit with dropped_postings.

    The shingle base feeds THREE plan branches (the exploded index and
    the two per-doc size relations) and Catalyst has no cross-branch
    common-subtree reuse — uncheckpointed, the full-corpus tokenize+
    shingle pass runs three times (r3 VERDICT: the dominant cost of the
    composed corpus pipeline). localCheckpoint materializes it once
    (MEMORY_AND_DISK, spillable), same pattern as the LSH verify path."""
    base = _shingle_base(df, id_col, text_col, n).localCheckpoint(eager=False)
    ex = base.select("id", F.explode("shingles").alias("sh"))
    # ex also feeds both self-join sides: checkpoint after the cap so the
    # explode + per-shingle window (a shuffle) runs once, not twice —
    # cheap to produce on top of the cached base.
    ex = _cap_postings(ex, ["sh"], max_df).localCheckpoint(eager=False)
    a = ex.select(F.col("id").alias("id_a"), "sh")
    b = ex.select(F.col("id").alias("id_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_shared"))
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = base.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("_shared") / (F.col("na") + F.col("nb") - F.col("_shared"))
    return (
        shared.join(sa, "id_a").join(sb, "id_b")
        .withColumn("_j", jac)
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

    (Formulation note: an allocation-free variant — 64 scalar bit-sum
    folds, counts[i] > 0 ⟺ 2·Σbit_i > n — was measured ~30% SLOWER at
    sf0.1: 64 separate array traversals with per-element lambda dispatch
    lose to this single traversal despite its two 64-wide array
    allocations per token. Keep the single-pass array form.)"""
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


def simhash64_arrow(text_col) -> F.Column:
    """SimHash fingerprint, Arrow-vectorized: token hashes stay JVM-side
    (xxhash64 inside the plan), the bit-count fold runs in numpy over
    the whole Arrow batch at once (unpackbits -> add.reduceat per doc ->
    threshold -> packbits). Bit-identical to ``simhash64`` (2·Σbit_i >
    n ⟺ counts_i > 0; verified exhaustively at sf0.1). r6 re-measured
    the impl choice both ways: isolated noop of the fingerprint alone
    now favors catalyst on Spark 4.1.2 (0.38 s vs 1.41 s), but the
    in-query interleaved A/B favors THIS kernel end-to-end (2.65 s vs
    4.24 s min over 4 alternating rounds) — the giant 64-wide catalyst
    expression pays per-plan compile/codegen costs inside the larger
    candidate pipeline that the isolated pass hides. Arrow remains the
    default (zero per-row Python; one list-comprehension concat per
    batch)."""

    @pandas_udf(LongType())
    def _fp(hs: pd.Series) -> pd.Series:
        lens = hs.map(lambda a: 0 if a is None else len(a)).to_numpy()
        valid = lens > 0
        if not valid.any():
            return pd.Series([None] * len(hs), dtype="object")
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in hs[valid]]).view(np.uint64)
        bits = np.unpackbits(flat.view(np.uint8), bitorder="little").reshape(-1, 64)
        offsets = np.zeros(int(valid.sum()), dtype=np.int64)
        np.cumsum(lens[valid][:-1], out=offsets[1:])
        s = np.add.reduceat(bits, offsets, axis=0)      # (n_docs, 64) bit sums
        n = lens[valid][:, None]
        fpbits = (2 * s > n).astype(np.uint8)           # counts_i > 0
        fp = np.packbits(fpbits, axis=1, bitorder="little") \
            .view(np.uint64)[:, 0].view(np.int64)
        out = np.empty(len(hs), dtype=object)
        out[valid] = fp
        out[~valid] = None
        return pd.Series(out)

    toks = F.split(F.lower(F.trim(text_col)), "\\s+")
    return _fp(F.transform(toks, lambda t: F.xxhash64(t)))


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       max_bucket: int | None = 200,
                       n_chunks: int = 4,
                       impl: str = "arrow") -> DataFrame:
    """Near-dup pairs by SimHash: bucket on each of the ``n_chunks``
    (64/n_chunks)-bit chunks (pigeonhole: hamming <= n_chunks-1 over 64
    bits ⇒ at least one chunk is identical — GUARANTEED recall up to
    that radius; higher radii are caught only by chance), verify Hamming
    distance with bit_count. More chunks = larger guaranteed radius but
    smaller chunk-value space = bigger buckets — the classic multi-index
    hamming trade. ``max_bucket`` caps each chunk bucket's postings —
    boilerplate-heavy corpora share chunk values and would otherwise go
    quadratic at scale. ``impl``: 'arrow' (default — batch numpy
    kernel) or 'catalyst' (pure-JVM expression, zero Python);
    bit-identical fingerprints either way (parity-tested). r6
    re-measured the choice BOTH ways: an isolated noop-sink pass of the
    fingerprint alone now favors catalyst (0.38 s vs 1.41 s — the 4.x
    higher-order evaluator is faster than r4's), but the interleaved
    in-query A/B (4 alternating rounds, same session) favors arrow
    end-to-end (2.65 s vs 4.24 s min): the 64-wide catalyst expression
    tree is re-planned/codegen'd inside the larger candidate plan where
    the kernel compiles once — the in-query number is the one that
    matters, so arrow stays the default."""
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    if impl not in ("arrow", "catalyst"):
        raise ValueError(f"impl must be arrow|catalyst, got {impl!r}")
    width = 64 // n_chunks
    mask = (1 << width) - 1
    fp_fn = simhash64_arrow if impl == "arrow" else simhash64
    fp = df.select(F.col(id_col).alias("id"), fp_fn(F.col(text_col)).alias("fp"))
    fp = fp.filter(F.col("fp").isNotNull())
    chunks = fp.select(
        "id", "fp",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("fp"), width * i).bitwiseAND(F.lit(mask))
            for i in range(n_chunks)
        ])).alias("chunk", "chunk_val"),
    )
    # the chunk self-join consumes the fingerprint relation TWICE (a and
    # b sides) — checkpoint so the SimHash kernel runs once (r4, same
    # pattern as the minhash band join). Rows are narrow (id, fp, chunk).
    chunks = _cap_postings(chunks, ["chunk", "chunk_val"], max_bucket) \
        .localCheckpoint(eager=False)
    a = chunks.select(F.col("id").alias("id_a"), F.col("fp").alias("fp_a"), "chunk", "chunk_val")
    b = chunks.select(F.col("id").alias("id_b"), F.col("fp").alias("fp_b"), "chunk", "chunk_val")
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    # hamming filter BEFORE the pair dedup (r6): the filter is a pure
    # function of the pair's fingerprints, already in hand from the
    # chunk join, so filtered-then-deduped == deduped-then-filtered —
    # but the dedup EXCHANGE then carries only the surviving pairs
    # (sf0.1: ~26k of ~380k joined rows) instead of every multi-chunk
    # collision (guide §2.3: shuffle fewer bytes).
    return (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def simhash_neardup_pairs(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", max_hamming: int = 6,
                          n: int = 3, threshold: float = 0.5,
                          max_bucket: int | None = 200,
                          n_chunks: int = 8,
                          impl: str = "arrow") -> DataFrame:
    """SimHash as the candidate generator, exact n-gram Jaccard as the
    verifier: output pairs (id_a < id_b, jaccard >= threshold) — the
    production near-dup shape (hash for recall, exact for precision),
    and the output is hash-function-free so a SQL oracle can check it.
    Default 8x8-bit chunks: guaranteed recall for hamming <= 7."""
    cand = simhash_candidates(df, id_col, text_col, max_hamming,
                              max_bucket, n_chunks=n_chunks,
                              impl=impl).select("id_a", "id_b")
    return _verify_exact_jaccard(cand, df, id_col, text_col, n, threshold)


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 25,
                         on_nonconverge: str = "raise",
                         driver_max_edges: int | None = None) -> DataFrame:
    """Duplicate-cluster resolution over a near-dup pair graph: assign
    every node the MINIMUM id reachable from it (its component id) —
    the step after pair generation that a dedup pipeline needs to pick
    one canonical document per cluster.

    Spark-first shape: iterative min-label propagation as pure DataFrame
    joins — labels(node, comp); each round (1) pulls min(comp) over
    neighbors through the symmetrized edge list, then (2) POINTER-JUMPS
    TWICE: comp <- min(comp, comp[comp]) via self-joins of the label
    relation (sound: comp[v] is reachable from v, so anything comp[v]
    reaches, v reaches). Each jump doubles how far a label has
    travelled, so a round multiplies reach ~4× and convergence needs
    O(log4 diameter) rounds, not diameter — a CHAIN-shaped near-dup
    graph (low thresholds produce those, not cliques; ADVICE r2) of
    10^6 nodes converges in ~10 rounds where plain propagation needs
    10^6. At 10^9 nodes every join shuffles narrow (node, comp) longs
    only. ``localCheckpoint`` truncates the growing lineage so round
    N's plan does not replay rounds 1..N-1; it is LAZY and materialized
    by the convergence agg itself, so each round is ONE Spark job
    (r4 — the eager-checkpoint-then-collect shape was two, and round
    latency, not data, dominates small/medium graphs). Exhausting
    ``max_iter`` with labels still moving raises (or warns with
    ``on_nonconverge='warn'``) instead of silently returning a
    multi-labelled component.
    """
    if on_nonconverge not in ("raise", "warn"):
        raise ValueError(f"on_nonconverge must be raise|warn, got {on_nonconverge!r}")
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates(["src", "dst"]).localCheckpoint(eager=False)
    # Size the ROUND LOOP's shuffles to the graph, not the session (r5):
    # the near-dup edge set is orders of magnitude smaller than the
    # corpus that produced it (LSH/Jaccard pairs at dedup thresholds),
    # and each round chains ~5 shuffles whose per-partition row counts
    # would be single-digit at session width — the driver-sequenced
    # round latency, not data, dominates (measured: 900-node graph,
    # 5.1 s at 32 partitions + AQE; the same loop at width 1, AQE off,
    # is sub-second). One count materializes the edge checkpoint (the
    # first round needed that anyway) and picks ~100k edges/partition,
    # capped at session width; AQE is scoped OFF for small graphs —
    # every shuffle is already minimal, re-planning each per round only
    # adds driver latency (the apply_batch pattern). Big graphs keep
    # the session's width and AQE untouched.
    spark = pairs.sparkSession
    if driver_max_edges is None:
        driver_max_edges = DRIVER_CC_MAX_EDGES
    # ONE probe job decides the path AND delivers the small-graph edges
    # (r6): limit(max+1).toPandas() — when the graph is under the gate
    # the limit is never hit, so the collected frame IS the full edge
    # set and the former count-then-collect pair (2 jobs) collapses to
    # one. Only the big-graph path still pays a count (for loop width),
    # where it amortizes over the round loop. Same size-gated trade as
    # r5 (≤ ~32 MB on the driver; see DRIVER_CC_MAX_EDGES): below the
    # threshold union-find on the driver beats any number of
    # distributed rounds — ~0.55 s/round of core-count-invariant py4j
    # plan latency was the measured scaling ceiling of
    # dedup_clusters/training_corpus before the gate existed.
    probe = edges.limit(driver_max_edges + 1).toPandas()
    if len(probe) <= driver_max_edges:
        return _cc_driver(spark, edges, pdf=probe)
    n_edges = edges.count()
    sp0 = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loop_sp = max(1, min(sp0, n_edges // 100_000 + 1))
    if loop_sp >= sp0:
        return _cc_rounds(edges, max_iter, on_nonconverge)
    # Scope the narrower width + AQE-off to a CHILD SESSION (same
    # SparkContext, private SQLConf) instead of mutating the shared
    # session's conf — a concurrent query (a streaming foreachBatch on
    # the same session, another thread) planned mid-loop must never see
    # a 1-partition shuffle width (r5 review). Relations cross sessions
    # through GLOBAL temp views — pure JVM plan sharing (a .rdd round
    # trip would pickle every edge through Python, a scale-killer on
    # exactly the large-graph path this branch exists for); the edges
    # view reads the checkpoint the count above materialized, and the
    # small (node, comp) result crosses back the same way so the caller
    # can join it with parent-session relations. Views are dropped
    # after the result binds (its analyzed plan captured the child
    # relation; the name is only needed during analysis).
    # uuid view names: the global-temp namespace is shared across every
    # session of the context, so a counter (or fixed names) would let two
    # concurrent connected_components calls replace each other's edge
    # views and silently compute components of the wrong graph
    import uuid

    tag = uuid.uuid4().hex[:12]
    ename, oname = f"_cc_edges_{tag}", f"_cc_labels_{tag}"
    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", str(loop_sp))
    child.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges.createOrReplaceGlobalTempView(ename)
        out = _cc_rounds(child.table(f"global_temp.{ename}"),
                         max_iter, on_nonconverge)
        out.createOrReplaceGlobalTempView(oname)
        res = spark.table(f"global_temp.{oname}")
        res.schema  # force analysis so the view names can be dropped
        return res
    finally:
        # always drop (even when _cc_rounds raises on non-convergence):
        # a leaked view pins the multi-million-edge checkpoint blocks
        # for the app lifetime
        spark.catalog.dropGlobalTempView(ename)
        spark.catalog.dropGlobalTempView(oname)


#: Edge-count threshold for the driver union-find fast path — the
#: CC analogue of spark.sql.autoBroadcastJoinThreshold: below it the
#: graph is driver-bounded (~16 B/edge, ≤ ~32 MB) and exact union-find
#: beats any number of distributed rounds; above it only the
#: pointer-jumping DataFrame loop scales.
DRIVER_CC_MAX_EDGES = 2_000_000


def _cc_driver(spark, edges: DataFrame, pdf=None) -> DataFrame:
    """Exact min-label components via union-find with path compression
    + union by label (the smaller ROOT LABEL wins every union, so each
    component's root is its minimum id — identical semantics to the
    distributed loop, which also converges every node to the minimum
    reachable id). Generic over the id type: any orderable id column
    (long doc ids, url strings) works, and the output schema carries
    the input's id type — matching the distributed path (r5 review:
    the first cut int()-cast ids and broke string-keyed graphs).
    ``pdf``: the already-collected edge frame from the caller's size
    probe (r6) — skips a second collection job."""
    from pyspark.sql import types as T

    id_type = edges.schema["src"].dataType
    if pdf is None:
        pdf = edges.select("src", "dst").toPandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:      # path compression
            parent[x], x = r, parent[x]
        return r

    # .tolist() converts numpy scalars to plain python values so dict
    # keys and comparisons behave identically for ints and strings
    for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            # min label becomes the root -> root IS the component min
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    out_schema = T.StructType([
        T.StructField("node", id_type, False),
        T.StructField("comp", id_type, False)])
    nodes = list(parent)
    # pandas + explicit schema keeps the Arrow conversion path (a plain
    # list of tuples pickles every row through py4j — seconds of driver
    # time near the 2M-edge ceiling, on the latency fast path)
    return spark.createDataFrame(
        pd.DataFrame({"node": nodes, "comp": [find(n) for n in nodes]}),
        schema=out_schema)


def _cc_rounds(edges: DataFrame, max_iter: int,
               on_nonconverge: str) -> DataFrame:
    labels = (
        edges.select(F.col("src").alias("node"))
        .dropDuplicates(["node"])
        .withColumn("comp", F.col("node"))
    )
    changed = None
    for _ in range(max_iter):
        pulled = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("comp").alias("n_comp"))
        )
        stepped = (
            labels.join(pulled, labels.node == pulled.src, "left")
            .select(
                "node",
                F.col("comp").alias("_prev"),
                F.least(F.col("comp"), F.coalesce("n_comp", "comp")).alias("comp"),
            )
        )
        hop = stepped.select(F.col("node").alias("_hn"), F.col("comp").alias("_hc"))
        j1 = (
            stepped.join(hop, stepped.comp == hop._hn, "left")
            .select(
                "node", "_prev",
                F.least(F.col("comp"), F.coalesce("_hc", "comp")).alias("comp"),
            )
        )
        hop2 = j1.select(F.col("node").alias("_hn"), F.col("comp").alias("_hc"))
        new = (
            j1.join(hop2, j1.comp == hop2._hn, "left")
            .select(
                "node", "_prev",
                F.least(F.col("comp"), F.coalesce("_hc", "comp")).alias("comp"),
            )
            .withColumn("_chg", F.col("comp") < F.col("_prev"))
            .drop("_prev")
        )
        # lazy checkpoint + the convergence agg as the materializing
        # action: one job caches the round's labels AND returns the
        # changed count — no separate materialization pass
        new = new.localCheckpoint(eager=False)
        changed = new.agg(F.sum(F.col("_chg").cast("long"))).collect()[0][0]
        labels = new.drop("_chg")
        if not changed:
            break
    if changed:
        msg = (f"connected_components did not converge in {max_iter} rounds "
               f"({changed} labels still moving) — component ids are NOT "
               "final; raise max_iter (rounds needed ~ log2(diameter) with "
               "pointer jumping)")
        if on_nonconverge == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def dedup_clusters(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 3,
                   threshold: float = 0.5,
                   max_df: int | None = 1000) -> DataFrame:
    """End-to-end near-dup clustering: exact n-gram-Jaccard pairs ->
    connected components -> canonical representative (min id per
    cluster). Output: (doc_id, comp, keep) for every document that
    participates in at least one near-dup pair; keep marks the one
    survivor per cluster (the training-set dedup decision)."""
    pairs = ngram_jaccard_pairs(df, id_col=id_col, text_col=text_col,
                                n=n, threshold=threshold, max_df=max_df)
    comps = connected_components(pairs)
    return comps.select(
        F.col("node").alias(id_col),
        F.col("comp"),
        (F.col("node") == F.col("comp")).alias("keep"),
    )


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8) -> DataFrame:
    """Benchmark decontamination (the eval-leakage guard every serious
    training-data pipeline runs): flag corpus documents sharing ANY word
    n-gram with a benchmark/eval document, with the overlap count — the
    caller drops or audits them.

    Spark-first shape: the benchmark's distinct shingle set is tiny
    relative to the corpus (eval suites are KBs–MBs vs TBs), so it
    BROADCASTS and the corpus-side check is a map-side semi join on the
    exploded corpus shingles — one corpus pass, no corpus-wide shuffle
    of anything but the per-doc hit counts (narrow (id, count) agg).
    Returns (id_col, n_hits, sample_ngram) for contaminated docs only."""
    c = shingles(corpus.select(id_col, text_col), text_col, n=n)
    b = shingles(benchmark.select(text_col), text_col, n=n)
    bset = b.select(F.explode("shingles").alias("sh")).dropDuplicates(["sh"])
    hits = (
        c.select(F.col(id_col).alias("id"), F.explode("shingles").alias("sh"))
        .join(F.broadcast(bset), "sh")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"),
             F.min("sh").alias("sample_ngram"))
    )
    return hits.select(F.col("id").alias(id_col), "n_hits", "sample_ngram")


def sample_by_source(df: DataFrame, rates: dict[str, float],
                     id_col: str = "doc_id", source_col: str = "source",
                     salt: int = 0, default_rate: float = 1.0) -> DataFrame:
    """Deterministic mixture sampling — the corpus-composition knob
    (per-source acceptance rates a la domain reweighting): keep a row
    iff hash(id, salt) mod 10^6 < rate(source)·10^6. Pure arithmetic
    (Knuth multiplicative hash on the id; the salt perturbs the odd
    MULTIPLIER, so a new salt redraws the whole membership rather than
    shifting it), runs identically on any engine/cluster and re-runs
    reproduce the exact sample. One codegen'd filter — no shuffle, no
    RNG state. int64-exact for any NUMERIC id (folded mod 2^31-1 before
    the multiply); non-numeric ids (urls, string keys) fall back to
    xxhash64 — same determinism engine-side, just not mirrorable in
    plain-SQL oracles."""
    # reduce the multiplier mod 10^6 up front: (a*b) mod m == (a*(b mod
    # m)) mod m, so h is IDENTICAL (oracle untouched) while the product
    # stays < 2^31 * 10^6 ~ 2^51 — int64-exact for ANY salt (unreduced,
    # an epoch-seconds salt would overflow int64 under ANSI mode)
    mult = (2654435761 + 2 * int(salt)) % 1_000_000
    idnum = F.coalesce(
        F.col(id_col).try_cast("long"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(int(salt))),
               F.lit(2147483647)),
    )
    h = F.pmod(
        F.pmod(idnum, F.lit(2147483647)) * F.lit(mult),
        F.lit(1_000_000))
    expr = F.lit(int(default_rate * 1_000_000))
    for src, rate in sorted(rates.items()):
        expr = F.when(F.col(source_col) == src,
                      F.lit(int(rate * 1_000_000))).otherwise(expr)
    return df.filter(h < expr)


def mixture_rates(df: DataFrame, targets: dict[str, float],
                  token_budget: int, source_col: str = "source",
                  text_col: str = "text",
                  source_tokens: dict[str, int] | None = None
                  ) -> tuple[dict, dict]:
    """Token-budget mixture PLANNER (r5) — turns the corpus-composition
    spec a data team writes (target mixture weights + a total token
    budget) into the per-source acceptance rates ``sample_by_source``
    consumes, from the corpus's actual per-source token counts.

    rate_s = (token_budget * w_s) / tokens_s, i.e. each source
    contributes ~w_s of the budget in expectation. Weights are used
    unnormalized (pass weights summing to 1). Sources absent from
    ``targets`` get rate 0.0 (excluded). When a source cannot meet its
    share (rate would exceed 1.0), it saturates at 1.0 — the whole
    source is kept — and the shortfall is redistributed over the
    remaining sources by renormalized weight (water-filling), iterating
    until no new source saturates; deterministic (sources processed in
    sorted order).

    One narrow per-source aggregate over the corpus (map-side combined,
    S rows to the driver — S = #sources, never #docs); the returned
    audit carries per-source token counts, planned tokens and the
    saturated set. Compose: ``sample_by_source(df, rates,
    default_rate=0.0)``."""
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    # ``source_tokens``: precomputed per-source counts (whitespace-token
    # convention) — a caller that already aggregated them (e.g. to
    # derive the budget from the total) avoids a second corpus scan
    toks = dict(source_tokens) if source_tokens is not None else {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(
            F.coalesce(
                F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
                      .cast("long")), F.lit(0)).alias("_t")).collect()
    }
    unknown = sorted(set(targets) - set(toks))
    if unknown:
        raise ValueError(f"targets name absent sources {unknown}")
    # a source with zero countable tokens (all-null text: tombstones)
    # can contribute nothing — rate 0.0, never a divide-by-zero
    rates = {s: 0.0 for s in toks if s not in targets or toks[s] == 0}
    active = {s: targets[s] for s in sorted(targets) if toks[s] > 0}
    remaining = float(token_budget)
    scale = 1.0   # 1/sum(active weights); 1.0 while nothing saturated
    while True:
        sat = [s for s in active
               if (remaining * (active[s] * scale)) / toks[s] >= 1.0]
        if not sat:
            break
        for s in sat:
            rates[s] = 1.0
            remaining -= toks[s]
            del active[s]
        wsum = sum(active.values())
        if not active or wsum <= 0 or remaining <= 0:
            for s in active:
                rates[s] = 0.0 if remaining <= 0 else rates.get(s, 0.0)
            active = {}
            break
        scale = 1.0 / wsum
    for s in active:
        # no-saturation fast path keeps the exact (budget * w) / toks
        # float64 op order so a SQL oracle can mirror it verbatim
        rates[s] = ((token_budget * active[s]) / toks[s] if scale == 1.0
                    else (remaining * (active[s] * scale)) / toks[s])
    planned = {s: (toks[s] if rates[s] >= 1.0
                   else int(rates[s] * toks[s])) for s in toks}
    audit = {"tokens": toks, "planned_tokens": planned,
             "saturated": sorted(s for s, r in rates.items() if r >= 1.0),
             "budget": token_budget}
    return rates, audit


# ---------------------------------------------------------------------------
# Persisted minhash dedup index + CDC-driven incremental maintenance (r5).
# The dedup analogue of similarity.py's ANN index upserts: a CDC-maintained
# documents table should not re-minhash the whole corpus to dedup an
# incoming batch — it keeps a banded signature index on disk, refreshes it
# partition-locally from LakeTable.changes(), and probes only the buckets
# an incoming batch touches. Reuses the versioned stage-and-swap store
# (index_write/index_read/_index_upsert) so readers never see a torn index.
# ---------------------------------------------------------------------------

#: Bucket count for the persisted band-row index layout: band_hash mod
#: _MINHASH_INDEX_BUCKETS is the partition column, so an incremental
#: upsert rewrites only touched buckets and a probe statically prunes to
#: the buckets its band hashes land in.
_MINHASH_INDEX_BUCKETS = 64


def _minhash_index_rows(docs: DataFrame, id_col: str, text_col: str,
                        n: int, bands: int, n_buckets: int) -> DataFrame:
    if bands < 1 or _N_MINHASH % bands:
        raise ValueError(f"bands must divide {_N_MINHASH}, got {bands}")
    rows = _band_rows(
        minhash_signature_arrow(_shingle_base(docs, id_col, text_col, n)),
        bands)
    return rows.select(
        F.col("id").alias(id_col), "band", "band_hash",
        F.pmod(F.col("band_hash"), F.lit(n_buckets)).cast("int")
        .alias("_bk"))


def minhash_index_build(docs: DataFrame, index_path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, bands: int = 16,
                        n_buckets: int = _MINHASH_INDEX_BUCKETS,
                        cursor: int | None = None) -> str:
    """Build the persisted banded-minhash dedup index: one (id, band,
    band_hash) row per document per band, partitioned by ``_bk =
    band_hash mod n_buckets`` under the versioned stage-and-swap layout
    (``similarity.index_write``). The index is deliberately UNCAPPED —
    caps are a probe-time recall trade (``minhash_index_candidates``),
    never storage: a capped store could not honor deletes exactly
    (dropping an over-cap posting loses the row a delete should
    promote), and refresh ≡ rebuild is gate-checked."""
    from .similarity import index_write

    # the hash-family config is written INTO the version directory by
    # index_write, before the pointer swap — visible atomically with
    # the rows it describes (a root-level file next to an atomic swap
    # leaves a crash window where config and rows disagree and the
    # guard green-lights the corrupting call it exists to block).
    # Upserts carry it into each new version; upsert/probe validate
    # against it and fail loudly on a mismatched hash family.
    return index_write(
        _minhash_index_rows(docs, id_col, text_col, n, bands, n_buckets),
        index_path, "_bk",
        config={"n": n, "bands": bands, "n_buckets": n_buckets},
        cursor=cursor)


def _check_index_config(index_path: str, n: int, bands: int,
                        n_buckets: int) -> None:
    """Fail loudly when an upsert/probe names a different hash family
    than the index was built with (missing config = pre-r5 index:
    validation is skipped, the caller owns consistency). The config is
    read from the CURRENT VERSION directory (where index_write and
    every upsert place it), so it always describes the rows the
    pointer resolves to."""
    import json
    import os

    from .similarity import _index_root

    p = os.path.join(_index_root(index_path), "_config.json")
    if not os.path.exists(p):
        return
    with open(p) as f:
        cfg = json.load(f)
    got = {"n": n, "bands": bands, "n_buckets": n_buckets}
    if cfg != got:
        raise ValueError(
            f"minhash index at {index_path} was built with {cfg}, "
            f"called with {got} — a mismatched hash family would "
            "silently corrupt the index (upsert) or collide with "
            "nothing (probe)")


def minhash_index_upsert(spark, index_path: str, changes: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 3, bands: int = 16,
                         n_buckets: int = _MINHASH_INDEX_BUCKETS,
                         cursor: int | None = None) -> dict:
    """Incrementally refresh the persisted minhash index from a
    ``LakeTable.changes()`` window: re-shingle and re-sign ONLY the
    changed documents, rewrite only the ``_bk`` buckets their old or
    new band rows live in (stage-and-swap; untouched buckets are
    hardlinked), drop deleted documents' rows everywhere they appear.
    O(changed docs × bands), not O(corpus). The hash family is a pure
    function of the (n, bands) config, so new rows land in the existing
    layout with no retraining; the refreshed index is row-identical to
    a full rebuild over the post-window table (gate-checked). Returns
    the upsert stats + bucket-imbalance drift audit dict."""
    from .similarity import _index_upsert

    _check_index_config(index_path, n, bands, n_buckets)

    def assign(rows: DataFrame) -> DataFrame:
        return _minhash_index_rows(rows, id_col, text_col, n, bands,
                                   n_buckets)

    return _index_upsert(spark, index_path, changes, assign, "_bk",
                         id_col, text_col,
                         source_cols=[id_col, text_col], cursor=cursor)


def minhash_index_refresh(spark, index_path: str, table,
                          id_col: str = "doc_id", text_col: str = "text",
                          n: int = 3, bands: int = 16,
                          n_buckets: int = _MINHASH_INDEX_BUCKETS) -> dict:
    """CONTINUOUS index maintenance (r5): bring the persisted minhash
    index up to date with a LakeTable using the index's own replay
    cursor — the source-table version it reflects, stored in the
    current version directory (written atomically with every swap).
    Build with ``minhash_index_build(..., cursor=table.version)``, then
    call this after every epoch (e.g. from ``CDCPipeline``'s
    ``post_epoch_hooks``): it reads the cursor, upserts exactly the
    ``table.changes(cursor, table.version)`` window, and stamps the new
    cursor with the swap.

    Crash-safe without coordination: a crash after the table commit but
    before the refresh simply leaves the cursor behind, and the next
    call replays the missed window (upserts are window-idempotent); a
    crash mid-refresh leaves an unreferenced staged version the next
    refresh clears. A window spanning a tombstone-PURGING compaction
    raises (changes() refuses to lie about removed deletes — rebuild
    instead); plain compaction emits the rewritten rows and degrades to
    a full-ish refresh, still correct."""
    from .similarity import index_cursor

    v_idx = index_cursor(index_path)
    if v_idx is None:
        raise ValueError(
            f"index at {index_path} carries no refresh cursor — build "
            "with minhash_index_build(..., cursor=table.version) to use "
            "continuous refresh")
    t = table.refresh()
    v_now = t.version
    if v_now <= v_idx:
        return {"refreshed": False, "cursor": v_idx}
    # POST-IMAGE refresh: the CDF window names WHICH keys changed; the
    # index rows come from the table's RESOLVED state for those keys.
    # Applying raw window payloads would be wrong whenever epochs commit
    # out of lsn order (tied-mtime file sources do): a stale upsert in a
    # later-committed epoch would resurrect a key whose newer delete
    # rode an earlier window. Resolved-state lookup is ordering-proof
    # and idempotent; cost stays O(touched keys), the key set prunes the
    # table read.
    keys = (t.changes(v_idx, v_now).select(id_col)
            .dropDuplicates([id_col]).localCheckpoint(eager=False))
    # bucket-pruned post-image read: the keys' bucket set is driver-
    # bounded (<= num_buckets ints) and scan(buckets=...) reads ONLY
    # those buckets' files — the lookup is O(touched buckets), never a
    # full-table resolve per epoch
    bks = sorted({r[0] for r in keys.select(
        t.bucket_expr(F.col(id_col)).alias("_b")).distinct().collect()})
    pool = t.scan(buckets=bks).filter(~F.col("_is_deleted"))
    live = (pool.join(keys, id_col, "semi")
            .select(id_col, text_col))
    gone = keys.join(live.select(id_col), id_col, "left_anti")
    synth = (
        live.select(
            id_col, text_col, F.lit("upsert").alias("_change_type"),
            F.lit(1).cast("long").alias("_lsn"),
            F.lit(0).cast("long").alias("_seq"))
        .unionByName(gone.select(
            id_col, F.lit(None).cast("string").alias(text_col),
            F.lit("delete").alias("_change_type"),
            F.lit(1).cast("long").alias("_lsn"),
            F.lit(0).cast("long").alias("_seq")))
    )
    stats = minhash_index_upsert(
        spark, index_path, synth,
        id_col=id_col, text_col=text_col, n=n, bands=bands,
        n_buckets=n_buckets, cursor=v_now)
    return {"refreshed": True, "cursor": v_now, **stats}


def minhash_index_candidates(spark, index_path: str, new_docs: DataFrame,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             corpus_docs: DataFrame | None = None,
                             threshold: float | None = None,
                             n: int = 3, bands: int = 16,
                             n_buckets: int = _MINHASH_INDEX_BUCKETS,
                             max_bucket: int = 50) -> DataFrame:
    """Probe the persisted index with an INCOMING batch — the dedup
    gate a CDC ingest runs per epoch: which new/updated documents
    near-duplicate something already in the corpus?

    Scale shape: the batch's band rows are computed once (tiny: docs ×
    bands longs) and drive two prunes of the index scan — a STATIC
    partition prune to the ``_bk`` buckets the batch hashes into (the
    bucket list is collected driver-side: ≤ n_buckets ints), then a
    broadcast semi-join on (band, band_hash) so only colliding postings
    survive the scan. The per-bucket cap is applied AFTER those prunes
    (window over the surviving postings only — never a corpus-wide
    shuffle) and bounds boilerplate-band blowup exactly like
    ``minhash_lsh_pairs``. Candidates are exact-Jaccard-verified when
    ``corpus_docs`` + ``threshold`` are given; otherwise the raw
    candidate pair set (id_a < id_b) is returned."""
    from .similarity import index_read

    _check_index_config(index_path, n, bands, n_buckets)
    idx = index_read(spark, index_path)
    q = _minhash_index_rows(new_docs, id_col, text_col, n, bands,
                            n_buckets).localCheckpoint(eager=False)
    bks = [r[0] for r in q.select("_bk").distinct().collect()]
    if not bks:
        # empty-batch relation typed from the CALLER's id column (ADVICE
        # r5: the hardcoded long schema broke string-keyed callers'
        # downstream unions/joins on exactly the empty-batch path)
        from pyspark.sql import types as T

        id_t = new_docs.schema[id_col].dataType
        return spark.createDataFrame([], T.StructType([
            T.StructField("id_a", id_t, True),
            T.StructField("id_b", id_t, True)]))
    pruned = (
        idx.filter(F.col("_bk").isin(bks))
        .join(F.broadcast(q.select("band", "band_hash").distinct()),
              ["band", "band_hash"], "semi")
        .select(F.col(id_col).alias("id"), "band", "band_hash")
    )
    pruned = _cap_postings(pruned, ["band", "band_hash"], max_bucket)
    cand = (
        pruned.join(F.broadcast(q.select(
            "band", "band_hash", F.col(id_col).alias("_qid"))),
            ["band", "band_hash"])
        .filter(F.col("id") != F.col("_qid"))
        .select(F.least("id", "_qid").alias("id_a"),
                F.greatest("id", "_qid").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if corpus_docs is None or threshold is None:
        return cand
    alldocs = (corpus_docs.select(id_col, text_col)
               .unionByName(new_docs.select(id_col, text_col))
               .dropDuplicates([id_col]))
    return _verify_exact_jaccard(cand, alldocs, id_col, text_col, n,
                                 threshold)
