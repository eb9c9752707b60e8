"""Text-analysis operators for training-data pipelines (driver-mandated
beyond-reference surface): language ID, quality scoring, token counting,
document fingerprinting.

All hot paths are native Catalyst expressions (regexp/length/md5 —
whole-stage codegen, no Python). Each has an exact DuckDB-SQL oracle in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker-word heuristic: deterministic, SQL-expressible in both engines.
LANG_MARKERS = [
    ("en", ["the", "and", "of"]),
    ("de", ["der", "die", "und"]),
    ("fr", ["le", "la", "et"]),
    ("es", ["el", "los", "que"]),
    ("zh", ["de5", "shi4", "le5"]),  # romanized placeholders
]

_WORD_RE = "[A-Za-z0-9]+"


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace/punct-robust token count: |matches of [A-Za-z0-9]+|."""
    return df.withColumn(out, F.size(F.regexp_extract_all(F.col(text_col), F.lit(_WORD_RE), 0)))


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 of lowercased trimmed text
    (portable across engines; used as the exact-dedup key)."""
    return df.withColumn(out, F.md5(F.lower(F.trim(F.col(text_col)))))


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Marker-word language ID: first language whose marker count >= 2
    wins (deterministic priority order), else 'und'. N-gram-heuristic
    shaped, fully codegen'd (no UDF). Marker hits are exact TOKEN
    counts (split + filter equality) — the earlier split-on-delimiter
    count consumed the shared space between adjacent repeats ('the the'
    counted 1, not 2)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def _eq(word: str):
        # NOTE: F.filter treats a two-arg lambda as (element, index) —
        # bind the marker via a closure, not a default arg
        return lambda t: t == word

    expr = F.lit("und")
    for lang, words in reversed(LANG_MARKERS):
        hits = sum(
            (F.size(F.filter(toks, _eq(w))) for w in words),
            start=F.lit(0),
        )
        expr = F.when(hits >= 2, F.lit(lang)).otherwise(expr)
    return df.withColumn(out, expr)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/alpha-ratio/mean-word-length quality features + composite
    score in [0,1] — the standard cheap pre-filter for web corpora."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(F.regexp_extract_all(t, F.lit(_WORD_RE), 0))
    # sum of token lengths == count of [A-Za-z0-9] chars, so mean word
    # length needs no array aggregate — one regexp_replace length.
    alpha_chars = F.length(F.regexp_replace(t, "[^A-Za-z0-9]", ""))
    df = (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("alpha_ratio", F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0)))
        .withColumn(
            "mean_word_len",
            F.when(n_tokens > 0, alpha_chars / n_tokens).otherwise(F.lit(0.0)),
        )
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.col("alpha_ratio") * 0.4
        + F.least(F.col("mean_word_len") / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return df.withColumn("quality", score)


_ROLL_MOD = (1 << 31) - 1  # keeps h*31 + codepoint < 2^36: int64-safe (ANSI)
_ROLL_BASE = 31


def rolling_fingerprint(df: DataFrame, text_col: str = "text",
                        out: str = "rfp") -> DataFrame:
    """Polynomial ROLLING-hash document fingerprint (Rabin-Karp shape):
    h = fold over characters of (h * 31 + codepoint) mod (2^31 - 1),
    seed 0. Order-sensitive (unlike md5-of-sorted anything), incremental
    by construction, and pure arithmetic — so the DuckDB oracle mirrors
    it exactly (list_reduce over codepoints with HUGEINT modulus).
    Native Catalyst aggregate over the char array; no Python."""
    chars = F.split(F.lower(F.trim(F.col(text_col))), "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _ROLL_BASE + F.ascii(c)) % _ROLL_MOD,
    )
    return df.withColumn(out, h)


# stopword list shared verbatim with the SQL oracle (English core set —
# the quality-filter convention for web corpora).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "that", "for", "on", "with", "as"]

_PUNCT_RE = r"[!-/:-@\[-`{-~]"


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Punctuation / stopword / uppercase ratio signals — the remaining
    cheap quality-filter features (Gopher/C4-style rules use exactly
    these to drop boilerplate and shouting pages). Pure Catalyst:

    * punct_ratio    — punctuation chars / total chars
    * stopword_ratio — stopword tokens / total tokens (0 when no tokens;
                       near-zero stopword ratio on English text flags
                       keyword-stuffing / non-prose)
    * upper_ratio    — uppercase letters / alphabetic letters
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, _PUNCT_RE, ""))
    toks = F.regexp_extract_all(F.lower(t), F.lit(_WORD_RE), 0)
    n_tokens = F.size(toks)
    stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    return (
        df.withColumn("punct_ratio",
                      F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)))
        .withColumn("stopword_ratio",
                    F.when(n_tokens > 0, stop / n_tokens).otherwise(F.lit(0.0)))
        .withColumn("upper_ratio",
                    F.when(alpha > 0, upper / alpha).otherwise(F.lit(0.0)))
    )


def canonicalize_url(url) -> F.Column:
    """Web-pipeline URL canonicalization (r3) — the dedup key prep every
    crawl ingest needs before url-keyed LWW: the same page crawled as
    `HTTPS://WWW.Site.COM:443/a?b=2&a=1#x` and `https://site.com/a?a=1&b=2`
    must collapse to one key. Deterministic, SQL-mirrorable rules:

    * scheme and host lowercased; `www.` prefix stripped
    * default ports dropped (`:80` for http, `:443` for https)
    * fragment dropped
    * query parameters sorted bytewise (split on `&`, array_sort, rejoin)
    * empty path becomes `/`

    Pure Catalyst (regexp_extract + array ops, codegen'd); the DuckDB
    oracle mirrors each rule with regexp_extract/list_sort."""
    # fragment dropped FIRST — a '?' inside the fragment must not be
    # mistaken for a query separator ('http://a/p#sec?x' has no query)
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    built = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    # scheme-less inputs ('example.com/page', protocol-relative '//…')
    # pass through UNCHANGED — every rule above keys off the scheme, so
    # canonicalizing them would collapse all such urls to one ':///'
    # key and url-keyed LWW would merge unrelated pages
    return F.when(scheme != "", built).otherwise(url)


# PII patterns shared verbatim with the SQL oracle — RE2-safe (no
# backreferences/lookaround; non-capturing groups only — both Java regex
# and DuckDB RE2 accept them). Applied in this exact order (email first
# so its digits are gone before the phone pass). The phone pattern is
# an ALTERNATION requiring real phone evidence: a +country or (area)
# prefix, or a word-bounded dash-separated 3[-3-4[-3-4]] run. Bare
# space-separated digit groups ('1 000 000', 'revenue 2023 2024',
# '555 000 9999' without any prefix) are NOT scrubbed — space-grouped
# thousands are indistinguishable from space-grouped phones, and
# corrupting numeric prose is worse than missing a bare phone (the
# documented recall trade). ISO dates survive the dash branch because
# no \b-aligned 3-digit group precedes their separators.
PII_RULES = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+\d{1,3}[ -](?:\(\d{2,4}\)[ -]?)?\d{3,4}[ -]\d{3,4}(?:[ -]\d{3,4})?"
     r"|\(\d{2,4}\)[ -]?\d{3,4}[ -]\d{3,4}(?:[ -]\d{3,4})?"
     r"|\b\d{3}-\d{3,4}(?:-\d{3,4})?\b",
     "<PHONE>"),
]


def scrub_pii(text) -> F.Column:
    """Training-data PII scrubbing: emails, IPv4 addresses and
    phone-shaped digit runs replaced with typed placeholders — the
    standard pre-training redaction pass. One chained regexp_replace
    projection (codegen'd, global replacement); rule order is part of
    the contract (see PII_RULES)."""
    out = text
    for pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def remove_boilerplate_lines(df: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text", max_df: int = 1,
                             out: str = "clean_text") -> DataFrame:
    """C4-style corpus-level line deduplication: a LINE occurring in more
    than ``max_df`` distinct documents is boilerplate (nav headers,
    cookie banners, footers) and is dropped from EVERY document; each
    document's surviving lines rejoin in original order.

    Spark-first shape: posexplode lines -> global line document-frequency
    (hash agg, map-side combine) -> join frequencies back -> per-doc
    ordered re-assembly via sort_array over (pos, line) structs. The
    frequency agg and the join back key on ``xxhash64(line)`` (8 B), not
    the raw line (r3 VERDICT #5: lines are hundreds of bytes and they
    were the shuffle key of BOTH corpus-wide exchanges); the line string
    itself crosses the wire only once, on the re-assembly side. A 64-bit
    collision merges two lines' document frequencies, which can only
    over-drop the rarer line (recall-style error, ~n_distinct²/2^64 —
    negligible even at 10^10 distinct lines); it can never fabricate
    output text. Returns (id, clean_text, n_removed)."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("_lh", F.xxhash64("line"))
    freq = (
        lines.groupBy("_lh")
        .agg(F.count_distinct("id").alias("_df"))
    )
    kept = (
        lines.join(freq, "_lh")
        .withColumn("_keep", F.col("_df") <= max_df)
    )
    return (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"),
                                   F.struct(F.col("pos"), F.col("line"))))),
                    lambda s: s.getField("line"),
                ),
                "\n",
            ).alias(out),
            F.sum((~F.col("_keep")).cast("long")).alias("n_removed"),
        )
        .select(F.col("id").alias(id_col), out, "n_removed")
    )


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 32,
                    overlap: int = 8) -> DataFrame:
    """Training-prep document chunking: split each document into
    whitespace-token windows of ``chunk_tokens`` with ``overlap`` tokens
    of context carried between consecutive chunks (stride =
    chunk_tokens - overlap) — the standard pretraining packing prep.
    The last window keeps its tail even when short; a document shorter
    than one window yields exactly one chunk.

    Pure Catalyst: split -> sequence over stride starts -> slice ->
    posexplode. Output (id_col, chunk_id, chunk_text, n_tokens); chunks
    of one document are independent rows, so downstream tokenize/pack
    stages parallelize past document granularity."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got "
                         f"{overlap} / {chunk_tokens}")
    stride = chunk_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    # start offsets 0, stride, 2*stride, ... while start < max(n - overlap, 1)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int"),
        F.lit(1))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(words, s + 1, chunk_tokens)))
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    )
    return out.withColumn(
        "n_tokens",
        F.size(F.split(F.col("chunk_text"), r"\s+")).cast("long"))


def pack_sequences(chunks: DataFrame, capacity: int,
                   id_col: str = "doc_id", chunk_col: str = "chunk_id",
                   tokens_col: str = "n_tokens") -> DataFrame:
    """Document-isolated greedy sequence packing (r5) — the pretraining
    step AFTER chunking: chunks are laid into fixed-``capacity`` token
    sequences in chunk order, starting a new sequence whenever the next
    chunk would overflow the current one. Document-isolated (sequences
    never mix documents — the no-cross-document-attention packing
    policy), so the recurrence is per-document and bounded by document
    length, never corpus-sized.

    Pure Catalyst: one narrow (chunk_id, n_tokens) shuffle to regroup a
    document's chunks, then the greedy fold runs JVM-side as an
    ``F.aggregate`` over the sorted chunk array — no Python, no window
    recursion. An over-capacity chunk (n_tokens > capacity) occupies a
    sequence alone rather than erroring: the greedy rule only opens a
    new sequence when the CURRENT one is non-empty.

    Output: (id_col, chunk_id, seq_id, seq_off, n_tokens) — seq_id
    numbers sequences within the document, seq_off is the chunk's token
    offset inside its sequence; a downstream writer materializes packed
    sequences by grouping on (id_col, seq_id) and concatenating at
    seq_off. Composes with ``chunk_documents`` (which it assumes:
    chunk_id dense from 0 in document order); when packing straight off
    raw documents, fuse by calling it on ``chunk_documents(df)`` — the
    regroup shuffle then carries only ints.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    lst = chunks.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct(
            F.col(chunk_col).cast("int").alias("chunk_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        ))).alias("cs"))
    asg_t = ("array<struct<chunk_id:int,seq_id:int,"
             "seq_off:bigint,n_tokens:bigint>>")
    acc0 = F.expr(
        "named_struct('seq', 0, 'used', CAST(0 AS BIGINT), "
        f"'asg', CAST(array() AS {asg_t}))")

    def step(acc, c):
        newseq = (acc["used"] > 0) & \
            (acc["used"] + c["n_tokens"] > F.lit(capacity))
        seq2 = acc["seq"] + newseq.cast("int")
        off = F.when(newseq, F.lit(0).cast("long")).otherwise(acc["used"])
        a = F.struct(c["chunk_id"].alias("chunk_id"),
                     seq2.alias("seq_id"), off.alias("seq_off"),
                     c["n_tokens"].alias("n_tokens"))
        return F.struct(
            seq2.alias("seq"),
            (off + c["n_tokens"]).alias("used"),
            F.concat(acc["asg"], F.array(a)).alias("asg"))

    folded = lst.select(F.col(id_col),
                        F.aggregate("cs", acc0, step).alias("acc"))
    return folded.select(
        id_col, F.explode(F.col("acc.asg")).alias("a")
    ).select(
        id_col,
        F.col("a.chunk_id").alias("chunk_id"),
        F.col("a.seq_id").alias("seq_id"),
        F.col("a.seq_off").alias("seq_off"),
        F.col("a.n_tokens").alias("n_tokens"),
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     top_ns: tuple[int, ...] = (2, 3),
                     dup_ns: tuple[int, ...] = (5,)) -> DataFrame:
    """Gopher-style repetition quality signals (r5) — the
    repetition-removal filter family from Rae et al. 2021 §A1.1 that a
    pretraining pipeline runs between language-ID and dedup:

    - ``dup_line_frac`` / ``dup_line_char_frac``: fraction of trimmed
      non-empty lines (and of their characters) that are repeats of an
      earlier line — boilerplate/menu detection. Computed array-local
      (no shuffle): size vs array_distinct.
    - ``top{n}_frac`` for n in ``top_ns``: characters covered by ALL
      occurrences of the single most frequent word n-gram, over total
      non-space characters. Ties broken toward the larger char volume
      (the conservative, filter-more direction).
    - ``dup{n}_frac`` for n in ``dup_ns``: char-volume fraction of word
      n-gram occurrences that belong to n-grams seen more than once.

    ``flagged`` applies the documented Gopher-ish thresholds
    (dup_line > 0.30, top2 > 0.20, top3 > 0.18, dup5 > 0.15).

    Scale shape: one explode + (id, gram) hash-aggregate + (id) rollup
    per n — every shuffle is keyed by (or prefixed with) the document
    id, so the job is embarrassingly doc-parallel with map-side partial
    aggregation; nothing is corpus-global. Fractions round to 4
    decimals (cross-engine FP discipline)."""
    txt = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(txt, "\n"), lambda x: F.trim(x)),
        lambda x: x != "")
    dist = F.array_distinct(lines)
    chars_of = (lambda arr: F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)))
    n_lines = F.size(lines)
    line_chars = chars_of(lines)
    base = df.select(
        F.col(id_col),
        F.split(F.trim(txt), r"\s+").alias("ws"),
        F.length(F.regexp_replace(txt, r"\s+", "")).cast("long")
        .alias("nchars"),
        n_lines.cast("long").alias("n_lines"),
        F.when(n_lines > 0,
               F.round((n_lines - F.size(dist)) / n_lines, 4))
        .otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(line_chars > 0,
               F.round((line_chars - chars_of(dist)) / line_chars, 4))
        .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
    ).localCheckpoint(eager=False)

    out = base.select(id_col, "nchars", "n_lines", "dup_line_frac",
                      "dup_line_char_frac")
    for kind, ns in (("top", top_ns), ("dup", dup_ns)):
        for n in ns:
            grams = F.when(
                F.size("ws") >= n,
                F.expr(f"transform(sequence(1, size(ws) - {n} + 1), "
                       f"i -> concat_ws(' ', slice(ws, i, {n})))"),
            ).otherwise(F.array().cast("array<string>"))
            g = (base.select(id_col, "nchars",
                             F.explode(grams).alias("gram"))
                 .groupBy(id_col, "nchars", "gram")
                 .agg(F.count("*").alias("cnt"))
                 .withColumn("charvol",
                             F.col("cnt")
                             * (F.length("gram") - (n - 1)).cast("long")))
            if kind == "top":
                col = (base.select(id_col).join(
                    g.groupBy(id_col).agg(
                        (F.max(F.struct("cnt", "charvol"))["charvol"]
                         / F.first("nchars")).alias("_f")),
                    id_col, "left")
                    .select(id_col, F.round(F.coalesce("_f", F.lit(0.0)), 4)
                            .alias(f"top{n}_frac")))
            else:
                col = (base.select(id_col).join(
                    g.groupBy(id_col).agg(
                        (F.sum(F.when(F.col("cnt") > 1, F.col("charvol"))
                               .otherwise(F.lit(0)))
                         / F.sum("charvol")).alias("_f")),
                    id_col, "left")
                    .select(id_col, F.round(F.coalesce("_f", F.lit(0.0)), 4)
                            .alias(f"dup{n}_frac")))
            out = out.join(col, id_col)
    flag = (F.col("dup_line_frac") > 0.30)
    if 2 in top_ns:
        flag = flag | (F.col("top2_frac") > 0.20)
    if 3 in top_ns:
        flag = flag | (F.col("top3_frac") > 0.18)
    if 5 in dup_ns:
        flag = flag | (F.col("dup5_frac") > 0.15)
    return out.drop("nchars").withColumn("flagged", flag)
