from pyspark.sql import functions as F

from database_delta_plugins_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [(0, "one two three"), (1, "  spaced   out  "), (2, "punct! only?? words"), (3, "")],
        ["id", "text"],
    )
    got = {r["id"]: r["n_tokens"] for r in token_count(df).collect()}
    assert got == {0: 3, 1: 2, 2: 3, 3: 0}


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of the house"),
            (1, "der hund und die katze"),
            (2, "le chat et la maison"),
            (3, "xyzzy plugh"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_quality_score_bounds(spark, sf_dir):
    d = quality_score(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    bad = d.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0
    row = d.filter(F.col("n_tokens") > 0).head()
    assert row["alpha_ratio"] > 0 and row["mean_word_len"] > 0


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([(0, " ABC "), (1, "abc"), (2, "abd")], ["id", "text"])
    got = {r["id"]: r["fp"] for r in fingerprint(df).collect()}
    assert got[0] == got[1] != got[2]


def test_rolling_fingerprint_order_sensitive(spark):
    from database_delta_plugins_spark.operators.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha"), (3, "alpha beta")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["rfp"] for r in rolling_fingerprint(df).collect()}
    assert got[1] == got[3]          # identical text -> identical hash
    assert got[1] != got[2]          # word order matters (md5-of-set wouldn't)
    assert all(0 <= v < (1 << 31) - 1 for v in got.values())


def test_text_stats_signals(spark):
    from database_delta_plugins_spark.operators.text import text_stats

    df = spark.createDataFrame(
        [(1, "The cat and the dog, in a house!"),
         (2, "SHOUTING ALL CAPS"),
         (3, "xq zr kv plmn wrt"),   # no stopwords
         (4, "")],
        "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in text_stats(df).collect()}
    assert got[1]["stopword_ratio"] > 0.4          # the, and, the, in, a
    assert got[1]["punct_ratio"] > 0
    assert got[2]["upper_ratio"] == 1.0
    assert got[3]["stopword_ratio"] == 0.0
    assert got[4]["punct_ratio"] == 0.0 and got[4]["stopword_ratio"] == 0.0


def test_canonicalize_url_rules(spark):
    from database_delta_plugins_spark.operators.text import canonicalize_url

    cases = [
        ("HTTPS://WWW.Site.COM:443/a?b=2&a=1#x", "https://site.com/a?a=1&b=2"),
        ("http://site.com:80", "http://site.com/"),
        ("http://site.com:8080/p", "http://site.com:8080/p"),
        ("https://www.a.b.c/path/?z=1", "https://a.b.c/path/?z=1"),
        ("http://Host.org", "http://host.org/"),
        # a '?' inside the fragment is NOT a query (fragment drops first)
        ("http://a.com/p#sec?x=1", "http://a.com/p"),
        # scheme-less inputs pass through (never collapse to ':///')
        ("example.com/page", "example.com/page"),
        ("//cdn.a.com/x", "//cdn.a.com/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url: string")
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_scrub_pii_cases(spark):
    from database_delta_plugins_spark.operators.text import scrub_pii

    cases = [
        ("mail a.b+c@ex-ample.co.uk now", "mail <EMAIL> now"),
        ("ip 192.168.0.1 end", "ip <IP> end"),
        ("call +1 (555) 010-9999 ok", "call <PHONE> ok"),
        ("call +44 555 0100 now", "call <PHONE> now"),
        ("dial (020) 7946-0958 pls", "dial <PHONE> pls"),
        ("fax 555-0100 sent", "fax <PHONE> sent"),
        ("clean text stays", "clean text stays"),
        # evidence, not digit runs: dates/timestamps/thousands survive
        ("released 2021-06-15 12:30 rev 2020-01-01",
         "released 2021-06-15 12:30 rev 2020-01-01"),
        ("row 10 20 30 40 50 end", "row 10 20 30 40 50 end"),
        ("about 1 000 000 rows", "about 1 000 000 rows"),
        ("revenue 2023 2024 compare", "revenue 2023 2024 compare"),
        # bare space-separated phone: the documented recall trade
        ("call 555 010 9999 ok", "call 555 010 9999 ok"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t: string")
    got = [r["c"] for r in df.select(scrub_pii(F.col("t")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_remove_boilerplate_lines(spark):
    from database_delta_plugins_spark.operators.text import (
        remove_boilerplate_lines,
    )

    docs = [
        (1, "NAV\nbody one\nFOOTER"),
        (2, "NAV\nbody two\nFOOTER"),
        (3, "solo page\nFOOTER"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    out = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in remove_boilerplate_lines(df, max_df=1).collect()}
    assert out[1] == ("body one", 2)
    assert out[2] == ("body two", 2)
    assert out[3] == ("solo page", 1)


def test_chunk_documents_stride_and_tail(spark):
    from database_delta_plugins_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(70))), (2, "a b c")],
        "doc_id: long, text: string")
    rows = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(df, chunk_tokens=32, overlap=8).collect()}
    assert len([k for k in rows if k[0] == 1]) == 3     # ceil((70-8)/24)
    assert rows[(1, 0)][0].startswith("w0 ") and rows[(1, 0)][1] == 32
    assert rows[(1, 1)][0].startswith("w24 ")           # 8-token overlap
    assert rows[(1, 2)][1] == 22                        # tail kept
    assert rows[(2, 0)] == ("a b c", 3)                 # short doc = 1 chunk
    # consecutive chunks overlap by exactly `overlap` tokens
    assert rows[(1, 0)][0].split()[-8:] == rows[(1, 1)][0].split()[:8]


def test_pack_sequences_greedy_boundaries(spark):
    """r5: document-isolated greedy packing — exact fill, overflow
    rollover, over-capacity chunk isolated in its own sequence, and
    documents never share a sequence."""
    from database_delta_plugins_spark.operators.text import pack_sequences

    rows = [
        # doc 1: 10+10 fills cap 20 exactly; 5 starts seq 1
        (1, 0, 10), (1, 1, 10), (1, 2, 5),
        # doc 2: over-capacity chunk (25 > 20) sits alone at seq 0;
        # next chunk opens seq 1
        (2, 0, 25), (2, 1, 3),
        # doc 3: single short chunk
        (3, 0, 7),
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, n_tokens long")
    got = {(r["doc_id"], r["chunk_id"]): (r["seq_id"], r["seq_off"])
           for r in pack_sequences(chunks, capacity=20).collect()}
    assert got == {
        (1, 0): (0, 0), (1, 1): (0, 10), (1, 2): (1, 0),
        (2, 0): (0, 0), (2, 1): (1, 0),
        (3, 0): (0, 0),
    }
    # invariant: non-final sequences of a doc never exceed capacity
    # unless they contain exactly one (over-capacity) chunk
    from pyspark.sql import functions as F
    seqs = (pack_sequences(chunks, capacity=20)
            .groupBy("doc_id", "seq_id")
            .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("k")))
    bad = seqs.filter((F.col("tok") > 20) & (F.col("k") > 1)).count()
    assert bad == 0


def test_repetition_stats_gopher_signals(spark):
    """r5: Gopher repetition arithmetic — top-n-gram char coverage
    (max count, ties to larger char volume), duplicated-5-gram char
    fraction, duplicate-line fractions, and the empty-doc guard."""
    from database_delta_plugins_spark.operators.text import repetition_stats

    rows = [
        (1, "a b a b a b"),                        # top2 'a b' covers all
        (2, "one two three four five six seven"),  # no repeats: tie-break
        (3, "menu item\nmenu item\nunique line"),  # duplicate line
        (4, "  "),                                 # degenerate
        (5, "x y z w v x y z w v x y z w v"),      # every 5-gram repeats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert got[1]["top2_frac"] == 1.0 and got[1]["dup5_frac"] == 0.0
    # all bigrams unique -> tie-break picks the longest ('three four'=9
    # chars of 27 non-space chars)
    assert got[2]["top2_frac"] == 0.3333
    assert got[3]["n_lines"] == 3 and got[3]["dup_line_frac"] == 0.3333
    assert got[3]["dup_line_char_frac"] == 0.3103  # 9 of 29 line chars
    assert got[4] == {"doc_id": 4, "n_lines": 0, "dup_line_frac": 0.0,
                      "dup_line_char_frac": 0.0, "top2_frac": 0.0,
                      "top3_frac": 0.0, "dup5_frac": 0.0, "flagged": False}
    assert got[5]["dup5_frac"] == 1.0 and got[5]["flagged"]
