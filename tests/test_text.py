"""Text functions: extraction inverse, token counting, quality, lang-id,
shingles, fingerprints."""

from pyspark.sql import functions as F

from debezium_server_batch_spark.functions.text import (
    extract_text,
    extract_text_from_html_bytes,
    fingerprint64,
    lang_id,
    quality_features,
    quality_score,
    shingles,
    subword_count,
    token_count,
    wrap_text_as_html,
)


def test_extract_is_exact_inverse_of_wrap(spark):
    texts = ["plain words here", "a & b < c", "unicode: héllo wörld 中文", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.withColumn("html", wrap_text_as_html(F.col("text"))).withColumn(
        "back", extract_text(F.col("html"))
    )
    assert out.filter(F.col("back") != F.col("text")).count() == 0


def test_extract_scalar_strips_tags_and_scripts():
    html = b"<html><head><script>var x=1;</script></head><body><p>keep me</p><style>a{}</style></body></html>"
    assert extract_text_from_html_bytes(html) == "keep me"
    assert extract_text_from_html_bytes(None) is None
    assert extract_text_from_html_bytes(b"a &amp; b &lt;ok&gt;") == 'a & b <ok>'


def test_token_count(spark):
    df = spark.createDataFrame([("one two  three",), ("",), ("   ",), ("solo",)], "t string")
    out = [r[0] for r in df.select(token_count(F.col("t"))).collect()]
    assert out == [3, 0, 0, 1]
    sw = df.select(subword_count(F.col("t"))).collect()
    assert sw[0][0] == 3 and sw[1][0] == 0


def test_quality_features_and_score(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to the hills"
    bad = "@@@@ 1234 5678 $$$$ %%%%"
    df = spark.createDataFrame([(good,), (bad,)], "t string")
    feats = quality_features(F.col("t"))
    rows = df.select(
        quality_score(F.col("t")).alias("score"), feats["alpha_ratio"].alias("ar"),
        feats["stopword_ratio"].alias("sr"),
    ).collect()
    assert rows[0]["score"] > rows[1]["score"]
    assert rows[0]["ar"] > 0.7 and rows[1]["ar"] < 0.1
    assert rows[0]["sr"] > 0.2


def test_lang_id(spark):
    samples = [
        ("the cat and the dog is on the mat with the hat", "en"),
        ("der hund und die katze ist nicht hier und der mann", "de"),
        ("le chat et la maison est sur les toits et le chien", "fr"),
        ("el perro y la casa es grande y los gatos que corren", "es"),
        ("这是一个中文句子没有任何英文单词", "zh"),
    ]
    df = spark.createDataFrame(samples, "t string, expected string")
    out = df.select("expected", lang_id(F.col("t")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["expected"], r


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d e",), ("a b",)], "t string")
    rows = df.select(shingles(F.col("t"), k=3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d", "c d e"]
    assert rows[1]["s"] == ["a b"]  # shorter than k → whole doc


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("same",), ("same",), ("diff",)], "t string")
    fps = [r[0] for r in df.select(fingerprint64(F.col("t"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_repetition_features_and_top_bigram(spark):
    import pytest
    from pyspark.sql import functions as F

    from debezium_server_batch_spark.functions.text import (
        repetition_features,
        top_bigram_ratio,
    )

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x"), (3, "w1 w2 w1 w2 w1"), (4, "")],
        "doc_id long, text string",
    )
    f = repetition_features(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            f["n_words"].alias("n"),
            F.round(f["dup_word_ratio"], 6).alias("d"),
            f["max_word_run"].alias("m"),
        ).collect()
    }
    assert (rows[1]["n"], rows[1]["m"], rows[1]["d"]) == (4, 3, 0.5)  # run of 3 a's
    assert (rows[2]["n"], rows[2]["m"], rows[2]["d"]) == (1, 1, 0.0)  # single token
    assert (rows[3]["m"], rows[3]["d"]) == (1, 0.6)  # alternation: no runs, heavy dup
    bg = {r["doc_id"]: r["top_bigram_ratio"] for r in top_bigram_ratio(df).collect()}
    assert bg[2] == 0.0 and bg[4] == 0.0  # <2 tokens → no bigrams
    assert bg[1] == pytest.approx(2 / 3)  # "a a" twice of 3 bigrams
    assert bg[3] == pytest.approx(0.5)  # "w1 w2" twice of 4 bigrams


def test_clean_text_normalization(spark):
    """NFC (decomposed accents + the U+2126 singleton), control-char
    strip, CRLF folding, run squeezing, and edge trimming — against the
    DuckDB oracle expression generated from the same rule table."""
    import duckdb

    from debezium_server_batch_spark.functions.text import (
        clean_text,
        clean_text_oracle_expr,
    )

    hostile = [
        "cafe\u0301 and \u2126 resistance",  # decomposed accent + OHM SIGN
        "a\tb\x07c   d",
        "line1  \r\n\r\n\r\n\r\n  line2",
        "  \n\n leading and trailing \n  ",
        "",
        None,
        "plain ascii text",
        "\x0b\x0cvertical tab and form feed",
        "already clean",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(hostile)], "i long, t string"
    )
    got = {r["i"]: r["c"] for r in df.select("i", clean_text("t").alias("c")).collect()}

    # spot-checks of the semantics themselves
    assert got[0] == "café and Ω resistance"  # composed forms
    assert got[1] == "a bc d"
    assert got[2] == "line1\n\nline2"
    assert got[3] == "leading and trailing"
    assert got[5] is None

    con = duckdb.connect(":memory:")
    con.execute("CREATE TABLE h(i BIGINT, t VARCHAR)")
    con.executemany(
        "INSERT INTO h VALUES (?, ?)", [(i, s) for i, s in enumerate(hostile)]
    )
    exp = dict(
        con.sql(f"SELECT i, {clean_text_oracle_expr('t')} FROM h").fetchall()
    )
    assert got == exp  # byte-for-byte engine parity


def test_clean_text_codegen_without_nfc(spark):
    """nfc=False keeps the whole expression JVM-side: no Python eval in
    the plan."""
    from debezium_server_batch_spark.functions.text import clean_text

    df = spark.createDataFrame([(1, " a\r\nb ")], "i long, t string")
    out = df.select(clean_text("t", nfc=False).alias("c"))
    assert out.collect()[0]["c"] == "a\nb"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_chunk_documents_semantics(spark):
    """Window coverage rules: single chunk when n <= chunk; overlapping
    windows at stride = chunk - overlap; last chunk shortened to the
    tail; stride-strided prefixes reconstruct the original token
    stream; blank docs vanish."""
    import pytest as _pytest

    from debezium_server_batch_spark.functions.text import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),   # n=10 <= 8? no: chunk 8 below
        (2, " ".join(f"x{i}" for i in range(5))),    # n=5 -> 1 chunk
        (3, ""),                                      # blank -> no chunks
        (4, "   "),                                   # whitespace only -> none
        (5, " ".join(f"y{i}" for i in range(17))),   # n=17, chunk 8, stride 6 -> k=1+ceil(9/6)=3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=8, overlap=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"], r["n_tokens"]))
    for v in got.values():
        v.sort()
    assert set(got) == {1, 2, 5}
    # doc 2: one whole chunk
    assert got[2] == [(0, " ".join(f"x{i}" for i in range(5)), 5)]
    # doc 1: n=10 > 8 -> k = 1 + ceil(2/6) = 2; second starts at token 6
    assert [c[0] for c in got[1]] == [0, 1]
    assert got[1][0][1].split() == [f"w{i}" for i in range(8)]
    assert got[1][1][1].split() == [f"w{i}" for i in range(6, 10)]
    assert got[1][1][2] == 4
    # doc 5: 3 chunks at starts 0, 6, 12; overlap = 2 tokens shared
    assert [c[0] for c in got[5]] == [0, 1, 2]
    assert got[5][1][1].split()[:2] == got[5][0][1].split()[-2:]
    assert got[5][2][1].split() == [f"y{i}" for i in range(12, 17)]
    # reconstruction: chunk i's tokens after the overlap prefix continue the stream
    toks = []
    for cid, text, _n in got[5]:
        t = text.split()
        toks.extend(t if cid == 0 else t[2:])
    assert toks == [f"y{i}" for i in range(17)]
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
