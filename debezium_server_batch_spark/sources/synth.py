"""Deterministic synthetic Debezium-shaped event log over web pages.

SURVEY.md M0: the CDC engine needs an input log shaped exactly like what
Debezium Server hands the reference's consumer — flat "unwrap" envelopes
(`{"schema": <connect-json>, "payload": {after-image + __op/__table/
__lsn/__source_ts_ms/__deleted}}`, cf. the reference fixture
json/unwrap-with-schema.json and ConfigSource.java:79-85) — over the
input_hint page shape (url, warc_ts, html, text, lang).

Everything is generated with JVM-side Column expressions seeded through
``xxhash64`` arithmetic: no Python RNG, no driver loops — the generator
itself scales to 10^10 events on a cluster, and the same (n_pages, seed)
always produces byte-identical envelopes (the determinism the replay
invariant needs).

Per-page scenario coverage (mirrors the reference's integration tests,
SURVEY.md §5):
  * first event op = 'r' (snapshot read) for 1 page in 5, else 'c'
  * middle events op = 'u' with a revised text per revision
  * 1 page in 17: final event op = 'd' (drop — delete-tombstone test)
  * 1 page in 10: delete at rev k-2 then re-insert at k-1 (tombstone +
    re-insert, reference BatchSparkChangeConsumerMysqlTest)
  * revisions ≥ `title_from_rev` add a `title` column under a new
    Connect schema (schema-evolution test) — and since offset =
    rev * n_pages + page, schema epochs are contiguous in offset order
  * pages with id < n_hot emit `hot_k` revisions (Zipf-ish hot-url skew)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.connect_schema import struct_to_connect_schema_json
from ..operators.envelope import envelope_value

DESTINATION = "testc.cdcdb.pages"

_VOCAB = (
    "the of and to in is for on with as by from at this that web page data open "
    "archive crawl index text content language model train corpus token word "
    "search query link site html body title news article report science world "
    "time year people system value number small large fast slow green blue red "
    "market share price growth music film game play sport team score match "
    "river mountain city street house garden light dark water fire earth air"
).split()

_LANGS = ["en", "de", "fr", "es", "zh"]

# Connect value schemas: v1, and v2 = v1 + title (schema evolution epoch)
_BASE_FIELDS = [
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts_ms", T.LongType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
]
_META_FIELDS = [
    T.StructField("__op", T.StringType(), True),
    T.StructField("__table", T.StringType(), True),
    T.StructField("__lsn", T.LongType(), True),
    T.StructField("__source_ts_ms", T.LongType(), True),
    T.StructField("__deleted", T.StringType(), True),
]
SCHEMA_V1 = T.StructType(_BASE_FIELDS + _META_FIELDS)
SCHEMA_V2 = T.StructType(_BASE_FIELDS + [T.StructField("title", T.StringType(), True)] + _META_FIELDS)
SCHEMA_V1_JSON = struct_to_connect_schema_json(SCHEMA_V1, name="testc.cdcdb.pages.Value")
SCHEMA_V2_JSON = struct_to_connect_schema_json(SCHEMA_V2, name="testc.cdcdb.pages.Value")

_KEY_SCHEMA_JSON = struct_to_connect_schema_json(
    T.StructType([T.StructField("url", T.StringType(), False)]), name="testc.cdcdb.pages.Key"
)

BASE_TS_MS = 1704067200000  # 2024-01-01T00:00:00Z


def _h(seed: int, *cols) -> F.Column:
    return F.xxhash64(F.lit(seed), *cols)


def generate_event_log(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    n_hot: int = 0,
    hot_k: int = 50,
    base_k: int = 3,
    title_from_rev: int = 2,
    base_ts_ms: int = BASE_TS_MS,
    destination: str = DESTINATION,
) -> DataFrame:
    """Event-log DataFrame (offset, destination, key, value) — see module
    docstring for the scenario matrix. offset = rev * n_pages + page_id
    (unique, monotone per page, interleaves keys across micro-batches
    like a real binlog)."""
    pid = F.col("id")
    k = (
        F.when(pid < n_hot, F.lit(hot_k))
        .otherwise(F.lit(base_k) + F.pmod(_h(seed, pid), F.lit(3)))
        .cast("int")
    )
    # per-PAGE columns are computed BEFORE the revision explode: a page
    # emits 3-64 revision events, and the token-loop base text (the
    # expensive column — ~100 xxhash64+element_at per page) depends only
    # on the page id, so hoisting it above the Generate evaluates it
    # once per page instead of once per event (the explode then carries
    # the ~1 KB string; measured ~2× faster generation, byte-identical
    # output)
    text_len = (F.lit(30) + F.pmod(_h(seed + 3, pid), F.lit(170))).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    base_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), text_len - 1),
            lambda j: F.element_at(vocab, (F.pmod(_h(seed + 4, pid * 1000 + j), F.lit(len(_VOCAB))) + 1).cast("int")),
        ),
    )
    # the html-escaped base is also per-page: the per-revision suffix
    # (" rev<i>") contains no escapable characters, so
    # escape(base + suffix) == escape(base) + suffix and the per-event
    # html build becomes a cheap concat+encode of the hoisted column
    esc_base = F.replace(
        F.replace(base_text, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")
    )
    # the Debezium KEY envelope is a function of the url → per page too
    url_page = F.format_string(
        "https://site-%d.example.com/page/%d", F.pmod(pid, F.lit(37)), pid
    )
    key_page = F.concat(
        F.lit('{"schema":'), F.lit(_KEY_SCHEMA_JSON), F.lit(',"payload":'),
        F.to_json(F.struct(url_page.alias("url"))), F.lit("}"),
    )
    df = (
        spark.range(n_pages)
        .withColumn("k", k)
        .withColumn("_base_text", base_text)
        .withColumn("_esc_base", esc_base)
        .withColumn("_key", key_page)
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.col("k") - 1)))
    )
    i, kk = F.col("i"), F.col("k")
    drop_page = F.pmod(_h(seed + 1, pid), F.lit(17)) == 0
    reinsert_page = (~drop_page) & (F.pmod(_h(seed + 2, pid), F.lit(10)) == 0) & (kk >= 3)

    op = (
        F.when(reinsert_page & (i == kk - 2), F.lit("d"))
        .when(reinsert_page & (i == kk - 1), F.lit("c"))
        .when(drop_page & (i == kk - 1), F.lit("d"))
        .when(i == 0, F.when(F.pmod(pid, F.lit(5)) == 0, F.lit("r")).otherwise(F.lit("c")))
        .otherwise(F.lit("u"))
    )
    is_delete = op == "d"

    url = F.format_string("https://site-%d.example.com/page/%d", F.pmod(pid, F.lit(37)), pid)
    text = F.concat(F.col("_base_text"), F.lit(" rev"), i.cast("string"))
    html = F.encode(
        F.concat(
            F.lit("<html><body><p>"),
            F.col("_esc_base"),
            F.lit(" rev"),
            i.cast("string"),
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in _LANGS]),
        (F.pmod(_h(seed + 5, pid), F.lit(len(_LANGS))) + 1).cast("int"),
    )
    title = F.format_string("Title %d rev %d", pid, i)

    offset = (i.cast("long") * n_pages + pid).alias("offset")
    warc_ts_ms = F.lit(base_ts_ms) + (i.cast("long") * n_pages + pid) * 1000
    src_ts_ms = warc_ts_ms + 500  # commit lags event time

    def nullable(col, dtype="string"):
        return F.when(is_delete, F.lit(None).cast(dtype)).otherwise(col)

    meta = {
        "__op": op,
        "__table": F.lit("pages"),
        "__lsn": offset.cast("long"),
        "__source_ts_ms": src_ts_ms,
        "__deleted": F.when(is_delete, F.lit("true")).otherwise(F.lit("false")),
    }
    common = {
        "url": url,
        "warc_ts_ms": nullable(warc_ts_ms, "long"),
        "html": nullable(html, "binary"),
        "text": nullable(text),
        "lang": nullable(lang),
    }
    payload_v1 = F.struct(*[c.alias(n) for n, c in {**common, **meta}.items()])
    payload_v2 = F.struct(
        *[c.alias(n) for n, c in {**common, "title": nullable(title), **meta}.items()]
    )

    value = F.when(
        i >= title_from_rev, envelope_value(payload_v2, SCHEMA_V2_JSON)
    ).otherwise(envelope_value(payload_v1, SCHEMA_V1_JSON))
    return df.select(
        offset,
        F.lit(destination).alias("destination"),
        F.col("_key").alias("key"),
        value.alias("value"),
    )


def write_event_log(df: DataFrame, path: str, n_files: int = 8) -> None:
    """Persist the log ordered by offset so offset-range scans prune files
    (Parquet min/max row-group stats — the replay fast path)."""
    (
        df.repartitionByRange(n_files, "offset")
        .sortWithinPartitions("offset")
        .write.mode("overwrite")
        .parquet(path)
    )
