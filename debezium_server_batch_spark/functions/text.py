"""Text analysis for web-page payloads — JVM-side Column functions first,
Arrow pandas UDFs only where built-ins can't express the op.

The reference is payload-agnostic (it ships bytes); these functions are
the training-data-pipeline extensions mandated by BASELINE.json
(input_hint: html binary → text, byte-identical per url; no per-row
Python) and the task brief (lang-id, quality scoring, token counting,
fingerprinting).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# html → text extraction.
#
# Deterministic pure function: UTF-8 decode, drop <script>/<style> blocks,
# strip tags, collapse entities we emit. Vectorized via Arrow (pandas UDF
# over a binary series) — never per-row Python. The synthetic generator
# produces html via wrap_text_as_html() below, so extract == original text
# byte-for-byte (the BASELINE.json per-row invariant).
# --------------------------------------------------------------------------

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text_from_html_bytes(html: bytes | None) -> str | None:
    """Scalar core (unit-testable); the UDF below applies it batch-wise."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Arrow-vectorized html(binary) → text(string)."""
    return html.map(extract_text_from_html_bytes)


def wrap_text_as_html(text: Column) -> Column:
    """Inverse used by the synthetic generator: text → html bytes.

    Escapes '&' and '<' so extraction is exactly inverse (byte-identical
    text on replay)."""
    escaped = F.replace(F.replace(text, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;"))
    return F.encode(F.concat(F.lit("<html><body><p>"), escaped, F.lit("</p></body></html>")), "UTF-8")


# --------------------------------------------------------------------------
# Token counting — whitespace tokens and a BPE-ish sub-word regex count.
# Pure Column expressions (whole-stage codegen; no Python).
# --------------------------------------------------------------------------


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def subword_count(text: Column) -> Column:
    """BPE-ish proxy: count of letter-runs, digit-runs, and punctuation
    singletons — a deterministic stand-in for a tokenizer vocabulary."""
    return F.size(F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1))


# --------------------------------------------------------------------------
# Quality scoring — length / punctuation / alpha / stopword ratios.
# --------------------------------------------------------------------------

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]


def quality_features(text: Column) -> dict[str, Column]:
    """Returns a dict of named quality-feature Columns (all built-in)."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    n_tokens = token_count(text)
    stop_pat = r"(?i)\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(text, F.lit(stop_pat), 1))
    denom = F.greatest(n_chars.cast("double"), F.lit(1.0))
    tok_denom = F.greatest(n_tokens.cast("double"), F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha / denom,
        "digit_ratio": n_digit / denom,
        "punct_ratio": n_punct / denom,
        "stopword_ratio": n_stop / tok_denom,
        "mean_token_len": n_alpha / tok_denom,
    }


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher/C4-style repetition signals — the document-level filters a
    training-data pipeline runs before dedup. All built-in expressions
    (higher-order array functions; zero Python in the row path):

      * n_words          — whitespace token count
      * dup_word_ratio   — fraction of tokens that repeat an earlier one
      * max_word_run     — longest consecutive same-token run, via an
                           aggregate() fold with a struct accumulator

    All three are LINEAR per document (hash-distinct, one fold) — no
    shuffle, pure per-row work. The dominant-bigram share is NOT here:
    counting each bigram's occurrences inside a row expression is
    O(tokens²) per document (measured 24 s vs 1 s at sf0.1) — use
    top_bigram_ratio(), the explode + hash-aggregate DataFrame plan,
    which is linear with map-side partial aggregation."""
    words = F.split(F.trim(text), r"\s+")
    n = F.size(words)
    n_d = F.greatest(n.cast("double"), F.lit(1.0))
    dup_word_ratio = (n - F.size(F.array_distinct(words))) / n_d
    max_word_run = F.aggregate(
        words,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return {
        "n_words": n,
        "dup_word_ratio": dup_word_ratio,
        "max_word_run": max_word_run,
    }


def top_bigram_ratio(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document share of word-bigram occurrences taken by the most
    frequent bigram — the explode + two-level hash-aggregate plan
    (LINEAR in corpus tokens, map-side partial aggregation, AQE-sized
    shuffle on (id, bigram)); the row-expression variant is O(tokens²)
    per document and does not survive long documents. Returns
    (id_col, top_bigram_ratio); documents with <2 tokens get 0.0."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_bigram = (
        df.select(F.col(id_col), F.explode(bigrams).alias("_bg"))
        .groupBy(id_col, "_bg")
        .count()
    )
    ratios = per_bigram.groupBy(id_col).agg(
        (F.max("count") / F.sum("count").cast("double")).alias("top_bigram_ratio")
    )
    return df.select(id_col).join(ratios, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("top_bigram_ratio"), F.lit(0.0)).alias("top_bigram_ratio"),
    )


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0,1]: high alpha ratio, sane token length,
    some stopwords, low digit/punct noise."""
    f = quality_features(text)
    score = (
        F.least(f["alpha_ratio"] * 1.25, F.lit(1.0)) * 0.4
        + F.least(f["stopword_ratio"] * 4.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(f["digit_ratio"] * 5.0, F.lit(1.0))) * 0.15
        + (1.0 - F.least(f["punct_ratio"] * 5.0, F.lit(1.0))) * 0.15
    )
    return score


# --------------------------------------------------------------------------
# Language ID — deterministic stopword-profile heuristic over a handful of
# languages. Built-in expressions only (regexp_count per language).
# --------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "los", "es"],
    "zh": [],  # handled by CJK codepoint ratio below
}


def lang_id(text: Column) -> Column:
    """Best-guess language code by marker-word hit counts; 'zh' when CJK
    characters dominate; 'und' when nothing matches."""
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    scores = []
    for lang, words in _LANG_MARKERS.items():
        if not words:
            continue
        pat = r"(?i)\b(" + "|".join(words) + r")\b"
        scores.append((lang, F.size(F.regexp_extract_all(text, F.lit(pat), 1))))
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, n in scores:
        is_better = n > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, n).otherwise(best_n)
    return F.when(cjk * 4 > F.length(text), F.lit("zh")).otherwise(best)


# --------------------------------------------------------------------------
# Document fingerprinting — 64-bit content hash + positional rolling hash.
# --------------------------------------------------------------------------


def fingerprint64(text: Column) -> Column:
    """Exact 64-bit content fingerprint (xxhash64, JVM-side)."""
    return F.xxhash64(text)


def shingles(text: Column, k: int = 5) -> Column:
    """Array of k-word shingles (token n-grams) — the unit for MinHash /
    Jaccard near-dup (operators/dedup_fuzzy.py)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


# --------------------------------------------------------------------------
# Text normalization — the first cleaning stage of a web corpus
# (CCNet/C4 both normalize before any dedup so that byte-level noise
# doesn't defeat exact-hash matching).
#
# Unicode NFC is the ONE step Spark's built-ins cannot express, so it is
# an Arrow pandas UDF (with a vectorized isascii() fast path — NFC is
# the identity on ASCII, which is most crawl text). Everything else is a
# generated chain of codegen regexp_replace calls; the pattern table is
# restricted to Java-regex ∩ RE2 syntax and the DuckDB oracle expression
# is GENERATED from the same table (clean_text_oracle_expr), so Spark
# and oracle cannot drift.
# --------------------------------------------------------------------------

# applied in order, AFTER NFC. Each entry: (pattern, replacement).
CLEANING_RULES: tuple[tuple[str, str], ...] = (
    (r"\r\n?", "\n"),  # CRLF / bare CR → LF
    (r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""),  # control chars (keep \t \n)
    (r"[\t ]+", " "),  # tab/space runs → one space
    (r" ?\n ?", "\n"),  # spaces hugging a newline
    (r"\n{3,}", "\n\n"),  # 3+ blank lines → paragraph break
    (r"^[\n ]+", ""),  # leading whitespace
    (r"[\n ]+$", ""),  # trailing whitespace
)


@F.pandas_udf(T.StringType())
def nfc_normalize(text: pd.Series) -> pd.Series:
    """Arrow-vectorized Unicode NFC. Identity on ASCII (checked with the
    C-level str.isascii, so the common case never enters unicodedata)."""
    import unicodedata

    def _nfc(s):
        if s is None or s.isascii():
            return s
        return unicodedata.normalize("NFC", s)

    return text.map(_nfc)


def clean_text(text: Column, nfc: bool = True) -> Column:
    """Normalized text: NFC (optional), then CLEANING_RULES in order.
    NULL-safe. With nfc=False the whole expression is codegen."""
    out = nfc_normalize(text) if nfc else text
    for pat, rep in CLEANING_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def clean_text_oracle_expr(expr: str, nfc: bool = True) -> str:
    """DuckDB expression equivalent to clean_text, generated from the
    same CLEANING_RULES table (single-quote SQL literals; patterns are
    RE2-safe by construction)."""
    out = f"nfc_normalize({expr})" if nfc else expr
    for pat, rep in CLEANING_RULES:
        p = pat.replace("\\", "\\\\").replace("'", "''")
        r = rep.replace("\\", "\\\\").replace("'", "''")
        out = f"regexp_replace({out}, E'{p}', E'{r}', 'g')"
    return out


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
):
    """Fixed-size token windows with overlap — the step between a
    cleaned corpus and an embedding/training pipeline: split each
    document into chunks of `chunk_tokens` whitespace tokens, each
    chunk starting `chunk_tokens - overlap` tokens after the previous
    one, the last chunk shortened to the document tail. Returns
    (id, chunk_id, chunk_text, n_tokens); blank documents yield no
    chunks.

    Chunk-count rule (portable integer arithmetic, no float ceil):
    1 chunk when n <= chunk_tokens, else 1 + (n - chunk_tokens +
    stride - 1) // stride — the smallest k whose last window reaches
    the end.

    100-TB shape: pure codegen — split + transform(sequence) + slice +
    posexplode, a map-only projection; output size is input size times
    chunk/(chunk-overlap), no shuffle, no UDF. Token semantics are
    exactly `token_count`'s (trim + split on \\s+), so the DuckDB
    oracle reproduces chunk boundaries and text byte-for-byte."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    trimmed = F.trim(F.col(text_col))
    toks = F.split(trimmed, r"\s+")
    base = (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.length(trimmed) > 0)
        .withColumn("_n", F.size(F.col("_t")))
    )
    n_chunks = (
        F.when(
            F.col("_n") > chunk_tokens,
            F.lit(1)
            + ((F.col("_n") - chunk_tokens + (stride - 1)) / stride).cast("long"),
        ).otherwise(F.lit(1))
    ).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i * stride + 1, chunk_tokens)),
    )
    return (
        base.select(
            F.col(id_col),
            F.posexplode(windows).alias("chunk_id", "chunk_text"),
            F.col("_n"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk_text",
            F.least(
                F.lit(chunk_tokens),
                F.col("_n") - F.col("chunk_id") * stride,
            ).cast("long").alias("n_tokens"),
        )
    )
