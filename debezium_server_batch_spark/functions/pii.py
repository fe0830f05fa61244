"""PII redaction for web-scraped text — the scrub step a training-data
pipeline runs between quality filtering and packing (the reference ships
payloads untouched; this is a pipeline extension, cf. the public
BigScience ROOTS / Dolma scrubbing stages).

Pure codegen: a chain of ``regexp_replace`` projections, no Python in
the hot path. Patterns are deliberately restricted to syntax that means
the same thing in Java regex (Spark) and RE2 (DuckDB oracle): character
classes, ``\\d``, ``\\b``, non-capturing groups, bounded repetition —
so the oracle reproduces the redaction byte-for-byte.

100-TB shape: a map-only projection fused into the scan by whole-stage
codegen — embarrassingly parallel, no shuffle, each executor compiles
the four regexes once per task. Counting and redaction share one pass
over the projection (Catalyst CSE collapses the repeated column read).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# kind -> (pattern, replacement token). INSERTION ORDER IS THE REDACTION
# ORDER and is semantic: email first (its local part may contain digits
# a later numeric rule would mangle), ssn (3-2-4) before phone (3-3-4)
# so each digit run is claimed by exactly one rule. Replacement tokens
# contain no digits or '@', so later rules never re-match earlier output.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def _kinds(kinds: list[str] | None) -> list[str]:
    if kinds is None:
        return list(PII_PATTERNS)
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; have {list(PII_PATTERNS)}")
    # preserve canonical order regardless of caller order — redaction
    # order is part of the operator's contract
    return [k for k in PII_PATTERNS if k in kinds]


def redact_pii(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace every occurrence of each PII kind with its token, in
    canonical order. Returns a string Column; codegen end-to-end."""
    out = F.col(col) if isinstance(col, str) else col
    for k in _kinds(kinds):
        pattern, token = PII_PATTERNS[k]
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind in the RAW text (count before you
    redact — after redaction the matches are gone). Long Column."""
    (pattern, _), = [PII_PATTERNS[k] for k in _kinds([kind])]
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern)).cast("long")


def pii_oracle_sql(text_expr: str, kinds: list[str] | None = None) -> str:
    """The DuckDB expression computing exactly ``redact_pii`` over
    `text_expr` — kept next to the patterns so query and oracle can't
    drift. DuckDB's regexp_replace replaces only the FIRST match unless
    passed the 'g' option; Spark's replaces all, hence 'g' here."""
    out = text_expr
    for k in _kinds(kinds):
        pattern, token = PII_PATTERNS[k]
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{token}', 'g')"
    return out


def pii_count_oracle_sql(text_expr: str, kind: str) -> str:
    """DuckDB expression matching ``pii_count`` (len of extract-all —
    DuckDB's regexp_count counts non-overlapping matches identically,
    but len(regexp_extract_all) works on every DuckDB version here)."""
    (pattern, _), = [PII_PATTERNS[k] for k in _kinds([kind])]
    p = pattern.replace("'", "''")
    return f"CAST(len(regexp_extract_all({text_expr}, '{p}')) AS BIGINT)"
