"""URL canonicalization — the dedup key of every web-crawl pipeline.
The graft's input is a CDC log of web pages keyed by url (BASELINE.json
input_hint); crawlers re-fetch the same page under case-variant hosts,
default ports, tracking query params, and fragments, so exact dedup and
host-level statistics both start by canonicalizing the key.

Rules (deliberately conservative — canonicalization must never merge
two *different* resources):
  1. drop the fragment (``#...`` — client-side only);
  2. lowercase scheme and host (RFC 3986: both case-insensitive);
  3. strip the scheme's default port (``:80`` http / ``:443`` https);
  4. drop tracking-only query params (``utm_*`` prefix; ``fbclid``,
     ``gclid``, ``msclkid``), KEEPING all other params in their
     original order (param order can be semantic; sorting would be a
     lossy guess);
  5. empty path → ``/`` (``http://h`` ≡ ``http://h/``);
  6. a string with no ``scheme://`` is returned unchanged (not a URL
     this operator understands — refusing beats mangling).
We do NOT strip ``www.``, collapse ``//`` in paths, or percent-decode:
all three can change which resource the URL names.

Pure codegen: regexp_extract/replace + higher-order array functions,
all JVM-side, map-only. Pattern syntax is restricted to Java-regex ∩
RE2 and the oracle SQL is GENERATED from the same tracking-param table,
so the DuckDB oracle reproduces the canonical form byte-for-byte.

100-TB shape: a projection fused into the scan — no shuffle. The
canonical url then feeds hash_sample/dedup/groupBy(host) downstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params dropped by rule 4. Prefixes match the param NAME
# prefix (utm_source, utm_campaign, ...); names match exactly (the
# startswith is on "name=", so a param merely *containing* these keeps).
TRACKING_PREFIXES: tuple[str, ...] = ("utm_",)
TRACKING_PARAMS: tuple[str, ...] = ("fbclid", "gclid", "msclkid")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[^/]*//([^/?]*)"
_PATH_RE = r"^[^/]*//[^/?]*([^?]*)"
_QUERY_RE = r"\?(.*)$"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _parts(u: Column) -> tuple[Column, Column, Column, Column, Column]:
    base = F.regexp_replace(u, "#.*", "")
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(base, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(base, _PATH_RE, 1)
    query = F.regexp_extract(base, _QUERY_RE, 1)
    return base, scheme, host, path, query


def _keep_param(p: Column) -> Column:
    cond = p != F.lit("")
    for pref in TRACKING_PREFIXES:
        cond = cond & ~p.startswith(pref)
    for name in TRACKING_PARAMS:
        cond = cond & ~p.startswith(name + "=")
    return cond


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form per the module rules; non-URLs pass through."""
    u = _col(col)
    _, scheme, host, path, query = _parts(u)
    params = F.filter(F.split(query, "&"), _keep_param)
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def url_host(col: Column | str) -> Column:
    """Lowercased host without any port; NULL for non-URLs. The groupBy
    key for per-site statistics, blocklists, and politeness budgets."""
    u = _col(col)
    _, scheme, host, _, _ = _parts(u)
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.regexp_replace(host, ":[0-9]+$", "")
    )


def filter_blocklisted_hosts(
    df, blocklist, url_col: str = "url", host_col: str | None = None
):
    """Drop every row whose host appears in `blocklist` (a DataFrame
    with a single `host` column) — the domain-blocklist stage of a
    crawl pipeline (adult/spam/robots-excluded domains). Matching is on
    the canonical host (``url_host``: lowercased, port stripped), so
    case/port variants of a blocked domain cannot slip through. Rows
    whose url has no parseable host (url_host NULL) are KEPT — the
    blocklist names domains, and a non-URL row is not on it; quarantine
    of malformed rows is the DLQ's job, not the blocklist's.

    With `host_col` given, that column is trusted as the precomputed
    canonical host and `url_col` is ignored.

    100-TB shape: a blocklist is 10^4-10^6 short strings — broadcast
    it; the filter is then a map-only BroadcastHashJoin(LeftAnti) fused
    into the scan, no shuffle of the corpus (plan-asserted in tests)."""
    from pyspark.sql import functions as _F

    h = _F.col(host_col) if host_col else url_host(url_col)
    bl = _F.broadcast(blocklist.select(_F.col("host").alias("_bl_host")).distinct())
    return (
        df.withColumn("_host", h)
        .join(bl, _F.col("_host") == _F.col("_bl_host"), "left_anti")
        .drop("_host")
    )


# ---------------------------------------------------------------- oracle


def _keep_param_sql(var: str) -> str:
    conds = [f"{var} <> ''"]
    conds += [f"NOT starts_with({var}, '{p}')" for p in TRACKING_PREFIXES]
    conds += [f"NOT starts_with({var}, '{n}=')" for n in TRACKING_PARAMS]
    return " AND ".join(conds)


def url_oracle_ctes(text_expr: str, source: str) -> str:
    """DuckDB CTE chain computing ``canonicalize_url``/``url_host`` over
    `text_expr` drawn FROM `source` — generated from the same regexes
    and tracking-param table as the Spark side so they cannot drift.
    Exposes columns (..., canon_url, host) in the final CTE `urlc`."""
    return f"""
            urls AS (
              SELECT *, regexp_replace({text_expr}, '#.*', '') AS _base FROM {source}
            ), urlp AS (
              SELECT *,
                lower(regexp_extract(_base, '{_SCHEME_RE}', 1)) AS _scheme,
                lower(regexp_extract(_base, '{_HOSTPORT_RE}', 1)) AS _hostport,
                regexp_extract(_base, '{_PATH_RE}', 1) AS _path,
                regexp_extract(_base, '{_QUERY_RE}', 1) AS _query
              FROM urls
            ), urlq AS (
              SELECT *,
                CASE WHEN _scheme='http' THEN regexp_replace(_hostport, ':80$', '')
                     WHEN _scheme='https' THEN regexp_replace(_hostport, ':443$', '')
                     ELSE _hostport END AS _host,
                list_filter(string_split(_query, '&'), x -> {_keep_param_sql('x')}) AS _params
              FROM urlp
            ), urlc AS (
              SELECT *,
                CASE WHEN _scheme='' THEN {text_expr} ELSE
                  _scheme || '://' || _host ||
                  (CASE WHEN _path='' THEN '/' ELSE _path END) ||
                  (CASE WHEN len(_params) > 0
                        THEN '?' || array_to_string(_params, '&') ELSE '' END)
                END AS canon_url,
                CASE WHEN _scheme='' THEN NULL
                     ELSE regexp_replace(_host, ':[0-9]+$', '') END AS host
              FROM urlq
            )"""
