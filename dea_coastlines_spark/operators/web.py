"""Web-corpus curation: URL canonicalization, registered-domain
extraction, and skew-safe per-domain document caps.

The C4/RefinedWeb-style front half of a pretraining pipeline dedups and
caps BY URL/domain before any content op runs. All of it is JVM string
expressions (regexp_replace / split / filter HOF / array ops) — zero
Python, zero shuffles until the cap's window — and every regex stays in
the RE2-compatible subset (no lookahead/backrefs in patterns) so a
DuckDB oracle can run the identical logic.

The per-domain cap is the one shuffle, and the one skew hazard: one
mega-domain (a 10^9-page host at 100 TB) would funnel through a single
window task. cap_per_domain therefore runs the standard two-stage exact
top-n: stage 1 caps within (domain, salt) sub-groups — bounding any
task at ~rows/salt — stage 2 re-caps the ≤ salt·n survivors per domain.
With a total, deterministic ordering (tie broken on a unique id) the
result is row-identical to the single-window cap; tests pin the parity.

Reference analog: dea-coastlines dedups its input run list / tile ids
with pandas unique() (coastlines/utils.py); a web corpus needs the same
"one representative per key, best-first" at domain granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tracking query parameters dropped by canonical_url. Kept as one
# RE2-safe alternation shared with the DuckDB oracle.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)="

# Two-level public suffixes (tiny built-in slice of the PSL): a host
# ending in one of these keeps THREE labels as its registered domain.
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au", "gov.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "co.in", "co.nz", "co.za",
)

_SCHEME_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of an http(s) URL, as one JVM expression chain:

    1. fragment dropped;
    2. scheme://host lowercased (path/query case preserved);
    3. the scheme's default port dropped (http://…:80, https://…:443 —
       a :443 on plain http is NOT a default and is preserved);
    4. leading www. dropped;
    5. tracking query params (TRACKING_PARAM_RE) dropped, '?' dropped
       when nothing survives;
    6. one trailing '/' on the pre-query part dropped.
    """
    u = F.regexp_replace(url, "#.*", "")
    # lowercase the scheme://host prefix only (substr past the end of
    # the string returns the remainder, so length(u) is a safe width)
    prefix = F.regexp_extract(u, _SCHEME_HOST_RE, 0)
    u = F.concat(F.lower(prefix), u.substr(F.length(prefix) + 1, F.length(u)))
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80($|[/?#])", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443($|[/?#])", r"$1$2")
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    # query-string handling: split once, filter tracking params. The
    # query is everything after the FIRST '?' — a second '?' is legal
    # inside a query string and must stay part of it (substring_index
    # with -1 would take everything after the LAST one).
    base = F.regexp_replace(F.substring_index(u, "?", 1), "/$", "")
    has_q = u.contains("?")
    params = F.split(
        F.substring(u, F.instr(u, "?") + F.lit(1), F.length(u)), "&"
    )
    kept = F.filter(params, lambda p: ~p.rlike(TRACKING_PARAM_RE))
    rebuilt_q = F.when(
        has_q & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.concat(base, rebuilt_q)


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds canon_url, host, and registered_domain columns.

    registered_domain = last 2 host labels, or last 3 when the final 2
    form a SECOND_LEVEL_SUFFIXES entry (co.uk etc.)."""
    canon = canonical_url(F.col(url_col))
    host = F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    suffixes = F.array(*[F.lit(s) for s in SECOND_LEVEL_SUFFIXES])
    take = F.when(
        (n >= 3) & F.array_contains(suffixes, last2), F.lit(3)
    ).otherwise(F.least(n, F.lit(2)))
    reg = F.array_join(F.slice(labels, n - take + 1, take), ".")
    return (
        df.withColumn("canon_url", canon)
        .withColumn("host", host)
        .withColumn("registered_domain", reg)
    )


def cap_per_domain(
    df: DataFrame,
    n: int,
    domain_col: str = "registered_domain",
    order_col: str | None = None,
    id_col: str = "doc_id",
    salt: int = 16,
) -> DataFrame:
    """Keep at most n rows per domain, best-first — exact, skew-safe.

    Ordering is (order_col DESC NULLS LAST, id_col ASC) — total and
    deterministic, so the two-stage salted cap is row-identical to the
    direct single-window cap: every true global top-n row is top-n
    inside its salt bucket, and stage 2 sees all of them among the
    ≤ salt·n survivors. No single task ever holds more than
    ~rows(domain)/salt + salt·n rows, so one mega-domain cannot stall
    the stage."""
    order = (
        [F.col(order_col).desc_nulls_last(), F.col(id_col).asc()]
        if order_col
        else [F.col(id_col).asc()]
    )
    # NULL/empty domains are pass-through, not a cap group: a corpus
    # slice without resolvable domains must not silently collapse to n
    # rows, so each such row gets a per-row key
    dkey = F.coalesce(
        F.nullif(F.col(domain_col), F.lit("")),
        F.concat(F.lit("\x00row:"), F.col(id_col).cast("string")),
    )
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt))
    w1 = Window.partitionBy(dkey, bucket).orderBy(*order)
    survivors = (
        df.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= n)
        .drop("_rn1")
    )
    w2 = Window.partitionBy(dkey).orderBy(*order)
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
