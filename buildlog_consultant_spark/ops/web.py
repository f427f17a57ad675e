"""URL canonicalization + URL-keyed dedup — the crawl-side identity pass
of a web pipeline (the same page arrives as http/https, with and without
default ports, tracking parameters, fragments, duplicate slashes; a
corpus deduped on raw URLs keeps all of them).

Everything is JVM-side (`parse_url` + regexp/HOF expressions — no
Python), and the transform is replayable in plain Python with
urllib.parse for the golden oracle (`py_canonical_url`, kept adjacent so
the two stay in lockstep).

Canonical form: ``scheme://host[:port]/path[?query]`` with
- scheme and host lowercased, userinfo dropped;
- default ports stripped (http:80, https:443);
- path: duplicate slashes collapsed, one trailing slash stripped
  (except the root path), empty path → '/';
- query: tracking parameters removed (utm_*, gclid, fbclid, msclkid,
  mc_eid), empty query dropped;
- fragment always dropped.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_PATTERN = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_eid)="


def canonical_url(url) -> Column:
    """Canonicalized URL as a Catalyst expression (see module doc).
    Uses try_parse_url — under Spark 4's default ANSI mode, plain
    parse_url THROWS SparkIllegalArgumentException on an invalid URL
    (same failure class as ANSI divide-by-zero): one malformed crawl
    URL must return NULL, not kill the job."""
    u = F.col(url) if isinstance(url, str) else url
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    # greedy ^.*@ strips through the LAST @ — java.net.URI/urlsplit
    # userinfo semantics; a lazy ^[^@]*@ stripped only to the first @
    # and broke both oracle parity and idempotence on 'a@b@host' forms
    auth = F.lower(
        F.regexp_replace(F.try_parse_url(u, F.lit("AUTHORITY")), r"^.*@", "")
    )
    host = (
        F.when(proto == "http", F.regexp_replace(auth, r":80$", ""))
        .when(proto == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(.)/$", r"$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


_TRACK_RE = re.compile(TRACKING_PARAM_PATTERN)


def py_canonical_url(u: str):
    """Python replay of canonical_url — byte-identical for oracle
    construction (urllib.parse mirrors parse_url's java.net splitting for
    the URL shapes the pipeline plants/tests; parity pinned in tests).
    Returns None for structurally unparseable URLs (no scheme/host, or
    embedded whitespace) to mirror try_parse_url's NULL — an
    approximation of java.net.URI's full validity rules, exact for the
    planted/tested shapes."""
    from urllib.parse import urlsplit

    if u is None or any(c.isspace() for c in u):
        return None
    sp = urlsplit(u)
    if not sp.scheme or not sp.netloc:
        return None
    proto = sp.scheme.lower()
    auth = sp.netloc.lower().split("@")[-1]
    if proto == "http" and auth.endswith(":80"):
        auth = auth[: -len(":80")]
    elif proto == "https" and auth.endswith(":443"):
        auth = auth[: -len(":443")]
    path = re.sub(r"/{2,}", "/", sp.path)
    path = re.sub(r"(.)/$", r"\1", path)
    if path == "":
        path = "/"
    kept = [p for p in sp.query.split("&") if p and not _TRACK_RE.match(p)]
    qs = "&".join(kept)
    return f"{proto}://{auth}{path}" + (f"?{qs}" if qs else "")


def url_dup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of rows whose URLs canonicalize identically:
    (canon_url, n_dups, min_id) for groups of ≥ 2 — the audit view.
    One hash-agg shuffle keyed on the canonical URL (map-side combined);
    the canonicalization itself is a scan-side expression.

    Unparseable URLs (canonical form NULL — relative URLs, NULL input,
    no scheme) are EXCLUDED: a NULL group would report every
    unparseable URL in the corpus as one giant duplicate set."""
    return (
        df.select(canonical_url(url_col).alias("canon_url"), F.col(id_col))
        .where(F.col("canon_url").isNotNull())
        .groupBy("canon_url")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("min_id"))
        .where(F.col("n_dups") > 1)
    )


def dedup_by_canonical_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """The dedup ENDPOINT: keep the lowest-id row per canonical URL.
    Same shape as dedup_exact (ops/dedup.py): group → min id → left-semi
    join back, all keyed on the canonical form.

    NULL policy (rows are never silently dropped without identity
    evidence): rows whose URL fails to canonicalize (canonical NULL) and
    rows with a NULL id are KEPT unconditionally — a NULL canonical
    carries no duplicate evidence, and a NULL id can't win or lose a
    min-id contest (the pre-fix non-null-safe join silently dropped
    them)."""
    canon = df.withColumn("_canon", canonical_url(url_col))
    passthrough = canon.where(
        F.col("_canon").isNull() | F.col(id_col).isNull()
    )
    dedupable = canon.where(
        F.col("_canon").isNotNull() & F.col(id_col).isNotNull()
    )
    keep = (
        dedupable.groupBy("_canon")
        .agg(F.min(id_col).alias("_keep_id"))
        .select("_keep_id")
    )
    kept = dedupable.join(keep, dedupable[id_col] == keep["_keep_id"], "left_semi")
    return kept.unionByName(passthrough).drop("_canon")


# eTLD+1 approximation: a compact common-cc-SLD alternation instead of
# the full Public Suffix List (thousands of entries, updated upstream —
# shipping it would be data, not code; the alternation covers the
# dominant two-level suffixes and degrades to last-2-labels elsewhere,
# which is exactly what a crawl pipeline wants from a DEPENDENCY-FREE
# approximation). Leftmost-match semantics pick the SHORTEST suffix
# position that still anchors at $: for a.b.co.uk the first matchable
# start is 'b.co.uk' (3-label branch), for a.b.c.d it is 'c.d'.
# Identical in Java regex (Spark) and RE2 (DuckDB) — no backrefs, no
# lookaround, so the same string is both the operator and the oracle.
REG_DOMAIN_PATTERN = (
    r"[^.]+\.(?:co\.(?:uk|jp|nz|za|in|kr)"
    r"|com\.(?:au|br|cn|mx|tw|sg|hk|ar)"
    r"|org\.(?:uk|au)|ac\.uk|gov\.uk|net\.au)$"
    r"|[^.]+\.[^.]+$"
)


def registered_domain(host) -> Column:
    """Registered domain (eTLD+1 approximation, see REG_DOMAIN_PATTERN)
    of a hostname Column: 'blog.site.co.uk' → 'site.co.uk',
    'www.site.com' → 'site.com'. Single-label hosts (no dot —
    'localhost', IP-less intranet names) fall back to the host itself;
    NULL stays NULL. Pure scan-side JVM expression — the per-domain
    groupBy this feeds is the only shuffle, keyed on a low-cardinality
    string (domains « hosts « URLs)."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    m = F.regexp_extract(h, REG_DOMAIN_PATTERN, 0)
    # NULL host needs no guard: regexp_extract(NULL) is NULL, so the
    # m == '' test is null (not true) and otherwise(m) yields NULL
    return F.when(m == "", h).otherwise(m)


def domain_stats(
    df: DataFrame, host_col: str = "host", id_col: str = "doc_id"
) -> DataFrame:
    """Per-registered-domain rollup — the crawl-side view domain quotas
    and robots policies key on: (reg_domain, n_docs, n_hosts, min_id).
    ONE hash agg over corpus rows (map-side combined); distinct hosts
    per domain are counted exactly (bounded: hosts per reg-domain is
    crawl-limited, and countDistinct within a domain group is a
    two-phase hash agg, not a sort)."""
    return (
        df.select(
            registered_domain(host_col).alias("reg_domain"),
            F.lower(F.col(host_col)).alias("_host"),
            F.col(id_col),
        )
        .groupBy("reg_domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("_host").alias("n_hosts"),
            F.min(id_col).alias("min_id"),
        )
    )
