"""URL/domain operators for web-corpus curation — JVM built-ins only.

Web-scale training pipelines dedup and stratify by URL before any text
ever moves: canonicalize (case, ports, tracking params, fragments), keep
one doc per canonical URL, and budget/attribute per host or registered
domain. Every operator here is pure ``pyspark.sql.functions`` expressions
(whole-stage codegen, map-only until the one dedup/rollup shuffle) with
exact ANSI-SQL twins runnable in DuckDB, so each is oracle-checkable by
the driver harness — same contract as ``ops/text.py``.

Canonicalization rule (documented, deterministic — the point is a STABLE
dedup key, not RFC 3986 completeness):

1. trim; drop the ``#fragment``;
2. lowercase the ``scheme://host[:port]`` head (path/query case is
   preserved — significant on most servers);
3. strip default ports (``http…:80``, ``https…:443``);
4. collapse duplicate ``//`` in the path, strip trailing slashes;
5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``), sort the
   surviving query params bytewise; an emptied query drops its ``?``.

Idempotence (canonical(canonical(u)) == canonical(u)) is test-gated, and
the whole rule is cross-checked against an independent stdlib
``urllib.parse`` implementation in tests/test_web.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid)="
# common two-level public suffixes for the registered-domain heuristic;
# a real deployment swaps in the full Mozilla public-suffix list — the
# OPERATOR (suffix-aware label grouping) is what scales, the table is data
TWO_LEVEL_TLDS = ("co.uk", "ac.uk", "gov.uk", "com.au", "net.au",
                  "co.jp", "co.kr", "com.br", "com.cn", "co.in")


def canonical_url(col) -> Column:
    """Composable canonical-URL expression (steps in the module docstring).

    Pure per-row JVM string/regexp built-ins — map-only, pushes past the
    scan; the regex subset used (character classes, alternation, anchors,
    bounded quantifiers) behaves identically in Java regex and RE2, so the
    DuckDB oracle twin is exact.
    """
    u = F.regexp_replace(F.trim(col), "#.*$", "")
    head = F.regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    head_lc = F.lower(head)
    head_np = F.regexp_replace(
        F.regexp_replace(head_lc, "^(http://[^/:?#]+):80$", "$1"),
        "^(https://[^/:?#]+):443$", "$1")
    rest = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    path = F.regexp_extract(rest, "^[^?]*", 0)
    path_norm = F.regexp_replace(
        F.regexp_replace(path, "/{2,}", "/"), "/+$", "")
    # everything after the FIRST '?' (path is the maximal '?'-free prefix,
    # so length arithmetic splits correctly even if the query itself holds
    # a literal '?')
    query = F.when(rest.contains("?"),
                   F.substring(rest, F.length(path) + 2, F.lit(1 << 30))
                   ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qjoined = F.array_join(F.array_sort(params), "&")
    return F.concat(
        head_np, path_norm,
        F.when(qjoined != "", F.concat(F.lit("?"), qjoined))
        .otherwise(F.lit("")))


def host_of(col) -> Column:
    """Lowercased host (no port) of a URL — works on raw or canonical."""
    return F.lower(F.regexp_extract(col, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))


def registered_domain(col) -> Column:
    """Registrable domain of a host column: last two labels, or last THREE
    when the last two form a known two-level public suffix (co.uk etc. —
    see TWO_LEVEL_TLDS). ``blog.shop.example.co.uk`` -> ``example.co.uk``,
    ``a.b.example.com`` -> ``example.com``; bare/1-label hosts pass
    through. Pure split/slice/array built-ins."""
    labels = F.split(col, "\\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    take = F.when(last2.isin(*TWO_LEVEL_TLDS), F.lit(3)).otherwise(F.lit(2))
    return F.when(n <= take, col).otherwise(
        F.array_join(F.slice(labels, n - take + 1, take), "."))


def with_canonical_url(docs: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    """Project the canonical URL alongside the existing columns (map-only)."""
    return docs.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dedup(docs: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """One doc per canonical URL: the survivor is the MINIMUM ``id_col``
    (deterministic, replay-stable). Returns the input columns plus
    ``canonical_url``.

    Scale shape: ONE map-side-combined shuffle, hash-partitioned on the
    canonical string — the survivor row is ``min(struct(id, ...))`` per
    key (id first, ids unique, so the struct min IS the min-id row), and
    the min PARTIALS collapse a hot canonical URL (a crawl that saw one
    landing page 10^9 times) to one candidate row per map task. The
    round-6 form was a ``row_number`` window over the same key, which
    routed every copy of a hot key to one reducer (a window partition
    cannot be pre-aggregated or split — AQE skew handling covers joins,
    not WindowExec). No self-join, no driver state; the map-side
    projection is the only thing that ever touches the raw text columns."""
    canon = with_canonical_url(docs, url_col)
    others = [c for c in canon.columns if c != id_col]
    return (canon
            .groupBy("canonical_url")
            .agg(F.min(F.struct(F.col(id_col), *others)).alias("__w"))
            .select(*[F.col(f"__w.{c}").alias(c) for c in canon.columns]))


def host_stats(docs: DataFrame, url_col: str = "url",
               size_col: str | None = None) -> DataFrame:
    """Per-host corpus attribution: (host, registered_domain, n_docs[,
    total_<size_col>]) — the budgeting/stratification rollup (docs per
    domain caps, per-host quality triage). One map-side-combined shuffle
    on the host key."""
    base = docs.select(host_of(F.col(url_col)).alias("host"),
                       *([F.col(size_col)] if size_col else []))
    aggs = [F.count("*").alias("n_docs")]
    if size_col:
        aggs.append(F.sum(size_col).cast("long").alias(f"total_{size_col}"))
    cols = ["host", "domain", "n_docs"] + \
        ([f"total_{size_col}"] if size_col else [])
    return (base.groupBy("host").agg(*aggs)
            .withColumn("domain", registered_domain(F.col("host")))
            .select(*cols))


def url_path_of(col) -> Column:
    """Path component of a URL (no scheme/host/query/fragment) — map-only."""
    return F.regexp_extract(col, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def url_blocklist_filter(docs: DataFrame, blocked: DataFrame,
                         url_col: str = "url", match: str = "domain",
                         path_pattern: str | None = None) -> DataFrame:
    """Drop documents whose URL is blocklisted — the Dolma/RefinedWeb
    pre-filter that runs before any text is fetched or moved.

    ``blocked`` is a one-column DataFrame of blocked keys:
    ``match="domain"`` (default) blocks by registered domain (so
    ``spam.example.com`` and ``www.example.com`` both fall to an
    ``example.com`` entry); ``match="host"`` blocks exact hosts. An
    optional ``path_pattern`` (Java-regex/RE2 common subset, so the
    DuckDB twin stays exact) additionally drops any URL whose PATH
    matches — the keyword rules blocklists carry alongside domain lists.

    Scale shape: blocklists are driver-small (the public ones are a few
    hundred thousand rows) — the anti-join is explicitly ``broadcast()``,
    so the 100-TB corpus never shuffles for this filter; host/domain
    derivation and the path rule are map-only JVM expressions that push
    past the scan. Output is the input rows that survive, unchanged.
    """
    if match not in ("domain", "host"):
        raise ValueError(f"unknown match {match!r}")
    key_col = blocked.columns[0]
    host = host_of(F.col(url_col))
    key = registered_domain(host) if match == "domain" else host
    out = docs.withColumn("__blk_key", key).join(
        F.broadcast(blocked.select(F.col(key_col).alias("__blk_key"))),
        "__blk_key", "left_anti").drop("__blk_key")
    if path_pattern is not None:
        out = out.where(~url_path_of(F.col(url_col)).rlike(path_pattern))
    return out
