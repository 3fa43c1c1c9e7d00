"""URL/domain operator gates (ops/web.py):

- canonicalization cross-checked against an INDEPENDENT stdlib
  urllib.parse implementation of the same documented rule over a messy
  URL zoo (two implementations, one spec);
- idempotence: canonical(canonical(u)) == canonical(u);
- url_dedup keeps exactly min-doc_id per canonical key;
- registered_domain handles two-level public suffixes;
- plan gates: map-only canonicalization (no shuffle, no Python), one
  shuffle for the dedup window.
"""

from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from filterz_spark.ops.web import (TRACKING_PARAM_RE, TWO_LEVEL_TLDS,
                                   canonical_url, host_stats, host_of,
                                   registered_domain, url_dedup,
                                   with_canonical_url)

MESSY = [
    "HTTP://WWW.Example.COM/a/b",
    "http://www.example.com:80/a/b",
    "https://www.example.com:443/a/b",
    "https://www.example.com:8443/a/b",
    "http://example.com//a///b//",
    "http://example.com/a/b#frag",
    "http://example.com/a/b?utm_source=x&b=2&a=1",
    "http://example.com/a/b?b=2&a=1",
    "http://example.com/a/b?a=1&b=2&fbclid=zz",
    "http://example.com/a/b?gclid=1&utm_medium=m",
    "http://example.com/a/b?z=9?y=8",       # literal '?' inside query
    "http://example.com/",
    "http://example.com",
    "  http://example.com/pad  ",
    "ftp://Files.Example.Org/Pub/X",
    "http://example.com/CaseKept/Path?Q=UPPER",
    "http://a.b.example.co.uk/x?utm_campaign=c",
    "http://example.com/a/b?",
]


def _ref_canonical(u: str) -> str:
    """Independent implementation of the documented rule via urllib."""
    import re
    u = u.strip().split("#", 1)[0]
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", u)
    head, rest = u[:m.end()].lower(), u[m.end():]
    head = re.sub(r"^(http://[^/:?#]+):80$", r"\1", head)
    head = re.sub(r"^(https://[^/:?#]+):443$", r"\1", head)
    path, _, query = rest.partition("?")
    path = re.sub(r"/{2,}", "/", path)
    path = re.sub(r"/+$", "", path)
    params = [p for p in query.split("&")
              if p and not re.match(TRACKING_PARAM_RE, p)]
    q = "&".join(sorted(params))
    return head + path + ("?" + q if q else "")


@pytest.fixture(scope="module")
def messy_df(spark):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(MESSY)], "doc_id long, url string")


class TestCanonical:
    def test_matches_independent_urllib_impl(self, spark, messy_df):
        got = {r["url"]: r["c"] for r in
               messy_df.select("url", canonical_url(F.col("url")).alias("c"))
               .collect()}
        for u in MESSY:
            assert got[u] == _ref_canonical(u), u

    def test_idempotent(self, spark, messy_df):
        once = messy_df.select(canonical_url(F.col("url")).alias("c"))
        twice = once.select("c", canonical_url(F.col("c")).alias("cc"))
        assert twice.where(F.col("c") != F.col("cc")).count() == 0

    def test_known_values(self, spark):
        cases = {
            "HTTP://WWW.Example.COM/a/b": "http://www.example.com/a/b",
            "http://www.example.com:80/a/b": "http://www.example.com/a/b",
            "https://www.example.com:8443/a/b":
                "https://www.example.com:8443/a/b",
            "http://example.com/a/b?utm_source=x&b=2&a=1":
                "http://example.com/a/b?a=1&b=2",
            "http://example.com/CaseKept/Path?Q=UPPER":
                "http://example.com/CaseKept/Path?Q=UPPER",
            "http://example.com/": "http://example.com",
        }
        spark_got = {r["u"]: r["c"] for r in
                     spark.createDataFrame([(k,) for k in cases], "u string")
                     .select("u", canonical_url(F.col("u")).alias("c"))
                     .collect()}
        for u, want in cases.items():
            assert spark_got[u] == want, u


class TestDomains:
    def test_host_and_registered_domain(self, spark):
        rows = spark.createDataFrame(
            [("http://Blog.Shop.Example.CO.UK:80/x",),
             ("https://a.b.example.com/y",),
             ("http://localhost/z",),
             ("http://example.com/",)], "u string") \
            .select(host_of(F.col("u")).alias("h")) \
            .select("h", registered_domain(F.col("h")).alias("d")).collect()
        got = {r["h"]: r["d"] for r in rows}
        assert got["blog.shop.example.co.uk"] == "example.co.uk"
        assert got["a.b.example.com"] == "example.com"
        assert got["localhost"] == "localhost"
        assert got["example.com"] == "example.com"


class TestUrlDedup:
    def test_min_id_survives(self, spark):
        # four spellings of ONE canonical url + one distinct url
        df = spark.createDataFrame(
            [(10, "http://example.com/a/b?b=2&a=1"),
             (3, "HTTP://EXAMPLE.com/a/b?a=1&b=2&utm_source=x"),
             (7, "http://example.com:80//a//b?b=2&a=1#f"),
             (5, "http://example.com/a/b/?a=1&b=2"),
             (9, "http://example.com/other",)], "doc_id long, url string")
        kept = url_dedup(df).collect()
        ids = sorted(r["doc_id"] for r in kept)
        assert ids == [3, 9]
        assert all("canonical_url" in r.asDict() for r in kept)

    def test_host_stats(self, spark):
        df = spark.createDataFrame(
            [(1, "http://a.example.com/x", 10),
             (2, "http://a.example.com/y", 20),
             (3, "http://b.example.co.uk/z", 5)],
            "doc_id long, url string, n_chars long")
        got = {r["host"]: r for r in
               host_stats(df, size_col="n_chars").collect()}
        assert got["a.example.com"]["n_docs"] == 2
        assert got["a.example.com"]["total_n_chars"] == 30
        assert got["a.example.com"]["domain"] == "example.com"
        assert got["b.example.co.uk"]["domain"] == "example.co.uk"


class TestPlans:
    def test_canonicalization_is_map_only_jvm(self, spark, messy_df):
        p = with_canonical_url(messy_df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "Exchange" not in p, "canonicalization must not shuffle"

    def test_dedup_single_shuffle(self, spark, messy_df):
        p = url_dedup(messy_df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert p.count("Exchange hashpartitioning") == 1, p
