"""URL canonicalization + registrable-domain + per-domain cap semantics.

Pure-Catalyst curation rail (no reference analogue; builder-brief
LLM-pipeline scope). The cross-engine value check is the `domain_caps`
DuckDB oracle; these tests pin the operator's semantic contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.urltools import (
    canonical_url_expr,
    domain_caps,
    host_expr,
    registrable_domain_expr,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        canonical_url_expr(F.col("url")).alias("c"),
        registrable_domain_expr(host_expr(F.col("url"))).alias("d"),
    ).collect()
    return [(r.c, r.d) for r in rows]


def test_canonicalization_contract(spark):
    got = _canon(
        spark,
        [
            # case-normalized scheme+host, :443 dropped, utm stripped
            # (non-tracking param kept in place), fragment removed
            "HtTpS://WWW.Example.CO.UK:443/Path/X?utm_source=a&q=1&utm_medium=b#frag",
            # non-default port kept; query that becomes empty is dropped
            "http://example.co.uk:8080/a?fbclid=zz",
            # path, param order and values preserved byte-for-byte
            "https://sub.deep.example.com/p?b=2&a=1",
            # :80 default for http dropped; PATH case preserved
            "http://EXAMPLE.com:80/CaseKept",
            # :80 is NOT the default for https -> kept
            "https://h.org:80/x",
        ],
    )
    assert got == [
        ("https://www.example.co.uk/Path/X?q=1", "example.co.uk"),
        ("http://example.co.uk:8080/a", "example.co.uk"),
        ("https://sub.deep.example.com/p?b=2&a=1", "example.com"),
        ("http://example.com/CaseKept", "example.com"),
        ("https://h.org:80/x", "h.org"),
    ]


def test_non_http_urls_yield_nulls(spark):
    got = _canon(spark, ["mailto:bob@example.com", "not a url", "http://", "ftp://x/y"])
    assert got == [(None, None)] * 4


def test_single_label_and_multi_tld_domains(spark):
    got = _canon(spark, ["https://localhost/x", "https://a.b.gov.uk/", "https://co.uk/"])
    # bare 2-label host whose whole name is a multi-TLD: n>=3 guard keeps it
    assert [d for _, d in got] == ["localhost", "b.gov.uk", "co.uk"]


def test_domain_caps_rank_and_kept(spark):
    rows = [
        (1, "https://a.com/1", 9),
        (2, "https://A.com/2", 7),
        (3, "https://www.a.com/3", 7),  # tie with doc 2 -> doc_id breaks it
        (4, "https://a.com/4", 1),
        (5, "nope", 99),  # null domain: never kept, still ranked
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, quality long")
    out = {
        r.doc_id: (r.domain, r.domain_rank, r.kept)
        for r in domain_caps(df, max_per_domain=2).collect()
    }
    assert out[1] == ("a.com", 1, True)
    assert out[2] == ("a.com", 2, True)
    assert out[3] == ("a.com", 3, False)  # tied quality, larger doc_id
    assert out[4] == ("a.com", 4, False)
    assert out[5] == (None, 1, False)
