"""URL curation: parsing edges, blocklist, per-domain cap determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_misc_tools_spark.operators import web as W


def test_url_parts_components(spark):
    cases = [
        ("https://a.b.example.com/x/y?q=1&r=2", "a.b.example.com", "example.com", "/x/y", "q=1&r=2"),
        ("http://example.org", "example.org", "example.org", "", ""),
        ("https://example.org/", "example.org", "example.org", "/", ""),
        # port stays inside host AND domain (last-two-dot-labels rule)
        ("https://host.co:8080/p?a=1#frag", "host.co:8080", "host.co:8080", "/p", "a=1"),
        ("ftp://files.example.net/pub", "files.example.net", "example.net", "/pub", ""),
        ("not a url", "", "", "", ""),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    got = {r.url: r for r in df.select("url", W.url_parts("url").alias("p")).select("url", "p.*").collect()}
    for u, host, domain, path, query in cases:
        r = got[u]
        assert (r.host, r.domain, r.path, r.query) == (host, domain, path, query), u


def test_blocklist_and_cap_deterministic(spark):
    rows = [(i, f"d{i % 3}.com") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = W.blocklist_filter(df, ["d2.com"])
    assert kept.where(F.col("domain") == "d2.com").count() == 0
    capped = W.per_domain_cap(kept, cap=10)
    out = capped.collect()
    assert len(out) == 20  # 2 surviving domains x 10
    per = {}
    for r in out:
        per.setdefault(r.domain, []).append((r.rank, r.doc_id))
    for dom, lst in per.items():
        assert sorted(r for r, _ in lst) == list(range(1, 11))
    # stable under repartition
    again = {(r.domain, r.rank): r.doc_id
             for r in W.per_domain_cap(kept.repartition(13), cap=10).collect()}
    for r in out:
        assert again[(r.domain, r.rank)] == r.doc_id


def test_canonical_url(spark):
    from pyspark.sql import functions as F

    from data_misc_tools_spark.operators.web import canonical_url

    cases = [
        ("https://www.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
         "https://example.com/a/b?a=1&b=2"),
        ("HTTP://HOST.example.com:80/", "http://host.example.com/"),
        ("http://host.example.com:8080/x", "http://host.example.com:8080/x"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/p?fbclid=only", "https://example.com/p"),
        ("https://example.com/p?z=1&utm_campaign=c&y=2",
         "https://example.com/p?y=2&z=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r.url: r.canon for r in df.select(
        "url", canonical_url("url").alias("canon")
    ).collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)
    # strip_www=False keeps the www. label
    df2 = spark.createDataFrame([("https://www.a.com/x",)], "url string")
    keep = df2.select(canonical_url("url", strip_www=False).alias("c")).collect()[0].c
    assert keep == "https://www.a.com/x"
