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
