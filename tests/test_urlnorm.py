"""URL canonicalization: Spark-expression vs pure-Python twin parity,
idempotence, and registrable-domain heuristic edges."""

import random

from pyspark.sql import functions as F

from thesis_ner_co_tri_training_spark.functions.urlnorm import (
    canonical_url, canonical_url_py, registrable_domain,
    registrable_domain_py)


def _gen_urls(n=300, seed=7):
    rng = random.Random(seed)
    schemes = ["http", "HTTP", "https", "HtTpS", "ftp"]
    hosts = ["WWW.Example.COM", "site.example.co.uk", "a.b.C.org",
             "www.www.x.net", "localhost", "10.0.0.1"]
    ports = ["", ":80", ":443", ":8080", ":21"]
    paths = ["", "/", "/A/b", "/p/q/"]
    params = ["a=1", "b=", "utm_source=x", "utm_medium=y", "gclid=9",
              "ref=home", "z=Z", "x=1", "x=0", ""]
    out = []
    for _ in range(n):
        q = "&".join(rng.sample(params, rng.randint(0, 5)))
        frag = rng.choice(["", "#f", "#a/b?c=1"])
        out.append(
            rng.choice(schemes) + "://" + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths)
            + (("?" + q) if rng.random() < 0.7 else "") + frag)
    out += ["no scheme here", "mailto:x@example.com", "://broken",
            "http://", "https://#only-frag"]
    return out


def test_canonical_url_parity_and_idempotent(spark):
    urls = _gen_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    for r in got:
        assert r.c == canonical_url_py(r.url), r.url
    # idempotence: canonicalizing a canonical url is a no-op
    c2 = (spark.createDataFrame([(r.c,) for r in got], "url string")
          .select("url", canonical_url(F.col("url")).alias("c")).collect())
    for r in c2:
        assert r.c == r.url, r.url
    for u in urls:
        assert canonical_url_py(canonical_url_py(u)) == canonical_url_py(u)


def test_registrable_domain_heuristic(spark):
    hosts = ["example.com", "a.b.example.co.uk", "gov.uk", "localhost",
             "x.com.au", "deep.sub.example.org", "example.ac.jp",
             "co.uk", "a.co", "b.c.d.e.gov.br"]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = {r.h: r.d for r in
           df.select("h", registrable_domain(F.col("h")).alias("d"))
           .collect()}
    for h in hosts:
        assert got[h] == registrable_domain_py(h), h
    assert got["a.b.example.co.uk"] == "example.co.uk"
    assert got["deep.sub.example.org"] == "example.org"
    assert got["localhost"] == "localhost"
    assert got["b.c.d.e.gov.br"] == "e.gov.br"


def test_canonical_url_merges_recrawl_variants(spark):
    """The operational point: syntactic recrawl variants of one page
    collapse to a single canonical key."""
    variants = [
        "http://www.example.com:80/page?b=2&a=1",
        "HTTP://EXAMPLE.com/page?a=1&b=2#top",
        "http://example.com/page?utm_source=feed&a=1&b=2",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    keys = {r[0] for r in
            df.select(canonical_url(F.col("url"))).collect()}
    assert keys == {"http://example.com/page?a=1&b=2"}
