"""Differential test of the JVM-side relative-URL resolver against
stdlib urljoin (ground truth) over a (base x href) grammar plus seeded
random composites — byte-equality required (minus fragments, which the
crawl contract drops)."""

import random
from urllib.parse import urljoin, urldefrag

from pyspark.sql import functions as F

from docling_api_spark.functions.urlresolve import resolve_href

BASES = [
    "https://a.example/doc/5.html",
    "https://a.example/",
    "https://a.example",
    "http://b.example:8080/x/y/z.html",
    "https://c.example/p/q/?k=1",
    "https://d.example/p/q?k=1#frag",
]

HREFS = [
    "https://other.example/abs.html",
    "mailto:joe@x.com",
    "//cdn.example/lib.js",
    "/root/file.html",
    "/a/../b/./c.html",
    "rel.html",
    "./rel.html",
    "../up.html",
    "../../up2.html",
    "../../../over.html",
    "sub/dir/file.html",
    "a/./b/../c.html",
    "?only=query",
    "",
    "#frag-only",
    "rel.html?q=2#f",
    "..",
    ".",
    "../",
    "./",
]


def _expected(b, h):
    return urldefrag(urljoin(b, h))[0]


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "base string, href string")
    rows = df.select("base", "href",
                     resolve_href(F.col("base"), F.col("href"))
                     .alias("r")).collect()
    return [(r["base"], r["href"], r["r"]) for r in rows]


def test_grammar_differential_vs_urljoin(spark):
    pairs = [(b, h) for b in BASES for h in HREFS]
    bad = [(b, h, got, _expected(b, h))
           for b, h, got in _run(spark, pairs)
           if got != _expected(b, h)]
    assert not bad, bad[:8]


def test_seeded_random_composites(spark):
    rng = random.Random(11)
    atoms = ["a", "bb", "..", ".", "x.html", "q%20z"]
    pairs = []
    for _ in range(300):
        b = rng.choice(BASES)
        depth = rng.randint(1, 5)
        segs = [rng.choice(atoms) for _ in range(depth)]
        h = "/".join(segs)
        if rng.random() < 0.3:
            h = "/" + h
        if rng.random() < 0.25:
            h += "?" + "k=" + str(rng.randint(0, 9))
        pairs.append((b, h))
    bad = [(b, h, got, _expected(b, h))
           for b, h, got in _run(spark, pairs)
           if got != _expected(b, h)]
    assert not bad, bad[:8]
