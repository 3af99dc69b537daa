"""WARC container tests: round-trip, gzip-member layout, robustness to
malformed records (one bad record must not kill the segment)."""

import gzip

from docling_api_spark.sources import warc as W


RECS = [
    ("https://a.example/1.html", "2025-01-01T00:00:00Z",
     b"<html><body><h1>One</h1></body></html>", "text/html"),
    ("https://b.example/2.md", "2025-01-01T00:00:05Z",
     b"# Two\n\nbody\n", "text/plain"),
    ("https://c.example/3.html", "2025-01-01T00:00:09Z",
     b"", "text/html"),
]


def _roundtrip(tmp_path, compress):
    p = str(tmp_path / ("x.warc.gz" if compress else "x.warc"))
    W.write_warc(RECS, p, compress=compress)
    data = open(p, "rb").read()
    got = list(W.iter_warc_records(data))
    assert [(u, d, pl) for u, d, pl, _ in RECS] == got


def test_roundtrip_plain(tmp_path):
    _roundtrip(tmp_path, compress=False)


def test_roundtrip_gzip_members(tmp_path):
    _roundtrip(tmp_path, compress=True)
    p = str(tmp_path / "x.warc.gz")
    data = open(p, "rb").read()
    # CC layout: each record its own gzip member → multiple magics
    assert data.count(b"\x1f\x8b\x08") == len(RECS)
    # byte-deterministic (mtime=0)
    W.write_warc(RECS, str(tmp_path / "y.warc.gz"), compress=True)
    assert open(str(tmp_path / "y.warc.gz"), "rb").read() == data


def test_non_response_records_skipped(tmp_path):
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    p = str(tmp_path / "x.warc")
    W.write_warc(RECS[:1], p)
    blob = info + open(p, "rb").read() + info
    got = list(W.iter_warc_records(blob))
    assert len(got) == 1 and got[0][0] == RECS[0][0]


def test_corrupt_record_resync(tmp_path):
    p = str(tmp_path / "x.warc")
    W.write_warc(RECS, p)
    good = open(p, "rb").read()
    # splice garbage with a bogus header between two good records
    bad = b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\njunk"
    first = W._record_bytes(*RECS[0])
    rest = good[len(first):]
    blob = first + bad + rest
    got = list(W.iter_warc_records(blob))
    # the first record parses; the resync recovers the remaining two
    assert [u for u, _, _ in got] == [u for u, _, _, _ in RECS]


def test_whole_file_gzip_also_readable(tmp_path):
    p = str(tmp_path / "x.warc")
    W.write_warc(RECS, p)
    blob = gzip.compress(open(p, "rb").read())
    got = list(W.iter_warc_records(blob))
    assert len(got) == len(RECS)


def test_spark_read_warc_pages(spark, tmp_path):
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    W.write_warc(RECS, str(seg_dir / "a.warc.gz"), compress=True)
    W.write_warc(RECS[:1], str(seg_dir / "b.warc"), compress=False)
    df = W.read_warc_pages(spark, str(seg_dir))
    rows = {(r["url"], bytes(r["html"])) for r in df.collect()}
    assert (RECS[0][0], RECS[0][2]) in rows
    assert len(rows) == 3          # url+payload dedups the repeated rec
    assert df.count() == 4         # but all 4 records are rows
