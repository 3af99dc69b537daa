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


def test_wet_conversion_records(tmp_path):
    p = str(tmp_path / "x.wet.gz")
    recs = [("https://a/1.html", "2025-01-01T00:00:00Z",
             "# Title\n\nbody text\n\nwith\r\n\r\nodd breaks".encode(),
             "text/plain")]
    W.write_warc(recs, p, compress=True, warc_type="conversion")
    data = open(p, "rb").read()
    # response-typed readers skip conversion records...
    assert list(W.iter_warc_records(data)) == []
    # ...and the WET reader returns the payload VERBATIM (no HTTP-header
    # stripping, even when the text contains CRLF CRLF)
    got = list(W.iter_warc_records(data, types=(b"conversion",)))
    assert got == [(recs[0][0], recs[0][1], recs[0][2])]


def test_warc_to_wet_full_round(spark, tmp_path):
    # the complete CC shape: pages → .warc.gz → extraction → .wet.gz →
    # read back → markdown matches the direct pipeline
    from docling_api_spark.config import ExtractConfig
    from docling_api_spark.plans.pipeline import extract_df
    from docling_api_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    cfg = ExtractConfig(num_partitions=4)
    direct = {r["url"]: r["markdown"]
              for r in extract_df(pages, cfg).collect()
              if r["markdown"] is not None}

    warc_dir = tmp_path / "warc"
    wet_dir = tmp_path / "wet"
    warc_dir.mkdir(), wet_dir.mkdir()
    W.warc_segments_from_pages(pages, str(warc_dir))
    results = extract_df(W.read_warc_pages(spark, str(warc_dir)), cfg)
    W.wet_from_extraction(results, str(wet_dir))

    wet = {}
    import pathlib
    for f in pathlib.Path(wet_dir).iterdir():
        for url, _, payload in W.iter_warc_records(
                f.read_bytes(), types=(b"conversion",)):
            wet[url] = payload.decode("utf-8")
    assert wet == direct and len(wet) == 500


def test_payload_roundtrip_property(tmp_path):
    """Arbitrary payload bytes survive the container — including
    payloads that CONTAIN record markers ('WARC/1.0') or header
    terminators (CRLF CRLF): slicing is Content-Length-driven, never
    delimiter-driven."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.binary(max_size=300), min_size=1, max_size=5),
           st.booleans())
    def prop(payloads, compress):
        recs = [(f"https://x/{i}", "2025-01-01T00:00:00Z", p, "a/b")
                for i, p in enumerate(payloads)]
        p = str(tmp_path / "prop.warc")
        W.write_warc(recs, p, compress=compress)
        got = list(W.iter_warc_records(open(p, "rb").read()))
        assert got == [(u, d, pl) for u, d, pl, _ in recs]

    prop()


def test_payload_with_embedded_markers(tmp_path):
    evil = (b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: 0\r\n\r\n\r\n\r\n")
    recs = [("https://x/e", "2025-01-01T00:00:00Z", evil, "a/b"),
            ("https://x/f", "2025-01-01T00:00:01Z", b"after", "a/b")]
    p = str(tmp_path / "evil.warc")
    W.write_warc(recs, p)
    got = list(W.iter_warc_records(open(p, "rb").read()))
    assert [(u, pl) for u, _, pl in got] == [
        ("https://x/e", evil), ("https://x/f", b"after")]


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


def test_warc_11_segment_resyncs(tmp_path):
    """A WARC/1.1 segment with one malformed record must resync on the
    version-agnostic marker, not silently drop the file tail (r3
    ADVICE: the old resync searched for the literal b'WARC/1.0')."""
    p = str(tmp_path / "x.warc")
    W.write_warc(RECS, p)
    good = open(p, "rb").read().replace(b"WARC/1.0", b"WARC/1.1")
    first = W._record_bytes(*RECS[0]).replace(b"WARC/1.0", b"WARC/1.1")
    bad = b"WARC/1.1\r\nContent-Length: notanumber\r\n\r\njunk"
    blob = first + bad + good[len(first):]
    got = list(W.iter_warc_records(blob))
    assert [u for u, _, _ in got] == [u for u, _, _, _ in RECS]
