"""Pages-table sources.

The reference's only source is HTTP multipart upload (``route.py:30,54``);
our engine's source is a table scan (SURVEY.md Table A rows A1/A2): Parquet
always, Iceberg when its runtime is on the classpath (not in this sandbox —
gated behind a flag with identical DataFrame code downstream, SURVEY.md
§7.0).

Also provides ``pages_from_documents``: a deterministic, fully JVM-side
(no UDF) synthesis of a Common-Crawl-style pages table from the
driver-provided ``documents.parquet``, used by the benchmark and the driver
smoke entry — every document's text is wrapped in an HTML shell with real
boilerplate (nav/header/footer/link-farm) so extraction work is
representative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import PAGES_SCHEMA


def read_pages(spark: SparkSession, path: str, storage: str = "parquet",
               table: str | None = None) -> DataFrame:
    """Scan the input table. ``storage='iceberg'`` loads the named table via
    the Iceberg catalog (requires the runtime jar); ``'parquet'`` reads the
    path with the declared schema (no inference)."""
    if storage == "iceberg":
        return spark.read.format("iceberg").load(table or path)
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


#: epoch for deterministic warc_ts (FIXTURES.md §1) — 2025-01-01T00:00:00Z
_EPOCH_S = 1735689600

# Real Common-Crawl pages are mostly chrome: the synthetic shell carries a
# representative ~4 KB of it (scripts, styles, nav trees, footer link
# farms) — all inside DROP tags, so extraction output (and therefore the
# extract_markdown oracle) is unchanged while the per-doc parse work is
# honest. Static literals: identical on every page, pure JVM concat.
_CHROME_HEAD = (
    "<style>" + "".join(f".c{i}{{margin:{i}px;padding:0}}"
                        for i in range(40)) + "</style>"
    + "".join(
        f"<script>var cfg{i} = {{\"page\": \"x\", \"ids\": "
        f"[{','.join(str(j) for j in range(12))}], \"flag{i}\": true}};"
        f"function f{i}(a) {{ return a + {i}; }}</script>"
        for i in range(6))
)

_CHROME_NAV = (
    "<nav><ul>"
    + "".join(
        f"<li><a href=\"/cat/{i}\">Category {i}</a><ul>"
        + "".join(f"<li><a href=\"/cat/{i}/{j}\">Sub {i}.{j}</a></li>"
                  for j in range(4))
        + "</ul></li>"
        for i in range(12))
    + "</ul></nav>"
)

_CHROME_FOOTER = (
    "<footer><div>"
    + "".join(f"<a href=\"/foot/{i}\">Footer link {i}</a> "
              for i in range(24))
    + "</div><p>Copyright 2025</p></footer>"
    + "<script>var tail = 'analytics';</script>"
)

#: the HTML shell of the synthetic page, split at its variable slots and
#: NAMED so derived oracles (content_density byte accounting) share one
#: source of truth with the generator — a shell edit breaks their value
#: hashes loudly instead of silently drifting
SHELL_PRE = ("<!DOCTYPE html><html><head><title>t</title>"
             + _CHROME_HEAD +
             "</head><body>" + _CHROME_NAV +
             "<header><h1>Site</h1></header>"
             "<div><a href=\"/s1\">sponsored story one</a> "
             "<a href=\"/s2\">sponsored story two</a> "
             "<a href=\"/s3\">sponsored story three</a></div>"
             "<main><h1>")
SHELL_AFTER_TITLE = "</h1><p>"
SHELL_AFTER_PARA = "</p>"
SHELL_POST = "</main>" + _CHROME_FOOTER + "</body></html>"
SHELL_LIST_PRE = "<ul><li>item one of doc "
SHELL_LIST_POST = "</li><li>item two</li></ul>"
SHELL_TBL_PRE = "<table><tr><th>k</th><th>v</th></tr><tr><td>id</td><td>"
SHELL_TBL_MID = "</td></tr><tr><td>lang</td><td>"
SHELL_TBL_POST = "</td></tr></table>"


def pages_from_documents(spark: SparkSession, sf_dir: str,
                         repeat: int = 1,
                         parallelism: int | None = None) -> DataFrame:
    """documents.parquet → pages(url, warc_ts, html, text, lang).

    Pure column expressions (whole-stage codegen; zero Python in this
    step). ``repeat`` tiles the corpus deterministically for larger bench
    inputs. Every 3rd doc gets a list, every 5th a table, so the extractor
    exercises more than paragraphs; boilerplate chrome is always present.

    ``parallelism`` repartitions the *raw docs* (tiny rows) before the HTML
    synthesis: documents.parquet is a single small file → a single input
    split, so without this the synthesis and any downstream shuffle map side
    run in ONE task — a serial Amdahl bottleneck that caps scaling. The
    repartition moves only the pre-synthesis text, so it is far cheaper
    than shuffling the synthesized html.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if parallelism:
        # BEFORE the repeat crossJoin: the repartition then moves only the
        # original 5k small rows, and the row multiplication + synthesis
        # fan out across all partitions instead of one scan task.
        docs = docs.repartition(parallelism, "doc_id")
    if repeat > 1:
        reps = spark.range(repeat).withColumnRenamed("id", "rep")
        docs = docs.crossJoin(F.broadcast(reps)) \
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000) \
            .drop("rep")
    i = F.col("doc_id")
    para = F.coalesce(F.col("text"), F.lit(""))
    title = F.concat(F.lit("Doc "), i.cast("string"))
    is_md = (i % 10) == 7  # every 10th doc ships as raw Markdown, rest as HTML
    lst = F.when(
        i % 3 == 0,
        F.concat(F.lit(SHELL_LIST_PRE), i.cast("string"),
                 F.lit(SHELL_LIST_POST))).otherwise(F.lit(""))
    tbl = F.when(
        i % 5 == 0,
        F.concat(
            F.lit(SHELL_TBL_PRE),
            i.cast("string"),
            F.lit(SHELL_TBL_MID), F.col("lang"),
            F.lit(SHELL_TBL_POST))).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit(SHELL_PRE),
        title,
        F.lit(SHELL_AFTER_TITLE), para, F.lit(SHELL_AFTER_PARA),
        lst, tbl,
        F.lit(SHELL_POST),
    )
    md_str = F.concat(F.lit("# "), title, F.lit("\n\n"), para, F.lit("\n"))
    body = F.when(is_md, md_str).otherwise(html_str)
    ext = F.when(is_md, F.lit(".md")).otherwise(F.lit(".html"))
    return docs.select(
        F.concat(F.lit("https://site"), (i % 97).cast("string"),
                 F.lit(".example/doc/"), i.cast("string"), ext).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_S) + (i % 86400)).alias("warc_ts"),
        F.encode(body, "UTF-8").alias("html"),
        para.alias("text"),   # the WET-style text column of the CC shape
        F.col("lang"),
    )


def pages_with_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages whose HTML carries ``<img>`` tags (and a
    table on every 5th doc), for oracle-gating the image-manifest quirks
    (reference ``_process_document_images``, ``service.py:41-66``):
    per-picture base64 payload + first-remaining-placeholder rewrite
    (``service.py:61``), and tables collected but NEVER substituted into
    the markdown (``service.py:53-56``). Pure column expressions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    para = F.coalesce(F.col("text"), F.lit(""))
    sid = i.cast("string")
    tbl = F.when(
        i % 5 == 0,
        F.concat(
            F.lit("<table><tr><th>k</th><th>v</th></tr><tr><td>id</td><td>"),
            sid,
            F.lit("</td></tr><tr><td>lang</td><td>"), F.col("lang"),
            F.lit("</td></tr></table>"))).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>t</title></head><body>"
              + _CHROME_NAV + "<main><h1>"),
        F.lit("Doc "), sid,
        F.lit("</h1><p><img src=\"pic-"), sid, F.lit("-a.png\"> "),
        para,
        F.lit(" <img src=\"pic-"), sid, F.lit("-b.png\"></p>"),
        tbl,
        F.lit("</main>" + _CHROME_FOOTER + "</body></html>"))
    return docs.select(
        F.concat(F.lit("https://site"), (i % 97).cast("string"),
                 F.lit(".example/doc/"), sid, F.lit(".html")).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_S) + (i % 86400)).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        para.alias("text"),
        F.col("lang"),
    )


def pages_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages exercising the REST of the markdown
    serializer: h2 heading, blockquote, pre/code, horizontal rule,
    ordered list, nested unordered list — each reconstructable in SQL, so
    the driver gate value-checks the serialization shapes the main corpus
    (h1/p/ul/table) doesn't reach. Pure column expressions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    sid = i.cast("string")
    para = F.coalesce(F.col("text"), F.lit(""))
    html_str = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>t</title></head><body>"
              + _CHROME_NAV + "<main><h2>"),
        F.lit("Doc "), sid,
        F.lit("</h2><blockquote><p>"), para,
        F.lit("</p></blockquote><pre><code>code line "), sid,
        F.lit("</code></pre><hr><ol><li>first of "), sid,
        F.lit("</li><li>second</li></ol>"
              "<ul><li>a<ul><li>deep "), F.col("lang"),
        F.lit("</li></ul></li><li>b</li></ul></main>"
              + _CHROME_FOOTER + "</body></html>"))
    return docs.select(
        F.concat(F.lit("https://site"), (i % 97).cast("string"),
                 F.lit(".example/doc/"), sid, F.lit(".html")).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_S) + (i % 86400)).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        para.alias("text"),
        F.col("lang"),
    )


def pages_linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages whose main content carries in-paragraph
    links: one absolute cross-host link (site (i+1)%97 — a real link
    GRAPH over the host space) and one relative link. Oracle-gates the
    ``[text](href)`` serialization (A11) and feeds the outlink/link-graph
    queries. Pure column expressions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    sid = i.cast("string")
    para = F.coalesce(F.col("text"), F.lit(""))
    dst_host = F.concat(F.lit("site"), ((i + 1) % 97).cast("string"),
                        F.lit(".example"))
    abs_href = F.concat(F.lit("https://"), dst_host, F.lit("/doc/"),
                        (i + 13).cast("string"), F.lit(".html"))
    rel_href = F.concat(F.lit("/about/"), (i % 5).cast("string"))
    html_str = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>t</title></head><body>"
              + _CHROME_NAV + "<main><h1>"),
        F.lit("Doc "), sid,
        F.lit("</h1><p>"), para,
        F.when(F.length(F.trim(para)) > 0, F.lit(" ")).otherwise(F.lit("")),
        F.lit("Read <a href=\""), abs_href,
        F.lit("\">site link "), sid,
        F.lit("</a> and <a href=\""), rel_href,
        F.lit("\">about "), (i % 5).cast("string"),
        F.lit("</a>.</p></main>" + _CHROME_FOOTER + "</body></html>"))
    return docs.select(
        F.concat(F.lit("https://site"), (i % 97).cast("string"),
                 F.lit(".example/doc/"), sid, F.lit(".html")).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_S) + (i % 86400)).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        para.alias("text"),
        F.col("lang"),
    )


def pages_with_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages whose ``<head>`` carries the metadata a
    crawl pipeline must honor before keeping a page: ``<title>``, a
    robots meta (four classes: absent / noindex,nofollow / index,follow /
    attr-order-flipped nofollow — the flip pins extraction robustness),
    and a canonical ``<link>`` (three classes: self / pointing elsewhere
    (a syndicated copy) / absent). The metas sit AFTER the chrome
    ``<style>``/``<script>`` blob, so extraction must scan past real head
    noise. Pure column expressions (zero Python)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    sid = i.cast("string")
    para = F.coalesce(F.col("text"), F.lit(""))
    url = F.concat(F.lit("https://site"), (i % 97).cast("string"),
                   F.lit(".example/doc/"), sid, F.lit(".html"))
    robots = (
        F.when(i % 4 == 1, F.lit(
            "<meta name=\"robots\" content=\"noindex, nofollow\">"))
        .when(i % 4 == 2, F.lit(
            "<meta name=\"robots\" content=\"index, follow\">"))
        .when(i % 4 == 3, F.lit(
            "<meta content=\"nofollow\" name=\"robots\">"))
        .otherwise(F.lit("")))
    canonical = (
        F.when(i % 3 == 0, F.concat(
            F.lit("<link rel=\"canonical\" href=\""), url, F.lit("\">")))
        .when(i % 3 == 1, F.concat(
            F.lit("<link rel=\"canonical\" href=\""), url,
            F.lit("?ref=syndicated\">")))
        .otherwise(F.lit("")))
    html_str = F.concat(
        F.lit("<!DOCTYPE html><html><head>" + _CHROME_HEAD + "<title>"),
        F.lit("Doc "), sid, F.lit(" | site"), (i % 97).cast("string"),
        F.lit("</title><meta charset=\"utf-8\">"),
        robots, canonical,
        F.lit("</head><body><main><h1>Doc "), sid,
        F.lit("</h1><p>"), para,
        F.lit("</p></main>" + _CHROME_FOOTER + "</body></html>"))
    return docs.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_S) + (i % 86400)).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        para.alias("text"),
        F.col("lang"),
    )


def pages_charset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages in the ENCODINGS a real crawl serves
    (r4): by ``doc_id % 5`` —

    - 0: utf-8, declared ``<meta charset="utf-8">`` ('café costs € i')
    - 1: declared iso-8859-1, bytes latin-1 ('déjà vu i') — whatwg
      remaps the label to windows-1252 (identical for these chars)
    - 2: declared windows-1252, bytes cp1252 with 0x80/0x97 ('dash —
      euro € i') — bytes INVALID as utf-8 and WRONG under a latin-1
      fallback (C1 controls), so the value hash proves the declaration
      is honored, not the fallback chain
    - 3: NO declaration, bytes latin-1 ('naïve i') — invalid utf-8,
      exercises the fallback chain
    - 4 (r5, ADVICE fix): declared ``charset=utf-16`` but bytes utf-8
      ('résumé i') — whatwg §13.2.3.2 remaps utf-16 labels to utf-8
      (a visible utf-16 declaration is always wrong); under the old
      alias table this page decoded as CJK mojibake with no error row

    mapInPandas (Python) — corpus materialization (cp1252 isn't a JVM
    F.encode charset); memoized via queries._cached_source."""
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def render(batches):
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [],
                    "lang": []}
            for i, lang in zip(pdf["doc_id"].tolist(),
                               pdf["lang"].tolist()):
                cls = i % 5
                if cls == 0:
                    text, codec = f"café costs € {i}", "utf-8"
                    meta = '<meta charset="utf-8">'
                elif cls == 1:
                    text, codec = f"déjà vu {i}", "latin-1"
                    meta = ('<meta http-equiv="Content-Type" '
                            'content="text/html; charset=iso-8859-1">')
                elif cls == 2:
                    text, codec = (f"dash — euro € {i}",
                                   "cp1252")
                    meta = '<meta charset="windows-1252">'
                elif cls == 3:
                    text, codec = f"naïve {i}", "latin-1"
                    meta = ""
                else:
                    text, codec = f"résumé {i}", "utf-8"
                    meta = '<meta charset="utf-16">'
                html = (f"<!DOCTYPE html><html><head>{meta}<title>t"
                        f"</title></head><body>{_CHROME_NAV}<main>"
                        f"<h1>Doc {i}</h1><p>{text}</p></main>"
                        f"{_CHROME_FOOTER}</body></html>")
                rows["url"].append(
                    f"https://site{i % 97}.example/doc/{i}.html")
                rows["warc_ts"].append(pd.Timestamp(
                    (_EPOCH_S + (i % 86400)) * 1_000_000_000))
                rows["html"].append(html.encode(codec))
                rows["text"].append(text)
                rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(render, PAGES_SCHEMA)


def pages_broken(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → a corpus exercising the FULL per-document
    failure taxonomy (r4; reference A14 — error capture must never
    raise, ``service.py:83-88``): by ``doc_id % 9`` —

    - 0: good HTML (the control row — real markdown comes out)
    - 1: zero-byte payload            → ``empty_document``
    - 2: binary junk, unknown ext     → ``unsupported_format``
    - 3: PDF header, no objects       → ``pdf_unsupported_feature``
    - 4: photographic PNG             → ``ocr_not_supported``
    - 5: valid zip, docx content-type, no word/document.xml
                                      → ``parse_error``
    - 6 (r5): PDF 1.5 with a malformed /ObjStm container dict
                                      → ``pdf_unsupported_feature``
    - 7 (r5): Type0/Identity-H PDF whose content references a CID
      missing from its ToUnicode CMap → ``pdf_unsupported_feature``
    - 8 (r5 notch 8): RC4-encrypted PDF with a REAL (non-empty) user
      password — /U verification fails → ``pdf_unsupported_feature``
      (empty-password encrypted files EXTRACT; see with_fixture_pdfs)
    - 9 (r6 notch 11b): V5/AESV3 (AES-256, R6) PDF with a REAL user
      password — the Algorithm-2.A hash check fails
                                      → ``pdf_unsupported_feature``
    - 10 (r6 notch 11b): V5/AESV3 empty-password PDF whose /Perms
      block is TAMPERED — the 'adb' seal fails after a successful
      password check, so the reader refuses rather than trusting a
      corrupt permissions record → ``pdf_unsupported_feature``

    (6-10 share class 3's error CODE but break in distinct grammar
    decode paths — the gate proves those paths fail TYPED through
    the full Spark pipeline, never raise, never emit mojibake rows.)

    mapInPandas (corpus materialization; the zip/PNG writers are
    Python). Deterministic: zip entries pin date_time."""
    import io
    import zipfile

    import pandas as pd

    from ..operators.pdf_write import write_pdf
    from ..operators.png_write import picture_png

    def broken_docx() -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
            # a word/ entry so the sniffer classifies DOCX, but no
            # word/document.xml — extraction must fail as parse_error
            zi = zipfile.ZipInfo("word/styles.xml",
                                 date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, "<w:styles/>")
        return buf.getvalue()

    _DOCX = broken_docx()
    # class 6: a valid PDF 1.5 file whose ObjStm dict loses /First —
    # the container unpack must fail typed (malformed /ObjStm dict)
    _PDF_OBJSTM_BAD = write_pdf(
        [[(72.0, 730.0, 24.0, ["Broken"]),
          (72.0, 690.0, 11.0, ["container probe"])]],
        compress=True, xref_stream=True).replace(b"/First", b"/Fifst")
    assert b"/Fifst" in _PDF_OBJSTM_BAD
    # class 7: Identity-H content referencing CID 0x9958 which the
    # CMap does not map (heading 'X' = <0058> corrupted)
    _PDF_CID_BAD = write_pdf(
        [[(72.0, 730.0, 24.0, ["X"])]],
        font_encoding=("cid", {0x1001: "€"})
    ).replace(b"<0058>", b"<9958>")
    assert b"<9958>" in _PDF_CID_BAD
    # class 8: RC4-encrypted with a real user password — the empty-
    # password probe fails /U verification → typed password row
    _PDF_LOCKED = write_pdf(
        [[(72.0, 730.0, 24.0, ["Locked"]),
          (72.0, 690.0, 11.0, ["secret body"])]],
        compress=True, encrypt_r=3, encrypt_user_pwd=b"hunter2")
    assert b"/Encrypt" in _PDF_LOCKED
    # class 9: V5/AESV3 (AES-256 R6) with a real user password
    _PDF_V5_LOCKED = write_pdf(
        [[(72.0, 730.0, 24.0, ["Locked5"]),
          (72.0, 690.0, 11.0, ["secret body"])]],
        compress=True, encrypt_r=6, encrypt_user_pwd=b"hunter2")
    assert b"/CFM /AESV3" in _PDF_V5_LOCKED
    # class 10: V5/AESV3 empty-password but /Perms tampered — seal fails
    import re as _re
    _PDF_V5_BADPERMS = _re.sub(
        rb"/Perms <[0-9a-f]{8}", b"/Perms <deadbeef",
        write_pdf([[(72.0, 730.0, 24.0, ["Sealed"]),
                    (72.0, 690.0, 11.0, ["perms probe"])]],
                  compress=True, encrypt_r=6))
    assert b"<deadbeef" in _PDF_V5_BADPERMS
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def render(batches):
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [],
                    "lang": []}
            for i, t, lg in zip(pdf["doc_id"].tolist(),
                                pdf["text"].tolist(),
                                pdf["lang"].tolist()):
                cls = i % 11
                t = t or ""
                if cls == 0:
                    ext, body = ".html", (
                        f"<html><body>{_CHROME_NAV}<main><h1>Doc {i}"
                        f"</h1><p>{t}</p></main>{_CHROME_FOOTER}"
                        f"</body></html>").encode()
                elif cls == 1:
                    ext, body = ".html", b""
                elif cls == 2:
                    ext, body = ".xyz", b"\x00\x01\x02binaryjunk" + bytes(
                        range(200, 230))
                elif cls == 3:
                    ext, body = ".pdf", b"%PDF-1.4\n no objects here"
                elif cls == 4:
                    ext, body = ".png", picture_png(f"photo-{i}")
                elif cls == 5:
                    ext, body = ".docx", _DOCX
                elif cls == 6:
                    ext, body = ".pdf", _PDF_OBJSTM_BAD
                elif cls == 7:
                    ext, body = ".pdf", _PDF_CID_BAD
                elif cls == 8:
                    ext, body = ".pdf", _PDF_LOCKED
                elif cls == 9:
                    ext, body = ".pdf", _PDF_V5_LOCKED
                else:
                    ext, body = ".pdf", _PDF_V5_BADPERMS
                rows["url"].append(
                    f"https://site{i % 97}.example/doc/{i}{ext}")
                rows["warc_ts"].append(pd.Timestamp(
                    (_EPOCH_S + (i % 86400)) * 1_000_000_000))
                rows["html"].append(body)
                rows["text"].append(t)
                rows["lang"].append(lg)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(render, PAGES_SCHEMA)


def pages_with_scans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages whose payload is a machine-rendered
    text RASTER (PNG built by the from-scratch 5×7 font rasterizer,
    operators/ocr.py): the IMAGE-input class the reference routes
    through easyocr (service.py:37). THREE lines per page (r4 —
    multi-line rasters, the page shape easyocr reads)::

        scan {doc_id}
        {first 40 chars of text}
        lang {lang}

    — all within the rasterizer charset (the driver corpus is pure
    [a-z ], langs lowercase alpha). Rendering is
    Python, so this source is a mapInPandas over the tiny documents
    table (Arrow-batched; the REAL extraction work downstream is the
    pixel-level OCR)."""
    import pandas as pd

    from ..operators.jpeg_codec import encode_gray_jpeg
    from ..operators.ocr import render_text_png
    from ..operators.png_write import read_png_gray
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def raster(i, t, lg):
        # r6: odd doc_ids ship as baseline-grayscale JPEG (the
        # container real scanners emit), even as PNG — text identical,
        # so the oracle only switches the extension
        png = render_text_png(f"scan {i}\n" + (t or "")[:40]
                              + f"\nlang {lg}")
        if i % 2 == 0:
            return ".png", png
        return ".jpg", encode_gray_jpeg(*read_png_gray(png))

    def render(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            texts = pdf["text"].tolist()
            langs = pdf["lang"].tolist()
            pairs = [raster(i, t, lg)
                     for i, t, lg in zip(ids, texts, langs)]
            yield pd.DataFrame({
                "url": [f"https://site{i % 97}.example/doc/{i}{ext}"
                        for i, (ext, _) in zip(ids, pairs)],
                "warc_ts": pd.to_datetime(
                    [(_EPOCH_S + (i % 86400)) * 1_000_000_000
                     for i in ids]),
                "html": [body for _, body in pairs],
                "text": [t or "" for t in texts],
                "lang": langs,
            })

    return docs.mapInPandas(render, PAGES_SCHEMA)


def with_fixture_ooxml(pages: DataFrame, docx_mod: int = 2,
                       pptx_mod: int = 9, adoc_mod: int = 3) -> DataFrame:
    """Replace docs with ``doc_id % 10 == docx_mod/pptx_mod/adoc_mod`` by
    deterministic DOCX / PPTX / AsciiDoc fixtures (generation rules below —
    each reconstructable in SQL, so the driver's DuckDB gate value-checks
    the OOXML and adoc extraction paths end-to-end; reference capability:
    ``utils.py:26-32``).

    - DOCX:  Heading1 'Doc i' + text paragraph + 2 bullets + k/v table
    - PPTX:  slide1(title 'Doc i', bullet text) +
             slide2(title 'Summary i', bullets lvl0/lvl1)
    - ADOC:  '= Doc i' + text + '* item...'x2 + '. first' '. second'

    mapInPandas (Python) — corpus *materialization*, not for a timed
    region. Deterministic: bytes are a pure function of (doc_id, text,
    lang)."""
    import pandas as pd

    from ..operators.ooxml_write import write_docx, write_pptx

    def rewrite(batches):
        for pdf in batches:
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist()
            for j, url in enumerate(urls):
                if not url.endswith(".html"):
                    continue
                stem = url.rsplit("/", 1)[-1]
                i = int(stem.split(".")[0])
                text = pdf["text"].iat[j] or ""
                lang = pdf["lang"].iat[j] or ""
                if i % 10 == docx_mod:
                    htmls[j] = write_docx(
                        f"Doc {i}", text,
                        [f"item one of doc {i}", "item two"],
                        [["k", "v"], ["id", str(i)], ["lang", lang]])
                    ext = ".docx"
                elif i % 10 == pptx_mod:
                    htmls[j] = write_pptx([
                        (f"Doc {i}", [(0, text)]),
                        (f"Summary {i}",
                         [(0, f"point one of doc {i}"), (1, "point two")]),
                    ])
                    ext = ".pptx"
                elif i % 10 == adoc_mod:
                    htmls[j] = (
                        f"= Doc {i}\n\n{text}\n\n"
                        f"* item one of doc {i}\n* item two\n\n"
                        f". first\n. second\n").encode("utf-8")
                    ext = ".adoc"
                else:
                    continue
                urls[j] = url[: -len(".html")] + ext
            out = pdf.copy()
            out["url"] = pd.Series(urls, index=pdf.index)
            out["html"] = pd.Series(htmls, index=pdf.index, dtype="object")
            yield out

    return pages.mapInPandas(
        rewrite, "url string, warc_ts timestamp, html binary, "
                 "text string, lang string")


def with_fixture_images(pages: DataFrame, every_mod: int = 6) -> DataFrame:
    """Replace docs with ``doc_id % 10 == every_mod`` by minimal-but-real
    image bytes (valid PNG sig+IHDR+IEND / GIF header+trailer), for the
    IMAGE-input metadata path: width = 16 + i%64, height = 16 + i%32,
    PNG when i is even (45 bytes) else GIF (14 bytes). The conversion path
    still yields ``error='ocr_not_supported'`` for these rows (OCR is
    env-scoped out); the metadata query parses headers only."""
    import struct
    import zlib

    import pandas as pd

    def png_bytes(w: int, h: int) -> bytes:
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        chunk = b"IHDR" + ihdr
        return (b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", 13) + chunk
                + struct.pack(">I", zlib.crc32(chunk))
                + struct.pack(">I", 0) + b"IEND"
                + struct.pack(">I", zlib.crc32(b"IEND")))

    def gif_bytes(w: int, h: int) -> bytes:
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00;"

    def rewrite(batches):
        for pdf in batches:
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist()
            for j, url in enumerate(urls):
                if not url.endswith(".html"):
                    continue
                stem = url.rsplit("/", 1)[-1]
                i = int(stem.split(".")[0])
                if i % 10 != every_mod:
                    continue
                w, h = 16 + i % 64, 16 + i % 32
                if i % 2 == 0:
                    htmls[j] = png_bytes(w, h)
                    ext = ".png"
                else:
                    htmls[j] = gif_bytes(w, h)
                    ext = ".gif"
                urls[j] = url[: -len(".html")] + ext
            out = pdf.copy()
            out["url"] = pd.Series(urls, index=pdf.index)
            out["html"] = pd.Series(htmls, index=pdf.index, dtype="object")
            yield out

    return pages.mapInPandas(
        rewrite, "url string, warc_ts timestamp, html binary, "
                 "text string, lang string")


def with_fixture_pdfs(pages: DataFrame, every_mod: int = 4) -> DataFrame:
    """Replace docs with ``doc_id % 10 == every_mod`` by fixture-grammar
    PDFs (``pdf_write``), so a corpus exercises the PDF extraction path
    end-to-end ("HTML/PDF→Markdown", BASELINE.json metric).

    mapInPandas (Python) — intended for corpus *materialization*, not for
    inside a timed region. Deterministic: PDF bytes are a pure function of
    (doc_id, text)."""
    import pandas as pd

    from ..operators.pdf_write import write_pdf

    def rewrite(batches):
        for pdf in batches:
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist()
            for j, url in enumerate(urls):
                stem = url.rsplit("/", 1)[-1]
                i = int(stem.split(".")[0])
                if i % 10 != every_mod or not url.endswith(".html"):
                    continue
                text = pdf["text"].iat[j] or ""
                words, lines, cur = text.split(), [], ""
                for w in words:
                    if len(cur) + len(w) + 1 > 90:
                        lines.append(cur)
                        cur = w
                    else:
                        cur = w if not cur else f"{cur} {w}"
                if cur:
                    lines.append(cur)
                # Tf size-driven heading hierarchy (r3): 24→h1, 18→h2,
                # 14→h3, body 11 — the driver oracle reconstructs all
                # three levels from the generation rule
                blocks = [(72.0, 730.0, 24.0, [f"Doc {i}"]),
                          (72.0, 690.0, 18.0, [f"Section {i % 7}"]),
                          (72.0, 655.0, 14.0, [f"Part {i % 3}"])]
                if lines:
                    blocks.append((72.0, 620.0, 11.0, lines))
                # r4: a trailing reference paragraph whose text NEEDS
                # string escapes — '(', ')', '\' — so the escape path
                # (pdf_write._escape / pdf_extract._ESCAPES) is driver
                # value-gated, not just unit-tested. 40pt below the last
                # body line (> 1.5×size → its own block).
                # r5 encoding slice (i%30==24, every third PDF): the
                # ref paragraph gains chars OUTSIDE latin-1 (€ and
                # curly quotes) and the font alternates by i//30 among
                # /WinAnsiEncoding, a /Differences array remapping
                # codes 0xE9-0xEB (which HAVE base cp1252 meanings, so
                # ignoring the table yields visibly wrong chars), and
                # a /ToUnicode CMap mapping control-code bytes (the
                # embedded-subset-font pattern — unreadable without
                # the CMap). All three decode to identical text, so
                # one oracle branch covers them.
                enc = None
                tail = ""
                if i % 30 == 24:
                    tail = " “prix” %d €" % (i % 50)
                    # r5 notch 9 widens the alternation to FIVE: the
                    # array-form bfrange CMap (consecutive control
                    # codes grouped into <lo> <hi> [<d1> <d2> <d3>])
                    enc = [
                        "winansi",
                        {0xE9: "Euro", 0xEA: "quotedblleft",
                         0xEB: "quotedblright"},
                        ("tounicode",
                         {0x01: "€", 0x04: "“", 0x05: "”"}),
                        ("cid",
                         {0x1001: "€", 0x1002: "“", 0x1003: "”"}),
                        ("tounicode_arr",
                         {0x01: "€", 0x02: "“", 0x03: "”"}),
                    ][(i // 30) % 5]
                ref_line = f"(ref {i}\\{i % 7}){tail}"
                para_y = 620.0 - 14.0 * max(0, len(lines) - 1)
                if i % 20 == 14:
                    # two-page fixture: the reference paragraph moves to
                    # page 2 under its own h3 — span offsets cross the
                    # page boundary and reading order must concatenate
                    # pages in /Kids order
                    page2 = [(72.0, 730.0, 14.0, [f"Part {i % 3} b"]),
                             (72.0, 690.0, 11.0, [ref_line])]
                    doc_pages = [blocks, page2]
                else:
                    blocks.append((72.0, para_y - 40.0, 11.0, [ref_line]))
                    doc_pages = [blocks]
                # r5: every third PDF uses the PDF 1.5 ObjStm+XRef-
                # stream layout (i%3 decorrelates from the i%20 two-
                # page rule, so 1.5 covers both single- and two-page
                # shapes); markdown is layout-invariant, so the driver
                # oracle is unchanged
                if i % 7 == 4:
                    # incremental-save slice (r5): the base revision
                    # carries STALE page-0 text; an appended update
                    # (§7.5.6, /Prev-chained) replaces it with the
                    # real blocks — the oracle expects the UPDATED
                    # text, so a first-definition-wins reader fails
                    # the value gate
                    from ..operators.pdf_write import append_update
                    stale = [(72.0, 730.0, 24.0, [f"Doc {i} STALE"]),
                             (72.0, 690.0, 11.0, ["pre-edit text"])]
                    base = write_pdf(
                        [stale] + doc_pages[1:],
                        compress=i % 2 == 0, xref_stream=i % 3 == 0,
                        font_encoding=enc)
                    htmls[j] = append_update(
                        base, 0, doc_pages[0], compress=i % 2 == 0,
                        font_encoding=enc)
                else:
                    # r5 notch 6: docs with i%5 in {2,4} split each
                    # page's content across 3 streams (/Contents
                    # ARRAY, §7.8.2 — BT/ET cross stream boundaries);
                    # two-page docs (i%20==14, always i%5==4) also get
                    # a NESTED page tree with /Resources inherited
                    # from the root node (§7.7.3.4). Markdown is
                    # layout-invariant, so the driver oracle is
                    # unchanged — a reader that misses the array or
                    # the tree extracts nothing and fails the hash.
                    # r5 notch 7: docs with i%11==6 swap the content
                    # stream's plain/Flate coding for ASCIIHex,
                    # ASCII85, the [/ASCII85Decode /FlateDecode]
                    # chain, or (notch 9) LZWDecode / RunLengthDecode
                    # — the pre-Flate codings of the oldest web-PDF
                    # slice (alternating by i//11) — layout-invariant,
                    # so the oracle is again unchanged
                    filt = (("ahx", "a85", "a85+flate", "lzw", "rle")
                            [(i // 11) % 5]
                            if i % 11 == 6 else None)
                    # r5 notches 8/10 + r6 notch 11b: docs with
                    # i%13==7 are standard-security encrypted with an
                    # EMPTY user password, alternating by i//13 across
                    # R2 RC4-40, R3 RC4-128, R4 V4/AESV2 (AES-128-CBC),
                    # R5 V5/AESV3 (AES-256, deprecated one-SHA-256
                    # revision) and R6 V5/AESV3 (AES-256, hardened
                    # Algorithm-2.B — the CURRENT standard scheme) —
                    # the permissions-only protection the whole web-PDF
                    # corpus carries, legacy to modern. Text is
                    # identical after decryption, so the oracle is
                    # unchanged; a reader that skips /Encrypt extracts
                    # nothing (or mojibake) and fails the value hash.
                    # Decorrelated from the incremental slice (i%7==4
                    # branch above stays unencrypted — append_update
                    # bases must).
                    # rotation is by encrypted-doc RANK (i // 130: PDF
                    # ∧ encrypted ⇒ i ≡ 124 mod 130), NOT (i//13)%5 —
                    # encrypted ids step by 130 so i//13 steps by
                    # 10 ≡ 0 (mod 5) and that index is CONSTANT: the
                    # first r6 corpus silently made EVERY encrypted doc
                    # R6 and its deliberately-expensive KDF dominated
                    # the flagship (7.5 s vs ~2.5 s — caught by the new
                    # bench calibration + per-query deltas). Ordered
                    # 6,5,4,3,2 so the NEW V5 revisions land on the
                    # lowest ranks and reach the sf0.01 driver gate
                    # (3 encrypted docs there); all five appear from
                    # sf0.1 up.
                    enc_r = ((6, 5, 4, 3, 2)[(i // 130) % 5]
                             if i % 13 == 7 else None)
                    # r6 form-XObject slice: docs with i%19==11 move
                    # the h3 'Part' block into a /Subtype /Form
                    # XObject painted by cm/Do — the letterhead
                    # pattern; markdown is layout-invariant so the
                    # oracle is unchanged, and a reader that ignores
                    # Form XObjects LOSES the h3 and fails the value
                    # hash. Excluded from nested-tree docs (i%20==14:
                    # per-page /XObject resources would override the
                    # §7.7.3.4 inheritance that slice gates).
                    pdf_forms = None
                    if i % 19 == 11 and i % 20 != 14:
                        part_block = doc_pages[0].pop(2)
                        pdf_forms = [[(0.0, 0.0, [part_block])]]
                    htmls[j] = write_pdf(doc_pages, compress=i % 2 == 0,
                                         xref_stream=i % 3 == 0,
                                         font_encoding=enc,
                                         split_contents=(
                                             3 if i % 5 in (2, 4) else 1),
                                         nested_kids=i % 20 == 14,
                                         stream_filter=filt,
                                         encrypt_r=enc_r,
                                         forms=pdf_forms)
                urls[j] = url[: -len(".html")] + ".pdf"
            out = pdf.copy()
            out["url"] = pd.Series(urls, index=pdf.index)
            out["html"] = pd.Series(htmls, index=pdf.index, dtype="object")
            yield out

    return pages.mapInPandas(
        rewrite, "url string, warc_ts timestamp, html binary, "
                 "text string, lang string")


def pages_embedded_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages carrying EMBEDDED raster images inside
    PDF and DOCX containers (r6 notch 11a — the A12 manifest contract
    beyond HTML; reference ``_process_document_images``,
    ``service.py:41-66`` surfaces pictures from ANY format):

    - doc_id %3 == 0 → a PDF whose page paints TWO /DeviceGray image
      XObjects between the title and the body text — one /FlateDecode
      (w = 16 + i%13, h = 12 + i%9), one /DCTDecode baseline-grayscale
      JPEG (w = 8 + i%8, h = 8 + i%5) — with layout alternating across
      classic/xref-stream and plain/Flate content coding (markdown and
      manifest are layout-invariant);
    - doc_id %3 == 1 → a DOCX with one inline ``a:blip`` drawing whose
      ``word/media`` part is the md5-textured ``picture_png`` for ref
      ``demb-<i>-a`` (dims md5-derived — the SQL oracle re-predicts
      them via textsql.md5_int);
    - doc_id %3 == 2 → a PPTX whose slide carries a ``p:pic`` →
      ``a:blip`` shape after the body (ref ``pemb-<i>-a``) — so ALL
      FOUR container formats (HTML via extract_images, PDF, DOCX,
      PPTX) are driver-gated on the one A12 manifest contract.

    Every dimension above is a pure function of doc_id, so the driver
    oracle value-gates the decoded PNG geometry end to end; exact
    pixel bytes are golden-tested in pytest (test_extractors /
    test_png)."""
    import pandas as pd

    from ..operators.ooxml_write import write_docx, write_pptx
    from ..operators.pdf_write import write_pdf
    from ..operators.png_write import picture_png

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def render(batches):
        for pdf in batches:
            urls, payloads = [], []
            for j in range(len(pdf)):
                i = int(pdf["doc_id"].iat[j])
                text = pdf["text"].iat[j] or ""
                if i % 3 == 0:
                    w1, h1 = 16 + i % 13, 12 + i % 9
                    px1 = bytes(((x * 3 + y * 5 + i) % 256)
                                for y in range(h1) for x in range(w1))
                    w2, h2 = 8 + i % 8, 8 + i % 5
                    px2 = bytes([(i * 7) % 256]) * (w2 * h2)
                    words, lines, cur = text.split(), [], ""
                    for wd in words:
                        if len(cur) + len(wd) + 1 > 90:
                            lines.append(cur)
                            cur = wd
                        else:
                            cur = wd if not cur else f"{cur} {wd}"
                    if cur:
                        lines.append(cur)
                    blocks = [(72.0, 730.0, 24.0, [f"Doc {i}"])]
                    if lines:
                        blocks.append((72.0, 560.0, 11.0, lines))
                    # r6: half the flate images ride the /Predictor 15
                    # PNG-row coding real writers emit — decode output
                    # is identical, so the geometry oracle is unchanged
                    codec1 = "flate-png" if (i // 3) % 2 else "flate"
                    payloads.append(write_pdf(
                        [blocks], compress=i % 4 == 0,
                        xref_stream=i % 6 == 0,
                        images=[[(72.0, 700.0, w1, h1, px1, codec1),
                                 (72.0, 640.0, w2, h2, px2, "dct")]]))
                    ext = ".pdf"
                elif i % 3 == 1:
                    payloads.append(write_docx(
                        f"Doc {i}", text,
                        [f"li one {i}", "li two"],
                        [["k", "v"], ["id", str(i)]],
                        images=[picture_png(f"demb-{i}-a")]))
                    ext = ".docx"
                else:
                    payloads.append(write_pptx(
                        [(f"Doc {i}", [(0, text)])],
                        images=[[picture_png(f"pemb-{i}-a")]]))
                    ext = ".pptx"
                urls.append(f"https://site{i % 97}.example/doc/{i}{ext}")
            out = pd.DataFrame({
                "url": pd.Series(urls, index=pdf.index),
                "warc_ts": pd.to_datetime(
                    (pdf["doc_id"] % 86400) + _EPOCH_S, unit="s"),
                "html": pd.Series(payloads, index=pdf.index,
                                  dtype="object"),
                "text": pdf["text"],
                "lang": pdf["lang"],
            })
            yield out

    return docs.mapInPandas(
        render, "url string, warc_ts timestamp, html binary, "
                "text string, lang string")
