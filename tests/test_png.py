"""PNG codec tests: hand-built byte golden for the encoder, round-trip,
and end-to-end pixel verification of the pipeline's image payloads."""

import base64
import struct
import zlib

from docling_api_spark.operators import png_write as P
from docling_api_spark.operators.convert import convert_one
from docling_api_spark.config import ExtractConfig


def test_encoder_bytes_golden_handbuilt():
    # 2x2 gray image built by hand, chunk by chunk — NOT via the encoder
    px = bytes([0, 85, 170, 255])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = b"\x00" + px[0:2] + b"\x00" + px[2:4]

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    expected = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 9))
                + chunk(b"IEND", b""))
    assert P.write_png_gray(2, 2, px) == expected


def test_roundtrip_and_determinism():
    w, h = 13, 7
    px = bytes((x * 31 + 7) % 256 for x in range(w * h))
    data = P.write_png_gray(w, h, px)
    assert P.read_png_gray(data) == (w, h, px)
    assert P.write_png_gray(w, h, px) == data     # byte-deterministic


def test_picture_png_dims_and_texture():
    ref = "img-5.png"
    data = P.picture_png(ref)
    w, h, px = P.read_png_gray(data)
    assert (w, h) == P.picture_dims(ref)
    assert 16 <= w < 32 and 12 <= h < 24
    import hashlib
    digest = hashlib.md5(ref.encode()).digest()
    assert px[:16] == digest                       # md5 texture tiling
    # different refs give different images
    assert P.picture_png("img-6.png") != data


def test_table_png_gridlines():
    data = P.table_png(3, 2)
    w, h, px = P.read_png_gray(data)
    assert (w, h) == P.table_dims(3, 2) == (19, 22)
    for y in range(h):
        for x in range(w):
            expected = 0 if (x % 9 == 0 or y % 7 == 0) else 255
            assert px[y * w + x] == expected


def test_pipeline_payloads_decode():
    # end-to-end: the engine's manifest payloads are valid PNGs whose
    # pixels match the independent generators
    html = ("<html><body><img src=\"pic-a.png\">"
            "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>"
            "</body></html>").encode()
    cfg = ExtractConfig(extract_tables_as_images=True)
    r = convert_one(html, "https://x/t.html", cfg)
    imgs = {i["type"]: i for i in r["images"]}
    pic = base64.b64decode(imgs["picture"]["image"])
    assert pic == P.picture_png("pic-a.png")
    tbl = base64.b64decode(imgs["table"]["image"])
    assert tbl == P.table_png(2, 1)
    P.read_png_gray(pic)
    P.read_png_gray(tbl)
