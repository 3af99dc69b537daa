"""Deterministic fixture-PDF writer (SURVEY.md §7.1 M4).

Emits minimal, valid PDFs inside the scoped grammar that
:mod:`.pdf_extract` reads: Catalog → Pages → Page objects, Helvetica,
``BT/ET``, ``Tf``, ``Td``, ``Tj`` text operators, optional
``/FlateDecode`` streams, US-Letter MediaBox. Used only to *generate test
inputs* — the reader never sees writer internals (the golden markdown for
PDF fixtures is hand-derived from the block spec, not round-tripped).
"""

from __future__ import annotations

import zlib


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def content_stream(blocks: list[tuple[float, float, float, list[str]]],
                   leading: float = 14.0) -> bytes:
    """blocks = [(x, y, font_size, lines)] — y is the baseline of the first
    line; subsequent lines step down by ``leading``."""
    parts = ["BT"]
    for x, y, size, lines in blocks:
        parts.append(f"/F1 {size:g} Tf")
        cy = y
        for i, line in enumerate(lines):
            if i == 0:
                parts.append(f"1 0 0 1 {x:g} {cy:g} Tm")
            else:
                cy -= leading
                parts.append(f"1 0 0 1 {x:g} {cy:g} Tm")
            parts.append(f"({_escape(line)}) Tj")
    parts.append("ET")
    return "\n".join(parts).encode("latin-1")


def write_pdf(pages: list[list[tuple[float, float, float, list[str]]]],
              compress: bool = False) -> bytes:
    """pages = list of pages; each page a list of (x, y, size, lines) blocks."""
    n_pages = len(pages)
    objs: list[bytes] = []
    # obj 1: catalog, obj 2: pages, obj 3: font,
    # then per page: page obj + content obj
    first_page_id = 4
    kid_refs = " ".join(
        f"{first_page_id + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kid_refs}] /Count {n_pages} >>"
                .encode("latin-1"))
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, page in enumerate(pages):
        page_id = first_page_id + 2 * i
        content_id = page_id + 1
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Resources << /Font << /F1 3 0 R >> >> "
             f"/Contents {content_id} 0 R >>").encode("latin-1"))
        cs = content_stream(page)
        if compress:
            data = zlib.compress(cs, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = cs
            head = f"<< /Length {len(data)} >>".encode()
        objs.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)
