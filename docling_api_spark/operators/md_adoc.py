"""Markdown / AsciiDoc lightweight normalizers.

The reference accepts MD and ASCIIDOC inputs (``utils.py:29,32``,
``README.md:27-28``) and delegates them to docling's marko backend
(``poetry.lock:444``). Our engine treats Markdown as identity-modulo-
normalization and AsciiDoc as a line-based transform to the same Markdown
dialect as the HTML serializer (SURVEY.md Table C).

Normalization spec (deterministic, byte-stable):
- every line right-stripped;
- leading/trailing blank lines removed;
- runs of 2+ blank lines collapse to exactly one blank line;
- no trailing newline.

AsciiDoc transform (fixture grammar — FIXTURES.md class 10):
- ``= Title`` / ``== Sub`` … → ``#`` / ``##`` … headings;
- ``* item`` / ``** nested`` → ``- item`` / two-space-indented ``- nested``;
- ``. item`` → ``1. item`` (GFM auto-numbering);
- everything else passes through the normalizer unchanged.
"""

from __future__ import annotations

import re

_ADOC_HEAD_RX = re.compile(r"^(=+)\s+(.*)$")
_ADOC_ULIST_RX = re.compile(r"^(\*+)\s+(.*)$")
_ADOC_OLIST_RX = re.compile(r"^(\.+)\s+(.*)$")


def normalize_markdown(text: str) -> str:
    lines = [ln.rstrip() for ln in text.split("\n")]
    out: list[str] = []
    blank = False
    for ln in lines:
        if ln == "":
            blank = True
            continue
        if blank and out:
            out.append("")
        blank = False
        out.append(ln)
    return "\n".join(out)


def asciidoc_to_markdown(text: str) -> str:
    out_lines: list[str] = []
    for ln in text.split("\n"):
        m = _ADOC_HEAD_RX.match(ln)
        if m:
            out_lines.append("#" * len(m.group(1)) + " " + m.group(2).strip())
            continue
        m = _ADOC_ULIST_RX.match(ln)
        if m:
            depth = len(m.group(1)) - 1
            out_lines.append("  " * depth + "- " + m.group(2).strip())
            continue
        m = _ADOC_OLIST_RX.match(ln)
        if m:
            depth = len(m.group(1)) - 1
            out_lines.append("  " * depth + "1. " + m.group(2).strip())
            continue
        out_lines.append(ln)
    return normalize_markdown("\n".join(out_lines))
