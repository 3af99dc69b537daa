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


# ---------------------------------------------------------- block spans

_HEAD_SPAN_RX = re.compile(r"^(#+) (.*)")
_OLIST_SPAN_RX = re.compile(r"^\d+\. ")


def _classify_block(block: str) -> tuple[str, str]:
    m = _HEAD_SPAN_RX.match(block)
    if m:
        return "heading", m.group(2).split("\n", 1)[0]
    if block.startswith(("- ", "* ")) or _OLIST_SPAN_RX.match(block):
        return "list", ""
    if block.startswith("|"):
        return "table", ""
    if block.startswith("> "):
        return "quote", ""
    if block.startswith("```"):
        return "code", ""
    if block == "---":
        return "rule", ""
    return "paragraph", ""


def block_spans(markdown: str) -> list[dict]:
    """Per-block (start, end, kind, ref) offsets into serializer-produced
    markdown — the C7 span contract for the non-HTML formats (r3: they
    previously carried one whole-document span; the HTML path tracks
    spans during serialization and keeps doing so). Blocks are the
    ``\\n\\n``-separated segments; a blank line inside an open ``\\`\\`\\```
    fence does NOT split (arbitrary MD passthrough can hold blank lines
    in code). kind = heading/list/table/quote/code/rule/paragraph;
    heading ref = the heading text, matching the HTML path."""
    if markdown == "":
        return []
    spans: list[dict] = []
    pos = 0
    pending_start: int | None = None
    fence_open = False
    for part in markdown.split("\n\n"):
        start, end = pos, pos + len(part)
        pos = end + 2
        if pending_start is None:
            pending_start = start
        ticks = sum(1 for ln in part.split("\n") if ln.startswith("```"))
        if ticks % 2 == 1:
            fence_open = not fence_open
        if fence_open:
            continue
        kind, ref = _classify_block(markdown[pending_start:end])
        spans.append({"start": pending_start, "end": end,
                      "kind": kind, "ref": ref})
        pending_start = None
    if pending_start is not None:  # unterminated fence: one block to EOF
        spans.append({"start": pending_start, "end": len(markdown),
                      "kind": "code", "ref": ""})
    return spans
