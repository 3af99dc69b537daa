"""HTML → Markdown extraction (main-content / boilerplate-strip path).

Re-implements, from scratch on the stdlib, the capability the reference
delegates to docling's HTML backend (beautifulsoup4 per
``poetry.lock:432``; invoked via ``service.py:80`` and exported via
``export_to_markdown(image_mode=PLACEHOLDER)`` ``service.py:46``), plus the
image-manifest post-pass ``_process_document_images``
(``service.py:41-66``) with its two quirks preserved:

- each picture replaces the **first** remaining ``<!-- image -->``
  placeholder, left to right, one at a time (``service.py:61``,
  ``str.replace(..., 1)``);
- tables extracted as images are **never** substituted into the markdown
  (no replace in the TableItem branch, ``service.py:53-56``).

Determinism contract (SURVEY.md §7.0): output is a pure function of
``(bytes, url, ExtractConfig)``. No wall clock, no dict-order dependence
(document order only), integer-ratio boilerplate heuristics, fixed
whitespace collapsing.

Markdown serialization spec (stable — golden fixtures depend on it):
- blocks joined by a single blank line ("\\n\\n"), no trailing newline;
- h1..h6 → ``#``*n + space + inline text;
- paragraphs → collapsed inline text;
- ul → ``- item``; ol → ``1. item`` (GFM auto-numbering), nesting indents
  by two spaces per level;
- tables → GFM pipes, first row is the header, ``---`` separator,
  ``|`` escaped as ``\\|``, colspan expanded with empty cells;
- pre/code blocks → fenced with ``` (content verbatim, trailing
  newline stripped);
- blockquote → each line prefixed ``> ``;
- hr → ``---``;
- ``<img>`` → ``<!-- image -->`` placeholder (then the picture rewrite
  pass above);
- inline: ``<b>/<strong>`` → ``**x**``, ``<i>/<em>`` → ``*x*``,
  ``<code>`` → `` `x` ``, ``<a href>`` → ``[text](href)``, ``<br>`` →
  newline within the block; runs of whitespace collapse to one space.

Boilerplate strip:
- tag blacklist dropped outright: script/style/noscript/template/nav/
  header/footer/aside/form/button/svg/iframe/select/datalist/dialog/
  object/embed/head;
- main-content root: the ``<main>``/``<article>`` subtree with the most
  text wins (ties → first in document order); else ``<body>``; else the
  whole tree;
- link-farm containers (div/section/ul/ol) dropped when
  ``link_chars * link_density_den >= total_chars * link_density_num``
  and the container holds at least ``min_container_chars`` characters —
  pure integer arithmetic, no float thresholds (§7.3).
"""

from __future__ import annotations

import base64
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from ..config import ExtractConfig

_WS_RX = re.compile(r"\s+")

VOID_TAGS = frozenset({
    "img", "br", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr", "param",
})

DROP_TAGS = frozenset({
    "script", "style", "noscript", "template", "nav", "header", "footer",
    "aside", "form", "button", "svg", "iframe", "select", "datalist",
    "dialog", "object", "embed", "head", "canvas", "map",
})

BLOCK_TAGS = frozenset({
    "h1", "h2", "h3", "h4", "h5", "h6", "p", "ul", "ol", "table", "pre",
    "blockquote", "hr", "div", "section", "article", "main", "figure",
    "figcaption", "details", "summary", "dl", "dt", "dd", "address",
    "fieldset", "center",
})

_CONTAINER_TAGS = frozenset({
    "div", "section", "article", "main", "figure", "details", "center",
    "fieldset", "body", "html",
})

_DENSITY_TAGS = frozenset({"div", "section", "ul", "ol"})


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or ())
        self.children: list = []  # Node | str
        self.parent = parent


class _TreeBuilder(HTMLParser):
    """Tolerant DOM builder: unmatched end tags are ignored, ``<p>``
    auto-closes on a new block tag, everything auto-closes at EOF —
    total-function requirement (``raises_on_error=False`` semantics,
    ``service.py:80``)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.cur.children.append(Node(tag, attrs, self.cur))
            return
        # implicit </p> / </li> before a new block or sibling li
        if tag in BLOCK_TAGS and self.cur.tag == "p":
            self.cur = self.cur.parent
        if tag == "li" and self.cur.tag == "li":
            self.cur = self.cur.parent
        node = Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, attrs, self.cur))

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.tag == tag and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            ch = self.cur.children
            # coalesce adjacent text nodes: the fast scanner and stdlib
            # flush text at different boundaries (e.g. a stray '<' is its
            # own stdlib flush); downstream stats must not depend on
            # segmentation (r2 soak find: a per-node whitespace collapse
            # at the link-density threshold flipped a container drop)
            if ch and isinstance(ch[-1], str):
                ch[-1] += data
            else:
                ch.append(data)


def parse_html_stdlib(text: str) -> Node:
    """Reference tokenizer (stdlib html.parser). Kept as the differential
    oracle for the fast scanner below; ~3x slower (it tracks source
    positions and re-scans per construct)."""
    tb = _TreeBuilder()
    tb.feed(text)
    tb.close()
    return tb.root


# one pass, one compiled alternation; group 1 = end-tag name, group 2 =
# start-tag name (attr blob is scanned by _scan_tag_end — a quote-aware
# char loop, NOT a regex: an ambiguous quoted-or-unquoted blob pattern
# backtracks exponentially on truncated tags full of quotes), group 3 =
# unterminated-construct marker (stdlib incomplete rule applies).
#: marked sections, exactly as _markupbase.parse_marked_section: the
#: keyword right after '<![' picks the close pattern — cdata-class
#: keywords close at ']' ws* ']' ws* '>', if-class at ']' ws* '>';
#: any OTHER keyword makes stdlib raise (tests skip those inputs, the
#: engine wraps them in error rows), and an unterminated section falls
#: to the incomplete rule via the '<!' head group.
#: keyword boundary = _markupbase._declname_match chars exactly
#: ([a-zA-Z][-_.a-zA-Z0-9]*) — NO colon: stdlib reads '<![if:x]>' as an
#: if-class section named 'if' with ':x' inside it (r3 advice fix)
_MS_CDATA = (r"<!\[(?i:temp|cdata|ignore|include|rcdata)"
             r"(?![-.a-zA-Z0-9_]).*?\]\s*\]\s*>")
_MS_IF = r"<!\[(?i:if|else|endif)(?![-.a-zA-Z0-9_]).*?\]\s*>"

_TOKEN_RX = re.compile(
    r"<!--.*?--\s*>"     # comment (stdlib close: '--' ws* '>')
    rf"|{_MS_CDATA}"              # CDATA-class marked section
    rf"|{_MS_IF}"                 # if-class marked section (<![if ...]>)
    r"|<!(?!--|\[)[^>]*>"         # declaration (never a comment/CDATA head)
    r"|<\?[^>]*>"                 # processing instruction
    r"|</\s*([a-zA-Z][^\t\n\r\f />\x00]*)[^>]*>"
    r"|</[^>]*>"                  # nameless end tag: bogus comment, skipped
    r"|<([a-zA-Z][^\t\n\r\f />\x00]*)"
    r"|(<[!?])",                  # unterminated construct head
    re.S)


#: fast path for the attribute region: UNAMBIGUOUS alternation — the
#: catch-all class excludes quote chars, so a quote can only match via a
#: completed ``name="value"`` pair (html.parser pairs a quote as a value
#: ONLY after an attribute name + '='; a bare ``="x"`` is a junk NAME
#: whose '>' ends the tag — r2 soak find). Tags with any other quote
#: shape fall to the stdlib-exact slow path. No alternative overlap ⇒
#: linear, never the exponential backtracking an ambiguous blob pattern
#: has on truncated quote-heavy tags. Possessive quantifiers/atomic
#: groups require Python >= 3.11 (declared in pyproject.toml).
_ATTR_PAIR = (r"[^\s<>\"'=/\x00][ \t\r\n]*=[ \t\r\n]*"
              r"(?:\"[^\"]*\"|'[^']*')")
_TAG_END_RX = re.compile(
    rf"((?:(?>{_ATTR_PAIR})|[^<>\"'=\x00]|=)*+)(/?)>")


# the stdlib's own tolerant start-tag regexes — imported, not copied, so
# the fast parser's hard-case classification is the reference parser's
# classification BY CONSTRUCTION (html.parser parse_starttag /
# check_for_whole_start_tag semantics, CPython 3.11)
from html.parser import (attrfind_tolerant as _ATTRFIND_RX,
                         locatestarttagend_tolerant as _LOCATE_RX,
                         tagfind_tolerant as _TAGFIND_RX)

_NAME_EQ_SLASH = frozenset("abcdefghijklmnopqrstuvwxyz=/"
                           "ABCDEFGHIJKLMNOPQRSTUVWXYZ")

#: html.parser's STRICT end-tag pattern (endtagfind): tried before the
#: tolerant name, so unicode whitespace between the name and '>' is
#: ignorable rather than part of the name
_ENDTAG_STRICT_RX = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")


def _stdlib_tag_end(text: str, s: int) -> tuple[str, int, bool]:
    """Exact ``html.parser`` classification of a start tag at ``s`` (the
    '<'). Returns (kind, endpos, selfclose):

    - ``('tag', endpos, selfclose)`` — a real start/startend tag ending
      at ``endpos``;
    - ``('incomplete', _, _)`` — stdlib's parse_starttag returns -1; the
      caller applies the goahead end-of-feed flush rule (to the next '>'
      inclusive, charref-converted — the ``<a b=">`` shape lands here:
      an unterminated quoted value is junk, NOT an open quote);
    - ``('data', endpos, _)`` — the junk-terminated shape stdlib flushes
      raw via ``handle_data(rawdata[i:endpos])``.
    """
    m = _LOCATE_RX.match(text, s)
    j = m.end()
    nxt = text[j:j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/":
        if text.startswith("/>", j):
            endpos = j + 2
        else:
            return ("incomplete", j, False)
    elif nxt == "" or nxt in _NAME_EQ_SLASH:
        return ("incomplete", j, False)
    else:
        endpos = j
    k = _TAGFIND_RX.match(text, s + 1).end()
    while k < endpos:
        am = _ATTRFIND_RX.match(text, k)
        if am is None:
            break
        k = am.end()
    end = text[k:endpos].strip()
    if end not in (">", "/>"):
        return ("data", endpos, False)
    return ("tag", endpos, end == "/>")


def _find_tag_end(text: str, pos: int, s: int) -> tuple[str, int, bool]:
    """Classify the start tag whose name ends at ``pos`` (tag '<' at
    ``s``). Regex fast path for the common case — an unambiguous
    attribute blob with paired quotes and no trailing '/' is a plain
    start tag in both this scanner and html.parser; everything else
    (trailing '/', unpaired quote, junk quotes, EOF truncation) goes to
    :func:`_stdlib_tag_end` for the reference's exact decision."""
    m = _TAG_END_RX.match(text, pos)
    if m is not None and not m.group(1).endswith("/") and not m.group(2):
        return ("tag", m.end(), False)
    return _stdlib_tag_end(text, s)


def _scan_tag_end(text: str, pos: int) -> tuple[int, int, bool]:
    """Scan a start tag's attribute region from ``pos`` (just past the tag
    name) to its closing '>'. Linear, quote-aware, and HTML5-faithful about
    the self-closing slash: '/' inside a quoted or unquoted attribute VALUE
    is data ('<a href=https://x/>' is NOT self-closing), '/' between
    attributes is. Returns (blob_end_exclusive, resume_pos, self_closing);
    blob_end == -1
    means EOF before '>' (caller applies the stdlib incomplete rule)."""
    n = len(text)
    j = pos
    quote = ""          # inside "..." or '...'
    unquoted = False    # inside an unquoted attribute value
    seen_eq = False     # just passed '=' (value comes next)
    slash = False       # a self-closing-position slash was last seen
    while j < n:
        ch = text[j]
        if quote:
            if ch == quote:
                quote = ""
        elif ch == ">":
            return (j - 1 if slash else j), j + 1, slash
        elif ch in "\"'":
            # a quote is a delimiter ONLY right after '=' (HTML5
            # before-attribute-value state); anywhere else it's a junk
            # name/value character like any other
            if seen_eq:
                quote = ch
                seen_eq = False
            slash = False
        elif ch in " \t\r\n":
            unquoted = False
            seen_eq = False
            slash = False
        elif ch == "=":
            seen_eq = True
            slash = False
        elif ch == "/":
            if seen_eq or unquoted:
                unquoted = True
                seen_eq = False
            else:
                slash = True
        else:
            if seen_eq or unquoted:
                unquoted = True
                seen_eq = False
            slash = False
        j += 1
    return -1, n, False


def _incomplete_end(text: str, i: int) -> int:
    """stdlib html.parser's rule for an incomplete construct at EOF-side
    parsing: flush data up to (and including) the next '>', else up to the
    next '<', else a single character."""
    k = text.find(">", i + 1)
    if k >= 0:
        return k + 1
    k = text.find("<", i + 1)
    if k >= 0:
        return k
    return i + 1

_ATTR_RX = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?")

#: script/style content is raw text in HTML5 — no tags inside. stdlib
#: semantics: the closer is '</' + optional whitespace + the EXACT tag
#: name + optional whitespace + '>'; '</scripty>' or '</script foo>' do
#: NOT close (they stay raw text).
_RAWTEXT_END = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}

#: DROP subtrees skipped at scan time — no nodes built for content the
#: emitter discards anyway (boilerplate is a large tag share of real
#: pages). The skip tracks ALL tags opened inside the region on a small
#: name stack: an end tag that matches nothing open inside the region
#: (e.g. '</div>' closing an ANCESTOR of a misnested '<nav>') aborts the
#: skip and falls back to tree building, which auto-closes correctly.
#: Comments and script/style raw text are consumed atomically so a
#: literal close tag inside them can't end the skip early. embed is void.
_DROP_SKIPPABLE = frozenset(DROP_TAGS - {"script", "style", "embed"})

#: one ANCHORED match per construct inside a skipped region, mirroring
#: _TOKEN_RX's full construct taxonomy: comments, CDATA, marked
#: sections, declarations/bogus comments (`<!...>` — these consume to
#: the first '>' and can swallow a literal close tag, so they MUST be
#: atomic here too), processing instructions, named close tags, nameless
#: close tags, and start tags with an unambiguous attr blob. Anything
#: that fails to match at its '<' (truncated tag, unpaired quote, junk
#: quotes) ABORTS the skip — the tree builder then applies the exact
#: stdlib semantics. Anchoring is the r2 fix: the old `search`-based
#: scanner skipped over constructs it didn't model (e.g. `<form><!</form>`
#: — the declaration swallows `</form>`, but search found the close tag
#: inside it and ended the region early).
_SKIP_TOKEN_RX = re.compile(
    r"<!--.*?--\s*>"
    rf"|{_MS_CDATA}"
    rf"|{_MS_IF}"
    r"|<!(?!--|\[)[^>]*>"
    r"|<\?[^>]*>"
    r"|</\s*([a-zA-Z][^\t\n\r\f />\x00]*+)[^>]*>"  # close: FIRST '>', as _TOKEN_RX
    r"|</[^>]*>"                                    # nameless close: bogus, no event
    # tag name is POSSESSIVE: backtracking must never donate name chars
    # to the blob, where they could form a false name="value" pair
    # (<nav =''> once matched as name 'na' + pair "v =''" — r2 soak find)
    r"|<([a-zA-Z][^\t\n\r\f />\x00]*+)"
    rf"((?:(?>{_ATTR_PAIR})|[^<>\"'=\x00]|=)*)>",
    re.S)

_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")

#: tags _pick_root may choose as the extraction root — a skip region
#: containing one must be tree-built, never consumed
_ROOT_CANDIDATE_TAGS = frozenset({"main", "article", "body"})

#: cheap candidate-end scan: same-tag depth only (6-ish events per region
#: instead of one per tag), comments/rawtext atomic — used to propose the
#: region for the memo cache; the full stack walk validates it once.
_DROP_CAND_RX = {
    t: re.compile(
        rf"<!--.*?--\s*>"
        rf"|<(/?){t}(?=[\s/>])(?:(?>{_ATTR_PAIR})|[^<>\"'=\x00]|=)*>"
        rf"|<(script|style)(?=[\s/>])(?:(?>{_ATTR_PAIR})|[^<>\"'=\x00]|=)*>",
        re.I | re.S)
    for t in _DROP_SKIPPABLE
}

#: validated-region memo: chrome repeats byte-identically across pages of
#: a site (and across this bench corpus), so each distinct region is
#: stack-validated once per worker; lookups are exact string compares.
_SKIP_CACHE: dict[str, bool] = {}
_SKIP_CACHE_MAX = 512


def _candidate_end(text: str, pos: int, tag: str):
    """Same-tag-depth scan for the region's candidate end position."""
    rx = _DROP_CAND_RX[tag]
    scan, depth = pos, 1
    while depth:
        m = rx.search(text, scan)
        if m is None:
            return None
        scan = m.end()
        if m.group(2) is not None:
            # trailing '/' is usually part of an unquoted value (stdlib/
            # HTML5), i.e. the script OPENS rawtext; ask the state machine
            selfclose = False
            if m.group(0).endswith("/>"):
                _, _, selfclose = _scan_tag_end(
                    text, m.start(2) + len(m.group(2)))
            if not selfclose:
                m3 = _RAWTEXT_END[m.group(2).lower()].search(text, scan)
                if m3 is None:
                    return None
                scan = m3.end()
            continue
        if m.group(1) is None:
            continue  # comment
        if m.group(1):
            depth -= 1
        else:
            # same self-closing classification as _try_skip_subtree: a
            # genuinely self-closing <nav/> must not add depth, and
            # <nav a=b/> (slash is value data per HTML5) must
            selfclose = False
            if m.group(0).endswith("/>"):
                _, _, selfclose = _scan_tag_end(
                    text, m.start() + 1 + len(tag))
            if not selfclose:
                depth += 1
    return scan


def _try_skip_subtree(text: str, pos: int, tag: str):
    """Attempt to consume the whole subtree of DROP tag ``tag`` starting
    just after its open tag at ``pos``. Returns the resume position, or
    None when skipping is unsafe — unclosed at EOF, an end tag crossing
    an ancestor boundary, or ANY construct this scanner can't interpret
    with tree-path fidelity (truncated tag, unpaired/junk quotes) — and
    the caller falls back to node building, which applies the exact
    stdlib semantics. Every construct is matched ANCHORED at its '<';
    bare '<' followed by a non-construct character is data, exactly as
    _TOKEN_RX treats it."""
    stack = [tag]
    scan = pos
    find = text.find
    match = _SKIP_TOKEN_RX.match
    while stack:
        lt = find("<", scan)
        if lt < 0:
            return None  # unclosed at EOF
        m = match(text, lt)
        if m is None:
            nxt = text[lt + 1:lt + 2]
            if nxt and nxt not in _ASCII_LETTERS and nxt not in "!?/":
                scan = lt + 1  # stray '<' is data (tree path: no token)
                continue
            return None  # truncated/unmodelable construct — abort
        scan = m.end()
        end_name = m.group(1)
        if end_name is not None:  # named closing tag
            sm = _ENDTAG_STRICT_RX.match(text, lt)
            name = (sm.group(1) if sm else end_name).lower()
            if name in stack:
                while stack[-1] != name:
                    stack.pop()
                stack.pop()
            elif name in VOID_TAGS:
                continue
            else:
                return None  # closes an ancestor outside the region
            continue
        name = m.group(2)
        if name is None:
            continue  # comment/CDATA/marked/decl/PI/bogus-close: no event
        name = name.lower()
        if name in _ROOT_CANDIDATE_TAGS:
            # a main/article/body INSIDE the boilerplate region could
            # become the extraction root (_pick_root searches the whole
            # tolerant tree) — the region must be built, not skipped
            return None
        selfclose = False
        if m.group(3).endswith("/"):
            # '/' ending an unquoted attribute VALUE is data, not a
            # self-close — same state machine as the tree path, else a
            # nested same-name tag like <nav a=b/> is wrongly treated
            # as self-closing, the region ends at the wrong close tag,
            # and boilerplate text leaks into the output
            _, _, selfclose = _scan_tag_end(text, m.start(2) + len(name))
        rt = _RAWTEXT_END.get(name)
        if rt is not None:
            if not selfclose:
                m3 = rt.search(text, scan)
                if m3 is None:
                    return None
                scan = m3.end()
            continue
        if name not in VOID_TAGS and not selfclose:
            stack.append(name)
    return scan


def _parse_attrs(blob: str) -> list:
    attrs = []
    for m in _ATTR_RX.finditer(blob):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            val = m.group(3)
        if val is None:
            val = m.group(4)
        if val is not None and "&" in val:
            from html import unescape
            val = unescape(val)
        attrs.append((name, val))
    return attrs


def parse_html(text: str) -> Node:
    """Fast single-pass tokenizer feeding the same tolerant tree builder.

    Matches parse_html_stdlib on the whole fixture corpus, an adversarial
    set, and a hypothesis random-soup differential. Attribute regions are
    scanned with a linear quote-aware char loop (no backtracking — a
    regex blob is exponential on truncated quote-heavy tags); entities
    decode only when an ampersand is present; stray '<' runs are data;
    incomplete constructs follow the stdlib flush rule; script/style
    bodies are raw text ended only by an exact-name close tag."""
    from html import unescape

    tb = _TreeBuilder()
    starttag = tb.handle_starttag
    startend = tb.handle_startendtag
    endtag = tb.handle_endtag
    data = tb.handle_data
    search = _TOKEN_RX.search
    pos, n = 0, len(text)
    while pos < n:
        m = search(text, pos)
        if m is None:
            chunk = text[pos:]
            data(unescape(chunk) if "&" in chunk else chunk)
            break
        s = m.start()
        if s > pos:
            chunk = text[pos:s]
            data(unescape(chunk) if "&" in chunk else chunk)
        pos = m.end()
        end_name = m.group(1)
        if end_name is not None:
            # stdlib resolves close-tag names with the STRICT pattern
            # first (trailing unicode whitespace is ignorable there:
            # </td > closes 'td'), falling back to the tolerant
            # name our token regex captured
            sm = _ENDTAG_STRICT_RX.match(text, s)
            endtag((sm.group(1) if sm else end_name).lower())
            continue
        name = m.group(2)
        if name is None:
            if m.group(3) is not None:
                # unterminated comment/decl/PI: stdlib incomplete rule —
                # flush up to the next '>' as data, resume parsing there
                pos = _incomplete_end(text, s)
                chunk = text[s:pos]
                data(unescape(chunk) if "&" in chunk else chunk)
            continue  # terminated comment / doctype / PI / CDATA
        tag = name.lower()
        kind, endpos, selfclose = _find_tag_end(text, pos, s)
        if kind == "incomplete":
            # stdlib goahead end-of-feed rule: flush to the next '>'
            # inclusive (else next '<', else one char), charref-converted
            pos = _incomplete_end(text, s)
            chunk = text[s:pos]
            data(unescape(chunk) if "&" in chunk else chunk)
            continue
        if kind == "data":
            # stdlib parse_starttag junk-terminated flush — RAW
            pos = endpos
            data(text[s:endpos])
            continue
        blob_end = endpos - (2 if selfclose else 1)
        blob = text[pos:blob_end]
        pos = endpos
        if not selfclose and tag in _DROP_SKIPPABLE:
            cand = _candidate_end(text, pos, tag)
            if cand is not None and text[pos:cand] in _SKIP_CACHE:
                pos = cand
                continue
            resume = _try_skip_subtree(text, pos, tag)
            if resume is not None:
                if resume == cand and len(_SKIP_CACHE) < _SKIP_CACHE_MAX:
                    _SKIP_CACHE[text[pos:cand]] = True
                pos = resume
                continue
            # unsafe to skip: fall through and build the node normally
        attrs = _parse_attrs(blob) if blob and not blob.isspace() else []
        if selfclose:
            startend(tag, attrs)
            continue
        starttag(tag, attrs)
        rt = _RAWTEXT_END.get(tag)
        if rt is not None:
            m2 = rt.search(text, pos)
            if m2 is not None:
                if m2.start() > pos:
                    data(text[pos:m2.start()])
                endtag(tag)
                pos = m2.end()
            else:
                if pos < n:
                    data(text[pos:])
                endtag(tag)
                pos = n
    tb.close()
    return tb.root


# ---------------------------------------------------------------- text stats

def _text_stats(node) -> tuple[int, int]:
    """(total_chars, link_chars) of collapsed text, excluding DROP_TAGS."""
    total = 0
    link = 0
    stack = [(node, False)]
    while stack:
        n, in_link = stack.pop()
        if isinstance(n, str):
            t = len(_WS_RX.sub(" ", n).strip())
            total += t
            if in_link:
                link += t
            continue
        if n.tag in DROP_TAGS:
            continue
        child_in_link = in_link or n.tag == "a"
        for c in n.children:
            stack.append((c, child_in_link))
    return total, link


# ------------------------------------------------------------------- blocks

@dataclass
class Block:
    kind: str
    text: str
    ref: str = ""


@dataclass
class _Ctx:
    cfg: ExtractConfig
    images: list = field(default_factory=list)
    n_pictures: int = 0
    n_tables: int = 0


def _inline(node, ctx: _Ctx) -> str:
    """Render inline content of a node (recursive)."""
    out = []
    for c in node.children:
        out.append(_inline_one(c, ctx))
    return "".join(out)


def _inline_one(c, ctx: _Ctx) -> str:
    if isinstance(c, str):
        return _WS_RX.sub(" ", c)
    tag = c.tag
    if tag in DROP_TAGS:
        return ""
    if tag == "br":
        return "\n"
    if tag == "img":
        ctx.n_pictures += 1
        src = c.attrs.get("src", "") or ""
        from .png_write import picture_png
        ctx.images.append({
            "type": "picture",
            "filename": f"picture-{ctx.n_pictures}.png",
            # a REAL decodable PNG (from-scratch stdlib encoder) standing
            # in for the reference's PIL rasterization (service.py:63):
            # md5-textured, dimensions derived from the src ref so the
            # driver oracle re-predicts them from the base64 bytes
            "image": base64.b64encode(picture_png(src)).decode("ascii"),
        })
        return "<!-- image -->"
    inner = _inline(c, ctx)
    if tag in ("b", "strong"):
        s = inner.strip()
        return f"**{s}**" if s else ""
    if tag in ("i", "em"):
        s = inner.strip()
        return f"*{s}*" if s else ""
    if tag in ("code", "kbd", "samp", "tt"):
        s = inner.strip()
        return f"`{s}`" if s else ""
    if tag == "a":
        label = inner.strip()
        href = (c.attrs.get("href") or "").strip()
        if not label:
            return ""
        if href:
            return f"[{label}]({href})"
        return label
    return inner


def _collapse(s: str) -> str:
    # collapse per-line (hard breaks from <br> survive), strip edges
    lines = [_WS_RX.sub(" ", ln).strip() for ln in s.split("\n")]
    lines = [ln for ln in lines if ln]
    return "\n".join(lines)


def _is_blockish(c) -> bool:
    return not isinstance(c, str) and c.tag in BLOCK_TAGS


def _list_blocks(node, ctx: _Ctx, depth: int, ordered: bool, out_lines: list):
    idx = 0
    for c in node.children:
        if isinstance(c, str) or c.tag != "li":
            continue
        idx += 1
        marker = "1." if ordered else "-"
        # split li content into inline head + nested lists
        head_parts = []
        nested = []
        for g in c.children:
            if not isinstance(g, str) and g.tag in ("ul", "ol"):
                nested.append(g)
            elif not isinstance(g, str) and g.tag in DROP_TAGS:
                continue
            else:
                head_parts.append(_inline_one(g, ctx))
        head = _collapse("".join(head_parts)).replace("\n", " ")
        out_lines.append(f"{'  ' * depth}{marker} {head}".rstrip())
        for g in nested:
            _list_blocks(g, ctx, depth + 1, g.tag == "ol", out_lines)


def _table_block(node, ctx: _Ctx) -> str | None:
    rows = []
    def collect(n):
        for c in n.children:
            if isinstance(c, str):
                continue
            if c.tag in ("thead", "tbody", "tfoot"):
                collect(c)
            elif c.tag == "tr":
                cells = []
                for cell in c.children:
                    if isinstance(cell, str) or cell.tag not in ("td", "th"):
                        continue
                    txt = _collapse(_inline(cell, ctx)).replace("\n", " ")
                    txt = txt.replace("|", "\\|")
                    cells.append(txt)
                    try:
                        span = int(cell.attrs.get("colspan", "1"))
                    except (TypeError, ValueError):
                        span = 1
                    cells.extend([""] * max(0, span - 1))
                rows.append(cells)
    collect(node)
    rows = [r for r in rows if r]
    if not rows:
        return None
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    lines = ["| " + " | ".join(rows[0]) + " |",
             "| " + " | ".join(["---"] * width) + " |"]
    for r in rows[1:]:
        lines.append("| " + " | ".join(r) + " |")
    if ctx.cfg.extract_tables_as_images:
        ctx.n_tables += 1
        from .png_write import table_png
        ctx.images.append({
            "type": "table",
            "filename": f"table-{ctx.n_tables}.png",
            # a real rasterization of the table STRUCTURE (white cells,
            # black gridlines, one cell per row×col) — the sandbox-honest
            # counterpart of the reference's PIL table render
            "image": base64.b64encode(
                table_png(len(rows), width)).decode("ascii"),
        })
    return "\n".join(lines)


def _pre_text(node) -> str:
    parts = []
    def walk(n):
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag == "br":
                parts.append("\n")
            elif c.tag not in DROP_TAGS:
                walk(c)
    walk(node)
    return "".join(parts)


def _flush_para(buf: list, blocks: list[Block]):
    if not buf:
        return
    text = _collapse("".join(buf))
    buf.clear()
    if text:
        blocks.append(Block("paragraph", text))


def _emit_blocks(node, ctx: _Ctx, blocks: list[Block]):
    """Flow-content walker: inline runs become paragraphs; block elements
    emit their own blocks; containers recurse (after the link-density
    gate)."""
    buf: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            buf.append(_WS_RX.sub(" ", c))
            continue
        tag = c.tag
        if tag in DROP_TAGS:
            continue
        if tag not in BLOCK_TAGS:
            buf.append(_inline_one(c, ctx))
            continue
        _flush_para(buf, blocks)
        if tag in _DENSITY_TAGS or tag in _CONTAINER_TAGS:
            total, link = _text_stats(c)
            cfg = ctx.cfg
            if (tag in _DENSITY_TAGS and total >= cfg.min_container_chars
                    and link * cfg.link_density_den >= total * cfg.link_density_num):
                continue  # link farm — boilerplate
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            text = _collapse(_inline(c, ctx)).replace("\n", " ")
            if text:
                blocks.append(Block("heading", "#" * int(tag[1]) + " " + text, ref=text))
        elif tag == "p" or tag in ("dt", "dd", "address", "summary", "figcaption"):
            text = _collapse(_inline(c, ctx))
            if text:
                blocks.append(Block("paragraph", text))
        elif tag in ("ul", "ol"):
            lines: list[str] = []
            _list_blocks(c, ctx, 0, tag == "ol", lines)
            if lines:
                blocks.append(Block("list", "\n".join(lines)))
        elif tag == "table":
            t = _table_block(c, ctx)
            if t:
                blocks.append(Block("table", t))
        elif tag == "pre":
            raw = _pre_text(c)
            raw = raw.strip("\n")
            blocks.append(Block("code", f"```\n{raw}\n```"))
        elif tag == "blockquote":
            sub: list[Block] = []
            _emit_blocks(c, ctx, sub)
            if sub:
                inner = "\n\n".join(b.text for b in sub)
                quoted = "\n".join(
                    ("> " + ln).rstrip() for ln in inner.split("\n"))
                blocks.append(Block("quote", quoted))
        elif tag == "hr":
            blocks.append(Block("rule", "---"))
        else:  # container: div/section/article/main/figure/dl/details/...
            _emit_blocks(c, ctx, blocks)
    _flush_para(buf, blocks)


# ------------------------------------------------------------- root picking

def _find_all(node, tags: frozenset) -> list[Node]:
    found = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag in tags:
            found.append(n)
        # reversed → document order when popping
        for c in reversed(n.children):
            if not isinstance(c, str):
                stack.append(c)
    return found


def _pick_root(root: Node) -> Node:
    mains = _find_all(root, frozenset({"main", "article"}))
    if mains:
        best = None
        best_len = -1
        for m in mains:  # document order; strict > keeps the first on ties
            total, _ = _text_stats(m)
            if total > best_len:
                best, best_len = m, total
        return best
    bodies = _find_all(root, frozenset({"body"}))
    if bodies:
        return bodies[0]
    return root


# ---------------------------------------------------------------- top level

@dataclass
class ExtractResult:
    markdown: str
    images: list
    spans: list


def extract_html(text: str, cfg: ExtractConfig) -> ExtractResult:
    """Parse HTML text and serialize main content to Markdown.

    Returns markdown + images manifest + per-block spans. Never raises on
    malformed input (tolerant tree builder)."""
    root = parse_html(text)
    content_root = _pick_root(root)
    ctx = _Ctx(cfg=cfg)
    blocks: list[Block] = []
    _emit_blocks(content_root, ctx, blocks)

    # picture placeholder rewrite — service.py:61 semantics: for each picture
    # in order, replace the FIRST remaining placeholder; tables never rewritten
    # (service.py:53-56 quirk).
    pictures = [im for im in ctx.images if im["type"] == "picture"]
    for im in pictures:
        for b in blocks:
            if "<!-- image -->" in b.text:
                b.text = b.text.replace("<!-- image -->", im["filename"], 1)
                break

    spans = []
    pos = 0
    parts = []
    for i, b in enumerate(blocks):
        if i:
            pos += 2  # "\n\n"
        start = pos
        parts.append(b.text)
        pos += len(b.text)
        spans.append({"start": start, "end": pos, "kind": b.kind, "ref": b.ref})
    markdown = "\n\n".join(parts)
    return ExtractResult(markdown=markdown, images=ctx.images, spans=spans)
