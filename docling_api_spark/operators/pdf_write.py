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


def _text_encoder(font_encoding):
    """str→bytes for content-stream string operands. ``None`` →
    latin-1 (the classic fixture default); ``"winansi"`` → cp1252;
    a dict ``{code: glyph_name}`` → those chars map to the REMAPPED
    code (base WinAnsi for the rest) and the font must carry the
    matching /Differences array — a reader that ignores Differences
    decodes the base-encoding char at that code, visibly wrong;
    ``("tounicode", {code: text})`` → those texts (single chars or
    multi-char ligatures) map to control-code bytes only a /ToUnicode
    CMap can recover — the embedded-subset-font pattern."""
    if font_encoding is None:
        return lambda s: s.encode("latin-1")
    if font_encoding == "winansi":
        return lambda s: s.encode("cp1252")
    if isinstance(font_encoding, tuple) and font_encoding[0] == "cid":
        # Type0/Identity-H: 2-byte codes; ASCII rides an identity
        # bfrange, extras get codes >= 0x100 recovered only via the
        # ToUnicode CMap
        mapping = font_encoding[1]
        for code in mapping:
            if not 0x100 <= code <= 0xFFFF:
                raise ValueError(
                    f"cid fixture code {code:#x} must be >= 0x100 "
                    "(ASCII rides the identity bfrange)")
        rev_cid = {s: c for c, s in mapping.items()}
        keys_cid = sorted(rev_cid, key=len, reverse=True)

        def enc_cid(s: str) -> bytes:
            out = bytearray()
            i = 0
            while i < len(s):
                for k in keys_cid:
                    if s.startswith(k, i):
                        out += rev_cid[k].to_bytes(2, "big")
                        i += len(k)
                        break
                else:
                    ch = s[i]
                    if not 0x20 <= ord(ch) <= 0x7E:
                        raise ValueError(
                            f"char {ch!r} not in CID map")
                    out += ord(ch).to_bytes(2, "big")
                    i += 1
            return bytes(out)
        return enc_cid
    if isinstance(font_encoding, tuple) and font_encoding[0] in (
            "tounicode", "tounicode_arr"):
        mapping = font_encoding[1]
        for code in mapping:
            # codes must be control bytes (no ASCII/parens/CR/LF
            # collisions inside literal strings)
            if not 1 <= code <= 0x1F or code in (0x0A, 0x0D):
                raise ValueError(
                    f"tounicode fixture code {code:#x} must be a "
                    "control byte (not CR/LF)")
        rev = {s: c for c, s in mapping.items()}
        keys = sorted(rev, key=len, reverse=True)

        def enc_tu(s: str) -> bytes:
            out = bytearray()
            i = 0
            while i < len(s):
                for k in keys:
                    if s.startswith(k, i):
                        out.append(rev[k])
                        i += len(k)
                        break
                else:
                    ch = s[i]
                    if ord(ch) >= 128:
                        raise ValueError(
                            f"char {ch!r} not in ToUnicode map")
                    out += ch.encode("ascii")
                    i += 1
            return bytes(out)
        return enc_tu
    from .pdf_extract import _AGL
    rev = {_AGL[g]: code for code, g in font_encoding.items()}
    taken = set(font_encoding)

    def enc(s: str) -> bytes:
        out = bytearray()
        for ch in s:
            if ch in rev:
                out.append(rev[ch])
                continue
            b = ch.encode("cp1252")
            if len(b) == 1 and b[0] in taken:
                # the base char at a remapped code no longer exists in
                # this font — emitting it would decode as the glyph
                raise ValueError(
                    f"char {ch!r} unencodable: code {b[0]:#x} is "
                    f"remapped by /Differences")
            out += b
        return bytes(out)
    return enc


def _tounicode_stream(mapping: dict[int, str], compress: bool,
                      two_byte: bool = False,
                      array_form: bool = False) -> bytes:
    """A §9.10.3 ToUnicode CMap stream body: bfchar entries with
    UTF-16BE destinations. ``two_byte`` (Type0/Identity-H) switches to
    the <0000><FFFF> codespace, 4-hex-digit srcs, and prepends the
    ASCII identity bfrange real generators emit. ``array_form``
    (notch 9) emits the mapping as ARRAY-form bfrange rows instead —
    consecutive codes grouped into ``<lo> <hi> [<d1> <d2> …]`` runs,
    the form subset-font generators produce for non-consecutive
    destinations."""
    w = 4 if two_byte else 2
    space = ("<0000> <FFFF>" if two_byte else "<00> <FF>")
    ranges = ("1 beginbfrange\n<0020> <007E> <0020>\nendbfrange\n"
              if two_byte else "")
    if array_form:
        runs: list[list[tuple[int, str]]] = []
        for c, s in sorted(mapping.items()):
            if runs and c == runs[-1][-1][0] + 1:
                runs[-1].append((c, s))
            else:
                runs.append([(c, s)])
        rows = [
            f"<{run[0][0]:0{w}X}> <{run[-1][0]:0{w}X}> ["
            + " ".join(f"<{s.encode('utf-16-be').hex().upper()}>"
                       for _, s in run) + "]"
            for run in runs]
        body = (f"{len(rows)} beginbfrange\n" + "\n".join(rows)
                + "\nendbfrange\n")
    else:
        lines = [f"<{c:0{w}X}> <{s.encode('utf-16-be').hex().upper()}>"
                 for c, s in sorted(mapping.items())]
        body = (f"{len(lines)} beginbfchar\n" + "\n".join(lines)
                + "\nendbfchar\n")
    cmap = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        f"1 begincodespacerange\n{space}\nendcodespacerange\n"
        + ranges + body
        + "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    ).encode("latin-1")
    if compress:
        data = zlib.compress(cmap, 6)
        head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
    else:
        data = cmap
        head = f"<< /Length {len(data)} >>".encode()
    return head + b"\nstream\n" + data + b"\nendstream"


_CID_DESCENDANT = (
    b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Helvetica"
    b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
    b" /Supplement 0 >> /CIDToGIDMap /Identity >>")


def _font_body(font_encoding, tounicode_id: int | None = None,
               descendant_id: int | None = None) -> bytes:
    if descendant_id is not None:
        # Type0 composite font (r5): Identity-H, 2-byte codes
        return (f"<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica"
                f" /Encoding /Identity-H"
                f" /DescendantFonts [{descendant_id} 0 R]"
                f" /ToUnicode {tounicode_id} 0 R >>").encode("latin-1")
    base = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
    if tounicode_id is not None:
        return (base + f" /ToUnicode {tounicode_id} 0 R >>"
                ).encode("latin-1")
    if font_encoding is None:
        return (base + " >>").encode("latin-1")
    if font_encoding == "winansi":
        return (base + " /Encoding /WinAnsiEncoding >>").encode("latin-1")
    diffs = " ".join(f"{code} /{name}"
                     for code, name in sorted(font_encoding.items()))
    return (base + " /Encoding << /Type /Encoding"
            " /BaseEncoding /WinAnsiEncoding"
            f" /Differences [ {diffs} ] >> >>").encode("latin-1")


def content_stream(blocks: list[tuple[float, float, float, list[str]]],
                   leading: float = 14.0, encode=None,
                   hex_strings: bool = False) -> bytes:
    """blocks = [(x, y, font_size, lines)] — y is the baseline of the first
    line; subsequent lines step down by ``leading``. ``encode`` maps each
    escaped string operand to bytes (default latin-1). ``hex_strings``
    emits ``<...> Tj`` instead of literal strings — what real generators
    write for subset-encoded (ToUnicode) fonts; hex needs no escaping."""
    if encode is None:
        encode = lambda s: s.encode("latin-1")  # noqa: E731
    parts = [b"BT"]
    for x, y, size, lines in blocks:
        parts.append(f"/F1 {size:g} Tf".encode("latin-1"))
        cy = y
        for i, line in enumerate(lines):
            if i == 0:
                parts.append(f"1 0 0 1 {x:g} {cy:g} Tm".encode("latin-1"))
            else:
                cy -= leading
                parts.append(f"1 0 0 1 {x:g} {cy:g} Tm".encode("latin-1"))
            if hex_strings:
                parts.append(
                    b"<" + encode(line).hex().upper().encode("ascii")
                    + b"> Tj")
            else:
                parts.append(b"(" + encode(_escape(line)) + b") Tj")
    parts.append(b"ET")
    return b"\n".join(parts)


def _lzw_encode(data: bytes) -> bytes:
    """§7.4.4 LZW encoder (EarlyChange=1), MSB-first bit packing —
    the writer half of the differential pair with pdf_extract's
    decoder. Leads with a clear code (what real legacy writers emit),
    widens one entry early, clears before the 12-bit table fills."""
    out = bytearray()
    buf = nbits = 0

    def emit(code: int, width: int):
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nextcode, width = 258, 9
    emit(256, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = nextcode
        nextcode += 1
        # the decoder's table lags the encoder's by ONE entry at each
        # code boundary (it can only build the previous code's
        # extension), so the encoder widens at nextcode >= 2^width —
        # one step LATER than the decoder's count+1 >= 2^width rule,
        # which is the same wire schedule (verified by the round-trip
        # property over width-crossing inputs)
        if nextcode >= (1 << width) and width < 12:
            width += 1
        elif nextcode >= 4095:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nextcode, width = 258, 9
        w = bytes([b])
    if w:
        emit(table[w], width)
        # the decoder adds one more entry for this final code and may
        # widen before reading EOD — mirror it so EOD lands at the
        # width the decoder will read it with
        if nextcode + 1 >= (1 << width) and width < 12:
            width += 1
    emit(257, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """§7.4.5 RunLengthDecode writer half: repeat runs ≥3 become
    (257−count, byte); everything else rides literal runs ≤128."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            if lit_start < i:
                lit = data[lit_start:i]
                for k in range(0, len(lit), 128):
                    chunk = lit[k:k + 128]
                    out += bytes([len(chunk) - 1]) + chunk
            out += bytes([257 - (j - i), data[i]])
            i = j
            lit_start = i
        else:
            i = j
    if lit_start < n:
        lit = data[lit_start:n]
        for k in range(0, len(lit), 128):
            chunk = lit[k:k + 128]
            out += bytes([len(chunk) - 1]) + chunk
    out.append(128)
    return bytes(out)


def _encode_stream(data: bytes, compress: bool,
                   stream_filter: str | None = None) -> tuple[bytes, bytes]:
    """→ (dict_head, payload) for a content stream. ``stream_filter``
    (r5 notch 7) overrides the plain/Flate choice: ``"ahx"`` →
    /ASCIIHexDecode (hex + '>' EOD), ``"a85"`` → /ASCII85Decode
    (ascii85 + '~>' EOD), ``"a85+flate"`` → the §7.4 filter ARRAY
    ``[/ASCII85Decode /FlateDecode]`` — ascii85 transport coding
    wrapped around Flate, the chain PostScript-derived real PDFs
    carry (decode order = array order: a85 first, then inflate)."""
    import base64
    if stream_filter is None:
        if compress:
            z = zlib.compress(data, 6)
            return (f"<< /Length {len(z)} /Filter /FlateDecode >>"
                    .encode(), z)
        return f"<< /Length {len(data)} >>".encode(), data
    if stream_filter == "ahx":
        enc = data.hex().upper().encode("ascii") + b">"
        return (f"<< /Length {len(enc)} /Filter /ASCIIHexDecode >>"
                .encode(), enc)
    if stream_filter == "a85":
        enc = base64.a85encode(data) + b"~>"
        return (f"<< /Length {len(enc)} /Filter /ASCII85Decode >>"
                .encode(), enc)
    if stream_filter == "a85+flate":
        enc = base64.a85encode(zlib.compress(data, 6)) + b"~>"
        return (f"<< /Length {len(enc)} "
                f"/Filter [/ASCII85Decode /FlateDecode] >>"
                .encode(), enc)
    if stream_filter == "lzw":
        enc = _lzw_encode(data)
        return (f"<< /Length {len(enc)} /Filter /LZWDecode >>"
                .encode(), enc)
    if stream_filter == "rle":
        enc = _rle_encode(data)
        return (f"<< /Length {len(enc)} /Filter /RunLengthDecode >>"
                .encode(), enc)
    raise ValueError(f"unknown stream_filter {stream_filter!r}")


def _split_stream(cs: bytes, k: int) -> list[bytes]:
    """Split a serialized content stream into ``k`` pieces at newline
    boundaries nearest the equal-size marks — the shape real writers
    produce when they flush buffers or when tools prepend/append
    streams: ``BT``/``ET`` and the text state routinely CROSS the
    stream boundary, and §7.8.2 says the page content is the
    concatenation of the streams (with whitespace between)."""
    if k <= 1 or len(cs) < 2 * k:
        return [cs]
    cuts = [0]
    for j in range(1, k):
        want = (len(cs) * j) // k
        cut = cs.find(b"\n", want)
        if cut < 0 or cut + 1 <= cuts[-1]:
            continue
        cuts.append(cut + 1)
    cuts.append(len(cs))
    return [cs[a:b] for a, b in zip(cuts, cuts[1:]) if b > a]


def _encrypt_objects(dict_objs: list[tuple[int, bytes]],
                     stream_objs: list[tuple[int, bytes]],
                     r: int, user_pwd: bytes
                     ) -> tuple[list[tuple[int, bytes]], bytes,
                                tuple[bytes, str]]:
    """Standard-security encryption (notches 8/10) applied at
    serialize time: every top-level stream payload is enciphered with
    its per-object key (§7.6.2 Algorithm 1 — encryption applies to the
    bytes AS STORED, i.e. after Flate/ASCII filters); /O, /U, the file
    key and a deterministic /ID derive from the spec math in
    :mod:`.pdf_crypt`. ``r`` 2/3 → RC4 (40/128-bit, length-preserving);
    ``r`` 4 → V4 crypt filters with /CFM /AESV2 (AES-128-CBC, IV
    prepended + PKCS#5 padding — the stream grows, so the dict's
    direct /Length is patched; the IV derives deterministically from
    the object number + plaintext so fixtures stay reproducible).
    Returns (stream_objs + the Encrypt dict object, trailer_extra,
    (file_key, kind)). The Encrypt dict rides the ``stream_objs`` list
    so BOTH serializers place it top-level — §7.5.7 forbids it inside
    an object stream. The fixture grammar's dict bodies carry no
    strings, so only streams need transforming (dict-level string
    encryption is out of grammar, as is encrypting an incremental
    update chain — ``append_update`` bases must stay unencrypted).

    ``r`` 5/6 (notch 11b) → V5 with /CFM /AESV3: AES-256-CBC streams
    under the SHA-2 handler — the 32-byte file key derives
    deterministically from the content id, /U //UE //O //OE //Perms
    from the §7.6.4 writer algorithms (R5 = the deprecated one-SHA-256
    revision, R6 = the hardened-2.B standard)."""
    import hashlib
    import re as _re

    from . import pdf_crypt as C

    aes = r >= 4
    n = 5 if r == 2 else 16
    p = -44                       # print allowed, modify denied
    id0 = hashlib.md5(b"".join(
        num.to_bytes(4, "big") + body
        for num, body in dict_objs + stream_objs)).digest()
    if r >= 5:
        key = hashlib.sha256(b"fk" + id0).digest()
        vsalt, ksalt = (hashlib.md5(b"vs" + id0).digest()[:8],
                        hashlib.md5(b"ks" + id0).digest()[:8])
        u, ue = C.v5_values(key, user_pwd, vsalt, ksalt, r)
        ovs, oks = (hashlib.md5(b"ov" + id0).digest()[:8],
                    hashlib.md5(b"ok" + id0).digest()[:8])
        o, oe = C.v5_values(key, b"fixture-owner", ovs, oks, r, udata=u)
        perms = C.perms_value(key, p, tail=id0)
    else:
        o = C.o_value(b"fixture-owner", user_pwd, r, n)
        key = C.file_key(user_pwd, o, p, id0, r, n)
        u = C.u_value(key, id0, r)
    out: list[tuple[int, bytes]] = []
    for num, body in stream_objs:
        sm = body.find(b"\nstream\n")
        if sm >= 0 and body.endswith(b"\nendstream"):
            payload = body[sm + len(b"\nstream\n"):-len(b"\nendstream")]
            head = body[:sm]
            if aes:
                iv = hashlib.md5(b"iv" + num.to_bytes(4, "big")
                                 + payload).digest()
                enc = C.aes_cbc_encrypt(
                    C.stream_object_key(key, "aes", num), iv, payload)
                head = _re.sub(rb"/Length \d+",
                               b"/Length %d" % len(enc), head, count=1)
            else:
                enc = C.rc4(C.object_key(key, num, 0), payload)
            body = head + b"\nstream\n" + enc + b"\nendstream"
        out.append((num, body))
    eid = max(num for num, _ in dict_objs + stream_objs) + 1
    if r >= 5:
        enc_dict = (
            f"<< /Filter /Standard /V 5 /R {r} /Length 256 /P {p} "
            f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/O <{o.hex()}> /U <{u.hex()}> "
            f"/OE <{oe.hex()}> /UE <{ue.hex()}> /Perms <{perms.hex()}> >>")
    elif aes:
        enc_dict = (
            f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {p} "
            f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/O <{o.hex()}> /U <{u.hex()}> >>")
    else:
        enc_dict = (
            f"<< /Filter /Standard /V {1 if r == 2 else 2} /R {r} "
            f"/Length {n * 8} /P {p} /O <{o.hex()}> /U <{u.hex()}> >>")
    out.append((eid, enc_dict.encode("latin-1")))
    trailer_extra = (f"/Encrypt {eid} 0 R /ID [<{id0.hex()}> "
                     f"<{id0.hex()}>] ").encode("latin-1")
    return out, trailer_extra, (key, "aes" if aes else "rc4")


def image_xobject(pw: int, ph: int, pixels: bytes,
                  codec: str = "flate") -> bytes:
    """An 8-bit /DeviceGray /Subtype /Image XObject body (r6 notch
    11a): ``codec`` 'flate' → /FlateDecode over the raw raster,
    'dct' → /DCTDecode carrying a baseline grayscale JPEG
    (:mod:`.jpeg_codec`) — the two encodings that carry essentially
    all real web-PDF raster content."""
    parms = ""
    if codec == "flate":
        data = zlib.compress(pixels, 6)
        filt = "/FlateDecode"
    elif codec == "flate-png":
        # r6: the /Predictor 15 coding real PDF writers emit — rows
        # Up-filtered (type 2) before Flate, decoder handles any of
        # the five row types by construction
        from .png_write import filter_rows_up
        data = zlib.compress(filter_rows_up(pixels, pw), 6)
        filt = "/FlateDecode"
        parms = (f"/DecodeParms << /Predictor 15 /Colors 1 "
                 f"/BitsPerComponent 8 /Columns {pw} >> ")
    elif codec == "dct":
        from .jpeg_codec import encode_gray_jpeg
        data = encode_gray_jpeg(pw, ph, pixels)
        filt = "/DCTDecode"
    else:
        raise ValueError(f"unknown image codec {codec!r}")
    head = (f"<< /Type /XObject /Subtype /Image /Width {pw} "
            f"/Height {ph} /ColorSpace /DeviceGray "
            f"/BitsPerComponent 8 /Filter {filt} {parms}"
            f"/Length {len(data)} >>").encode("latin-1")
    return head + b"\nstream\n" + data + b"\nendstream"


def write_pdf(pages: list[list[tuple[float, float, float, list[str]]]],
              compress: bool = False, xref_stream: bool = False,
              font_encoding=None, split_contents: int = 1,
              nested_kids: bool = False,
              stream_filter: str | None = None,
              encrypt_r: int | None = None,
              encrypt_user_pwd: bytes = b"",
              images: list[list[tuple]] | None = None,
              forms: list[list[tuple]] | None = None) -> bytes:
    """pages = list of pages; each page a list of (x, y, size, lines)
    blocks. ``xref_stream=True`` (r5) emits the PDF 1.5 layout real
    Common-Crawl PDFs near-universally use: all dict-only objects
    (catalog, page tree, font, page dicts) packed Flate-compressed into
    one ``/Type /ObjStm`` container, plus a binary ``/Type /XRef``
    cross-reference STREAM (W [1 4 2] type/offset/gen rows) instead of
    the classic ``xref`` table — the reference reads these via
    docling-parse (poetry.lock:503-504). ``font_encoding`` (r5):
    None → latin-1 strings, ``"winansi"`` → /Encoding /WinAnsiEncoding
    + cp1252 strings, a ``{code: glyph_name}`` dict → a /Differences
    array over /WinAnsiEncoding with string bytes remapped to match
    (see :func:`_text_encoder`).

    r5 notch 6 — ``split_contents=k`` splits each page's content into
    k separately-compressed streams referenced by an ARRAY
    ``/Contents [c1 0 R … ck 0 R]`` (§7.8.2 — ubiquitous in real PDFs;
    BT/ET and text state cross the stream boundaries);
    ``nested_kids=True`` builds a page TREE (root /Pages → two
    intermediate /Pages nodes → leaf pages, §7.7.3.2 — how real
    writers balance large documents) and moves ``/Resources`` to the
    ROOT node so leaf pages INHERIT the font (§7.7.3.4) — a reader
    that does not walk the tree or inherit resources extracts nothing
    or mojibake. The two flags use their own object numbering;
    ``append_update`` bases must not use them (its content-id formula
    assumes the classic layout). ``stream_filter`` (r5 notch 7)
    replaces the plain/Flate choice for CONTENT streams with
    /ASCIIHexDecode, /ASCII85Decode, or the [/ASCII85Decode
    /FlateDecode] chain (see :func:`_encode_stream`); the ToUnicode
    CMap and ObjStm containers keep their own Flate coding — real
    files routinely mix filters per stream.

    ``images`` (r6 notch 11a) — per-page lists of
    ``(x, y_top, pw, ph, pixels, codec)``: each becomes a /DeviceGray
    image XObject (:func:`image_xobject`) named in the page's
    /Resources /XObject dict and painted by a ``q pw 0 0 ph x
    (y_top−ph) cm /ImN Do Q`` sequence appended to the content stream
    — the standard raster-painting idiom, so the reader's ``cm``/``Do``
    tracking is exercised at the real wire shape. Classic and
    xref-stream layouts only (the tree/split layouts keep their own
    numbering).

    ``forms`` (r6) — per-page lists of ``(x, y, blocks)``: each
    becomes a ``/Subtype /Form`` XObject whose content is
    :func:`content_stream` over ``blocks`` (identity /Matrix, page
    BBox), painted by ``q 1 0 0 1 x y cm /FmN Do Q`` — the
    letterhead/generated-content pattern where page TEXT lives inside
    a reusable XObject. Same layout restriction as ``images``."""
    if split_contents > 1 or nested_kids:
        return _write_pdf_tree(pages, compress, xref_stream,
                               font_encoding, split_contents,
                               nested_kids, stream_filter,
                               encrypt_r, encrypt_user_pwd,
                               images, forms)
    encode = _text_encoder(font_encoding)
    n_pages = len(pages)
    kind = (font_encoding[0]
            if isinstance(font_encoding, tuple) else None)
    tounicode = (font_encoding[1]
                 if kind in ("tounicode", "tounicode_arr", "cid")
                 else None)
    # obj 1: catalog, obj 2: pages, obj 3: font, then per page:
    # page obj + content obj; the optional ToUnicode CMap stream takes
    # the next id after the pages, the CID descendant font dict the
    # one after that
    tounicode_id = 3 + 2 * n_pages + 1 if tounicode is not None else None
    descendant_id = 3 + 2 * n_pages + 2 if kind == "cid" else None
    dict_objs: list[tuple[int, bytes]] = []
    stream_objs: list[tuple[int, bytes]] = []
    first_page_id = 4
    kid_refs = " ".join(
        f"{first_page_id + 2 * i} 0 R" for i in range(n_pages))
    dict_objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    dict_objs.append(
        (2, f"<< /Type /Pages /Kids [{kid_refs}] /Count {n_pages} >>"
            .encode("latin-1")))
    dict_objs.append(
        (3, _font_body(font_encoding, tounicode_id, descendant_id)))
    if tounicode is not None:
        stream_objs.append(
            (tounicode_id, _tounicode_stream(
                tounicode, compress, two_byte=kind == "cid",
                array_form=kind == "tounicode_arr")))
    if descendant_id is not None:
        dict_objs.append((descendant_id, _CID_DESCENDANT))
    # image ids continue the contiguous numbering after the optional
    # ToUnicode/descendant objects (both serializers require 1..N)
    next_img_id = (3 + 2 * n_pages + 1
                   + (1 if tounicode_id is not None else 0)
                   + (1 if descendant_id is not None else 0))
    for i, page in enumerate(pages):
        page_id = first_page_id + 2 * i
        content_id = page_id + 1
        page_imgs = (images[i] if images and i < len(images) else [])
        page_forms = (forms[i] if forms and i < len(forms) else [])
        xobj_res = ""
        img_ops = b""
        for k, (ix, iy_top, pw, ph, pixels, codec) in enumerate(page_imgs):
            img_id = next_img_id
            next_img_id += 1
            stream_objs.append((img_id, image_xobject(pw, ph, pixels,
                                                      codec)))
            xobj_res += f"/Im{k + 1} {img_id} 0 R "
            img_ops += (f"\nq {pw:g} 0 0 {ph:g} {ix:g} "
                        f"{iy_top - ph:g} cm /Im{k + 1} Do Q"
                        ).encode("latin-1")
        for k, (fx, fy, fblocks) in enumerate(page_forms):
            form_id = next_img_id
            next_img_id += 1
            fcs = content_stream(fblocks, encode=encode,
                                 hex_strings=tounicode is not None)
            fhead, fdata = _encode_stream(fcs, compress)
            fdict = (b"<< /Type /XObject /Subtype /Form "
                     b"/BBox [0 0 612 792] /Matrix [1 0 0 1 0 0] "
                     + fhead[2:])  # reuse the /Length(+/Filter) tail
            stream_objs.append(
                (form_id, fdict + b"\nstream\n" + fdata + b"\nendstream"))
            xobj_res += f"/Fm{k + 1} {form_id} 0 R "
            img_ops += (f"\nq 1 0 0 1 {fx:g} {fy:g} cm /Fm{k + 1} Do Q"
                        ).encode("latin-1")
        res = "/Resources << /Font << /F1 3 0 R >> "
        if xobj_res:
            res += f"/XObject << {xobj_res}>> "
        res += ">> "
        dict_objs.append(
            (page_id,
             (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
              f"{res}/Contents {content_id} 0 R >>").encode("latin-1")))
        # subset-encoded (ToUnicode) fonts get hex strings — the shape
        # real generators emit for arbitrary byte codes
        cs = content_stream(page, encode=encode,
                            hex_strings=tounicode is not None) + img_ops
        head, data = _encode_stream(cs, compress, stream_filter)
        stream_objs.append(
            (content_id, head + b"\nstream\n" + data + b"\nendstream"))

    trailer_extra, enc_key = b"", None
    if encrypt_r is not None:
        stream_objs, trailer_extra, enc_key = _encrypt_objects(
            dict_objs, stream_objs, encrypt_r, encrypt_user_pwd)
    if not xref_stream:
        return _serialize_classic(dict_objs, stream_objs, trailer_extra)
    return _serialize_xref_stream(dict_objs, stream_objs,
                                  trailer_extra, enc_key)


def _write_pdf_tree(pages, compress: bool, xref_stream: bool,
                    font_encoding, split_contents: int,
                    nested_kids: bool,
                    stream_filter: str | None = None,
                    encrypt_r: int | None = None,
                    encrypt_user_pwd: bytes = b"",
                    images: list[list[tuple]] | None = None,
                    forms: list[list[tuple]] | None = None) -> bytes:
    """The ``split_contents``/``nested_kids`` layout of
    :func:`write_pdf` (r5 notch 6). Own object numbering: 1 catalog,
    2 root /Pages, 3 font, [4,5 intermediate /Pages when nested],
    then per page the leaf dict + [its image/form XObjects, r6] + its
    k content streams, then the optional ToUnicode CMap and CID
    descendant. When nested, ``/Resources`` lives ONLY on the root
    node (§7.7.3.4 inheritance — leaf pages carry none, so a
    non-inheriting reader finds no /F1); the nested layout rejects
    ``images``/``forms`` (per-page /XObject resources would override
    inheritance wholesale)."""
    if nested_kids and (images or forms):
        raise ValueError("images/forms not supported with nested_kids")
    encode = _text_encoder(font_encoding)
    n_pages = len(pages)
    kind = (font_encoding[0]
            if isinstance(font_encoding, tuple) else None)
    tounicode = (font_encoding[1]
                 if kind in ("tounicode", "tounicode_arr", "cid")
                 else None)
    nested = nested_kids and n_pages >= 2
    next_id = 6 if nested else 4
    node_ids = [4, 5] if nested else []
    page_ids: list[int] = []
    page_chunks: list[tuple[list[int], list[bytes]]] = []
    page_xres: list[str] = []
    xobj_objs: list[tuple[int, bytes]] = []
    for i, p in enumerate(pages):
        pid = next_id
        next_id += 1
        cs = content_stream(p, encode=encode,
                            hex_strings=tounicode is not None)
        xres = ""
        for k, (ix, iy_top, pw, ph, pixels, codec) in enumerate(
                images[i] if images and i < len(images) else []):
            oid = next_id
            next_id += 1
            xobj_objs.append((oid, image_xobject(pw, ph, pixels, codec)))
            xres += f"/Im{k + 1} {oid} 0 R "
            cs += (f"\nq {pw:g} 0 0 {ph:g} {ix:g} {iy_top - ph:g} cm "
                   f"/Im{k + 1} Do Q").encode("latin-1")
        for k, (fx, fy, fblocks) in enumerate(
                forms[i] if forms and i < len(forms) else []):
            oid = next_id
            next_id += 1
            fcs = content_stream(fblocks, encode=encode,
                                 hex_strings=tounicode is not None)
            fhead, fdata = _encode_stream(fcs, compress)
            xobj_objs.append(
                (oid, b"<< /Type /XObject /Subtype /Form "
                 b"/BBox [0 0 612 792] /Matrix [1 0 0 1 0 0] "
                 + fhead[2:] + b"\nstream\n" + fdata + b"\nendstream"))
            xres += f"/Fm{k + 1} {oid} 0 R "
            cs += (f"\nq 1 0 0 1 {fx:g} {fy:g} cm /Fm{k + 1} Do Q"
                   ).encode("latin-1")
        chunks = _split_stream(cs, split_contents)
        cids = list(range(next_id, next_id + len(chunks)))
        next_id += len(chunks)
        page_ids.append(pid)
        page_chunks.append((cids, chunks))
        page_xres.append(xres)
    tounicode_id = descendant_id = None
    if tounicode is not None:
        tounicode_id = next_id
        next_id += 1
    if kind == "cid":
        descendant_id = next_id
        next_id += 1
    res = "/Resources << /Font << /F1 3 0 R >> >> "
    dict_objs: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>")]
    stream_objs: list[tuple[int, bytes]] = []
    if nested:
        half = (n_pages + 1) // 2
        groups = [page_ids[:half], page_ids[half:]]
        kid_refs = " ".join(f"{n} 0 R" for n in node_ids)
        dict_objs.append(
            (2, (f"<< /Type /Pages /Kids [{kid_refs}] /Count {n_pages} "
                 f"{res}>>").encode("latin-1")))
        for nid, grp in zip(node_ids, groups):
            refs = " ".join(f"{p} 0 R" for p in grp)
            dict_objs.append(
                (nid, (f"<< /Type /Pages /Parent 2 0 R /Kids [{refs}] "
                       f"/Count {len(grp)} >>").encode("latin-1")))
        page_res = ""  # inherited from the root node
        parent_of = {p: nid for nid, grp in zip(node_ids, groups)
                     for p in grp}
    else:
        kid_refs = " ".join(f"{p} 0 R" for p in page_ids)
        dict_objs.append(
            (2, f"<< /Type /Pages /Kids [{kid_refs}] /Count {n_pages} >>"
                .encode("latin-1")))
        page_res = res
        parent_of = {p: 2 for p in page_ids}
    dict_objs.append(
        (3, _font_body(font_encoding, tounicode_id, descendant_id)))
    if tounicode is not None:
        stream_objs.append(
            (tounicode_id, _tounicode_stream(
                tounicode, compress, two_byte=kind == "cid",
                array_form=kind == "tounicode_arr")))
    if descendant_id is not None:
        dict_objs.append((descendant_id, _CID_DESCENDANT))
    stream_objs.extend(xobj_objs)
    for pid, (cids, chunks), xres in zip(page_ids, page_chunks,
                                         page_xres):
        if len(cids) == 1:
            contents = f"/Contents {cids[0]} 0 R"
        else:
            contents = ("/Contents ["
                        + " ".join(f"{c} 0 R" for c in cids) + "]")
        pres = page_res
        if xres:
            pres = ("/Resources << /Font << /F1 3 0 R >> "
                    f"/XObject << {xres}>> >> ")
        dict_objs.append(
            (pid, (f"<< /Type /Page /Parent {parent_of[pid]} 0 R "
                   f"/MediaBox [0 0 612 792] {pres}{contents} >>"
                   ).encode("latin-1")))
        for cid, chunk in zip(cids, chunks):
            head, data = _encode_stream(chunk, compress, stream_filter)
            stream_objs.append(
                (cid, head + b"\nstream\n" + data + b"\nendstream"))
    trailer_extra, enc_key = b"", None
    if encrypt_r is not None:
        stream_objs, trailer_extra, enc_key = _encrypt_objects(
            dict_objs, stream_objs, encrypt_r, encrypt_user_pwd)
    if not xref_stream:
        return _serialize_classic(dict_objs, stream_objs, trailer_extra)
    return _serialize_xref_stream(dict_objs, stream_objs,
                                  trailer_extra, enc_key)


def _serialize_classic(dict_objs: list[tuple[int, bytes]],
                       stream_objs: list[tuple[int, bytes]],
                       trailer_extra: bytes = b"") -> bytes:
    """Classic PDF 1.4 serialization: sequential objects + xref table.
    Object ids must be contiguous 1..N (both layout builders allocate
    them that way). ``trailer_extra`` carries the /Encrypt + /ID
    entries when the encryption transform ran."""
    bodies = dict(dict_objs + stream_objs)
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i in range(1, len(bodies) + 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + bodies[i] + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(bodies) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(bodies) + 1} /Root 1 0 R "
            .encode() + trailer_extra
            + f">>\nstartxref\n{xref_pos}\n%%EOF\n".encode())
    return bytes(out)


def _serialize_xref_stream(dict_objs: list[tuple[int, bytes]],
                           stream_objs: list[tuple[int, bytes]],
                           trailer_extra: bytes = b"",
                           enc_key: tuple[bytes, str] | None = None
                           ) -> bytes:
    # ---- PDF 1.5 layout: ObjStm + XRef stream ----
    # (stream-carrying objects cannot live inside an ObjStm per spec
    # §7.5.7 — content streams and the ToUnicode CMap stay top-level;
    # the Encrypt dict arrives via stream_objs for the same reason).
    # When enc_key is set the ObjStm payload is RC4'd with ITS object
    # key after compression; the XRef stream is NEVER encrypted
    # (§7.5.8.2) — a reader must be able to locate objects first.
    n_base = max(n for n, _ in dict_objs + stream_objs)
    objstm_id = n_base + 1
    xref_id = n_base + 2
    header_parts: list[str] = []
    body_parts: list[bytes] = []
    off = 0
    for objnum, body in dict_objs:
        header_parts.append(f"{objnum} {off}")
        body_parts.append(body)
        off += len(body) + 1          # single-space separators
    header = (" ".join(header_parts) + " ").encode("latin-1")
    payload = header + b" ".join(body_parts)
    zpayload = zlib.compress(payload, 6)
    if enc_key is not None:
        import hashlib

        from . import pdf_crypt as C
        key, kind = enc_key
        if kind == "aes":
            iv = hashlib.md5(b"iv" + objstm_id.to_bytes(4, "big")
                             + zpayload).digest()
            zpayload = C.aes_cbc_encrypt(
                C.stream_object_key(key, "aes", objstm_id), iv, zpayload)
        else:
            zpayload = C.rc4(C.object_key(key, objstm_id, 0), zpayload)
    objstm_body = (
        f"<< /Type /ObjStm /N {len(dict_objs)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(zpayload)} >>"
        .encode("latin-1") + b"\nstream\n" + zpayload + b"\nendstream")

    out = bytearray(b"%PDF-1.5\n")
    top_level = stream_objs + [(objstm_id, objstm_body)]
    offsets: dict[int, int] = {}
    for objnum, body in top_level:
        offsets[objnum] = len(out)
        out += f"{objnum} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    # W [1 4 2]: type, offset|objstm-number, gen|index-in-objstm
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")
    for objnum in range(1, xref_id + 1):
        if objnum in offsets or objnum == xref_id:
            pos = xref_pos if objnum == xref_id else offsets[objnum]
            rows += bytes([1]) + pos.to_bytes(4, "big") + b"\x00\x00"
        else:
            idx = next(k for k, (num, _) in enumerate(dict_objs)
                       if num == objnum)
            rows += (bytes([2]) + objstm_id.to_bytes(4, "big")
                     + idx.to_bytes(2, "big"))
    zrows = zlib.compress(bytes(rows), 6)
    xref_body = (
        f"<< /Type /XRef /Size {xref_id + 1} /Root 1 0 R /W [1 4 2] "
        f"/Index [0 {xref_id + 1}] /Filter /FlateDecode "
        .encode("latin-1") + trailer_extra
        + f"/Length {len(zrows)} >>".encode("latin-1")
        + b"\nstream\n" + zrows + b"\nendstream")
    out += f"{xref_id} 0 obj\n".encode() + xref_body + b"\nendobj\n"
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def append_update(pdf: bytes,
                  page_index: int,
                  blocks: list[tuple[float, float, float, list[str]]],
                  compress: bool = False, font_encoding=None) -> bytes:
    """Append an incremental-update revision (PDF 32000 §7.5.6) that
    REPLACES page ``page_index``'s content stream: the original bytes
    are untouched (the defining property of incremental save — how
    Acrobat, signing tools and most editors write changes), followed by
    the replacement object, a one-entry classic xref subsection, and a
    trailer chained to the previous one via ``/Prev``.

    Real-corpus relevance: a reader that resolves objects from the
    FIRST definition (or ignores updates) silently extracts the stale
    pre-edit text — the reader's last-definition-wins object scan is
    what makes the update visible. Works on both the classic and the
    ``xref_stream=True`` base layouts (object numbering is shared)."""
    import re as _re
    content_id = 5 + 2 * page_index
    cs = content_stream(
        blocks, encode=_text_encoder(font_encoding),
        hex_strings=isinstance(font_encoding, tuple)
        and font_encoding[0] in ("tounicode", "tounicode_arr", "cid"))
    if compress:
        data = zlib.compress(cs, 6)
        head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
    else:
        data = cs
        head = f"<< /Length {len(data)} >>".encode()
    prevs = _re.findall(rb"startxref\s+(\d+)", pdf)
    if not prevs:
        raise ValueError("base pdf has no startxref to chain /Prev to")
    prev = int(prevs[-1])
    sizes = _re.findall(rb"/Size\s+(\d+)", pdf)
    size = max([int(s) for s in sizes] + [content_id + 1])
    out = bytearray(pdf)
    if not out.endswith(b"\n"):
        out += b"\n"
    obj_off = len(out)
    out += (f"{content_id} 0 obj\n".encode() + head
            + b"\nstream\n" + data + b"\nendstream\nendobj\n")
    xref_pos = len(out)
    out += (f"xref\n{content_id} 1\n{obj_off:010d} 00000 n \n"
            f"trailer\n<< /Size {size} /Root 1 0 R /Prev {prev} >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)
