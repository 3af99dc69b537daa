"""PDF standard security handler math (ISO 32000-1 §7.6.2-7.6.3).

RC4 ("V1/V2") encryption with the STANDARD handler is the scheme the
legacy half of the real web-PDF corpus carries, and the overwhelming
majority of those files are "encrypted" with an EMPTY user password —
permissions-only protection where the document opens without a prompt.
Everything needed to read them is public spec math on stdlib md5:

- Algorithm 2  — file encryption key from the (empty) user password,
  /O, /P, and the first document ID.
- Algorithm 3  — the /O (owner) value, RC4 of the padded user password
  under a key derived from the owner password.
- Algorithms 4/5 — the /U (user) value for R2 / R3; recomputing it from
  the derived key and comparing against the stored /U is how a reader
  PROVES the empty password is correct before trusting any decrypted
  byte (a wrong password fails here, typed — never silent mojibake).
- Per-object keys — md5(key + objnum[0:3 LE] + gen[0:2 LE]) truncated
  to min(n+5, 16) (§7.6.2 Algorithm 1 step b-c).

The reference reads encrypted PDFs through docling's pypdfium2 backend
(/root/reference/poetry.lock:437); this module re-derives the open
spec math so the scoped reader handles the same files stdlib-only.

AES ("V4" crypt filters with /CFM /AESV2 — the modern empty-password
default, notch 10) is implemented from FIPS-197 + SP 800-38A directly:
the S-box is GENERATED from the GF(2^8) inverse + affine definition
(not transcribed), and the block cipher, key schedule and CBC mode are
anchored to the published known-answer vectors (Appendix B/C.1,
F.2.1) in tests. AESV2 per-object keys append the spec's 'sAlT' bytes;
the wire format is leading IV + PKCS#5 padding. AES-256 ("V5"/AESV3,
the SHA-2 handler) remains a typed scope-out.
"""

from __future__ import annotations

import hashlib
import struct

#: §7.6.3.3 — the 32-byte password padding string (spec Table 21 bytes)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA). Symmetric: encrypt == decrypt."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def file_key(user_pwd: bytes, o_value: bytes, p: int, id0: bytes,
             r: int, n: int) -> bytes:
    """Algorithm 2: the n-byte file encryption key."""
    # /P is "a 32-bit signed integer, stored little-endian" — but real
    # legacy writers emit it in BOTH numeric forms (-44 and its
    # unsigned alias 4294967252), so mask to the 32-bit pattern rather
    # than trusting the sign (review find: struct.pack('<i', ...)
    # raised raw struct.error on the unsigned form)
    h = hashlib.md5(
        _pad(user_pwd) + o_value[:32] + struct.pack("<I", p & 0xFFFFFFFF)
        + id0).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def o_value(owner_pwd: bytes, user_pwd: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the 32-byte /O entry."""
    h = hashlib.md5(_pad(owner_pwd or user_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    o = rc4(key, _pad(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def u_value(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R3): the 32-byte /U entry.
    R3 comparisons use only the first 16 bytes; the trailing 16 are
    'arbitrary padding' per spec — zeroed here for determinism."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def check_user_password(user_pwd: bytes, o: bytes, u: bytes, p: int,
                        id0: bytes, r: int, n: int) -> bytes | None:
    """Derive the file key for ``user_pwd`` and verify it against the
    stored /U (Algorithm 6). Returns the key, or None on mismatch —
    the caller treats None as password-protected and scopes out typed."""
    key = file_key(user_pwd, o, p, id0, r, n)
    expect = u_value(key, id0, r)
    ok = expect[:16] == u[:16] if r >= 3 else expect == u[:32]
    return key if ok else None


def object_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1 step b-c: the per-object RC4 key."""
    h = hashlib.md5(
        key + num.to_bytes(4, "little")[:3]
        + gen.to_bytes(4, "little")[:2]).digest()
    return h[:min(len(key) + 5, 16)]


# ------------------------- AES-128-CBC (FIPS-197 / SP 800-38A) ------

#: FIPS-197 S-box, generated from the spec definition (multiplicative
#: inverse in GF(2^8) + affine transform) rather than transcribed — the
#: known-answer tests below anchor it to the published vectors
def _gf_inv(x: int) -> int:
    if x == 0:
        return 0
    # brute force is fine at module import: 255 multiplications max
    for y in range(1, 256):
        if _gf_mul(x, y) == 1:
            return y
    raise AssertionError


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _make_sbox() -> bytes:
    out = bytearray(256)
    for i in range(256):
        c = _gf_inv(i)
        x = c
        for _ in range(4):
            c = ((c << 1) | (c >> 7)) & 0xFF
            x ^= c
        out[i] = x ^ 0x63
    return bytes(out)


_SBOX = _make_sbox()
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


#: GF(2^8) multiplication tables for the (Inv)MixColumns coefficients
_MUL = {c: bytes(_gf_mul(c, x) for x in range(256))
        for c in (2, 3, 9, 11, 13, 14)}


def _expand_key(key: bytes) -> list[list[int]]:
    """AES-128 key schedule → 11 round keys (16-int lists)."""
    words = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        w = list(words[i - 1])
        if i % 4 == 0:
            w = w[1:] + w[:1]
            w = [_SBOX[b] for b in w]
            w[0] ^= _RCON[i // 4 - 1]
        words.append([a ^ b for a, b in zip(words[i - 4], w)])
    return [sum(words[4 * i:4 * i + 4], []) for i in range(11)]


#: ShiftRows as a flat SOURCE-index permutation over the column-major
#: state (state[r + 4c]): output[r + 4c] = input[r + 4*((c + r) % 4)]
_SHIFT = [(i % 4) + 4 * (((i // 4) + (i % 4)) % 4) for i in range(16)]
_INV_SHIFT = [0] * 16
for _j, _src in enumerate(_SHIFT):
    _INV_SHIFT[_src] = _j


def _aes_encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[0])]
    m2, m3 = _MUL[2], _MUL[3]
    for rnd in range(1, 10):
        s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]
        t = []
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t += [m2[a0] ^ m3[a1] ^ a2 ^ a3,
                  a0 ^ m2[a1] ^ m3[a2] ^ a3,
                  a0 ^ a1 ^ m2[a2] ^ m3[a3],
                  m3[a0] ^ a1 ^ a2 ^ m2[a3]]
        s = [x ^ k for x, k in zip(t, rk[rnd])]
    s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]
    return bytes(x ^ k for x, k in zip(s, rk[10]))


def _aes_decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[10])]
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(9, 0, -1):
        s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        s = [x ^ k for x, k in zip(s, rk[rnd])]
        t = []
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t += [m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3],
                  m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3],
                  m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3],
                  m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]]
        s = t
    s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
    return bytes(x ^ k for x, k in zip(s, rk[0]))


class AesError(Exception):
    """Malformed AES payload (bad length / padding) — callers map it
    to the typed PdfUnsupported channel."""


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC with PKCS#5 padding, IV prepended — the §7.6.2
    AESV2 wire format."""
    rk = _expand_key(key)
    padlen = 16 - len(data) % 16
    data = data + bytes([padlen]) * padlen
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _aes_encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_encrypt`: IV is the leading block,
    PKCS#5 padding validated and stripped."""
    if len(data) < 32 or len(data) % 16:
        raise AesError(f"bad AES payload length {len(data)}")
    rk = _expand_key(key)
    out = bytearray()
    prev = data[:16]
    for i in range(16, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in
                     zip(_aes_decrypt_block(rk, blk), prev))
        prev = blk
    padlen = out[-1]
    if not 1 <= padlen <= 16 or out[-padlen:] != bytes([padlen]) * padlen:
        raise AesError("bad AES padding")
    return bytes(out[:-padlen])


def object_key_aes(key: bytes, num: int, gen: int) -> bytes:
    """AESV2 per-object key: the RC4 derivation plus the spec's
    constant salt bytes 0x73416C54 ('sAlT', §7.6.2 Algorithm 1b)."""
    h = hashlib.md5(
        key + num.to_bytes(4, "little")[:3]
        + gen.to_bytes(4, "little")[:2] + b"sAlT").digest()
    return h[:min(len(key) + 5, 16)]
