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
AES ("V4+/R4+") requires a cipher primitive the sandbox lacks and
scopes out typed in the reader.
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
