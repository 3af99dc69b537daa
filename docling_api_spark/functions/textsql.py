"""Two-dialect (Spark SQL / DuckDB) expression snippets for the
training-data operators.

Every operator that is oracle-checked by the driver computes the SAME
deterministic formula in both engines. The only portable hash both engines
share is ``md5`` (hex string), so all hashing here is
``int(md5(payload)[:k], 16)`` — unsigned, well inside BIGINT:

- Spark : ``CAST(conv(substring(md5(x), 1, k), 16, 10) AS BIGINT)``
- DuckDB: ``CAST(('0x' || substr(md5(x), 1, k)) AS BIGINT)``

Tokenization (shared normalization): lowercase, non-alphanumerics → space,
split on runs of spaces, drop empties. Verified byte-equal across engines
on the driver testdata.
"""

from __future__ import annotations

import hashlib


def tokens(dialect: str, col: str = "text") -> str:
    """Shared normalization: lowercase, tokens = maximal [a-z0-9] runs.

    r7 (guide §1.2 step 2): the Spark dialect extracts the positive
    class directly — ``regexp_extract_all(lower(col), '[a-z0-9]+', 0)``
    — instead of the original replace-negated-class-with-space →
    split-on-spaces → drop-empties chain. Both compute exactly the
    maximal alphanumeric runs of the lowercased text (verified: zero
    mismatches over every corpus scale AND an adversarial set incl.
    unicode, NULs, empties), but the replace form measured ~9x slower
    at sf1.0 (2.18 s vs 0.24 s for one corpus pass — Spark's
    regexp_replace replacement machinery, not the match, is the cost).
    ~25 registered queries tokenize at least once, so this is the
    single widest per-task win of the round. The DuckDB dialect keeps
    the original form — oracle text is frozen."""
    norm_duck = f"regexp_replace(lower({col}), '[^a-z0-9 ]', ' ', 'g')"
    if dialect == "spark":
        return f"regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"
    return f"list_filter(string_split_regex({norm_duck}, ' +'), x -> x != '')"


def md5_int(dialect: str, payload: str, hex_digits: int = 8) -> str:
    """Deterministic unsigned int from the first ``hex_digits`` of md5."""
    if dialect == "spark":
        return (f"CAST(conv(substring(md5({payload}), 1, {hex_digits}),"
                f" 16, 10) AS BIGINT)")
    return f"CAST(('0x' || substr(md5({payload}), 1, {hex_digits})) AS BIGINT)"


def ratio4(dialect: str, num: str, den: str) -> str:
    """``num/den`` rounded half-AWAY at 4 dp as exact integer arithmetic:
    ``(2*10^4*num + den) div (2*den) / 10^4``. ROUND(int/int double, 4)
    is the cross-engine tie class found in lm_scores/content_density
    (Spark BigDecimal HALF_UP vs DuckDB scaled-double rounding disagree
    when the scaled ratio lands exactly on .5); integer division cannot
    tie. Requires ``num >= 0`` and ``den > 0`` (pass ``nullif(den, 0)``
    — NULL propagates). The quotient maps to the identical nearest
    double in both engines (4 dp values are exact in binary64 / 10^4)."""
    op = "DIV" if dialect == "spark" else "//"
    # operands widened to BIGINT: with an INT-typed num, 20000*num
    # overflows int32 past num≈10^5 and Spark's ANSI mode raises
    # (found by the bulk cross-engine fuzz; the registered call sites
    # all pass BIGINT counts, but the helper must not rely on that)
    n = f"CAST({num} AS BIGINT)"
    m = f"CAST({den} AS BIGINT)"
    return (f"CAST((20000 * ({n}) + ({m})) {op} (2 * ({m})) "
            f"AS DOUBLE) / 10000")


def shingles_from(dialect: str, tk: str = "tk", k: int = 3) -> str:
    """k-word shingles (k=3) from a *token-array column* ``tk``.

    Must be given a column reference, never an inline tokens expression:
    the shingle lambda reads the array 5 times, and an inlined expression
    would be recomputed per reference per shingle — measured 36x slower.
    Stage it as ``(SELECT ..., <tokens> AS tk FROM ...)``; Spark keeps the
    projection separate (expensive multi-referenced expressions are not
    collapsed, SPARK-36718). Spark arrays are 0-based, DuckDB lists
    1-based — indices differ, content identical."""
    assert k == 3, "only 3-shingles wired"
    if dialect == "spark":
        return (f"CASE WHEN size({tk}) >= 3 THEN "
                f"transform(sequence(0, size({tk}) - 3), "
                f"i -> concat({tk}[i], ' ', {tk}[i+1], ' ', {tk}[i+2])) "
                f"ELSE array() END")
    return (f"CASE WHEN len({tk}) >= 3 THEN "
            f"list_transform(generate_series(1, len({tk}) - 2), "
            f"i -> ({tk}[i] || ' ' || {tk}[i+1] || ' ' || {tk}[i+2])) "
            f"ELSE [] END")


def shingle_hashes(dialect: str, sh: str = "sh") -> str:
    """32-bit md5 hash of each shingle in array column ``sh`` — computed
    ONCE per shingle; per-seed minhash signatures derive from these via
    cheap affine rehashing (:func:`minhash_affine`)."""
    h = md5_int(dialect, "s")
    if dialect == "spark":
        return f"transform({sh}, s -> {h})"
    return f"list_transform({sh}, s -> {h})"


#: Mersenne prime 2^31-1: affine products stay < 2^62 (no BIGINT overflow)
MINHASH_P = 2147483647


def minhash_affine(dialect: str, hs: str, seed: int) -> str:
    """Signature ``seed``: min over hashed shingles of (a*h + b) mod p,
    a/b fixed odd/offset constants per seed — the standard universal-hash
    family, identical arithmetic in both engines."""
    a, b = 2 * seed + 1, 7919 * (seed + 1)
    if dialect == "spark":
        return (f"array_min(transform({hs}, "
                f"h -> pmod({a} * h + {b}, {MINHASH_P})))")
    return (f"list_min(list_transform({hs}, "
            f"h -> (({a} * h + {b}) % {MINHASH_P})))")


def ngrams(dialect: str, tk: str = "tk", k: int = 2) -> str:
    """Word k-grams (space-joined) from a *token-array column* ``tk`` for
    any ``k >= 2`` — the general form of :func:`shingles_from` (which stays
    pinned at k=3 for the minhash family's frozen oracle). Same staging
    rule applies: pass a column reference, never an inline expression.
    Spark arrays are 0-based, DuckDB lists 1-based."""
    assert k >= 2
    if dialect == "spark":
        parts = " , ' ', ".join(f"{tk}[i+{j}]" for j in range(k))
        return (f"CASE WHEN size({tk}) >= {k} THEN "
                f"transform(sequence(0, size({tk}) - {k}), "
                f"i -> concat({parts})) ELSE array() END")
    parts = " || ' ' || ".join(f"{tk}[i+{j}]" for j in range(k))
    return (f"CASE WHEN len({tk}) >= {k} THEN "
            f"list_transform(generate_series(1, len({tk}) - {k - 1}), "
            f"i -> ({parts})) ELSE [] END")


def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 random-hyperplane weights for sign-LSH, derived
    from md5 — same literal vectors are inlined into BOTH engines' SQL."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            b = hashlib.md5(f"plane{p}_{i}".encode()).digest()[0]
            row.append(1 if b % 2 else -1)
        planes.append(row)
    return planes


#: stopword markers per language for the lang-id heuristic — fixed,
#: deterministic priority order for ties (en > fr > de > es > it > pt)
LANG_MARKERS = [
    ("en", ("the", "and", "of", "to", "is", "in")),
    ("fr", ("le", "la", "et", "les", "des", "est")),
    ("de", ("der", "die", "und", "das", "ist", "nicht")),
    ("es", ("el", "los", "las", "es", "una", "para")),
    ("it", ("il", "di", "che", "per", "una", "sono")),
    ("pt", ("o", "os", "das", "um", "uma", "para")),
]

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
                "it", "on", "for", "with", "as", "at", "by")


def array_lit(dialect: str, values) -> str:
    inner = ", ".join(f"'{v}'" if isinstance(v, str) else str(v)
                      for v in values)
    if dialect == "spark":
        return f"array({inner})"
    return f"[{inner}]"
