"""Python/numpy twins of the ``portable`` hash chain.

Every function here reproduces the corresponding SQL expression in
``functions.portable`` EXACTLY — same tokenization, same integer
arithmetic mod ``PRIME`` — so a pandas-UDF stage can replace the
interpreted higher-order-function stage without changing a single
output value.  ``tests/test_portable_fuzz.py`` asserts the parity on
the adversarial corpus; the DuckDB oracle gate asserts it end-to-end.

Parity contract (and its edges):

* tokenization splits on the JAVA regex ``\\s+`` — the ASCII class
  ``[ \\t\\n\\x0b\\f\\r]+`` — NOT Python's unicode-aware ``\\s``;
* ``char_hash`` folds code points (``ord``), matching Spark/DuckDB
  ``ascii()`` for all Basic-Multilingual-Plane text (the engines split
  supplementary-plane characters differently from each other too, so
  non-BMP text is outside the portable contract entirely);
* all arithmetic stays in int64: ``PRIME`` ≈ 1e9, multipliers ≤ 31 —
  products < 2^63, no overflow, no floats anywhere.
"""

from __future__ import annotations

import re

from .portable import PRIME, minhash_params

# Java regex \s — ASCII-only whitespace (Python's \s would also match
# unicode spaces like \xa0 and silently diverge from the SQL engines)
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def tokens(text: str) -> list[str]:
    """Twin of ``portable.tokens``: lowercased ws-split, empties removed."""
    return [t for t in _JAVA_WS.split(text.lower()) if t]


def char_hash(token: str) -> int:
    """Twin of ``portable.char_hash``: h = fold(7, h*31 + codepoint)."""
    h = 7
    for ch in token:
        h = (h * 31 + ord(ch)) % PRIME
    return h


def token_hashes(toks: list[str], cache: dict[str, int]) -> list[int]:
    """Char-hash each token, memoizing per distinct token (Zipf's law
    makes the distinct set tiny relative to the token stream)."""
    out = []
    for t in toks:
        h = cache.get(t)
        if h is None:
            h = cache[t] = char_hash(t)
        out.append(h)
    return out


def shingle_hashes_positional(th: list[int], n: int):
    """Twin of ``portable.token_hash_ngrams_all``: element ``i``
    (0-based here) is the window hash starting at token ``i`` — order
    kept, duplicates kept (positional span operators)."""
    import numpy as np

    if len(th) < n:
        return np.empty(0, dtype=np.int64)
    arr = np.asarray(th, dtype=np.int64)
    m = len(arr) - n + 1
    g = arr[:m].copy()
    for k in range(1, n):
        g = (g * 31 + arr[k : k + m]) % PRIME
    return g


def shingle_hashes(th: list[int], n: int):
    """Twin of ``portable.token_hash_ngrams``: distinct window-combined
    n-gram hashes, ascending (set semantics downstream — order free)."""
    import numpy as np

    return np.unique(shingle_hashes_positional(th, n))


def minhash(sh, k: int):
    """Twin of ``portable.minhash_from_hashes``: k affine-permutation
    minima; empty shingle set yields the PRIME sentinel for every slot."""
    import numpy as np

    if len(sh) == 0:
        return np.full(k, PRIME, dtype=np.int64)
    params = minhash_params(k)
    a = np.array([p[0] for p in params], dtype=np.int64)
    b = np.array([p[1] for p in params], dtype=np.int64)
    return ((a[:, None] * sh[None, :] + b[:, None]) % PRIME).min(axis=1)


def simhash32(th) -> int:
    """Twin of ``portable.simhash32_from_hashes``: bit b of the 32-bit
    fingerprint is 1 iff the +/-1 vote sum of the tokens' b-th hash bits
    is positive.  Votes use the FULL token stream (duplicates count)."""
    import numpy as np

    if len(th) == 0:
        return 0
    arr = np.asarray(th, dtype=np.int64)
    bits = (arr[:, None] >> np.arange(32)) & 1          # (tokens, 32)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.int64) << np.arange(32)).sum())


def simhash60(th) -> int:
    """Twin of ``portable.simhash60_from_hashes``: 60-bit fingerprint,
    bits 0..29 from the token hash, 30..59 from the affine remix
    ``(h*31+17) % PRIME`` (token hashes are mod PRIME ≈ 2^30, so a
    single hash carries only 30 independent bits)."""
    import numpy as np

    if len(th) == 0:
        return 0
    arr = np.asarray(th, dtype=np.int64)
    remix = (arr * 31 + 17) % PRIME
    fp = 0
    for b in range(60):
        src, shift = (arr, b) if b < 30 else (remix, b - 30)
        ones = int(((src >> shift) & 1).sum())
        if 2 * ones > len(arr):  # sum of +-1 contributions > 0
            fp |= 1 << b
    return fp


def stopword_hits(toks: list[str], lang: str) -> int:
    """Twin of ``portable.stopword_hits_from_tokens`` (multiplicity counts)."""
    from .portable import STOPWORDS

    stops = frozenset(STOPWORDS[lang])
    return sum(1 for t in toks if t in stops)


def lang_id(toks: list[str]) -> str:
    """Twin of ``portable.lang_id_from_tokens``: argmax stopword hits,
    'und' on zero total, fixed en>de>fr>es tie-break (same CASE order)."""
    en, de, fr, es = (stopword_hits(toks, lg) for lg in ("en", "de", "fr", "es"))
    if en + de + fr + es == 0:
        return "und"
    if en >= de and en >= fr and en >= es:
        return "en"
    if de >= fr and de >= es:
        return "de"
    if fr >= es:
        return "fr"
    return "es"


def quality_score_ppm(text: str, toks: list[str]) -> int:
    """Twin of ``portable.quality_score_ppm_from_tokens``: exact integer
    ppm of 0.4*alpha_ratio + 0.3*en_stopword_ratio + 0.3*min(tokens,64)/64
    over the common denominator 640*len*tokens.  Positive operands, so
    Python ``//`` (floor) equals SQL ``div`` (truncate)."""
    ls = len(text)
    tc = len(toks)
    if ls == 0 or tc == 0:
        return 0
    la = sum(1 for c in text if c == " " or "A" <= c <= "Z" or "a" <= c <= "z")
    h = stopword_hits(toks, "en")
    m = min(tc, 64)
    num = 256 * la * tc + 192 * h * ls + 3 * m * ls * tc
    return (num * 1_000_000) // (640 * ls * tc)


# ---------------------------------------------------- Gopher rule twins
# Bit-parity contracts with functions.portable's SQL renderings (fuzz-
# tested): `ltrim`/`rtrim` in both SQL dialects strip SPACES only, so
# the twins use strip(' '), never Python's all-whitespace strip; the
# alpha check is ASCII [a-z] over the already-lowercased tokens.

_BULLETS = ("- ", "* ", "• ")


def mean_token_len_ppm(toks: list[str]) -> int:
    n = len(toks)
    return (sum(len(t) for t in toks) * 1_000_000) // n if n else 0


def symbol_token_ppm(text: str, toks: list[str]) -> int:
    n = len(toks)
    if not n:
        return 0
    return ((text.count("#") + text.count("...")) * 1_000_000) // n


def bullet_line_ppm(text: str) -> int:
    lines = text.split("\n")
    hits = sum(1 for l in lines if l.lstrip(" ").startswith(_BULLETS))
    return (hits * 1_000_000) // len(lines) if lines else 0


def ellipsis_line_ppm(text: str) -> int:
    lines = text.split("\n")
    hits = sum(
        1 for l in lines
        if l.rstrip(" ").endswith(("...", "…"))
    )
    return (hits * 1_000_000) // len(lines) if lines else 0


def alpha_token_ppm(toks: list[str]) -> int:
    n = len(toks)
    if not n:
        return 0
    hits = sum(1 for t in toks if any("a" <= ch <= "z" for ch in t))
    return (hits * 1_000_000) // n


def gopher_pass(text: str, toks: list[str]) -> bool:
    n = len(toks)
    return (
        50 <= n <= 100_000
        and 3_000_000 <= mean_token_len_ppm(toks) <= 10_000_000
        and symbol_token_ppm(text, toks) <= 100_000
        and bullet_line_ppm(text) < 900_000
        and ellipsis_line_ppm(text) < 300_000
        and alpha_token_ppm(toks) >= 800_000
        and stopword_hits(toks, "en") >= 2
    )
