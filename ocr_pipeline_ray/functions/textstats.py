"""Text-analysis kernels: tokens, quality, language-ID, fingerprints.

These power the large-scale training-data-pipeline operators (dedup,
quality filtering, language routing) that sit alongside the reference's
extraction capabilities. The quality-score shape (cheap scalar features
+ weighted blend + thresholds) mirrors the reference's image-quality
scorer (adaptive_ocr_pipeline.py:76-148, SURVEY §2.6 F15) applied to
text.

Every formula here is deliberately simple enough to restate exactly in
DuckDB SQL — the oracle for the driver's correctness gate computes the
identical expressions.

Tokenization contract: split on a single ASCII space (the corpus is
single-space separated); this matches DuckDB ``string_split(text, ' ')``
including empty-string behavior.
"""

from __future__ import annotations

import hashlib
import struct

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "on")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "ein", "zu", "den")
STOPWORDS_ES = ("el", "la", "de", "que", "y", "en", "un", "es")
STOPWORDS_FR = ("le", "la", "et", "les", "des", "en", "un", "du")

# Deterministic preference order for arg-max ties (first wins).
LANG_ORDER = (("en", STOPWORDS_EN), ("de", STOPWORDS_DE),
              ("es", STOPWORDS_ES), ("fr", STOPWORDS_FR))


def tokens(text: str) -> list[str]:
    return text.split(" ")


def stopword_hits(toks: list[str], stopwords: tuple[str, ...]) -> int:
    sw = set(stopwords)
    return sum(1 for t in toks if t in sw)


def quality_score(text: str) -> float:
    """Length/stopword/token-shape blend in [0,1]; SQL-identical formula:

    n_tokens     = len(string_split(text,' '))
    stop_ratio   = en-stopword hits / n_tokens
    mean_tok_len = (length(text) - (n_tokens-1)) / n_tokens
    score = 0.5*min(1, n_tokens/100) + 0.3*stop_ratio + 0.2*min(1, mean_tok_len/8)
    """
    toks = tokens(text)
    n = len(toks)
    if n == 0:
        return 0.0
    stop_ratio = stopword_hits(toks, STOPWORDS_EN) / n
    mean_tok_len = (len(text) - (n - 1)) / n
    return 0.5 * min(1.0, n / 100.0) + 0.3 * stop_ratio + 0.2 * min(1.0, mean_tok_len / 8.0)


def lang_id(text: str) -> str:
    """N-gram-free stopword-vote language heuristic, deterministic ties."""
    toks = tokens(text)
    best_lang, best_score = "unknown", 0
    for lang, words in LANG_ORDER:
        s = stopword_hits(toks, words)
        if s > best_score:
            best_lang, best_score = lang, s
    return best_lang


def fingerprint_md5(text: str) -> str:
    """Document fingerprint = md5 hex (DuckDB ``md5(text)``-identical)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def token_shingles(text: str, k: int = 3) -> list[str]:
    """Distinct token k-gram shingles, order-stable (first occurrence)."""
    toks = tokens(text)
    seen: dict[str, None] = {}
    for i in range(len(toks) - k + 1):
        seen.setdefault(" ".join(toks[i:i + k]), None)
    return list(seen)


def jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def _hash64(s: str, seed: int = 0) -> int:
    h = hashlib.md5(f"{seed}:{s}".encode()).digest()
    return struct.unpack("<Q", h[:8])[0]


def minhash_signature(shingles: list[str], num_perms: int = 128) -> list[int]:
    """MinHash via the one-hash + seeded-rehash scheme (deterministic)."""
    if not shingles:
        return [0] * num_perms
    base = [_hash64(s) for s in shingles]
    sig = []
    for p in range(num_perms):
        a = (2 * p + 1) | 1
        b = _hash64(str(p), seed=1)
        sig.append(min(((a * h + b) & 0xFFFFFFFFFFFFFFFF) for h in base))
    return sig


def lsh_band_keys(sig: list[int], bands: int = 32) -> list[str]:
    """Split a signature into ``bands`` rows-per-band buckets → hashable keys."""
    r = len(sig) // bands
    return [
        f"{bi}:{hashlib.md5(repr(sig[bi * r:(bi + 1) * r]).encode()).hexdigest()[:16]}"
        for bi in range(bands)
    ]


def simhash64(toks: list[str]) -> int:
    """64-bit SimHash over token unigrams (deterministic md5 basis)."""
    acc = [0] * 64
    for t in toks:
        h = _hash64(t)
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
