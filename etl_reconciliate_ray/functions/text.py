"""Text-analysis primitives for large-scale training-data pipelines:
tokenization, quality signals, language-ID, shingles, MinHash, SimHash,
rolling-hash fingerprints.

All deterministic (fixed seeds / fixed hash keys), all designed to be
called per-batch from ``map_batches`` — vectorized or C-speed per row,
never per-row Python in a driver loop.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

TOKEN_RE = re.compile(r"\w+", re.UNICODE)
PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "del", "se"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "du", "que"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"},
}

_MERSENNE = np.uint64((1 << 61) - 1)


def tokens(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def whitespace_token_count(text: str) -> int:
    """Token count by whitespace split (matches SQL
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` on non-empty)."""
    return len(text.split())


def whitespace_quality(text: str) -> tuple[int, float]:
    """(n_tokens, stopword_ratio) over WHITESPACE tokens of the
    lowercased trimmed text — bit-identical to the DuckDB oracle's
    ``regexp_split_to_array(lower(trim(text)), '\\s+')`` tokenization
    (a token like 'the,' counts as one token and is NOT a stopword on
    either side)."""
    toks = text.lower().split()
    n = len(toks)
    if n == 0:
        return 0, 0.0
    stop = STOPWORDS["en"]
    return n, sum(t in stop for t in toks) / n


def quality_signals(text: str) -> dict:
    """Cheap quality-scoring signals: length, token stats, punctuation
    and stopword ratios (the classic pre-training heuristics)."""
    toks = tokens(text)
    n = len(toks)
    n_stop = sum(t in STOPWORDS["en"] for t in toks)
    n_punct = len(PUNCT_RE.findall(text))
    return {
        "n_chars": len(text),
        "n_tokens": n,
        "stop_ratio": (n_stop / n) if n else 0.0,
        "punct_ratio": (n_punct / len(text)) if text else 0.0,
        "mean_token_len": (sum(len(t) for t in toks) / n) if n else 0.0,
    }


def langid(text: str) -> str:
    """N-gram/stopword-heuristic language ID. Deterministic tie-break:
    languages in sorted order, highest stopword hit-rate wins."""
    toks = set(tokens(text))
    best_lang, best_score = "und", 0
    for lang in sorted(STOPWORDS):
        score = len(toks & STOPWORDS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64) of a document."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        t = t.ljust(k)
    hashes = {zlib.crc32(t[i : i + k].encode()) for i in range(len(t) - k + 1)}
    return np.fromiter(hashes, dtype=np.uint64, count=len(hashes))


def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = tokens(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


class MinHasher:
    """Seeded universal-hash MinHash: ``num_perm`` permutations via
    (a*x + b) mod p. Build ONCE (per actor) — the (a, b) tables are the
    stateful part; `signature` is vectorized numpy per document."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (P, S) matrix of permuted hashes -> min over shingles
        prod = (self.a[:, None] * shingle_hashes[None, :] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def bands(self, sig: np.ndarray, num_bands: int = 16) -> list[int]:
        """LSH band hashes (one per band) for bucketing."""
        rows = self.num_perm // num_bands
        out = []
        for b in range(num_bands):
            chunk = sig[b * rows : (b + 1) * rows]
            out.append(zlib.crc32(chunk.tobytes()) & 0x7FFFFFFF)
        return out


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (unweighted)."""
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens(text):
        h = np.uint64(zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32))
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def rolling_fingerprint(text: str, window: int = 64, keep_mod: int = 1 << 6) -> list[int]:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash
    over bytes, keep hashes ≡ 0 (mod keep_mod) — a compact, shift-
    tolerant signature for containment detection."""
    data = text.encode()
    if len(data) < window:
        return [zlib.crc32(data)]
    base, mod = 257, (1 << 31) - 1
    h = 0
    pw = pow(base, window - 1, mod)
    out = []
    for i, c in enumerate(data):
        h = (h * base + c) % mod
        if i >= window:
            h = (h - data[i - window] * pw * base) % mod
        if i >= window - 1 and h % keep_mod == 0:
            out.append(h)
    return out or [zlib.crc32(data)]
