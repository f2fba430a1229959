"""Text analysis kernels for large-scale training-data pipelines.

All functions are pa.Table -> pa.Table batch kernels (vectorized via
pyarrow.compute / numpy; compiled regexes built once at module import, so a
map_batches task pays setup once per worker process).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pretokenizer: words with leading space, numbers, punctuation runs
_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]+")

# tiny stopword profiles for a crude n-gram language heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "une", "pour", "que"},
    "es": {"el", "la", "de", "que", "los", "una", "por", "con", "para", "las"},
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens, regex (BPE-ish) tokens, chars."""
    text = batch.column(text_col)
    ws = pc.list_value_length(pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+"))
    texts = text.combine_chunks().to_pylist()
    bpe = np.array(
        [len(_TOKEN_RE.findall(t)) if t else 0 for t in texts], dtype=np.int64
    )
    batch = batch.append_column("n_tokens_ws", ws.cast(pa.int64()))
    batch = batch.append_column("n_tokens_re", pa.array(bpe))
    return batch.append_column("n_chars", pc.utf8_length(text).cast(pa.int64()))


def language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language guess (n-gram heuristic); 'und' when no
    profile scores."""
    texts = batch.column(text_col).combine_chunks().to_pylist()
    langs = []
    for t in texts:
        words = (t or "").lower().split()[:300]
        best, score = "und", 0
        for lang, prof in _LANG_PROFILES.items():
            s = sum(1 for w in words if w in prof)  # frequency-weighted
            if s > score:
                best, score = lang, s
        langs.append(best if score >= 2 else "und")
    return batch.append_column("lang_guess", pa.array(langs, type=pa.string()))


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features + a combined score in [0, 1]:
    length, alpha ratio, punctuation ratio, mean word length."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.float64()).to_numpy(zero_copy_only=False)
    texts = text.combine_chunks().to_pylist()
    alpha = np.zeros(len(texts))
    punct = np.zeros(len(texts))
    mean_wl = np.zeros(len(texts))
    for i, t in enumerate(texts):
        if not t:
            continue
        n = len(t)
        na = sum(c.isalpha() or c.isspace() for c in t)
        npct = sum(not c.isalnum() and not c.isspace() for c in t)
        words = t.split()
        alpha[i] = na / n
        punct[i] = npct / n
        mean_wl[i] = np.mean([len(w) for w in words]) if words else 0.0
    length_score = np.clip(n_chars / 500.0, 0.0, 1.0)
    wl_score = np.clip(1.0 - np.abs(mean_wl - 5.0) / 5.0, 0.0, 1.0)
    score = 0.35 * length_score + 0.35 * alpha + 0.15 * (1 - np.clip(punct * 4, 0, 1)) + 0.15 * wl_score
    batch = batch.append_column("alpha_ratio", pa.array(alpha))
    batch = batch.append_column("punct_ratio", pa.array(punct))
    batch = batch.append_column("mean_word_len", pa.array(mean_wl))
    return batch.append_column("quality", pa.array(score))


def _rolling_hash_u64(s: str, window: int = 8) -> np.ndarray:
    """Rolling (Rabin-Karp style) window hashes of a string."""
    if not s or len(s) < window:
        return np.array([hash_u64_str(s)], dtype=np.uint64)
    b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
    if len(b) < window:
        return np.array([hash_u64_str(s)], dtype=np.uint64)
    base = np.uint64(1099511628211)
    pows = base ** np.arange(window, dtype=np.uint64)
    # windows via strided sum of byte*pow
    n = len(b) - window + 1
    out = np.zeros(n, dtype=np.uint64)
    for k in range(window):
        out += b[k : k + n] * pows[window - 1 - k]
    return out


def hash_u64_str(s: str) -> np.uint64:
    """FNV-1a 64-bit (deterministic across runs, unlike Python's hash)."""
    h = np.uint64(0xCBF29CE484222325)
    for byte in (s or "").encode("utf-8", "ignore"):
        h = np.uint64((int(h) ^ byte) * 0x100000001B3 % (1 << 64))
    return h


def document_fingerprint(batch: pa.Table, text_col: str = "text", window: int = 8,
                         keep: int = 4) -> pa.Table:
    """Winnowing-style fingerprint: the ``keep`` smallest rolling-window
    hashes, combined into one u64 per document."""
    texts = batch.column(text_col).combine_chunks().to_pylist()
    fps = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        hs = np.sort(_rolling_hash_u64(t or "", window))[:keep]
        acc = np.uint64(0xCBF29CE484222325)
        for h in hs:
            acc = np.uint64((int(acc) ^ int(h)) * 0x100000001B3 % (1 << 64))
        fps[i] = acc
    return batch.append_column("fingerprint", pa.array(fps))
