"""Text analysis kernels for large-scale training-data pipelines.

All functions are pa.Table -> pa.Table batch kernels.  Every hot path is
vectorized over the flat UTF-8 buffer of the string column (see
``_strkern``): byte/char classification, token counting, language scoring
and fingerprinting run as numpy / pyarrow.compute passes with no per-row
Python, so a map_batches stage is memory-bandwidth-bound, not
interpreter-bound.  Output values are bit-identical to the original
per-row reference kernels (pinned by tests/test_ray_layer.py), with one
documented exception: lowercasing goes through Arrow's utf8_lower, which
follows ICU special cases ('İ' -> 'i') where Python's str.lower emits a
combining mark — ASCII text is unaffected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._strkern import (
    FNV_OFFSET,
    FNV_PRIME,
    char_classes,
    codepoints,
    fnv1a_segments,
    list_offsets,
    split_tokens,
    utf8_view,
)

# BPE-ish pretokenizer: words with leading space, numbers, punctuation runs.
# RE2-compatible (used via pc.count_substring_regex — no Python regex loop).
# RE2's \s is ASCII-only, so the whitespace class is generated from Python's
# own str.isspace set to keep token counts identical to the re module.
_WS_CLASS = "".join(
    "\\x{%x}" % c for c in range(0x10000) if chr(c).isspace()
)
_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^" + _WS_CLASS + r"A-Za-z0-9]+"

# tiny stopword profiles for a crude n-gram language heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "une", "pour", "que"},
    "es": {"el", "la", "de", "que", "los", "una", "por", "con", "para", "las"},
}
_LANG_NAMES = list(_LANG_PROFILES)  # scoring order == dict order (ties -> first)




def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens, regex (BPE-ish) tokens, chars."""
    text = batch.column(text_col)
    ws = pc.list_value_length(pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+"))
    # null text counted 0 tokens in the scalar reference (`if t else 0`)
    bpe = pc.fill_null(pc.count_substring_regex(text, _TOKEN_PATTERN), 0)
    batch = batch.append_column("n_tokens_ws", ws.cast(pa.int64()))
    batch = batch.append_column("n_tokens_re", bpe.cast(pa.int64()))
    return batch.append_column("n_chars", pc.utf8_length(text).cast(pa.int64()))


def language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language guess (n-gram heuristic); 'und' when the
    best profile scores < 2 hits in the first 300 words."""
    text = batch.column(text_col)
    toks = pc.list_slice(split_tokens(pc.utf8_lower(text)), 0, 300)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    off = list_offsets(toks)
    n = len(batch)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    counts = np.zeros((n, len(_LANG_NAMES)), dtype=np.int64)
    for li, lang in enumerate(_LANG_NAMES):
        hits = pc.is_in(
            flat, value_set=pa.array(sorted(_LANG_PROFILES[lang]))
        ).to_numpy(zero_copy_only=False)
        if hits.any():
            counts[:, li] = np.bincount(doc_of[hits], minlength=n)
    best = counts.argmax(axis=1)  # first max == dict-order strict-> semantics
    bestc = counts.max(axis=1)
    langs = np.where(bestc >= 2, np.array(_LANG_NAMES)[best], "und")
    return batch.append_column("lang_guess", pa.array(langs, type=pa.string()))


def quality_score(batch: pa.Table, text_col: str = "text",
                  counts: bool = False) -> pa.Table:
    """Heuristic quality features + a combined score in [0, 1]:
    length, alpha ratio, punctuation ratio, mean word length.

    One UTF-32 decode of the whole batch, then numpy char-class tables and
    prefix sums — exact parity with per-character str.isalpha/isspace/
    isalnum semantics (see _strkern.char_classes).  With ``counts=True``
    the raw integer features (n_alpha_space, n_punct, n_words, word_chars)
    are appended too — the SQL-oracleable layer under the float score."""
    text = batch.column(text_col)
    n = len(batch)
    # null text scores as '' (0.15), matching the scalar reference kernel;
    # utf8_length would propagate the null into a NaN score otherwise
    n_chars = pc.utf8_length(pc.fill_null(text, "")).cast(pa.float64()).to_numpy(
        zero_copy_only=False
    )
    u32, char_off = codepoints(text)
    is_alpha, is_space, is_alnum = char_classes(u32)
    nonspace = ~is_space
    # word starts: non-space char whose predecessor (within the same doc) is
    # space or start-of-doc
    prev_ns = np.zeros(len(u32), dtype=bool)
    if len(u32):
        prev_ns[1:] = nonspace[:-1]
        prev_ns[char_off[:-1][char_off[:-1] < len(u32)]] = False
    word_start = nonspace & ~prev_ns
    # all four per-doc counts from ONE bincount over a (doc, class-combo)
    # composite code — a single O(total_chars) counting pass
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(char_off))
    combo = (
        (is_alpha | is_space).astype(np.int64)
        + ((~is_alnum) & nonspace) * 2
        + word_start * 4
        + nonspace * 8
    )
    cnt = np.bincount(doc_of * 16 + combo, minlength=n * 16).reshape(n, 16)
    bits = np.arange(16)
    na = (cnt * (bits & 1).astype(bool)).sum(axis=1).astype(np.float64)
    npct = (cnt * (bits & 2).astype(bool)).sum(axis=1).astype(np.float64)
    n_words = (cnt * (bits & 4).astype(bool)).sum(axis=1).astype(np.float64)
    word_chars = (cnt * (bits & 8).astype(bool)).sum(axis=1).astype(np.float64)

    nz = n_chars > 0
    alpha = np.zeros(n)
    punct = np.zeros(n)
    alpha[nz] = na[nz] / n_chars[nz]
    punct[nz] = npct[nz] / n_chars[nz]
    mean_wl = np.divide(word_chars, n_words, out=np.zeros(n), where=n_words > 0)
    length_score = np.clip(n_chars / 500.0, 0.0, 1.0)
    wl_score = np.clip(1.0 - np.abs(mean_wl - 5.0) / 5.0, 0.0, 1.0)
    score = 0.35 * length_score + 0.35 * alpha + 0.15 * (1 - np.clip(punct * 4, 0, 1)) + 0.15 * wl_score
    batch = batch.append_column("alpha_ratio", pa.array(alpha))
    batch = batch.append_column("punct_ratio", pa.array(punct))
    batch = batch.append_column("mean_word_len", pa.array(mean_wl))
    batch = batch.append_column("quality", pa.array(score))
    if counts:
        batch = batch.append_column("n_alpha_space", pa.array(na.astype(np.int64)))
        batch = batch.append_column("n_punct", pa.array(npct.astype(np.int64)))
        batch = batch.append_column("n_words", pa.array(n_words.astype(np.int64)))
        batch = batch.append_column("word_chars", pa.array(word_chars.astype(np.int64)))
    return batch


# PII patterns, RE2-compatible (both pyarrow.compute and DuckDB compile
# regexes with RE2, so the oracle twin applies the IDENTICAL patterns —
# no engine-divergence risk).  Order matters: emails first (an email's
# digits must not be half-eaten by the phone pattern).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(batch: pa.Table, text_col: str = "text",
               out_col: str | None = None) -> pa.Table:
    """Redact emails / IPv4s / phone-ish digit runs with typed
    placeholders, plus an int64 ``n_redactions`` count per doc — the
    standard pre-training PII scrub pass (C4/RefinedWeb-style), fully
    vectorized via Arrow's RE2 kernels (no Python regex loop).  Pattern
    order is fixed (emails before phones) so digits inside an email are
    never double-redacted.  ``out_col`` defaults to replacing
    ``text_col`` in place."""
    text = batch.column(text_col)
    total = None
    for _, pat, repl in PII_PATTERNS:
        n = pc.count_substring_regex(text, pat).cast(pa.int64())
        total = n if total is None else pc.add(total, n)
        text = pc.replace_substring_regex(text, pat, repl)
    def set_or_append(t: pa.Table, name: str, col) -> pa.Table:
        if name in t.column_names:
            return t.set_column(t.schema.get_field_index(name), name, col)
        return t.append_column(name, col)

    batch = set_or_append(batch, out_col or text_col, text)
    return set_or_append(batch, "n_redactions", pc.fill_null(total, 0))


# RE2-compatible (pyarrow.compute AND DuckDB both compile RE2, so a SQL
# oracle can apply the byte-identical pattern)
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?:/[^\s]*)?"
# named group: pyarrow extract_regex requires named groups; DuckDB
# addresses the same group positionally as group 1
URL_HOST_PATTERN = r"https?://(?P<host>[A-Za-z0-9.-]+)"


def extract_url_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc URL stats — the link-density / source-attribution pass of
    a web-corpus pipeline: int64 ``n_urls`` and utf8 ``first_host``
    (registrable host of the FIRST url, '' when none), fully vectorized
    via Arrow's RE2 kernels.  Feed ``first_host``/exploded hosts into the
    generic per-key machinery (top_n_per_group, bloom joins, exact
    dedup) for per-domain caps and stats."""
    text = batch.column(text_col)
    n = pc.fill_null(pc.count_substring_regex(text, URL_PATTERN), 0).cast(
        pa.int64()
    )
    # extract_regex returns a struct with one field per capture group
    first = pc.extract_regex(text, URL_HOST_PATTERN)
    host = pc.fill_null(pc.struct_field(first, "host"), "")
    batch = batch.append_column("n_urls", n)
    return batch.append_column("first_host", host.cast(pa.string()))


def hash_u64_str(s: str) -> np.uint64:
    """FNV-1a 64-bit of one string (deterministic across runs, unlike
    Python's hash).  Scalar convenience; batches use ``hash_u64_batch``."""
    h = np.uint64(0xCBF29CE484222325)
    for byte in (s or "").encode("utf-8", "ignore"):
        h = np.uint64((int(h) ^ byte) * 0x100000001B3 % (1 << 64))
    return h


def hash_u64_batch(col) -> np.ndarray:
    """FNV-1a 64-bit per row of a string column — jagged-vectorized."""
    data, off = utf8_view(col)
    return fnv1a_segments(data, off)


def document_fingerprint(batch: pa.Table, text_col: str = "text", window: int = 8,
                         keep: int = 4) -> pa.Table:
    """Winnowing-style fingerprint: the ``keep`` smallest rolling-window
    (Rabin-Karp) hashes of each document, FNV-combined into one u64.

    Vectorized: window hashes for the whole batch are ``window`` shifted
    multiply-adds over the flat byte buffer; per-document top-``keep`` via
    one lexsort; documents shorter than ``window`` *characters* fall back to
    the whole-string FNV hash (same semantics as the scalar reference)."""
    text = batch.column(text_col)
    n = len(batch)
    data, off = utf8_view(text)
    charlens = pc.utf8_length(pc.fill_null(text, "")).to_numpy(zero_copy_only=False)
    short = charlens < window  # includes empty docs

    fps = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # fallback: single whole-string FNV hash, combined once
        if short.any():
            idx = np.nonzero(short)[0]
            from ._strkern import gather_segments

            sub_data, sub_off = gather_segments(data, off[:-1][idx], off[1:][idx])
            h = fnv1a_segments(sub_data, sub_off)
            fps[idx] = (FNV_OFFSET ^ h) * FNV_PRIME

        # rolling windows over the flat buffer, masked to within-doc spans
        long_mask = ~short
        if long_mask.any():
            base = np.uint64(1099511628211)
            total = len(data)
            m = total - window + 1
            if m > 0:
                # closed-form polynomial hash via modular prefix sums: since
                # base is odd it is invertible mod 2^64, so
                #   H(p) = base^(p+w-1) * sum_i b[i]*base^(-i), i in [p, p+w)
                # — three cumulative passes instead of `window` shifted
                # multiply-adds (the dominant cost on this DRAM-bound box).
                inv = np.uint64(pow(1099511628211, -1, 1 << 64))
                invp = np.full(total, inv, dtype=np.uint64)
                invp[0] = np.uint64(1)
                np.cumprod(invp, out=invp)  # invp[i] = base^-i
                P = np.zeros(total + 1, dtype=np.uint64)
                np.cumsum(data.astype(np.uint64) * invp, out=P[1:])
                pw = np.full(m, base, dtype=np.uint64)
                pw[0] = base ** np.uint64(window - 1)
                np.cumprod(pw, out=pw)  # pw[p] = base^(p+w-1)
                H = (P[window:] - P[:m]) * pw
                # valid windows: start within a long doc and not within
                # window-1 bytes of its end (shared jagged-window helper)
                from ._strkern import window_valid

                valid, wcounts, _ = window_valid(off, window, short)
                Hv = H[valid]
                dv = np.repeat(np.arange(n, dtype=np.int64), wcounts)
                # threshold prefilter: hashes are ~uniform, so the keep
                # smallest of a doc's wc windows are (whp) below
                # 8*keep/wc * 2^64; docs where the filter kept too few fall
                # back to all their windows.  Shrinks the sort to ~10%.
                wc = np.bincount(dv, minlength=n).astype(np.float64)
                frac = np.minimum(1.0, 8.0 * keep / np.maximum(wc, 1.0))
                # 1.8446e19 is just below 2^64 so the cast never overflows;
                # any windows lost to the slightly-low cap are reclaimed by
                # the `bad` full-doc fallback below.
                thresh = (frac * 1.8446744073709549e19).astype(np.uint64)
                keepmask = Hv < thresh[dv]
                got = np.bincount(dv[keepmask], minlength=n)
                bad = got < np.minimum(keep, wc.astype(np.int64))
                if bad.any():
                    keepmask |= bad[dv]
                Hv, dv = Hv[keepmask], dv[keepmask]
                order = np.lexsort((Hv, dv))
                Hs, ds = Hv[order], dv[order]
                # rank within doc group
                grp_start = np.zeros(len(ds), dtype=np.int64)
                new_grp = np.concatenate([[True], ds[1:] != ds[:-1]])
                grp_start[new_grp] = np.nonzero(new_grp)[0]
                grp_start = np.maximum.accumulate(grp_start)
                rank = np.arange(len(ds)) - grp_start
                sel = rank < keep
                Hk, dk, rk = Hs[sel], ds[sel], rank[sel]
                M = np.zeros((n, keep), dtype=np.uint64)
                has = np.zeros((n, keep), dtype=bool)
                M[dk, rk] = Hk
                has[dk, rk] = True
                acc = np.full(n, FNV_OFFSET, dtype=np.uint64)
                for r in range(keep):
                    mask = has[:, r]
                    acc[mask] = (acc[mask] ^ M[mask, r]) * FNV_PRIME
                fps[long_mask] = acc[long_mask]
    return batch.append_column("fingerprint", pa.array(fps))


# ---------------------------------------------------------------------------
# vocabulary statistics + term search (inverted-index family)
# ---------------------------------------------------------------------------


def _batch_term_partials(batch: pa.Table, text_col: str, doc_col: str):
    """(terms pa.Array, df_partial, tf_partial) for one batch of docs:
    whitespace tokens dictionary-encoded once, tf via bincount, df via
    distinct (``doc_col`` value, term) pairs — duplicate doc ids within
    a batch count once.  A doc id must not span batches (each doc is one
    row, and one row lives in one batch), so summing these partials over
    batches yields exact global df/tf."""
    toks = split_tokens(batch.column(text_col))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = list_offsets(toks)
    flat = toks.values
    did = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of_tok = np.repeat(did, np.diff(off))
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    # split_tokens yields one '' token for fully-empty rows: mask it out
    lens = pc.utf8_length(vocab).to_numpy(zero_copy_only=False)
    ok = lens[idx] > 0
    idx, doc_of_tok = idx[ok], doc_of_tok[ok]
    nv = len(vocab)
    tf = np.bincount(idx, minlength=nv).astype(np.int64)
    from ._util import distinct_pairs

    _, uterm = distinct_pairs(doc_of_tok, idx)
    df = np.bincount(uterm, minlength=nv).astype(np.int64)
    used = tf > 0
    return vocab.take(pa.array(np.nonzero(used)[0])), df[used], tf[used]


def token_doc_stats(ds, text_col: str = "text", doc_col: str = "doc_id",
                    num_buckets: int = 64):
    """Corpus vocabulary statistics: one row per distinct whitespace
    token with ``df`` (distinct documents containing it) and ``tf``
    (total occurrences) — the document-frequency table behind stopword
    pruning, idf weighting and tokenizer vocab selection.

    Scale: per-batch dictionary-encoded partials bound the exchange at
    (vocab-per-block x blocks), then ONE bucketed groupby with a
    vectorized dictionary-merge per bucket (the high-cardinality groupby
    rule — at web scale the vocabulary has millions of entries, far too
    many for Ray's per-key combine)."""

    def partial(batch: pa.Table) -> pa.Table:
        terms, df, tf = _batch_term_partials(batch, text_col, doc_col)
        bucket = (hash_u64_batch(terms) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "term": terms,
                "df": pa.array(df),
                "tf": pa.array(tf),
                "bucket": pa.array(bucket),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(group.column("term").combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(enc.dictionary)
        df = np.zeros(nv, dtype=np.int64)
        tf = np.zeros(nv, dtype=np.int64)
        np.add.at(df, idx, group.column("df").to_numpy(zero_copy_only=False))
        np.add.at(tf, idx, group.column("tf").to_numpy(zero_copy_only=False))
        return pa.table(
            {"term": enc.dictionary, "df": pa.array(df), "tf": pa.array(tf)}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("bucket").map_groups(merge, batch_format="pyarrow")


def term_search(ds, terms: list[str], *, text_col: str = "text",
                doc_col: str = "doc_id", k: int = 20):
    """Top-``k`` documents for a bag-of-words query: score = total
    occurrences of any query term in the doc (ties toward the smallest
    doc id), 1-based ``rank``.  Returns (doc_id, score, rank).

    Scale: the query-term set ships once via ``ray.put``; each batch
    scores its docs with one dictionary-encode + isin mask (no exchange
    for scoring, docs never leave their block), then the global top-k
    reduces through ranking.top_n_per_group's partial-top-k combiner —
    exchange volume is k rows per upstream block, not one row per
    matching doc."""
    import ray

    from .ranking import top_n_per_group

    terms_ref = ray.put(pa.array(sorted(set(terms))))

    def score(batch: pa.Table) -> pa.Table:
        qset = ray.get(terms_ref)
        toks = split_tokens(batch.column(text_col))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = list_offsets(toks)
        hit = pc.is_in(toks.values, value_set=qset).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        sc = np.bincount(doc_of_tok[hit], minlength=n).astype(np.int64)
        pos = sc > 0
        did = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                doc_col: pa.array(did[pos]),
                "score": pa.array(sc[pos]),
                "grp": pa.array(np.zeros(int(pos.sum()), dtype=np.int64)),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    top = top_n_per_group(
        scored, key_col="grp", val_col="score", id_col=doc_col, n=k
    )
    return top.drop_columns(["grp"])
