"""Cross-document repeated-segment removal, sessionization, vocabulary
stats and term search (the round-4 training-data additions)."""

import numpy as np
import pyarrow as pa
import pytest

from h3ray.functions.linedup import remove_duplicated_segments, split_segments
from h3ray.functions._strkern import utf8_view


def _segs(docs, delim):
    data, off = utf8_view(pa.chunked_array([pa.array(docs)]))
    starts, stops, dos = split_segments(data, off, delim)
    return [
        (int(d), data[s:t].tobytes().decode())
        for d, s, t in zip(dos, starts, stops)
    ]


def test_split_segments_edges():
    assert _segs(["a\nb", "", "\n", "x\n"], b"\n") == [
        (0, "a"),
        (0, "b"),
        (1, ""),
        (2, ""),
        (2, ""),
        (3, "x"),
        (3, ""),
    ]


def test_split_segments_rejects_multibyte_delim():
    with pytest.raises(ValueError):
        _segs(["a"], b"ab")


def _brute_remove(docs, delim, min_docs):
    """Reference: exact-content line dedup in plain Python."""
    from collections import Counter

    df = Counter()
    for d in docs:
        df.update({s for s in d.split(delim) if s})
    dup = {s for s, c in df.items() if c >= min_docs}
    out = []
    for d in docs:
        kept = [s for s in d.split(delim) if s and s not in dup]
        total = [s for s in d.split(delim) if s]
        out.append((delim.join(kept), len(kept), len(total) - len(kept)))
    return out


@pytest.mark.parametrize("delim", ["\n", " "])
def test_remove_duplicated_segments_matches_brute(ray_session, delim):
    import ray

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "", "header line", "x y"]
    docs = [
        delim.join(
            vocab[i] for i in rng.integers(0, len(vocab), rng.integers(0, 8))
        )
        for _ in range(60)
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    )
    got = {
        r["doc_id"]: (r["kept_text"], r["n_kept"], r["n_dropped"])
        for r in remove_duplicated_segments(
            ds, delim=delim.encode(), min_docs=10, num_buckets=4
        ).take_all()
    }
    want = _brute_remove(docs, delim, 10)
    for i, w in enumerate(want):
        assert got[i] == w, (i, docs[i], got[i], w)


def test_remove_duplicated_segments_guard(ray_session):
    import ray

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1], "text": ["a\nb", "a\nc"]})
    )
    with pytest.raises(ValueError, match="max_dup_segments"):
        remove_duplicated_segments(ds, min_docs=2, max_dup_segments=0).take_all()


def test_sessionize_matches_window_rule(ray_session):
    import ray

    from h3ray.functions.timeseries import sessionize

    rng = np.random.default_rng(3)
    n = 400
    key = rng.integers(0, 12, n).astype(np.int64)
    ts = rng.integers(0, 10_000, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"uid": key, "t": ts, "eid": eid})
    )
    gap = 300
    got = {
        r["eid"]: r["session_seq"]
        for r in sessionize(
            ds, key_col="uid", ts_col="t", id_col="eid", gap_us=gap,
            num_buckets=4,
        ).take_all()
    }
    # brute force per key
    want = {}
    for k in np.unique(key):
        idx = np.nonzero(key == k)[0]
        order = idx[np.lexsort((eid[idx], ts[idx]))]
        seq = 0
        prev = None
        for i in order:
            if prev is None or ts[i] - prev > gap:
                seq += 1
            want[int(eid[i])] = seq
            prev = ts[i]
    assert got == want

    # session-level rollup agrees with the event labels
    sess = sessionize(
        ds, key_col="uid", ts_col="t", id_col="eid", gap_us=gap,
        num_buckets=4, emit="sessions",
    ).take_all()
    from collections import defaultdict

    per = defaultdict(list)
    for i in range(n):
        per[(int(key[i]), want[int(eid[i])])].append(int(ts[i]))
    assert len(sess) == len(per)
    for r in sess:
        tss = per[(r["uid"], r["session_seq"])]
        assert r["n_events"] == len(tss)
        assert r["duration_us"] == max(tss) - min(tss)
        assert r["start_us"] == min(tss)


def test_sessionize_rejects_bad_emit(ray_session):
    import ray

    from h3ray.functions.timeseries import sessionize

    ds = ray.data.from_arrow(pa.table({"u": [1], "t": [1], "e": [1]}))
    with pytest.raises(ValueError, match="emit"):
        sessionize(ds, key_col="u", ts_col="t", id_col="e", gap_us=1,
                   emit="rows")


def test_token_doc_stats_and_term_search(ray_session):
    import ray

    from h3ray.functions.text import term_search, token_doc_stats

    docs = ["a b b c", "", "b c d", "a  a", "c", "  ", "d a"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    )
    st = {
        r["term"]: (r["df"], r["tf"])
        for r in token_doc_stats(ds, num_buckets=3).take_all()
    }
    assert st == {"a": (3, 4), "b": (2, 3), "c": (3, 3), "d": (2, 2)}

    top = term_search(ds, ["a", "c"], k=3).take_all()
    assert [(r["doc_id"], r["score"], r["rank"]) for r in top] == [
        (0, 2, 1),
        (3, 2, 2),
        (2, 1, 3),
    ]


def test_exact_group_distinct(ray_session):
    import ray

    from h3ray.functions.sampling import exact_group_distinct

    rng = np.random.default_rng(11)
    k = rng.integers(0, 20, 3000).astype(np.int64)
    v = rng.integers(0, 50, 3000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"g": k, "x": v}))
    got = {
        r["g"]: r["n_distinct"]
        for r in exact_group_distinct(
            ds, key_col="g", val_col="x", num_buckets=4
        ).take_all()
    }
    want = {
        int(g): len(np.unique(v[k == g])) for g in np.unique(k)
    }
    assert got == want


def test_flag_contaminated(ray_session):
    import ray

    from h3ray.functions.decontam import flag_contaminated

    docs = [
        "the quick brown fox jumps",   # bench
        "lazy dog sleeps",             # bench
        "a quick brown fox runs",      # shares 'quick brown fox'
        "quick brown cat jumps",       # no full 3-gram shared
        "lazy dog sleeps all day",     # shares 'lazy dog sleeps'
        "",                            # empty
        "one two",                     # < 3 tokens
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    )
    bench = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1], "text": docs[:2]})
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in flag_contaminated(ds, bench, n=3).take_all()
    }
    assert got == {
        0: (3, True),   # self-overlap: all 3 of its grams
        1: (1, True),
        2: (1, True),
        3: (0, False),
        4: (1, True),
        5: (0, False),
        6: (0, False),
    }


def test_benchmark_gram_guard(ray_session):
    import ray

    from h3ray.functions.decontam import flag_contaminated

    ds = ray.data.from_arrow(pa.table({"doc_id": [0], "text": ["a b c d"]}))
    with pytest.raises(ValueError, match="max_grams"):
        flag_contaminated(ds, ds, n=3, max_grams=1).take_all()


def test_split_segments_rejects_non_ascii_delim():
    with pytest.raises(ValueError, match="ASCII"):
        _segs(["a"], b"\xa7")


def test_token_doc_stats_duplicate_doc_ids(ray_session):
    import ray

    from h3ray.functions.text import token_doc_stats

    # the same doc id on two rows of one batch: df counts it ONCE
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [7, 7, 8], "text": ["a b", "a c", "a"]})
    )
    st = {
        r["term"]: (r["df"], r["tf"])
        for r in token_doc_stats(ds, num_buckets=2).take_all()
    }
    assert st == {"a": (2, 3), "b": (1, 1), "c": (1, 1)}
