"""Property-based tests (hypothesis) over the core codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from h3ray.h3core import bits, boundary, faceijk, hierarchy


coords = st.tuples(
    st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    st.floats(min_value=-179.99, max_value=179.99, allow_nan=False),
    st.integers(min_value=0, max_value=15),
)


@settings(max_examples=200, deadline=None)
@given(coords)
def test_encode_decode_roundtrip(c):
    lat, lng, res = c
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    assert bits.is_valid_cell(cell).all()
    la, lo = faceijk.cell_to_latlng(cell)
    again = faceijk.latlng_to_cell(la, lo, res)
    assert again[0] == cell[0]
    # the input point is within the cell circumradius of the centroid
    d = boundary.great_circle_distance_rads(
        np.radians([lat]), np.radians([lng]), np.radians(la), np.radians(lo)
    )[0]
    # res-0 circumradius is < 0.21 rad; each res shrinks by sqrt(7)
    assert d < 0.22 / (7 ** (res / 2)) * 2.66


@settings(max_examples=100, deadline=None)
@given(coords)
def test_parent_contains_direct_child_center(c):
    # only DIRECT children: deeper descendants' centers can legitimately
    # fall outside an ancestor's hexagon (aperture-7 fractal overhang)
    lat, lng, res = c
    if res == 0:
        return
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    parent = bits.cell_to_parent(cell, np.uint64(res - 1))
    direct = faceijk.latlng_to_cell(*faceijk.cell_to_latlng(cell), res - 1)
    assert parent[0] == direct[0]


@settings(max_examples=50, deadline=None)
@given(coords)
def test_compact_uncompact_roundtrip(c):
    lat, lng, res = c
    res = max(1, min(res, 9))
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res - 1)
    ch = hierarchy.uncompact(cell, res)
    out = hierarchy.compact(ch)
    assert len(out) == 1 and out[0] == cell[0]


@settings(max_examples=100, deadline=None)
@given(coords)
def test_string_roundtrip(c):
    lat, lng, res = c
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    s = bits.to_hex_strings(cell)
    back, ok = bits.parse_hex_strings(list(s))
    assert ok.all() and back[0] == cell[0]


# --- round-3 training-data operators -----------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.text(max_size=600), min_size=1, max_size=20),
    st.integers(min_value=2, max_value=64),
    st.integers(min_value=0, max_value=31),
)
def test_chunk_documents_roundtrip_property(texts, size, overlap):
    """Any unicode corpus: chunks reassemble losslessly (strip each chunk's
    leading overlap) and the chunk-count formula holds per doc."""
    import pyarrow as pa

    from h3ray.functions import sampling

    if overlap >= size:
        overlap = size - 1
    stride = size - overlap
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    out = sampling.chunk_documents(t, size=size, overlap=overlap).to_pandas()
    for i, txt in enumerate(texts):
        chunks = out[out.doc_id == i].sort_values("chunk_id")["chunk_text"].tolist()
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == txt
        exp = 1 if len(txt) <= size else 1 + -(-(len(txt) - size) // stride)
        assert len(chunks) == exp


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=40))
def test_fnv_blocked_scheme_parity_property(segs):
    """Below the block cap, the jagged FNV kernel must equal the scalar
    reference byte-for-byte for arbitrary binary segments."""
    from h3ray.functions._strkern import FNV_OFFSET, FNV_PRIME, fnv1a_segments

    data = np.frombuffer(b"".join(segs), dtype=np.uint8)
    off = np.zeros(len(segs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=off[1:])
    got = fnv1a_segments(data, off)
    for i, s in enumerate(segs):
        h = np.uint64(FNV_OFFSET)
        with np.errstate(over="ignore"):
            for byte in s:
                h = np.uint64((int(h) ^ byte) * int(FNV_PRIME) % (1 << 64))
        assert got[i] == h


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.text(max_size=120), st.text(max_size=120)),
                min_size=1, max_size=30))
def test_jaccard_pairs_matches_scalar_property(pairs):
    """The vectorized batch Jaccard equals the per-pair scalar for
    arbitrary unicode text pairs (multi-byte UTF-8, empties, shorts —
    the zero-pad path — and identical strings)."""
    import pyarrow as pa

    from h3ray.functions import dedup

    t = pa.table({
        "text_a": pa.array([a for a, _ in pairs], type=pa.large_string()),
        "text_b": pa.array([b for _, b in pairs], type=pa.large_string()),
    })
    out = dedup.jaccard_pairs(t)
    for i, (a, b) in enumerate(pairs):
        assert abs(out.column("jaccard")[i].as_py()
                   - dedup.jaccard(a, b)) < 1e-12


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
             max_size=200, unique=True),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hash_sample_rate_property(keys, rate):
    """hash_sample is a pure per-key predicate: subset-invariant (sampling
    a subset equals subsetting the sample) and monotone in rate."""
    import pyarrow as pa

    from h3ray.functions import sampling

    t = pa.table({"doc_id": pa.array(keys, type=pa.int64())})
    kept = set(sampling.hash_sample(t, rate).column("doc_id").to_pylist())
    half = pa.table({"doc_id": pa.array(keys[::2], type=pa.int64())})
    kept_half = set(sampling.hash_sample(half, rate).column("doc_id").to_pylist())
    assert kept_half == kept & set(keys[::2])
    kept_less = set(
        sampling.hash_sample(t, rate / 2).column("doc_id").to_pylist()
    )
    assert kept_less <= kept


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 500)),
        min_size=0, max_size=120,
    )
)
def test_multi_key_runs_matches_brute_force(rows):
    """The bucketed run kernel's (order, first_idx, rank) equals a
    per-composite-key brute force for arbitrary key collisions and
    duplicate tiebreak values."""
    from h3ray.functions.dedup import _multi_key_runs

    k1 = np.array([r[0] for r in rows], dtype=np.int64)
    k2 = np.array([r[1] for r in rows], dtype=np.int64)
    doc = np.array([r[2] for r in rows], dtype=np.int64)
    order, first_idx, rank = _multi_key_runs([k1, k2], doc)
    triples = sorted(zip(k1.tolist(), k2.tolist(), doc.tolist()))
    assert [
        (k1[i], k2[i], doc[i]) for i in order.tolist()
    ] == triples
    # rank within each (k1, k2) run, brute-forced
    want_rank = []
    prev_key, r = None, 0
    for a, b, _ in triples:
        r = r + 1 if (a, b) == prev_key else 0
        prev_key = (a, b)
        want_rank.append(r)
    assert rank.tolist() == want_rank
    assert all(
        first_idx[i] == i - rank[i] for i in range(len(rank))
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 20), st.integers(-50, 50)),
             min_size=0, max_size=150)
)
def test_segment_min_broadcast_matches_brute_force(rows):
    """Bucketed CC's segment-min kernel equals a per-key dict min."""
    from h3ray.functions.dedup import _segment_min_broadcast

    keys = np.array([r[0] for r in rows], dtype=np.int64)
    labels = np.array([r[1] for r in rows], dtype=np.int64)
    got = _segment_min_broadcast([keys], labels)
    mins = {}
    for k, v in rows:
        mins[k] = min(mins.get(k, v), v)
    assert got.tolist() == [mins[k] for k in keys.tolist()]


# --- top-level array API (h3ray.arrays) properties ---------------------------

_cells_strategy = st.lists(coords, min_size=1, max_size=12)


@settings(max_examples=60, deadline=None)
@given(_cells_strategy)
def test_arrays_parse_string_roundtrip(cs):
    import h3ray as h

    lat = np.array([c[0] for c in cs])
    lng = np.array([c[1] for c in cs])
    res = np.array([c[2] for c in cs])
    cells = faceijk.latlng_to_cell(lat, lng, res)
    strings = h.cells_to_string(cells)
    assert h.cells_parse(strings).to_pylist() == cells.tolist()
    # decimal-integer form parses to the same cells
    dec = [str(int(c)) for c in cells]
    assert h.cells_parse(dec).to_pylist() == cells.tolist()


@settings(max_examples=40, deadline=None)
@given(coords, st.integers(min_value=0, max_value=2))
def test_arrays_change_resolution_list_flatten_consistency(c, delta):
    """change_resolution == concat(change_resolution_list) when all rows
    are valid (the reference's flatten relationship)."""
    import pyarrow as pa

    import h3ray as h

    lat, lng, res = c
    target = min(15, res + delta)
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    arr = pa.array(np.repeat(cell, 3), type=pa.uint64())
    flat = h.change_resolution(arr, target).to_pylist()
    lst = h.change_resolution_list(arr, target).to_pylist()
    assert sorted(x for row in lst for x in row) == sorted(flat)
    paired = h.change_resolution_paired(arr, target)
    assert sorted(paired.column("cell_after").to_pylist()) == sorted(flat)


@settings(max_examples=40, deadline=None)
@given(coords)
def test_arrays_localij_roundtrip_within_disk(c):
    import pyarrow as pa

    import h3ray as h

    lat, lng, res = c
    anchor = int(
        faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)[0]
    )
    neigh = h.grid_disk(pa.array([anchor], type=pa.uint64()), 1, flatten=True)
    ij = h.cells_to_localij(neigh, anchor, set_failing_to_invalid=True)
    i, j = ij.column("i"), ij.column("j")
    ok_rows = [k for k in range(len(i)) if i[k].as_py() is not None]
    back = h.localij_to_cells(
        anchor, i.take(pa.array(ok_rows)), j.take(pa.array(ok_rows)),
        set_failing_to_invalid=True,
    )
    got = back.to_pylist()  # positionally aligned with ok_rows
    want = [neigh[k].as_py() for k in ok_rows]
    # every successfully round-tripped coordinate lands on its source cell
    assert all(g == w for g, w in zip(got, want, strict=True)
               if g is not None)
    # and the k=1 disk of a hexagon anchor round-trips completely
    if not bits.is_pentagon(np.array([anchor], dtype=np.uint64))[0]:
        assert len(ok_rows) == len(neigh) and got == want


@settings(max_examples=50, deadline=None)
@given(st.lists(coords, min_size=1, max_size=8),
       st.integers(min_value=0, max_value=4))
def test_compact_mixed_area_preservation(cs, res_spread):
    """compact(mixed_resolutions=True) must preserve COVERAGE exactly:
    uncompacting the output to the finest input resolution yields the
    same cell SET as uncompacting the input (covered duplicates
    collapse), and no output cell is an ancestor of another output
    cell."""
    lat = np.array([c[0] for c in cs])
    lng = np.array([c[1] for c in cs])
    # mixed resolutions in a narrow band so uncompact stays small
    res = np.array([min(15, c[2] % 3 + res_spread) for c in cs])
    cells = faceijk.latlng_to_cell(lat, lng, res)
    out = hierarchy.compact(cells, mixed_resolutions=True)
    rmax = int(bits.get_resolution(cells).max())
    want = set(hierarchy.uncompact(np.unique(cells), rmax).tolist())
    got = set(hierarchy.uncompact(out, rmax).tolist())
    assert got == want
    # pairwise ancestor-freedom: each output cell's ancestor at every
    # coarser output resolution must not itself be an output cell
    out_set = set(out.tolist())
    out_res = bits.get_resolution(out).astype(np.int64)
    for rc in np.unique(out_res)[:-1]:
        finer = out[out_res > rc]
        if len(finer):
            anc = bits.cell_to_parent(finer, np.uint64(int(rc)))
            coarse_set = set(out[out_res == rc].tolist())
            assert not (set(anc.tolist()) & coarse_set)
