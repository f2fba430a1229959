"""Distributed point-in-polygon join (the north-star operator).

Two-phase design per SURVEY.md section 2.8 (mirrors the intent of the
reference's Rust-only SpatialIndex, crates/h3arrow/src/spatial_index.rs,
re-expressed for Ray Data):

  phase 1 — cover: each polygon/rectangle is covered by the set of H3 cells
  at a join resolution whose cells could contain any of its points (a
  superset; guaranteed by sampling the buffered bbox at sub-inradius
  spacing).  The cover is keyed by cell.

  phase 2 — join: points are encoded to the same resolution.
    * broadcast variant (small polygon side): the cover dict is placed in
      the object store once (``ray.put``) and every ``map_batches`` task
      reads it zero-copy; candidates are refined with an exact planar test.
    * shuffle variant (both sides large): both sides key by cell and
      co-group via ``groupby(cell).map_groups``; hot cells are salted by
      hashing the point id into S buckets and replicating the polygon side
      per bucket.

The exact refinement is planar (lng/lat rectangles / rings), matching both
the reference's geo-types semantics and the SQL BETWEEN oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .h3core import bits, faceijk

# Full 0-15 conservative per-resolution cell metrics (degrees, global worst
# cases), shared with the polyfill cover sampler — the reference's
# SpatialIndex queries are resolution-agnostic (spatial_index.rs:101-166),
# so the PIP join must accept every H3 resolution too.
from .h3core.polyfill import _MAX_CIRCUMRADIUS_DEG, _MIN_INRADIUS_DEG

# default peak element count of one dense point x rect membership block
# inside a salted join group (~4 MB of bool); groups larger than this
# evaluate in point-axis chunks (pip_join_shuffle's block_elems param)
_JOIN_BLOCK_ELEMS = 4_000_000


def rect_cover_cells(
    rect_ids: np.ndarray,
    lng0: np.ndarray,
    lat0: np.ndarray,
    lng1: np.ndarray,
    lat1: np.ndarray,
    res: int,
):
    """Superset cover of each rectangle at ``res``.

    Returns (rect_row_idx, cell) pairs.  Every point inside a rectangle maps
    to a cell in its cover: the rect is buffered by the cell circumradius so
    any cell whose *center* falls outside can't contain an inside point, and
    the buffered bbox is sampled at sub-inradius spacing so no candidate
    center is missed.
    """
    buf = _MAX_CIRCUMRADIUS_DEG[res] * 1.05
    step = _MIN_INRADIUS_DEG[res] * 0.9
    n = len(rect_ids)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    la0 = lat0 - buf
    la1 = lat1 + buf
    inner = np.where(la0 * la1 > 0, np.minimum(np.abs(la0), np.abs(la1)), 0.0)
    coslat = np.maximum(0.05, np.cos(np.radians(inner)))
    lo0 = lng0 - buf / coslat
    lo1 = lng1 + buf / coslat
    step_lng = step / coslat
    # per-rect grid sizes, then one flat index expansion (same sample points
    # as np.arange per rect: count = floor(span/step) + 1 with arange's
    # half-open [start, stop+step) semantics)
    nlat = np.floor((la1 + step - la0) / step - 1e-12).astype(np.int64) + 1
    nlng = np.floor((lo1 + step_lng - lo0) / step_lng - 1e-12).astype(np.int64) + 1
    total = nlat * nlng
    cum = np.cumsum(total) - total
    rect_of = np.repeat(np.arange(n, dtype=np.int64), total)
    g = np.arange(int(total.sum()), dtype=np.int64) - cum[rect_of]
    lat_idx = g // nlng[rect_of]
    lng_idx = g % nlng[rect_of]
    glat = la0[rect_of] + step * lat_idx
    glng = lo0[rect_of] + step_lng[rect_of] * lng_idx
    cells = faceijk.latlng_to_cell(glat, glng, res)
    # per-rect dedupe: sort by (rect, cell), keep first occurrences
    order = np.lexsort((cells, rect_of))
    rs, cs = rect_of[order], cells[order]
    first = np.concatenate([[True], (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])])
    return rs[first], cs[first]


class RectLookup:
    """Broadcastable cover index: cell -> candidate rectangle rows, plus the
    exact rect bounds for refinement.  Built once on the driver from the
    small side, shipped via ray.put, read zero-copy by every actor."""

    def __init__(self, rect_ids, lng0, lat0, lng1, lat1, res: int):
        self.res = res
        self.rect_ids = np.asarray(rect_ids)
        self.lng0 = np.asarray(lng0, dtype=np.float64)
        self.lat0 = np.asarray(lat0, dtype=np.float64)
        self.lng1 = np.asarray(lng1, dtype=np.float64)
        self.lat1 = np.asarray(lat1, dtype=np.float64)
        rows, cells = rect_cover_cells(
            self.rect_ids, self.lng0, self.lat0, self.lng1, self.lat1, res
        )
        order = np.argsort(cells, kind="stable")
        self._cells = cells[order]
        self._rows = rows[order]

    def candidates(self, cells: np.ndarray):
        """For each input cell: matching (input_idx, rect_row) candidate
        pairs via binary search on the sorted cover."""
        left = np.searchsorted(self._cells, cells, side="left")
        right = np.searchsorted(self._cells, cells, side="right")
        counts = right - left
        in_idx = np.repeat(np.arange(len(cells)), counts)
        total = int(counts.sum())
        take = (
            np.repeat(left, counts)
            + np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
        )
        return in_idx, self._rows[take]


def make_pip_refine_kernel(
    lookup_ref,
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_cols=("point_id",),
    rect_id_col: str = "rect_id",
):
    """Build a map_batches kernel closing over a ray.ObjectRef (or plain
    RectLookup) that emits exact (point columns, rect_id) join rows."""
    import ray

    def kernel(batch: pa.Table) -> pa.Table:
        lookup = lookup_ref
        if isinstance(lookup, ray.ObjectRef):
            lookup = ray.get(lookup)
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        lng = batch.column(lng_col).to_numpy(zero_copy_only=False)
        cells = faceijk.latlng_to_cell(lat, lng, lookup.res)
        in_idx, rect_rows = lookup.candidates(cells)
        # exact planar refinement (matches SQL BETWEEN semantics)
        ok = (
            (lng[in_idx] >= lookup.lng0[rect_rows])
            & (lng[in_idx] <= lookup.lng1[rect_rows])
            & (lat[in_idx] >= lookup.lat0[rect_rows])
            & (lat[in_idx] <= lookup.lat1[rect_rows])
        )
        in_idx = in_idx[ok]
        rect_rows = rect_rows[ok]
        out = batch.select(list(id_cols)).take(pa.array(in_idx, type=pa.int64()))
        out = out.append_column(
            rect_id_col, pa.array(np.asarray(lookup.rect_ids[rect_rows]))
        )
        out = out.append_column("cell", pa.array(cells[in_idx], type=pa.uint64()))
        return out

    return kernel


def pip_join_hash(
    points_ds,
    rects_ds,
    res: int,
    num_partitions: int = 8,
    lat_col: str = "lat",
    lng_col: str = "lng",
    point_id_col: str = "point_id",
):
    """PIP join through Ray Data's native hash join: both sides keyed by the
    cover cell, ``Dataset.join(..., on=("cell",))``, then the exact planar
    refinement.  The most idiomatic both-sides-large expression — the hash
    exchange scales with data volume, not with the sort machinery — but its
    aggregator actor pool has a multi-second spin-up, so at tiny local
    scale the groupby co-group (`pip_join_shuffle`) or the broadcast path
    win; this variant is the 256-node-cluster shape."""
    from .h3core import faceijk as faceijk_mod

    def point_rows(batch: pa.Table) -> pa.Table:
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        lng = batch.column(lng_col).to_numpy(zero_copy_only=False)
        pid = batch.column(point_id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cells = faceijk_mod.latlng_to_cell(lat, lng, res)
        return pa.table(
            {
                point_id_col: pa.array(pid),
                lat_col: pa.array(lat),
                lng_col: pa.array(lng),
                "cell": pa.array(cells.astype(np.int64)),
            }
        )

    def rect_rows(batch: pa.Table) -> pa.Table:
        rid = batch.column("rect_id").to_numpy(zero_copy_only=False).astype(np.int64)
        l0 = batch.column("lng0").to_numpy(zero_copy_only=False)
        a0 = batch.column("lat0").to_numpy(zero_copy_only=False)
        l1 = batch.column("lng1").to_numpy(zero_copy_only=False)
        a1 = batch.column("lat1").to_numpy(zero_copy_only=False)
        rows, cells = rect_cover_cells(rid, l0, a0, l1, a1, res)
        return pa.table(
            {
                "cell": pa.array(cells.astype(np.int64)),
                "rect_id": pa.array(rid[rows]),
                "lng0": pa.array(l0[rows]),
                "lat0": pa.array(a0[rows]),
                "lng1": pa.array(l1[rows]),
                "lat1": pa.array(a1[rows]),
            }
        )

    def refine(batch: pa.Table) -> pa.Table:
        lng = batch.column(lng_col).to_numpy(zero_copy_only=False)
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        m = (
            (lng >= batch.column("lng0").to_numpy(zero_copy_only=False))
            & (lng <= batch.column("lng1").to_numpy(zero_copy_only=False))
            & (lat >= batch.column("lat0").to_numpy(zero_copy_only=False))
            & (lat <= batch.column("lat1").to_numpy(zero_copy_only=False))
        )
        return batch.filter(pa.array(m)).select([point_id_col, "rect_id"])

    pts = points_ds.map_batches(point_rows, batch_format="pyarrow", zero_copy_batch=True)
    cov = rects_ds.map_batches(rect_rows, batch_format="pyarrow", zero_copy_batch=True)
    joined = pts.join(cov, "inner", num_partitions, on=("cell",))
    return joined.map_batches(refine, batch_format="pyarrow")


# --- shuffle variant (both sides large) -------------------------------------


def pip_join_shuffle(
    points_ds,
    rects_ds,
    res: int,
    salt: int = 4,
    lat_col: str = "lat",
    lng_col: str = "lng",
    point_id_col: str = "point_id",
    block_elems: int = _JOIN_BLOCK_ELEMS,
    num_buckets: int = 256,
    hot_cells: "np.ndarray | None" = None,
):
    """Two-phase PIP join as a cell-keyed co-group shuffle.

    When the polygon side is too large to broadcast, both sides key by the
    cover cell and co-group:

      * every point lands in exactly one (cell, salt) slot, with
        ``salt = hash(point_id) % S`` — a dense urban cell's points spread
        over S slots instead of one straggler group;
      * every polygon cover row is replicated to all S salt slots of its
        cell, so each point slot still sees every candidate polygon.

    The SHUFFLE key is ``hash(cell, salt) % num_buckets``, not the
    (cell, salt) slot itself: grouping per slot would invoke the group
    kernel once per occupied slot (per-group Python dominated the round-3
    plan — ~100k kernel calls at sf0.1), while each of the
    ``num_buckets`` groups now runs ONE vectorized hash join (dense
    composite keys, sort + searchsorted candidate ranges, flat repeat
    expansion) over all its slots, with the containment test evaluated in
    ``block_elems``-bounded chunks.  Pair semantics are unchanged: a
    point still only meets rect replicas of its exact (cell, salt) slot.
    ``num_buckets`` scales per-task group size at 100 TB without changing
    results.

    ``rects_ds`` is a Dataset with columns (rect_id, lng0, lat0, lng1,
    lat1); its cover cells and salt replicas are computed *inside* a
    ``map_batches`` stage, so the rectangle side streams through the
    shuffle like any other dataset — nothing is materialized on the driver
    (the "both sides large" contract).

    ``salt`` is the hot-cell fanout S.  With ``hot_cells=None`` every
    cell fans out S ways (the simple constant scheme).  Passing the
    observed-frequency hot set (``sketch.heavy_keys`` over the point
    cells — see ``pip_join_shuffle_adaptive``) restricts fanout to the
    actually-hot cells: cold cells keep ONE rect replica and salt slot
    0, so rect replication shrinks by ~S× while dense cells still
    spread over S slots.  Pair results are identical either way.
    Output matches ``make_pip_refine_kernel`` row-for-row.
    """
    import ray

    hot_ref = (
        ray.put(np.sort(np.asarray(hot_cells, dtype=np.uint64)))
        if hot_cells is not None
        else None
    )

    def _hot_mask(cells: np.ndarray):
        """Sorted-membership test against the broadcast hot set."""
        hs = hot_ref
        if isinstance(hs, ray.ObjectRef):
            hs = ray.get(hs)
        if len(hs) == 0:
            return np.zeros(len(cells), dtype=bool)
        pos = np.minimum(np.searchsorted(hs, cells), len(hs) - 1)
        return hs[pos] == cells

    def bucket_of(cells: np.ndarray, salts: np.ndarray) -> np.ndarray:
        from .functions._util import bucket_pair

        return bucket_pair(cells, salts, num_buckets)

    def rect_rows(batch: pa.Table) -> pa.Table:
        rid = batch.column("rect_id").to_numpy(zero_copy_only=False).astype(np.int64)
        l0 = batch.column("lng0").to_numpy(zero_copy_only=False)
        a0 = batch.column("lat0").to_numpy(zero_copy_only=False)
        l1 = batch.column("lng1").to_numpy(zero_copy_only=False)
        a1 = batch.column("lat1").to_numpy(zero_copy_only=False)
        rows, cells = rect_cover_cells(rid, l0, a0, l1, a1, res)
        n = len(rows)
        if hot_ref is None:
            fan = np.full(n, salt, dtype=np.int64)
        else:
            # cold cover cells keep ONE replica (salt slot 0); only the
            # observed-hot cells pay the S-way replication
            fan = np.where(_hot_mask(cells), salt, 1).astype(np.int64)
        idx = np.repeat(np.arange(n), fan)
        start = np.cumsum(fan) - fan
        rsalt = (np.arange(len(idx)) - start[idx]).astype(np.int32)
        rcell = cells[idx]
        m = len(idx)
        return pa.table(
            {
                "bucket": pa.array(bucket_of(rcell, rsalt.astype(np.int64))),
                "cell": pa.array(rcell),
                "salt": pa.array(rsalt),
                "side": pa.array(np.zeros(m, dtype=np.int8)),
                point_id_col: pa.array(np.zeros(m, dtype=np.int64)),
                lat_col: pa.array(np.zeros(m)),
                lng_col: pa.array(np.zeros(m)),
                "rect_id": pa.array(rid[rows][idx]),
                "lng0": pa.array(l0[rows][idx]),
                "lat0": pa.array(a0[rows][idx]),
                "lng1": pa.array(l1[rows][idx]),
                "lat1": pa.array(a1[rows][idx]),
            }
        )

    rect_keyed = rects_ds.map_batches(
        rect_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def point_rows(batch: pa.Table) -> pa.Table:
        from .h3core import faceijk

        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        lng = batch.column(lng_col).to_numpy(zero_copy_only=False)
        pid = batch.column(point_id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cells = faceijk.latlng_to_cell(lat, lng, res)
        m = len(batch)
        psalt = (pid * 0x9E3779B9) % salt
        if hot_ref is not None:
            psalt = np.where(_hot_mask(cells), psalt, 0)
        return pa.table(
            {
                "bucket": pa.array(bucket_of(cells, psalt)),
                "cell": pa.array(cells),
                "salt": pa.array(psalt.astype(np.int32)),
                "side": pa.array(np.ones(m, dtype=np.int8)),
                point_id_col: pa.array(pid),
                lat_col: pa.array(lat),
                lng_col: pa.array(lng),
                "rect_id": pa.array(np.zeros(m, dtype=np.int64)),
                "lng0": pa.array(np.zeros(m)),
                "lat0": pa.array(np.zeros(m)),
                "lng1": pa.array(np.zeros(m)),
                "lat1": pa.array(np.zeros(m)),
            }
        )

    def join_group(batch: pa.Table) -> pa.Table:
        side = batch.column("side").to_numpy(zero_copy_only=False)
        pts = batch.filter(pa.array(side == 1))
        rcs = batch.filter(pa.array(side == 0))
        empty = pa.table(
            {
                point_id_col: pa.array([], type=pa.int64()),
                "rect_id": pa.array([], type=pa.int64()),
            }
        )
        if pts.num_rows == 0 or rcs.num_rows == 0:
            return empty
        # vectorized (cell, salt) hash join across ALL slots in the bucket:
        # dense composite keys, sorted rect keys, searchsorted candidate
        # ranges per point, one flat repeat expansion
        pcell = pts.column("cell").to_numpy(zero_copy_only=False)
        psalt = pts.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
        rcell = rcs.column("cell").to_numpy(zero_copy_only=False)
        rsalt = rcs.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
        allc = np.concatenate([pcell, rcell])
        _, inv = np.unique(allc, return_inverse=True)
        pk = inv[: len(pcell)] * salt + psalt
        rk = inv[len(pcell):] * salt + rsalt
        rorder = np.argsort(rk, kind="stable")
        rks = rk[rorder]
        lo = np.searchsorted(rks, pk, "left")
        hi = np.searchsorted(rks, pk, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        plat = pts.column(lat_col).to_numpy(zero_copy_only=False)
        plng = pts.column(lng_col).to_numpy(zero_copy_only=False)
        pid = pts.column(point_id_col).to_numpy(zero_copy_only=False)
        rl0 = rcs.column("lng0").to_numpy(zero_copy_only=False)
        ra0 = rcs.column("lat0").to_numpy(zero_copy_only=False)
        rl1 = rcs.column("lng1").to_numpy(zero_copy_only=False)
        ra1 = rcs.column("lat1").to_numpy(zero_copy_only=False)
        rid = rcs.column("rect_id").to_numpy(zero_copy_only=False)
        # expand candidate pairs AND test containment in bounded point
        # slices: every temporary (index expansion included) stays
        # ~block_elems long no matter how hot the bucket is — the worst
        # case is one point whose own candidate range exceeds the step
        cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(cnt)])
        out_p = []
        out_r = []
        step = max(1, block_elems)
        i0 = 0
        while i0 < len(pk):
            i1 = int(np.searchsorted(cum, cum[i0] + step, "left"))
            i1 = min(max(i1, i0 + 1), len(pk))
            c = cnt[i0:i1]
            t = int(cum[i1] - cum[i0])
            if t == 0:
                i0 = i1
                continue
            pr = np.repeat(np.arange(i0, i1, dtype=np.int64), c)
            rr = rorder[
                np.repeat(lo[i0:i1], c)
                + (np.arange(t, dtype=np.int64)
                   - np.repeat(np.cumsum(c) - c, c))
            ]
            hit = (
                (plng[pr] >= rl0[rr])
                & (plng[pr] <= rl1[rr])
                & (plat[pr] >= ra0[rr])
                & (plat[pr] <= ra1[rr])
            )
            out_p.append(pid[pr[hit]])
            out_r.append(rid[rr[hit]])
            i0 = i1
        return pa.table(
            {point_id_col: pa.array(np.concatenate(out_p)),
             "rect_id": pa.array(np.concatenate(out_r))}
        )

    pts_keyed = points_ds.map_batches(
        point_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    both = pts_keyed.union(rect_keyed)
    return both.groupby("bucket").map_groups(
        join_group, batch_format="pyarrow"
    )


def pip_join_shuffle_adaptive(
    points_ds,
    rects_ds,
    res: int,
    threshold: int,
    salt: int = 4,
    lat_col: str = "lat",
    lng_col: str = "lng",
    point_id_col: str = "point_id",
    **kw,
):
    """Sketch-driven salted PIP join: a count-min pass over the point
    cells (functions/sketch.heavy_keys — two streaming passes, one
    512 KiB mergeable matrix, no key shuffle) finds the cells with
    >= ``threshold`` points, and only THOSE fan out ``salt`` ways in
    the co-group; cold cells keep one rect replica.  Same pairs as
    ``pip_join_shuffle`` with constant salting, at ~1/salt of its rect
    replication when hotspots are rare — the skew handling the
    constant-salt docstring deferred to "an observed-frequency sketch".

    Reads the point side twice (sketch pass + join pass); both passes
    stream.
    """
    import pyarrow as pa

    from .functions import sketch

    def to_cells(batch: pa.Table) -> pa.Table:
        from .h3core import faceijk

        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        lng = batch.column(lng_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {"cell": pa.array(faceijk.latlng_to_cell(lat, lng, res).astype(np.int64))}
        )

    hot = sketch.heavy_keys(
        points_ds.map_batches(to_cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell",
        threshold,
    )
    return pip_join_shuffle(
        points_ds, rects_ds, res, salt=salt, lat_col=lat_col, lng_col=lng_col,
        point_id_col=point_id_col, hot_cells=hot, **kw,
    )


def nearest_anchor_join(
    points_ds,
    anchor_ids: np.ndarray,
    anchor_lat: np.ndarray,
    anchor_lng: np.ndarray,
    *,
    lat_col: str = "lat",
    lng_col: str = "lng",
    carry_cols=("point_id",),
    out_col: str = "anchor_id",
    with_distance: bool = False,
):
    """Assign every point to its nearest anchor by great-circle distance
    (geo Voronoi labeling — nearest city / region centroid / cluster
    center).  The anchor set is SMALL-side: packed once on the driver
    (sorted by id so np.argmin's first-minimum rule breaks exact ties
    toward the smallest anchor id, matching a SQL ``ORDER BY dist, id``
    row_number), shipped via one ``ray.put``, and every batch computes a
    vectorized (batch x anchors) haversine matrix — no exchange at all.
    For anchor sets too large for a dense matrix, route through the ANN
    operators (functions/ann.py) instead.

    ``with_distance=True`` appends ``dist_rads`` (float64) for
    threshold-style post-filters; leave it off for integer-stable
    oracle comparisons.
    """
    import ray

    from .h3core.boundary import great_circle_distance_rads

    order = np.argsort(np.asarray(anchor_ids), kind="stable")
    pack = {
        "ids": np.ascontiguousarray(np.asarray(anchor_ids)[order]),
        "lat": np.radians(np.asarray(anchor_lat, dtype=np.float64)[order]),
        "lng": np.radians(np.asarray(anchor_lng, dtype=np.float64)[order]),
    }
    if len(pack["ids"]) == 0:
        raise ValueError("anchor set is empty")
    pack_ref = ray.put(pack)

    def kernel(batch: pa.Table) -> pa.Table:
        p = pack_ref
        if isinstance(p, ray.ObjectRef):
            p = ray.get(p)
        lat = np.radians(
            batch.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        lng = np.radians(
            batch.column(lng_col).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        d = great_circle_distance_rads(
            lat[:, None], lng[:, None], p["lat"][None, :], p["lng"][None, :]
        )
        best = np.argmin(d, axis=1)
        out = batch.select(list(carry_cols))
        out = out.append_column(out_col, pa.array(p["ids"][best]))
        if with_distance:
            out = out.append_column(
                "dist_rads", pa.array(d[np.arange(len(best)), best])
            )
        return out

    return points_ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)
