"""Raster <-> cells conversion (reference: h3ronpy.raster / src/raster.rs).

Semantics mirror the reference exactly: ``raster_to_cells`` assigns each
cell the raster value under the cell *centroid* (raster.py:14-15 of the
reference), skipping ``nodata``; ``nearest_h3_resolution`` picks the
resolution whose cell area best matches the pixel area; ``rasterize_cells``
is the inverse (cells+values -> 2D array).

Scale design: where the reference distributes tiles to a thread pool
(reference raster.py:88), we make tiles the *dataset rows*: ``tile_dataset``
splits a raster into tile specs (window + per-tile transform + ndarray
payload) and the per-tile kernel runs under ``map_batches`` — the tile grid
is the partitioning unit, so a 100 TB raster mosaic streams tile-by-tile
with no shared state.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .h3core import bits, faceijk, hierarchy

# average hexagon area (km^2) per resolution — published H3 table
AVG_HEX_AREA_KM2 = [
    4357449.416078381, 609788.441794133, 86801.780398997, 12393.434655088,
    1770.347654491, 252.903858182, 36.129062164, 5.161293360, 0.737327598,
    0.105332513, 0.015047502, 0.002149643, 0.000307092, 0.000043870,
    0.000006267, 0.000000895,
]

EARTH_RADIUS_KM = 6371.007180918475


@dataclass(frozen=True)
class Transform:
    """GDAL-convention affine geotransform: x = a*col + b*row + c,
    y = d*col + e*row + f (reference h3ronpy/src/transform.rs:8-54)."""

    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    @classmethod
    def from_gdal(cls, gt):
        # GDAL order: (c, a, b, f, d, e)
        return cls(gt[1], gt[2], gt[0], gt[4], gt[5], gt[3])

    @classmethod
    def from_rasterio(cls, t):
        # rasterio Affine: (a, b, c, d, e, f)
        return cls(t[0], t[1], t[2], t[3], t[4], t[5])

    def pixel_center(self, col, row):
        col = np.asarray(col, dtype=np.float64) + 0.5
        row = np.asarray(row, dtype=np.float64) + 0.5
        x = self.a * col + self.b * row + self.c
        y = self.d * col + self.e * row + self.f
        return x, y

    def invert(self, x, y):
        det = self.a * self.e - self.b * self.d
        if det == 0:
            raise ValueError("non-invertible transform")
        xx = np.asarray(x, dtype=np.float64) - self.c
        yy = np.asarray(y, dtype=np.float64) - self.f
        col = (self.e * xx - self.b * yy) / det
        row = (-self.d * xx + self.a * yy) / det
        return col, row

    def offset(self, col0: int, row0: int) -> "Transform":
        x0 = self.a * col0 + self.b * row0 + self.c
        y0 = self.d * col0 + self.e * row0 + self.f
        return Transform(self.a, self.b, x0, self.d, self.e, y0)


def _check_wgs84_extent(shape, transform: Transform):
    h, w = shape
    xs = [transform.c, transform.a * w + transform.b * h + transform.c]
    ys = [transform.f, transform.d * w + transform.e * h + transform.f]
    if (max(xs) - min(xs)) > 361.0 or (max(ys) - min(ys)) > 181.0:
        raise ValueError(
            "raster exceeds WGS84 extents - coordinate system mismatch?"
        )


def _apply_axis_order(axis_order: str):
    if axis_order not in ("yx", "xy"):
        raise ValueError(f"unknown axis_order {axis_order!r} (use 'yx' or 'xy')")
    return axis_order == "xy"


def nearest_h3_resolution(
    shape, transform: Transform, axis_order: str = "yx",
    search_mode: str = "min_diff",
) -> int:
    """Resolution whose cell area best matches the pixel area
    (reference raster.py:63-74 / src/raster.rs:91-107); ``axis_order``
    mirrors the reference parameter ('xy' arrays are column-major:
    shape = (w, h))."""
    if _apply_axis_order(axis_order):
        shape = (shape[1], shape[0])
    _check_wgs84_extent(shape, transform)
    h, w = shape
    cy = transform.f + (transform.d * w + transform.e * h) / 2.0
    deg_km_x = 111.32 * max(0.05, np.cos(np.radians(np.clip(cy, -89, 89))))
    deg_km_y = 110.57
    pixel_area = abs(transform.a * deg_km_x) * abs(transform.e * deg_km_y)
    if search_mode == "min_diff":
        diffs = [abs(a - pixel_area) for a in AVG_HEX_AREA_KM2]
        return int(np.argmin(diffs))
    if search_mode == "smaller_than_pixel":
        for res, a in enumerate(AVG_HEX_AREA_KM2):
            if a <= pixel_area:
                return res
        return 15
    raise ValueError(f"unknown search_mode {search_mode}")


def raster_to_cells(
    values: np.ndarray,
    transform: Transform,
    h3_resolution: int,
    nodata_value=None,
    axis_order: str = "yx",
    compact: bool = False,
):
    """2D array + transform -> (value, cell) arrays.

    Cell value = raster value under the cell centroid (nodata skipped).
    ``axis_order='xy'`` accepts (x, y)-ordered arrays and transposes them
    (reference h3ronpy/python/h3ronpy/raster.py:82 parameter)."""
    values = np.asarray(values)
    if values.ndim != 2:
        raise ValueError("expected a 2D array")
    if _apply_axis_order(axis_order):
        values = values.T
    h, w = values.shape
    _check_wgs84_extent(values.shape, transform)
    # bbox of the raster in geo space
    cols = np.array([0.0, w, 0.0, w])
    rows = np.array([0.0, 0.0, h, h])
    xs = transform.a * cols + transform.b * rows + transform.c
    ys = transform.d * cols + transform.e * rows + transform.f
    from .h3core.polyfill import _bbox_cover_cells

    cand = _bbox_cover_cells(xs.min(), ys.min(), xs.max(), ys.max(), h3_resolution)
    if len(cand) == 0:
        return values[:0].ravel(), cand
    clat, clng = faceijk.cell_to_latlng(cand)
    col, row = transform.invert(clng, clat)
    ci = np.floor(col).astype(np.int64)
    ri = np.floor(row).astype(np.int64)
    ok = (ci >= 0) & (ci < w) & (ri >= 0) & (ri < h)
    cand = cand[ok]
    vals = values[ri[ok], ci[ok]]
    if nodata_value is not None:
        keep = vals != nodata_value
        cand = cand[keep]
        vals = vals[keep]
    if compact and len(cand):
        # compact per distinct value (reference: CellCoverage compaction)
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        cand = cand[order]
        out_v = []
        out_c = []
        uniq, starts = np.unique(vals, return_index=True)
        bounds = list(starts) + [len(vals)]
        for i, v in enumerate(uniq):
            cc = hierarchy.compact(np.unique(cand[bounds[i]:bounds[i + 1]]))
            out_c.append(cc)
            out_v.append(np.full(len(cc), v, dtype=vals.dtype))
        vals = np.concatenate(out_v)
        cand = np.concatenate(out_c)
    return vals, cand


def raster_to_table(
    values, transform, h3_resolution, nodata_value=None, axis_order="yx",
    compact=False,
) -> pa.Table:
    v, c = raster_to_cells(values, transform, h3_resolution, nodata_value,
                           axis_order=axis_order, compact=compact)
    return pa.table({"value": pa.array(v), "cell": pa.array(c)})


def raster_to_dataframe(
    in_raster: np.ndarray,
    transform,
    h3_resolution: int,
    nodata_value=None,
    axis_order: str = "yx",
    compact: bool = True,
) -> pa.Table:
    """Reference-name twin of :func:`raster_to_table` with the reference's
    argument order and defaults (h3ronpy/python/h3ronpy/raster.py:77-84
    returns an arrow Table despite the name; the pandas form lives in
    ``pandas_compat.raster_to_dataframe``)."""
    return raster_to_table(
        in_raster, transform, h3_resolution, nodata_value,
        axis_order=axis_order, compact=compact,
    )


# --- Ray tile pipeline ------------------------------------------------------


def tile_specs(shape, tile_size: int = 512):
    """Tile windows covering a raster: (row0, col0, h, w) tuples."""
    H, W = shape
    out = []
    for r0 in range(0, H, tile_size):
        for c0 in range(0, W, tile_size):
            out.append((r0, c0, min(tile_size, H - r0), min(tile_size, W - c0)))
    return out


def tile_dataset(values: np.ndarray, transform: Transform, tile_size: int = 512):
    """In-memory raster -> Ray Dataset of tile rows {row0, col0, transform
    params, payload (binary)}.  Right for rasters that already fit on the
    driver (the reference's single-array semantics, reference raster.py:88);
    for anything bigger use :func:`tile_dataset_from_file`, whose rows
    carry only (path, window) and read the payload inside the kernel."""
    import ray

    items = []
    for (r0, c0, th, tw) in tile_specs(values.shape, tile_size):
        sub = np.ascontiguousarray(values[r0 : r0 + th, c0 : c0 + tw])
        t = transform.offset(c0, r0)
        items.append(
            {
                "row0": r0,
                "col0": c0,
                "h": th,
                "w": tw,
                "dtype": str(sub.dtype),
                "payload": sub.tobytes(),
                "transform": [t.a, t.b, t.c, t.d, t.e, t.f],
            }
        )
    return ray.data.from_items(items)


def tile_dataset_from_file(path: str, transform: Transform,
                           tile_size: int = 512):
    """File-backed tile specs: rows carry only (path, window, per-tile
    transform) — the pixel payload is read INSIDE the map_batches kernel
    via a memory-mapped window, so the raster never resides in driver
    memory and a 100 TB mosaic is just a union of these datasets.

    ``path`` is a ``.npy`` array file (self-describing shape/dtype;
    ``np.load(mmap_mode='r')`` maps it without reading pixel data — the
    driver touches only the header).  GeoTIFF and friends need a raster
    IO library (rasterio/GDAL, not available in this environment): write
    the windows with the same row layout and this pipeline is unchanged.
    """
    import ray

    mm = np.load(path, mmap_mode="r")  # header-only on the driver
    if mm.ndim != 2:
        raise ValueError(f"expected a 2D raster in {path!r}, got {mm.shape}")
    items = []
    for (r0, c0, th, tw) in tile_specs(mm.shape, tile_size):
        t = transform.offset(c0, r0)
        items.append(
            {
                "path": path,
                "row0": r0,
                "col0": c0,
                "h": th,
                "w": tw,
                "transform": [t.a, t.b, t.c, t.d, t.e, t.f],
            }
        )
    return ray.data.from_items(items)


def make_tile_kernel(h3_resolution: int, nodata_value=None, compact: bool = False):
    """map_batches kernel: tile rows -> (value, cell) rows.

    Accepts both row layouts: payload-carrying rows (binary pixels viewed
    zero-copy through the Arrow buffer — no ``.as_py()`` byte copy) and
    file-backed rows from :func:`tile_dataset_from_file` (the window is
    sliced from a per-task memory map; only the window's pages are read).
    The per-ROW loop is over tiles (hundreds of thousands of pixels each),
    not pixels — the hot work inside ``raster_to_cells`` is vectorized."""

    def kernel(batch: pa.Table) -> pa.Table:
        vs = []
        cs = []
        hcol = "h" if "h" in batch.column_names else "height"
        wcol = "w" if "w" in batch.column_names else "width"
        pcol = "payload" if "payload" in batch.column_names else (
            "values" if "values" in batch.column_names else None)
        mmaps: dict = {}  # one mapping per distinct file per batch
        for i in range(batch.num_rows):
            t = Transform(*[float(x) for x in batch.column("transform")[i].as_py()])
            h = batch.column(hcol)[i].as_py()
            w = batch.column(wcol)[i].as_py()
            if pcol is not None and batch.column(pcol)[i].is_valid:
                dtype = batch.column("dtype")[i].as_py()
                buf = batch.column(pcol)[i].as_buffer()  # zero-copy view
                arr = np.frombuffer(buf, dtype=np.dtype(dtype)).reshape(h, w)
            else:
                path = batch.column("path")[i].as_py()
                if path not in mmaps:
                    mmaps[path] = np.load(path, mmap_mode="r")
                r0 = batch.column("row0")[i].as_py()
                c0 = batch.column("col0")[i].as_py()
                arr = mmaps[path][r0 : r0 + h, c0 : c0 + w]
            v, c = raster_to_cells(arr, t, h3_resolution, nodata_value, compact=compact)
            vs.append(v)
            cs.append(c)
        if not vs:
            return pa.table({"value": pa.array([]), "cell": pa.array([], type=pa.uint64())})
        return pa.table(
            {"value": pa.array(np.concatenate(vs)), "cell": pa.array(np.concatenate(cs))}
        )

    return kernel


def rasterize_cells(cells, values, size, nodata_value=0):
    """Inverse: cells+values -> (array, transform).  ``size`` is (width,
    height); cells may be mixed resolution (reference raster.py:140-213)."""
    from .vector import cells_bounds

    cells = np.asarray(cells, dtype=np.uint64)
    values = np.asarray(values)
    w, h = size
    bounds = cells_bounds(cells)
    if bounds is None:
        raise ValueError("no cells")
    minx, miny, maxx, maxy = bounds
    transform = Transform(
        (maxx - minx) / w, 0.0, minx, 0.0, (miny - maxy) / h, maxy
    )
    out = np.full((h, w), nodata_value, dtype=values.dtype)
    col = np.arange(w)
    row = np.arange(h)
    px, py = transform.pixel_center(np.tile(col, h), np.repeat(row, w))
    res_arr = bits.get_resolution(cells).astype(np.int64)
    filled = np.zeros(h * w, dtype=bool)
    for r in np.unique(res_arr):
        m = res_arr == r
        sub = cells[m]
        subv = values[m]
        order = np.argsort(sub)
        sub = sub[order]
        subv = subv[order]
        pix_cells = faceijk.latlng_to_cell(py, px, int(r))
        pos = np.searchsorted(sub, pix_cells)
        pos = np.clip(pos, 0, len(sub) - 1)
        hit = (sub[pos] == pix_cells) & ~filled
        out.ravel()[np.nonzero(hit)[0]] = subv[pos[hit]]
        filled |= hit
    return out, transform
