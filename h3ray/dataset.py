"""H3Dataset: operator-method sugar over ray.data.Dataset.

The reference registers its ops as polars ``.h3`` expression namespaces
(h3ronpy/python/h3ronpy/polars.py:39-197); the Ray-native equivalent is a
thin wrapper exposing each operator as a Dataset-returning method, all
implemented as ``map_batches`` stages over zero-copy Arrow blocks.

    ds = H3Dataset(ray.data.read_parquet(...))
    out = (ds.coordinates_to_cells(res=9)
             .cells_parent(5)
             .grid_disk(1)
             .dataset)           # plain ray.data.Dataset again
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from . import kernels, vector


def _mb(ds, fn, **kwargs):
    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None, **kwargs
    )


class H3Dataset:
    def __init__(self, dataset):
        self.dataset = dataset

    def _wrap(self, fn, **kwargs):
        return H3Dataset(_mb(self.dataset, functools.partial(fn, **kwargs)))

    # --- coordinates / scalar ops ------------------------------------------
    def coordinates_to_cells(self, lat_col="lat", lng_col="lng", res=9, cell_col="cell"):
        return self._wrap(
            kernels.coordinates_to_cells,
            lat_col=lat_col, lng_col=lng_col, res=res, cell_col=cell_col,
        )

    def cells_to_coordinates(self, cell_col="cell"):
        return self._wrap(kernels.cells_to_coordinates, cell_col=cell_col)

    def cells_resolution(self, cell_col="cell"):
        return self._wrap(kernels.cells_resolution, cell_col=cell_col)

    def cells_parent(self, parent_res, cell_col="cell", out_col="parent"):
        return self._wrap(
            kernels.cells_parent, parent_res=parent_res, cell_col=cell_col,
            out_col=out_col,
        )

    def cells_valid(self, cell_col="cell", booleanarray=True):
        return self._wrap(
            kernels.cells_valid, cell_col=cell_col, booleanarray=booleanarray
        )

    def cells_to_string(self, cell_col="cell"):
        return self._wrap(kernels.cells_to_string, cell_col=cell_col)

    def cells_parse(self, str_col, set_failing_to_invalid=False, cell_col="cell"):
        return self._wrap(
            kernels.cells_parse, str_col=str_col,
            set_failing_to_invalid=set_failing_to_invalid, cell_col=cell_col,
        )

    def cells_area(self, unit="km2", cell_col="cell"):
        return self._wrap(kernels.cells_area, unit=unit, cell_col=cell_col)

    def cells_bounds_arrays(self, cell_col="cell"):
        return self._wrap(kernels.cells_bounds_arrays, cell_col=cell_col)

    # --- hierarchy / traversal ---------------------------------------------
    def change_resolution(self, out_res, cell_col="cell"):
        return self._wrap(kernels.change_resolution, out_res=out_res, cell_col=cell_col)

    def grid_disk(self, k, cell_col="cell"):
        return self._wrap(kernels.grid_disk, k=k, cell_col=cell_col)

    def grid_ring(self, k_min, k_max, cell_col="cell"):
        return self._wrap(
            kernels.grid_ring, k_min=k_min, k_max=k_max, cell_col=cell_col
        )

    def uncompact(self, res, cell_col="cell"):
        return self._wrap(kernels.uncompact_kernel, res=res, cell_col=cell_col)

    def cells_to_vertexes(self, cell_col="cell", out_col="vertexes", flatten=False):
        """Canonical corner vertexes per cell — with flatten=True the
        natural pre-stage for a corner-keyed groupby (each corner's three
        touching cells derive the identical uint64 key)."""
        return self._wrap(
            kernels.cells_to_vertexes, cell_col=cell_col, out_col=out_col,
            flatten=flatten,
        )

    def are_neighbor_cells(self, a_col="cell", b_col="other", out_col="neighbor"):
        return self._wrap(
            kernels.are_neighbor_cells, a_col=a_col, b_col=b_col, out_col=out_col
        )

    def get_icosahedron_faces(self, cell_col="cell", out_col="faces"):
        return self._wrap(
            kernels.get_icosahedron_faces, cell_col=cell_col, out_col=out_col
        )

    def compact(self, cell_col="cell"):
        """Distributed compact: per-block dedup keyed by the res-0 base
        cell, then ONE exact compact per base group (parent chains never
        cross base cells, and base groups see every copy of their cells,
        so the result is globally exact for any block layout).

        Deliberately NOT a per-block partial compaction: if a complete
        sibling set is split across blocks, a partial pass can promote it
        in one block while another block still holds a subset of the same
        siblings, and the final group then cannot re-merge them — the
        composed result diverges from a one-shot compact.  Per-block work
        is therefore only dedup (which is what actually shrinks scattered
        inputs; random fine cells almost never form complete sibling sets
        within one block anyway).  At extreme single-base skew, group by a
        finer res-R ancestor instead and run one extra pass for the cells
        that compact all the way up to res R."""
        from .h3core import bits, hierarchy

        def partial(batch: pa.Table) -> pa.Table:
            cells = np.unique(
                batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            return pa.table(
                {"base": pa.array(bits.get_base_cell(cells)), cell_col: pa.array(cells)}
            )

        def per_group(batch: pa.Table) -> pa.Table:
            cells = np.unique(
                batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            out = hierarchy.compact(cells, mixed_resolutions=True)
            return pa.table({cell_col: pa.array(out)})

        ds = _mb(self.dataset, partial)
        return H3Dataset(
            ds.groupby("base").map_groups(per_group, batch_format="pyarrow")
        )

    # --- geometry -----------------------------------------------------------
    def wkb_to_cells(self, geometry_col="geometry", resolution=9,
                     containment_mode="containscentroid", compact=False,
                     cell_col="cell"):
        return self._wrap(
            vector.wkb_to_cells_kernel, geometry_col=geometry_col,
            resolution=resolution, containment_mode=containment_mode,
            compact=compact, cell_col=cell_col,
        )

    def wkb_to_cells_skew_routed(self, geometry_col="geometry", resolution=9,
                                 containment_mode="containscentroid",
                                 compact=False, cell_col="cell", **kwargs):
        """Skew-aware polyfill: complexity-tier routing + exact
        heavy-polygon window split (vector.polyfill_skew_routed) — use
        over `wkb_to_cells` when geometry sizes are heavy-tailed."""
        return H3Dataset(
            vector.polyfill_skew_routed(
                self.dataset, resolution=resolution,
                containment_mode=containment_mode, compact=compact,
                geometry_col=geometry_col, cell_col=cell_col, **kwargs,
            )
        )

    def cells_to_wkb_polygons(self, cell_col="cell", out_col="geometry"):
        def k(batch: pa.Table) -> pa.Table:
            cells = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
            return batch.append_column(out_col, vector.cells_to_wkb_polygons(cells))

        return self._wrap(k)

    def cells_to_wkb_points(self, cell_col="cell", out_col="geometry"):
        def k(batch: pa.Table) -> pa.Table:
            cells = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
            return batch.append_column(out_col, vector.cells_to_wkb_points(cells))

        return self._wrap(k)

    def dissolve(self, parent_res: int = 3, cell_col: str = "cell"):
        """Distributed link_cells dissolve; returns merged MultiPolygon WKB."""
        return vector.dissolve_cells_dataset(self.dataset, parent_res, cell_col)

    def convex_hull(self, cell_col: str = "cell"):
        """Distributed convex hull of the cell set (per-block hulls, exact
        hull-of-hulls merge); returns the polygon WKB."""
        return vector.convex_hull_dataset(self.dataset, cell_col)

    def centroid(self, cell_col: str = "cell"):
        """Centroid of the cell set (mean of cell centers, the reference's
        MultiPoint centroid): streaming partial sums per block + one tiny
        merge — no materialization.  Returns (lat, lng) or None."""
        from .h3core import bits as bits_mod
        from .h3core import faceijk as faceijk_mod

        def partial(batch: pa.Table) -> pa.Table:
            cells = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
            cells = cells[bits_mod.is_valid_cell(cells)]
            if len(cells) == 0:
                return pa.table(
                    {"slat": pa.array([0.0]), "slng": pa.array([0.0]),
                     "n": pa.array([0], type=pa.int64())}
                )
            lat, lng = faceijk_mod.cell_to_latlng(cells)
            return pa.table(
                {"slat": pa.array([float(lat.sum())]),
                 "slng": pa.array([float(lng.sum())]),
                 "n": pa.array([len(cells)], type=pa.int64())}
            )

        agg = _mb(self.dataset, partial).sum(["slat", "slng", "n"])  # one pass
        if not agg or not agg["sum(n)"]:
            return None
        return agg["sum(slat)"] / agg["sum(n)"], agg["sum(slng)"] / agg["sum(n)"]

    # --- passthrough --------------------------------------------------------
    def __getattr__(self, name):
        # delegate everything else to the underlying Dataset
        return getattr(self.dataset, name)
