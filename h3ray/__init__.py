"""h3ray: a Ray-Data-native H3 spatial engine (see README.md)."""

from . import arrays, corpus, functions, join, kernels, lineage  # noqa: F401
from . import pandas_compat, raster, sources, vector  # noqa: F401
from .dataset import H3Dataset  # noqa: F401
from .h3core.polyfill import ContainmentMode  # noqa: F401

# reference-parity top-level array API: `from h3ronpy import compact`
# ports as `from h3ray import compact` (see arrays.py)
from .arrays import (  # noqa: F401
    DEFAULT_CELL_COLUMN_NAME,
    H3_CRS,
    __version__,
    version,
    cells_area_km2,
    cells_area_m2,
    cells_area_rads2,
    cells_parse,
    cells_resolution,
    cells_to_localij,
    cells_to_string,
    cells_valid,
    change_resolution,
    change_resolution_list,
    change_resolution_paired,
    compact,
    directededges_parse,
    directededges_to_string,
    directededges_valid,
    grid_disk,
    grid_disk_aggregate_k,
    grid_disk_distances,
    grid_ring_distances,
    localij_to_cells,
    uncompact,
    vertexes_parse,
    vertexes_to_string,
    vertexes_valid,
)
