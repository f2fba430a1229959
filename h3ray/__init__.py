"""h3ray: a Ray-Data-native H3 spatial engine (see README.md)."""

from . import corpus, functions, join, kernels, lineage  # noqa: F401
from . import pandas_compat, raster, sources, vector  # noqa: F401
from .dataset import H3Dataset  # noqa: F401
from .h3core.polyfill import ContainmentMode  # noqa: F401
