"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship interleaved-corpus pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md section 2; ``oracle_sql()`` gives the DuckDB twin of each query
(omitted for H3-encode pipelines SQL cannot express — those get rows-only
checks and are anchored by goldens in tests/).

Ray is initialised by the driver before this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: interleaved docs -> geo spans -> cells -> PIP join, with the
    span-sequence fingerprint (the per-row invariant) carried through."""
    import ray

    from h3ray import join as join_mod
    from h3ray.pipelines.flagship import make_kernel
    from h3ray.pipelines.queries import nation_rects

    nk, lng0, lat0, lng1, lat1 = nation_rects(SF_SMOKE)
    lookup = join_mod.RectLookup(nk, lng0, lat0, lng1, lat1, res=3)
    kernel = make_kernel(lookup)

    ds = ray.data.read_parquet(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def queries() -> dict[str, Callable[[str], Any]]:
    from h3ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from h3ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
