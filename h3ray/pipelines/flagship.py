"""Flagship resumable pipeline: interleaved corpus -> geo cells -> PIP join,
committed partition-by-partition with lineage (the north-star shape).

Each input fragment (at 100 TB scale: a Lance/parquet fragment of the
document corpus) is one partition; the kernel is pure, so a restarted run
recomputes only partitions missing from the lineage sidecar.  The span
sequence of every document is fingerprinted before and carried through the
join untouched (the per-row span-sequence invariant).
"""

from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa

from .. import corpus as corpus_mod
from .. import join as join_mod
from .. import kernels, lineage
from .queries import nation_rects


def make_kernel(lookup: join_mod.RectLookup):
    def kernel(batch: pa.Table) -> pa.Table:
        docs = corpus_mod.interleave_documents(batch)
        docs = corpus_mod.spans_fingerprint(docs)
        geo = corpus_mod.extract_geo_spans(docs)
        parsed = kernels.cells_parse(geo, "geo_text")
        parsed = kernels.cells_to_coordinates(parsed)
        refine = join_mod.make_pip_refine_kernel(
            lookup, id_cols=("doc_id",), rect_id_col="rect_id"
        )
        joined = refine(parsed)
        # carry span_fp by sorted-key lookup (doc_id strings), vectorized
        keys = docs.column("doc_id").to_numpy(zero_copy_only=False)
        fps = docs.column("span_fp").to_numpy(zero_copy_only=False)
        order = np.argsort(keys)
        probe = joined.column("doc_id").to_numpy(zero_copy_only=False)
        span_fp = fps[order[np.searchsorted(keys[order], probe)]]
        return joined.append_column("span_fp", pa.array(span_fp))

    return kernel


def run_flagship(sf_dir: str, out_dir: str):
    """Resumable run over every documents fragment in ``sf_dir``."""
    nk, lng0, lat0, lng1, lat1 = nation_rects(sf_dir)
    lookup = join_mod.RectLookup(nk, lng0, lat0, lng1, lat1, res=3)
    frags = sorted(glob.glob(f"{sf_dir}/documents*.parquet"))
    return lineage.run_partitioned(
        frags,
        out_dir,
        make_kernel(lookup),
        read_columns=["doc_id", "text", "source"],
    )


def q_flagship_resumable(sf_dir: str):
    """Driver query: run the resumable flagship twice into a scratch dir;
    the second run must skip everything.  Returns the deterministic lineage
    facts (partition_key, row_count, resumed_ok)."""
    import tempfile

    import shutil

    out_dir = tempfile.mkdtemp(prefix="h3ray_flagship_")
    try:
        r1 = run_flagship(sf_dir, out_dir)
        r2 = run_flagship(sf_dir, out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    resumed_ok = r2["computed_now"] == 0 and r2["completed_before"] >= 1
    rows = [
        {"partition_key": k, "row_count": n, "resumed_ok": resumed_ok}
        for k, n in r1["results"]
    ]
    return pa.Table.from_pylist(rows)
