"""Flagship resumable pipeline: interleaved corpus -> geo cells -> PIP join,
committed partition-by-partition with lineage (the north-star shape).

Each input fragment (at 100 TB scale: a Lance/parquet fragment of the
document corpus) is one partition; the kernel is pure, so a restarted run
recomputes only partitions missing from the lineage sidecar.  The span
sequence of every document is fingerprinted before and carried through the
join untouched (the per-row span-sequence invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import corpus as corpus_mod
from .. import join as join_mod
from .. import kernels, lineage
from .queries import nation_rects


def make_kernel(lookup: join_mod.RectLookup):
    def kernel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        docs = corpus_mod.interleave_documents(batch)
        docs = corpus_mod.spans_fingerprint(docs)
        geo = corpus_mod.extract_geo_spans(docs)
        parsed = kernels.cells_parse(geo, "geo_text")
        # join on the document's TRUE coordinates from the geo span text
        # ("lng,lat,res"; exact 2-decimal values, so the parse is lossless)
        # rather than the encoded cell's centroid: the join result is then
        # exactly the SQL BETWEEN join over the corpus coordinate formulas
        # (the flagship value oracle), while the encode still runs per row
        # for the emitted cell column.
        toks = pc.split_pattern(parsed.column("geo_text"), ",")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vals = toks.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
        coords = vals.reshape(len(parsed), 3)
        parsed = parsed.append_column("lng", pa.array(coords[:, 0]))
        parsed = parsed.append_column("lat", pa.array(coords[:, 1]))
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
    """Resumable run over every documents fragment in ``sf_dir``.
    Fragment discovery goes through h3ray.sources (format-dispatched: the
    production corpus is a Lance table whose fragments play the same
    partition role these parquet files do)."""
    from .. import sources

    nk, lng0, lat0, lng1, lat1 = nation_rects(sf_dir)
    lookup = join_mod.RectLookup(nk, lng0, lat0, lng1, lat1, res=3)
    frags = sources.list_fragments(sf_dir, pattern="documents*.parquet")
    return lineage.run_partitioned(
        frags,
        out_dir,
        make_kernel(lookup),
        read_columns=["doc_id", "text", "source"],
    )


def q_flagship_resumable(sf_dir: str):
    """Value-oracled driver query: run the resumable flagship twice into a
    scratch dir; the second run must skip everything.  Returns the lineage
    facts (partition_key, row_count, resumed_ok): the committed row count
    is exactly the SQL BETWEEN join of the corpus coordinate formulas
    against the nation rectangles (the kernel joins on the parsed geo-span
    coordinates), and resumed_ok asserts the zero-recompute resume.  The
    oracle assumes the driver's one-fragment-per-table sf layout
    (partition_key = 'documents')."""
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
