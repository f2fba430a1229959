"""Benchmark harness: headline Ray Data pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": secs, "unit": "sec",
"queries": {...}, "sf": ..., "num_cpus": N, ...}.

``--scaling`` runs the heavy encode+join pipeline twice in fresh
subprocesses at num_cpus=8 and num_cpus=32 on identical input and reports
throughput at both plus scaling efficiency (the sandbox substitute for the
N vs 4N node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _blocks(rows: int) -> int:
    # right-size read parallelism: ~50k rows per block, between 4 and 2/CPU
    # (tiny inputs should not pay per-task overhead)
    return max(4, min(NUM_CPUS * 2, rows // 50_000 + 1))



def _enable_push_shuffle():
    """Push-based shuffle for every bench exchange: consistently 5-10%
    faster than the default sort exchange on this repo's bucketed
    groupbys at sf0.1 (measured 8x interleaved: mode_per_group 1.9->1.3,
    pip_salted 3.2->2.5, bloom_antijoin 4.3->4.0 s) and Ray's documented
    large-shuffle path (bounds intermediate block count at scale).  Set
    here, in the session owner, never in library code.

    Uses the current `DataContext.shuffle_strategy` API so the bench
    keeps exercising the push-based path across Ray upgrades (the old
    `use_push_based_shuffle` flag is deprecated and may become a silent
    no-op); falls back to the flag on older Ray."""
    import ray

    ctx = ray.data.DataContext.get_current()
    try:
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    except (ImportError, AttributeError):
        ctx.use_push_based_shuffle = True

def _pipelines(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from h3ray import corpus as corpus_mod
    from h3ray import join as join_mod
    from h3ray import kernels
    from h3ray.h3core import bits, faceijk, hierarchy, traversal
    from h3ray.pipelines.queries import (
        event_lat,
        event_lng,
        nation_rects,
    )

    def final_merge(ds, key: str, val: str):
        """Combiner pattern: blocks already hold partial (key, val) sums with
        bounded cardinality.  A distributed combine level first re-batches
        partials ACROSS blocks (batch_size=64Ki) and merges each batch down
        to <= cardinality rows in a task — at 100 TB this collapses
        num_blocks x cardinality partial rows by ~64Ki/cardinality per
        level before anything reaches the driver — then the driver runs one
        Arrow C++ hash groupby over the residue (far cheaper than an
        all-to-all for bounded group counts; the groupby shuffle path in
        h3ray/pipelines/queries.py covers unbounded cardinalities)."""

        def combine(batch: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(batch, key).aggregate([(val, "sum")])
            return g.select([key, f"{val}_sum"]).rename_columns([key, val])

        combined = ds.map_batches(
            combine, batch_format="pyarrow", batch_size=1 << 16
        )
        tables = ray.get(combined.to_arrow_refs())
        t = pa.concat_tables([x for x in tables if x.num_rows])
        return pa.TableGroupBy(t, key).aggregate([(val, "sum")])

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    n_lineitem = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def q_encode_pip():
        """events -> coords -> res-7 cells -> broadcast PIP join -> count."""
        nk, lng0, lat0, lng1, lat1 = nation_rects(sf_dir)
        lookup_ref = ray.put(join_mod.RectLookup(nk, lng0, lat0, lng1, lat1, res=3))
        refine = join_mod.make_pip_refine_kernel(
            lookup_ref, id_cols=("event_id",), rect_id_col="rect_id"
        )

        def add_coords(batch: pa.Table) -> pa.Table:
            eid = batch.column("event_id").to_numpy(zero_copy_only=False)
            batch = batch.append_column("lat", pa.array(event_lat(eid)))
            return batch.append_column("lng", pa.array(event_lng(eid)))

        ds = (
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id"],
                override_num_blocks=_blocks(n_events),
            )
            .map_batches(add_coords, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
            .map_batches(refine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        )
        return ds.count()

    def q_lineitem_encode_agg():
        """lineitem -> synthesized coords -> res-9 cells -> parent res 4 ->
        partial agg in-batch -> small groupby."""

        def k(batch: pa.Table) -> pa.Table:
            key = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
            kk = key * 7 + ln
            lat = ((kk * 37) % 16000) / 100.0 - 80.0
            lng = ((kk * 73) % 36000) / 100.0 - 180.0
            cells = faceijk.latlng_to_cell(lat, lng, 9)
            parent = bits.cell_to_parent(cells, np.uint64(4))
            # in-batch partial aggregation before the shuffle
            u, c = np.unique(parent, return_counts=True)
            return pa.table({"parent": pa.array(u), "n": pa.array(c)})

        ds = (
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_linenumber"],
                override_num_blocks=_blocks(n_lineitem),
            )
            .map_batches(k, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        )
        return final_merge(ds, "parent", "n").num_rows

    def q_disk_explode():
        """events constructed cells -> grid_disk k=2 -> per-cell counts."""
        from h3ray.pipelines.queries import _construct_cells

        def k(batch: pa.Table) -> pa.Table:
            eid = batch.column("event_id").to_numpy(zero_copy_only=False)
            cells = _construct_cells(eid)
            rows, disk, dist = traversal.grid_disk_distances(cells, 2)
            u, c = np.unique(disk, return_counts=True)
            return pa.table({"cell": pa.array(u), "n": pa.array(c)})

        ds = (
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id"],
                override_num_blocks=_blocks(n_events),
            )
            .map_batches(k, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        )
        return final_merge(ds, "cell", "n").num_rows

    def q_corpus_geo():
        """documents -> interleaved spans -> geo parse -> cells."""

        def k(batch: pa.Table) -> pa.Table:
            docs = corpus_mod.interleave_documents(batch)
            geo = corpus_mod.extract_geo_spans(docs)
            parsed = kernels.cells_parse(geo, "geo_text")
            return parsed.select(["doc_id", "cell"])

        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "source"],
            override_num_blocks=_blocks(n_docs),
        ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        return ds.count()

    def q_compact():
        """lineitem cells res 8 -> distributed compact through the
        H3Dataset.compact scale plan: per-block dedup keyed by base cell,
        one exact compact per base group — the benched pipeline IS the
        shipped plan (the round-2 bench's driver-side final concat+compact
        is retired; its number is recorded in BASELINE.md as a labeled
        comparison)."""
        from h3ray.dataset import H3Dataset

        def encode(batch: pa.Table) -> pa.Table:
            key = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
            kk = key * 7 + ln
            lat = ((kk * 41) % 16000) / 100.0 - 80.0
            lng = ((kk * 79) % 36000) / 100.0 - 180.0
            cells = np.unique(faceijk.latlng_to_cell(lat, lng, 8))
            return pa.table({"cell": pa.array(cells)})

        ds = (
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_linenumber"],
                override_num_blocks=_blocks(n_lineitem),
            )
            .map_batches(encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        )
        return H3Dataset(ds).compact().count()

    def q_text_dedup():
        """documents -> vectorized LLM-pipeline kernels: minhash + simhash
        signatures, quality score, language id (the flat-buffer jagged
        kernels; one pass each over the corpus bytes)."""
        from h3ray.functions import dedup as dedup_fns
        from h3ray.functions import text as text_fns

        def k(batch: pa.Table) -> pa.Table:
            t = dedup_fns.minhash_signatures(batch)
            t = dedup_fns.simhash_signatures(t)
            t = text_fns.quality_score(t)
            t = text_fns.language_id(t)
            return t.select(["doc_id", "simhash", "lang_guess"])

        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            override_num_blocks=_blocks(n_docs),
        ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        return ds.count()

    def q_pip_salted():
        """Shuffle-path PIP join: both sides streamed, cell-keyed co-group
        with hot-cell salting (the both-sides-large variant)."""

        def add_coords(batch: pa.Table) -> pa.Table:
            eid = batch.column("event_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "point_id": pa.array(eid.astype(np.int64)),
                    "lat": pa.array(event_lat(eid)),
                    "lng": pa.array(event_lng(eid)),
                }
            )

        def nation_to_rects(batch: pa.Table) -> pa.Table:
            nk = batch.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
            lat0 = ((nk * 11 % 140) - 70).astype(np.float64)
            lng0 = ((nk * 29 % 340) - 170).astype(np.float64)
            return pa.table(
                {
                    "rect_id": pa.array(nk),
                    "lng0": pa.array(lng0),
                    "lat0": pa.array(lat0),
                    "lng1": pa.array(lng0 + 13),
                    "lat1": pa.array(lat0 + 9),
                }
            )

        pds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id"],
            override_num_blocks=_blocks(n_events),
        ).map_batches(add_coords, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        rds = ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
        ).map_batches(nation_to_rects, batch_format="pyarrow", zero_copy_batch=True)
        return join_mod.pip_join_shuffle(pds, rds, res=3, salt=4).count()

    def q_window_agg():
        """24h sliding-window user features over events — the shipped
        queries.q_window_agg plan verbatim ((key, chunk)+halo bucketed
        exchange, vectorized searchsorted/cumsum kernel)."""
        from h3ray.pipelines.queries import q_window_agg as shipped

        return shipped(sf_dir).count()

    return {
        "encode_pip": q_encode_pip,
        "lineitem_encode_agg": q_lineitem_encode_agg,
        "disk_explode": q_disk_explode,
        "corpus_geo": q_corpus_geo,
        "compact": q_compact,
        "text_dedup": q_text_dedup,
        "pip_salted": q_pip_salted,
        "window_agg": q_window_agg,
    }


def _warm_kernel(batch):
    import h3ray.h3core.boundary  # noqa: F401
    import h3ray.h3core.traversal  # noqa: F401  (loads the table cache)

    return batch


def run_bench():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    # untimed warmup: spawn the worker pool + import the library everywhere
    ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm_kernel, batch_format="pyarrow"
    ).count()
    # ... and exercise one tiny sort exchange: the AllToAll machinery has
    # a ~3 s one-time spin-up that otherwise lands on whichever timed
    # pipeline shuffles first (measured: first sliding_window_agg 4.8 s
    # cold vs 1.45 s immediately after, same plan and data)
    ray.data.range(1024, override_num_blocks=8).groupby("id").count().materialize()
    qs = _pipelines(SF_DIR)
    # per-query MIN over reps: this box's minute-scale tenant-load spikes
    # read 1.5-5x on single shots (BASELINE §7/§8 ledger); the min of two
    # back-to-back reps is the standard drift-robust estimator and both
    # reps are reported for honesty
    reps = max(1, int(os.environ.get("H3RAY_BENCH_REPS", "2")))
    all_times: list[dict] = []
    rows = {}
    for r in range(reps):
        times = {}
        for name, fn in qs.items():
            t0 = time.perf_counter()
            rows[name] = fn()
            times[name] = round(time.perf_counter() - t0, 3)
        all_times.append(times)
    best = {
        name: min(t[name] for t in all_times) for name in all_times[0]
    }
    total = round(sum(best.values()), 3)
    out = {
        "metric": "headline pipelines wall time",
        "value": total,
        "unit": "sec",
        "queries": best,
        "rep_totals": [round(sum(t.values()), 3) for t in all_times],
        "rows": rows,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        # measurement-window self-diagnosis (BASELINE.md §host-drift):
        # ~76-80k rows/s/core = clean band; <70k = externally loaded —
        # absolute wall times scale with this, the plan does not change
        "probe_krows_per_core": round(_single_core_probe() / 1000.0, 1),
    }
    print(json.dumps(out))
    ray.shutdown()
    return out


def run_flagship_sf1():
    """End-to-end flagship rehearsal at sf1 scale (10x the sf0.1 corpus):
    synthesize a 10-fragment document corpus (deterministic doc_id offsets
    per fragment — no external data), then run the resumable flagship
    (interleave -> span fingerprint -> geo parse -> encode -> PIP join ->
    lineage-committed parquet) over all fragments at NUM_CPUS, and run it
    AGAIN to time the zero-recompute resume.  Prints one JSON line with
    docs/sec, joined rows, per-partition wall stats and the resume time."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm_kernel, batch_format="pyarrow"
    ).count()

    from h3ray.pipelines.flagship import run_flagship

    n_frags = int(os.environ.get("H3RAY_FLAGSHIP_FRAGMENTS", "10"))
    src = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    work = tempfile.mkdtemp(prefix="h3ray_sf1_")
    out_dir = os.path.join(work, "out")
    try:
        sf1_dir = os.path.join(work, "corpus")
        os.makedirs(sf1_dir)
        shutil.copy(f"{SF_DIR}/nation.parquet", f"{sf1_dir}/nation.parquet")
        ids = src.column("doc_id").to_numpy(zero_copy_only=False)
        for i in range(n_frags):
            frag = src.set_column(
                src.schema.get_field_index("doc_id"),
                "doc_id",
                pa.array(ids + i * 1_000_000),
            )
            pq.write_table(frag, f"{sf1_dir}/documents-{i:03d}.parquet")
        n_docs = len(src) * n_frags

        # untimed warm pass into a scratch dir: library imports + table
        # caches load once per core worker (lineage tasks use plain
        # @ray.remote workers, which the Ray Data warmup above does not
        # necessarily touch); steady-state throughput is what scales
        warm_dir = os.path.join(work, "warm")
        run_flagship(sf1_dir, warm_dir)
        shutil.rmtree(warm_dir, ignore_errors=True)

        t0 = time.perf_counter()
        r1 = run_flagship(sf1_dir, out_dir)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        r2 = run_flagship(sf1_dir, out_dir)
        t_resume = time.perf_counter() - t0
        walls = []
        lin_dir = os.path.join(out_dir, "_lineage")
        for f in sorted(os.listdir(lin_dir)):
            t = pq.read_table(os.path.join(lin_dir, f), columns=["wall_ms"])
            walls.extend(t.column("wall_ms").to_pylist())
        out = {
            "metric": "flagship sf1 end-to-end",
            "value": round(t1, 3),
            "unit": "sec",
            "n_docs": n_docs,
            "n_fragments": n_frags,
            "docs_per_sec": round(n_docs / t1),
            "joined_rows": int(sum(n for _, n in r1["results"])),
            "partition_wall_ms": {
                "mean": round(float(np.mean(walls)), 1),
                "max": round(float(np.max(walls)), 1),
            },
            "resume_sec": round(t_resume, 3),
            "resume_recomputed": r2["computed_now"],
            "num_cpus": NUM_CPUS,
            "sf": SF_DIR,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()
    return out


def run_pip_scale():
    """pip_salted at 1x and FACTORx the sf0.1 events table (default 10x,
    H3RAY_PIP_SCALE_FACTOR to override): measures whether the sort-exchange
    floor amortizes as the streamed side grows.  The FACTORx input is
    synthesized deterministically (fragment k offsets event_id by k*1e7, so
    coords differ per copy — no external data) and run through the IDENTICAL
    pip_join_shuffle plan.  Prints one JSON line with rows/s at both scales."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from h3ray import join as join_mod
    from h3ray.pipelines.queries import event_lat, event_lng

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm_kernel, batch_format="pyarrow"
    ).count()

    def add_coords(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "point_id": pa.array(eid.astype(np.int64)),
                "lat": pa.array(event_lat(eid)),
                "lng": pa.array(event_lng(eid)),
            }
        )

    def nation_to_rects(batch: pa.Table) -> pa.Table:
        nk = batch.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        lat0 = ((nk * 11 % 140) - 70).astype(np.float64)
        lng0 = ((nk * 29 % 340) - 170).astype(np.float64)
        return pa.table(
            {
                "rect_id": pa.array(nk),
                "lng0": pa.array(lng0),
                "lat0": pa.array(lat0),
                "lng1": pa.array(lng0 + 13),
                "lat1": pa.array(lat0 + 9),
            }
        )

    def run_once(events_path, n_points: int) -> tuple:
        pds = ray.data.read_parquet(
            events_path,
            columns=["event_id"],
            override_num_blocks=max(4, min(NUM_CPUS * 2, n_points // 50_000 + 1)),
        ).map_batches(add_coords, batch_format="pyarrow", zero_copy_batch=True,
                      batch_size=None)
        rds = ray.data.read_parquet(
            f"{SF_DIR}/nation.parquet", columns=["n_nationkey"]
        ).map_batches(nation_to_rects, batch_format="pyarrow", zero_copy_batch=True)
        t0 = time.perf_counter()
        joined = join_mod.pip_join_shuffle(pds, rds, res=3, salt=4).count()
        return time.perf_counter() - t0, joined

    factor = int(os.environ.get("H3RAY_PIP_SCALE_FACTOR", "10"))
    src = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id"])
    ids = src.column("event_id").to_numpy(zero_copy_only=False)
    work = tempfile.mkdtemp(prefix="h3ray_pipscale_")
    try:
        big = os.path.join(work, "events")
        os.makedirs(big)
        for i in range(factor):
            pq.write_table(
                pa.table({"event_id": pa.array(ids + i * 10_000_000)}),
                f"{big}/events-{i:03d}.parquet",
            )
        run_once(f"{SF_DIR}/events.parquet", len(src))  # untimed warm pass
        results = {}
        for label, path, n in (
            ("1x", f"{SF_DIR}/events.parquet", len(src)),
            (f"{factor}x", big, len(src) * factor),
        ):
            secs, joined = run_once(path, n)
            results[label] = {
                "points": n,
                "joined_rows": joined,
                "secs": round(secs, 3),
                "rows_per_sec": round(n / secs),
            }
        lo = results["1x"]["rows_per_sec"]
        hi = results[f"{factor}x"]["rows_per_sec"]
        out = {
            "metric": "pip_salted exchange-floor amortization",
            "value": round(hi / lo, 2),
            "unit": f"rows/s speedup at {factor}x input",
            "scales": results,
            "num_cpus": NUM_CPUS,
            "sf": SF_DIR,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()  # a failed sweep must not leave plasma pages behind
    return out


def _scaling_child(n_points: int):
    """Heavy fixed-size pipeline: synthesize points, encode res 12, disk
    k=1, parent aggregation.  Prints rows/sec."""
    import numpy as np
    import pyarrow as pa
    import ray

    from h3ray.h3core import bits, faceijk, traversal

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    _enable_push_shuffle()

    def k(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy(zero_copy_only=False)
        lat = ((i * 37) % 16000) / 100.0 - 80.0
        lng = ((i * 73) % 36000) / 100.0 - 180.0
        cells = faceijk.latlng_to_cell(lat, lng, 15)
        rows, disk, dist = traversal.grid_disk_distances(cells, 1)
        parent = bits.cell_to_parent(disk, np.uint64(2))
        u, c = np.unique(parent, return_counts=True)
        return pa.table({"parent": pa.array(u), "n": pa.array(c)})

    # warm the worker pool before timing (steady-state throughput)
    ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm_kernel, batch_format="pyarrow"
    ).count()

    t0 = time.perf_counter()
    # constant decomposition at every cpu count: identical tasks, only the
    # executor width changes (the point of a scaling measurement)
    ds = ray.data.range(n_points, override_num_blocks=64).map_batches(
        k, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    tables = ray.get(ds.to_arrow_refs())
    t = pa.concat_tables([x for x in tables if x.num_rows])
    pa.TableGroupBy(t, "parent").aggregate([("n", "sum")])
    dt = time.perf_counter() - t0
    print(json.dumps({"rows_per_sec": n_points / dt, "secs": dt}))
    ray.shutdown()


def _single_core_probe(n: int = 600_000) -> float:
    """In-run measurement-window calibration: single-core rows/s of the
    scaling kernel's work (latlng encode + grid_disk_distances + parent),
    warm rep.  The clean band on this host is ~76-80k rows/s/core; <70k
    means external load, >85k means low-occupancy turbo that inflates the
    low-cpu baseline and understates efficiency (see BASELINE.md
    "measurement-window honesty log").  Recorded per rep in the --scaling
    JSON so every reading carries its own window diagnosis."""
    import numpy as np

    from h3ray.h3core import bits, faceijk, traversal

    i = np.arange(n, dtype=np.int64)
    lat = ((i * 37) % 16000) / 100.0 - 80.0
    lng = ((i * 73) % 35000) / 100.0 - 175.0
    best = 0.0
    for _ in range(2):  # first rep warms caches/JIT'd ufunc paths
        t0 = time.perf_counter()
        c = faceijk.latlng_to_cell(lat, lng, 7)
        traversal.grid_disk_distances(c, 1)
        bits.cell_to_parent(c, 4)
        best = max(best, n / (time.perf_counter() - t0))
    return best


def run_scaling(n_points: int = 24_000_000):
    """N vs 4N scaling on identical input in fresh Ray sessions.

    Default pair is (2, 8): this sandbox's single box saturates its DRAM
    bandwidth near 8 concurrent workers of these memory-heavy kernels (a
    pure-multiprocessing probe shows the same ceiling without Ray), so
    (8, 32) conflates core scaling with a fixed per-node bandwidth budget.
    On a real N -> 4N *node* scale-out every node brings its own memory
    bus, which the (2, 8) in-envelope pair models; override with
    H3RAY_SCALING_CPUS=8,32 to measure the saturated pair (see
    BASELINE.md for both numbers)."""
    # stale Ray session dirs hold plasma-store pages in tmpfs and measurably
    # degrade throughput; clear sessions that are no longer running
    subprocess.run(
        "find /tmp/ray -maxdepth 1 -name 'session_*' -mmin +30 "
        "-exec rm -rf {} + 2>/dev/null",
        shell=True,
    )
    n_points = int(os.environ.get("H3RAY_SCALING_POINTS", n_points))
    # the job must run long enough (>~20 s per level) to average out the
    # shared host's low-occupancy turbo boost, which otherwise inflates the
    # 2-cpu rate and understates efficiency (measured: 6M points -> 0.68-0.79
    # noisy, 24M points -> 0.91 stable)
    pair = tuple(
        int(x) for x in os.environ.get("H3RAY_SCALING_CPUS", "2,8").split(",")
    )
    reps = int(os.environ.get("H3RAY_SCALING_REPS", "3"))
    samples = {c: [] for c in pair}
    probes = []
    # interleave repetitions and take the MEDIAN per level: the shared host
    # turbo-boosts low-occupancy runs, so best-of-N inflates the low-cpu
    # baseline and understates efficiency
    for _ in range(reps):
        # bracket each rep with a pre- AND post-probe: a pre-only point
        # sample mislabels reps in a drifting window (observed: a clean
        # 77.7k pre-probe preceding legs that ran into a turbo minute)
        probes.append([round(_single_core_probe() / 1000.0, 1)])
        for cpus in pair:
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            p = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(n_points)],
                capture_output=True,
                text=True,
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            samples[cpus].append(json.loads(line)["rows_per_sec"])
        probes[-1].append(round(_single_core_probe() / 1000.0, 1))
    lo, hi = pair
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    # pair the back-to-back runs of each repetition: host capacity drifts
    # between reps but is similar within one, so the per-rep ratio isolates
    # the engine's scaling from the drift; report the median ratio
    effs = [
        samples[hi][i] / ((hi / lo) * samples[lo][i])
        for i in range(len(samples[lo]))
    ]
    tp_lo = med(samples[lo])
    tp_hi = med(samples[hi])
    out = {
        "metric": f"scaling efficiency {lo}->{hi} cpus",
        "value": round(med(effs), 3),
        "unit": "efficiency",
        f"throughput_{lo}cpu": round(tp_lo),
        f"throughput_{hi}cpu": round(tp_hi),
        "per_rep_efficiency": [round(e, 3) for e in effs],
        "per_rep_probe_krows_per_core_pre_post": probes,
        "n_points": n_points,
    }
    print(json.dumps(out))
    return out


def run_ts_scale():
    """sliding_window_agg at 1x and FACTORx the sf0.1 events table
    (default 10x, H3RAY_TS_SCALE_FACTOR to override): fragment k offsets
    user_id by k*10_000 (distinct keys, identical per-key densities and
    chunk structure), so the synthesized input is exactly the wider-fleet
    shape — more (key, chunk) slices, same slice size.  The same
    24h-window / 96h-chunk plan runs at both scales (num_buckets=256,
    sized for the larger input; the headline window_agg query uses 64);
    rows/s should grow toward linear as the two fixed sort-exchange
    floors amortize."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from h3ray.functions import timeseries

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm_kernel, batch_format="pyarrow"
    ).count()

    hour_us = 3_600_000_000

    def run_once(path, n_rows: int) -> float:
        ds = ray.data.read_parquet(
            path, override_num_blocks=max(4, min(NUM_CPUS * 2, n_rows // 50_000 + 1))
        )
        t0 = time.perf_counter()
        out = timeseries.sliding_window_agg(
            ds,
            key_col="user_id",
            ts_col="ts_us",
            val_col="cents",
            id_col="event_id",
            window_us=24 * hour_us,
            num_buckets=256,
        ).count()
        secs = time.perf_counter() - t0
        assert out == n_rows, (out, n_rows)
        return secs

    factor = int(os.environ.get("H3RAY_TS_SCALE_FACTOR", "10"))
    src = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    eid = src.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    uid = src.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = src.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
    cents = np.floor(
        src.column("value").to_numpy(zero_copy_only=False) * 100 + 0.5
    ).astype(np.int64)
    # dict dedupes the degenerate factor=1 case (both scales are "1x")
    scales = dict((("1x", 1), (f"{factor}x", factor)))
    work = tempfile.mkdtemp(prefix="h3ray_tsscale_")
    try:
        for scale, nfrag in scales.items():
            d = os.path.join(work, scale)
            os.makedirs(d)
            for i in range(nfrag):
                pq.write_table(
                    pa.table(
                        {
                            "event_id": pa.array(eid + i * 10_000_000),
                            "user_id": pa.array(uid + i * 10_000),
                            "ts_us": pa.array(ts),
                            "cents": pa.array(cents),
                        }
                    ),
                    f"{d}/events-{i:03d}.parquet",
                )
        run_once(os.path.join(work, "1x"), len(eid))  # untimed warm pass
        results = {}
        for scale, nfrag in scales.items():
            n = len(eid) * nfrag
            secs = run_once(os.path.join(work, scale), n)
            results[scale] = {
                "rows": n,
                "secs": round(secs, 3),
                "rows_per_sec": round(n / secs),
            }
        lo = results["1x"]["rows_per_sec"]
        hi = results[f"{factor}x"]["rows_per_sec"]
        print(
            json.dumps(
                {
                    "metric": "sliding_window_agg exchange-floor amortization",
                    "value": round(hi / lo, 2),
                    "unit": f"rows/s speedup at {factor}x input",
                    "scales": results,
                    "num_cpus": NUM_CPUS,
                    "sf": SF_DIR,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()


def run_ivf_recall():
    """IVF approximation quality: recall@10 of the persisted
    bucket-partitioned index vs brute-force ground truth, swept over
    n_probe (1..n_centroids) on the sf embeddings table.  The probes=all
    point must be 1.0 exactly (the ivf_recall driver query's oracle
    invariant); the interior points are the measured accuracy/IO
    trade-off a user tunes against bucket-read counts."""
    import shutil
    import tempfile

    import numpy as np
    import ray

    from h3ray.functions import ann as ann_fns
    from h3ray.pipelines.queries import _embeddings_ds, _query_vectors

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    try:
        k = 10
        n_centroids = 16
        sample_ids, S = _query_vectors(SF_DIR, 2048)
        cent = ann_fns.train_centroids(S[:: max(1, len(S) // 256)], n_centroids)
        ids, Q = sample_ids[:50], S[:50]
        exact = ann_fns.bruteforce_topk(_embeddings_ds(SF_DIR), ids, Q, k=k)
        index_dir = tempfile.mkdtemp(prefix="h3ray_ivfbench_")
        try:
            t0 = time.perf_counter()
            ann_fns.ivf_build(_embeddings_ds(SF_DIR), cent, index_dir)
            build_s = time.perf_counter() - t0
            curve = {}
            for n_probe in (1, 2, 4, 8, n_centroids):
                t0 = time.perf_counter()
                approx, n_read = ann_fns.ivf_topk_partitioned(
                    index_dir, ids, Q, cent, k=k, n_probe=n_probe
                )
                dt = time.perf_counter() - t0
                r = ann_fns.recall_at_k(approx, exact)
                hits = r.column("hits").to_numpy(zero_copy_only=False).sum()
                truth = r.column("truth_k").to_numpy(zero_copy_only=False).sum()
                curve[str(n_probe)] = {
                    "recall": round(float(hits) / float(truth), 4),
                    "buckets_read": n_read,
                    "sec": round(dt, 3),
                }
        finally:
            shutil.rmtree(index_dir, ignore_errors=True)
        print(
            json.dumps(
                {
                    "metric": "ivf recall@10 vs n_probe",
                    "queries_n": len(ids),
                    "k": k,
                    "n_centroids": n_centroids,
                    "build_sec": round(build_s, 3),
                    "curve": curve,
                    "sf": SF_DIR,
                    "num_cpus": NUM_CPUS,
                }
            )
        )
    finally:
        ray.shutdown()


def run_vertex_scale():
    """Corner-keyed aggregation at scale: N synthetic res-9 cells ->
    canonical vertex flatten (x6 rows) -> groupby(vertex).count().  The
    canonicality claim this measures: all three cells touching a corner
    derive the identical uint64, so the grouped counts NEVER exceed 3 —
    checked over the full result, not sampled.  Reports end-to-end
    rows/s through the one corner-key exchange."""
    import numpy as np
    import pyarrow as pa
    import ray

    from h3ray import kernels

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    try:
        ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
            _warm_kernel, batch_format="pyarrow"
        ).count()
        ray.data.range(1024, override_num_blocks=8).groupby("id").count().materialize()

        n = int(os.environ.get("H3RAY_VERTEX_SCALE_N", "2000000"))
        n_sites = max(1, n // 343)

        def make_cells(batch: pa.Table) -> pa.Table:
            from h3ray.h3core import faceijk, hierarchy

            i = batch.column("id").to_numpy(zero_copy_only=False)
            # one DISTINCT res-6 site per id (>=1 degree spacing, far
            # above the ~0.02 degree res-6 cell size), expanded to its
            # 343 contiguous res-9 children: globally unique cells whose
            # corners genuinely collide within each patch
            lat = (i % 160).astype(np.float64) - 79.5
            lng = ((i // 160) % 360).astype(np.float64) - 179.5
            sites = faceijk.latlng_to_cell(lat, lng, 6)
            ch, _ = hierarchy.cell_to_children(np.unique(sites), 9)
            return pa.table({"cell": pa.array(ch.astype(np.int64))})

        # the repo's high-cardinality groupby idiom: hash-bucket the 64-bit
        # corner keys into a BOUNDED number of groups and aggregate each
        # bucket with ONE vectorized np.unique — groupby(vertex).count()
        # directly would push ~4.5M distinct keys through Ray's per-group
        # combine (measured ~900 core-seconds of Python at this size)
        n_buckets = NUM_CPUS * 4

        def to_buckets(batch: pa.Table) -> pa.Table:
            t = kernels.cells_to_vertexes(batch, flatten=True)
            vx = t.column("vertexes").to_numpy(zero_copy_only=False).astype(np.uint64)
            b = ((vx * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)).astype(
                np.int64
            ) % n_buckets
            return pa.table({"bucket": pa.array(b), "vertexes": pa.array(vx)})

        def count_bucket(batch: pa.Table) -> pa.Table:
            vx = batch.column("vertexes").to_numpy(zero_copy_only=False)
            _, counts = np.unique(vx, return_counts=True)
            return pa.table(
                {
                    "over": pa.array([int((counts > 3).sum())]),
                    "n": pa.array([len(counts)]),
                }
            )

        ds = (
            ray.data.range(n_sites, override_num_blocks=NUM_CPUS * 2)
            .map_batches(make_cells, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
        )
        t0 = time.perf_counter()
        partials = (
            ds.groupby("bucket")
            .map_groups(count_bucket, batch_format="pyarrow")
            .to_pandas()
        )
        over = int(partials["over"].sum())
        n_corners = int(partials["n"].sum())
        dt = time.perf_counter() - t0
        assert over == 0, f"{over} corners with >3 owners — canonicality broken"
        n_cells = n_sites * 343
        print(
            json.dumps(
                {
                    "metric": "corner-keyed groupby rows/s",
                    "cells": n_cells,
                    "corner_rows": n_cells * 6,
                    "distinct_corners": n_corners,
                    "over_degree_3": over,
                    "sec": round(dt, 3),
                    "rows_per_s": round(n_cells * 6 / dt),
                    "num_cpus": NUM_CPUS,
                }
            )
        )
    finally:
        ray.shutdown()



def run_lsh_scale():
    """LSH candidate-stage A/B at amplified group count: sf0.1 documents
    replicated H3RAY_LSH_REPL x (distinct doc_ids), 16 bands -> ~16 x docs
    band rows / LSH groups.  Default runs the bucketed plan (the shipped
    path); H3RAY_AB_CONTROL=1 adds the per-(band, band_hash) map_groups
    control — both emit the identical distinct pair set (asserted).
    BASELINE §8 carries the measured 7-12x at 1.6M groups."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    try:
        from h3ray.functions import dedup
        from h3ray.functions.text import hash_u64_batch

        repl = int(os.environ.get("H3RAY_LSH_REPL", "20"))
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )

        distinct = bool(os.environ.get("H3RAY_LSH_DISTINCT"))
        # replica offset must exceed the MAX doc_id (not the row count —
        # sparse ids would alias) so replica ranges never collide; hoisted
        # to a plain int so the closure doesn't pickle the whole table
        import pyarrow.compute as _pc
        stride = max(1_000_000, int(_pc.max(docs.column("doc_id")).as_py()) + 1)

        def replicate(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            tabs = []
            for r in range(repl):
                text = batch.column("text")
                if distinct and r:
                    text = pc.binary_join_element_wise(
                        text, pa.scalar(f" replica salt {r}"), ""
                    )
                tabs.append(pa.table({"doc_id": pa.array(d + r * stride),
                                      "text": text}))
            return pa.concat_tables(tabs)

        def sig(batch: pa.Table) -> pa.Table:
            t = dedup.minhash_signatures(batch)
            t = t.append_column(
                "text_hash",
                pa.array(hash_u64_batch(batch.column("text")).astype(np.int64)),
            )
            return dedup.minhash_bands(t, 16, "doc_id",
                                       extra_cols=("text_hash",))

        def band_rows():
            return (
                ray.data.from_arrow(docs).repartition(NUM_CPUS)
                .map_batches(replicate, batch_format="pyarrow")
                .map_batches(sig, batch_format="pyarrow")
            )

        results = {}
        t0 = time.perf_counter()
        pairs = (
            band_rows()
            .map_batches(lambda b: dedup.with_band_bucket(b, 256),
                         batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dedup.exact_pairs_bucketed, batch_format="pyarrow")
        )
        n_bucketed = dedup.distinct_pairs_ds(pairs, 256).count()
        results["bucketed"] = {"sec": round(time.perf_counter() - t0, 2),
                               "pairs": n_bucketed}
        if os.environ.get("H3RAY_LSH_VERIFIED"):
            # the COMPOSED near-dup pipeline: signatures -> bucketed LSH
            # candidates -> bucketed distinct -> exact n-gram Jaccard
            # verify >= 0.7 (the production fuzzy-dedup path end-to-end)
            t0 = time.perf_counter()
            verified = dedup.minhash_dedup_verified(
                ray.data.from_arrow(docs).repartition(NUM_CPUS)
                .map_batches(replicate, batch_format="pyarrow"),
                threshold=0.7,
            ).count()
            dt = time.perf_counter() - t0
            results["verified_pipeline"] = {
                "sec": round(dt, 2), "pairs": verified,
                "docs_per_sec": round(docs.num_rows * repl / dt),
            }
        if os.environ.get("H3RAY_AB_CONTROL"):
            t0 = time.perf_counter()
            ctrl = (
                band_rows()
                .groupby(["band", "band_hash"])
                .map_groups(dedup.exact_pairs_in_group, batch_format="pyarrow")
                .groupby(["a", "b"]).count()
            )
            n_ctrl = ctrl.count()
            results["pergroup_control"] = {
                "sec": round(time.perf_counter() - t0, 2), "pairs": n_ctrl
            }
            assert n_ctrl == n_bucketed, (n_ctrl, n_bucketed)
        print(json.dumps({
            "metric": "LSH candidate stage", "docs": docs.num_rows * repl,
            "band_rows": docs.num_rows * repl * 16, "num_cpus": NUM_CPUS,
            **results,
        }))
    finally:
        ray.shutdown()


def run_cc_scale():
    """Connected-components A/B: 200k star components of size 5 (1M
    nodes, 800k edges; 2 rounds + 1 quiet).  Default runs the shipped
    bucketed segment-min path; H3RAY_AB_CONTROL=1 adds the per-key
    map_groups control leg (BASELINE §8: 8x at this size; identical
    label sums asserted)."""
    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    try:
        from h3ray.functions import dedup

        s_comp, k = (int(os.environ.get("H3RAY_CC_COMPONENTS", "200000")), 5)
        centers = np.arange(s_comp, dtype=np.int64) * 10
        a = np.repeat(centers, k - 1)
        b = (centers[:, None] + np.arange(1, k)[None, :]).reshape(-1).astype(
            np.int64
        )
        pairs = pa.table({"a": pa.array(a), "b": pa.array(b)})
        t0 = time.perf_counter()
        out = dedup.connected_components(
            ray.data.from_arrow(pairs).repartition(NUM_CPUS), num_buckets=256
        )
        label_sum = out.sum("cluster")
        n = out.count()
        results = {"bucketed": {"nodes": n, "sec": round(time.perf_counter() - t0, 2)}}
        if os.environ.get("H3RAY_AB_CONTROL"):
            # round-4 per-key control: one Python kernel per node and per
            # edge, two map_groups scatters per round
            def seed_pairs(batch: pa.Table) -> pa.Table:
                aa = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
                bb = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
                return pa.table(
                    {"ea": pa.array(np.repeat(aa, 2)),
                     "eb": pa.array(np.repeat(bb, 2)),
                     "node": pa.array(np.stack([aa, bb], 1).reshape(-1)),
                     "label": pa.array(np.stack([aa, bb], 1).reshape(-1))}
                )

            def scatter_min(batch: pa.Table) -> pa.Table:
                lab = batch.column("label").to_numpy(zero_copy_only=False)
                return batch.set_column(
                    batch.schema.get_field_index("label"), "label",
                    pa.array(np.full(len(lab), int(lab.min()), dtype=np.int64)),
                )

            t0 = time.perf_counter()
            state = ray.data.from_arrow(pairs).repartition(NUM_CPUS).map_batches(
                seed_pairs, batch_format="pyarrow"
            )
            prev = None
            for _ in range(16):
                state = (
                    state.groupby("node")
                    .map_groups(scatter_min, batch_format="pyarrow")
                    .groupby(["ea", "eb"])
                    .map_groups(scatter_min, batch_format="pyarrow")
                    .materialize()
                )
                sm = state.sum("label")
                if sm == prev:
                    break
                prev = sm
            ctrl = state.groupby("node").min("label")
            ctrl_sum = ctrl.sum("min(label)")
            results["pergroup_control"] = {
                "nodes": ctrl.count(),
                "sec": round(time.perf_counter() - t0, 2),
            }
            assert ctrl_sum == label_sum, (ctrl_sum, label_sum)
        print(json.dumps({
            "metric": "connected components", "edges": len(a),
            "num_cpus": NUM_CPUS, **results,
        }))
    finally:
        ray.shutdown()


def run_polyfill_skew():
    """Skew-aware polyfill A/B over a heavy-tail synthetic workload
    (SURVEY §4 skew row): n-gons whose radii follow a Pareto tail, so a
    handful of geometries carry orders of magnitude more output cells
    than the median.  Compares the UNIFORM plan (one map_batches,
    fixed batch_size) against `vector.polyfill_skew_routed`'s
    complexity-tiered routing, reporting wall time and the straggler
    ratio max(task_ms)/median(task_ms) for both."""
    import numpy as np
    import pyarrow as pa
    import ray

    from h3ray import vector
    from h3ray.h3core import polyfill as polyfill_mod
    from h3ray.h3core import wkb

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        _enable_push_shuffle()
    try:
        res = int(os.environ.get("H3RAY_SKEW_RES", "6"))
        n_geoms = int(os.environ.get("H3RAY_SKEW_N", "3000"))
        rng = np.random.default_rng(11)
        # heavy-tail radii: Pareto(alpha=1.05), median ~0.03 deg, capped
        radii = np.minimum(0.03 * (1.0 + rng.pareto(1.05, n_geoms)), 4.0)
        order = rng.permutation(n_geoms)  # shuffle so heavies scatter
        radii = radii[order]
        clat = rng.uniform(-55, 55, n_geoms)
        clng = rng.uniform(-170, 170, n_geoms)
        ang = np.linspace(0, 2 * np.pi, 25)[:-1]
        geoms = []
        for i in range(n_geoms):
            ring = np.stack(
                [clng[i] + radii[i] * np.cos(ang),
                 clat[i] + radii[i] * 0.7 * np.sin(ang)], axis=1
            )
            ring = np.vstack([ring, ring[:1]])
            geoms.append(wkb.dumps_polygon([ring]))
        tbl = pa.table(
            {"gid": pa.array(np.arange(n_geoms)),
             "geometry": pa.array(geoms, type=pa.large_binary())}
        )
        ds = ray.data.from_arrow(tbl).repartition(NUM_CPUS * 2).materialize()
        ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
            _warm_kernel, batch_format="pyarrow"
        ).count()

        class TimedPolyfill:
            """One (n_cells, ms, tier) row per BATCH: measures per-task
            compute so the straggler ratio is read from data, not log
            scraping."""

            def __init__(self, resolution, tier="all"):
                self.resolution = resolution
                self.tier = tier

            def __call__(self, batch: pa.Table) -> pa.Table:
                t0 = time.perf_counter()
                _, cells = vector.wkb_to_cells(
                    batch.column("geometry").combine_chunks(), self.resolution
                )
                dt = (time.perf_counter() - t0) * 1000.0
                return pa.table(
                    {"n_cells": pa.array([len(cells)]),
                     "ms": pa.array([dt]),
                     "tier": pa.array([self.tier])}
                )

        def straggler(df):
            ms = np.sort(df["ms"].to_numpy())
            med = float(np.median(ms)) if len(ms) else 0.0
            return float(ms[-1]) / med if med > 0 else float("nan")

        split_at, grid = 8_192, 4
        tiers = ((2_048, 64), (split_at, 2))

        def split_rows(b: pa.Table) -> pa.Table:
            w = b.column("pf_weight").to_numpy(zero_copy_only=False)
            heavy = b.filter(pa.array(w >= split_at))
            gb, x0, y0, x1, y1 = [], [], [], [], []
            col = heavy.column("geometry")
            for i in range(heavy.num_rows):
                g = wkb.loads(col[i].as_py())
                for wn in polyfill_mod.polygon_split_windows(g, grid):
                    gb.append(col[i].as_py())
                    x0.append(wn[0]); y0.append(wn[1])
                    x1.append(wn[2]); y1.append(wn[3])
            return pa.table(
                {"geometry": pa.array(gb, type=pa.large_binary()),
                 "x0": pa.array(x0), "y0": pa.array(y0),
                 "x1": pa.array(x1), "y1": pa.array(y1)}
            )

        def timed_window(b: pa.Table) -> pa.Table:
            t0 = time.perf_counter()
            total = 0
            for i in range(b.num_rows):
                g = wkb.loads(b.column("geometry")[i].as_py())
                win = (b.column("x0")[i].as_py(), b.column("y0")[i].as_py(),
                       b.column("x1")[i].as_py(), b.column("y1")[i].as_py())
                total += len(
                    polyfill_mod.polygon_to_cells(g, res, clip_window=win)
                )
            dt = (time.perf_counter() - t0) * 1000.0
            return pa.table({"n_cells": pa.array([total]),
                             "ms": pa.array([dt]),
                             "tier": pa.array(["split"])})

        def routed_timed():
            est = ds.map_batches(
                lambda b: vector.polyfill_weight_kernel(b, "geometry", res),
                batch_format="pyarrow",
            )
            outs, lo = [], 0
            for hi, bs in tiers:
                def flt(lo=lo, hi=hi):
                    def k(b):
                        w = b.column("pf_weight").to_numpy(zero_copy_only=False)
                        m = (w >= lo) & (w < hi)
                        return b.filter(pa.array(m)).drop_columns(["pf_weight"])
                    return k
                outs.append(
                    est.map_batches(flt(), batch_format="pyarrow").map_batches(
                        TimedPolyfill,
                        fn_constructor_kwargs={"resolution": res,
                                               "tier": f"lt{hi}"},
                        batch_format="pyarrow", batch_size=bs,
                        concurrency=NUM_CPUS,
                    )
                )
                lo = hi
            # heaviest geometries SPLIT into grid^2 independent window
            # tasks (exact partition — vector.polyfill_skew_routed path)
            outs.append(
                est.map_batches(split_rows, batch_format="pyarrow")
                .map_batches(timed_window, batch_format="pyarrow",
                             batch_size=8)
            )
            out = outs[0]
            for o in outs[1:]:
                out = out.union(o)
            return out

        results = {}
        for name, plan in (
            ("uniform_bs64", lambda: ds.map_batches(
                TimedPolyfill, fn_constructor_kwargs={"resolution": res},
                batch_format="pyarrow", batch_size=64,
                concurrency=NUM_CPUS)),
            ("skew_routed", routed_timed),
        ):
            t0 = time.perf_counter()
            df = plan().to_pandas()
            wall = time.perf_counter() - t0
            results[name] = {
                "sec": round(wall, 3),
                "cells": int(df["n_cells"].sum()),
                "tasks": len(df),
                "max_ms": round(float(df["ms"].max()), 1),
                "median_ms": round(float(df["ms"].median()), 1),
                "straggler_ratio": round(straggler(df), 2),
                "tiers": {
                    t: {"tasks": int((df["tier"] == t).sum()),
                        "max_ms": round(float(df[df["tier"] == t]["ms"].max()), 1)}
                    for t in sorted(df["tier"].unique())
                },
            }
        # the library operator end-to-end (explode output), cell-count tie-in
        t0 = time.perf_counter()
        n_out = vector.polyfill_skew_routed(
            ds, resolution=res, tiers=tiers + ((None, 1),),
            concurrency=NUM_CPUS, split_cells=split_at, split_grid=grid,
        ).count()
        results["skew_routed_explode"] = {
            "sec": round(time.perf_counter() - t0, 3), "cells": int(n_out)
        }
        assert n_out == results["skew_routed"]["cells"] == results[
            "uniform_bs64"]["cells"]
        print(json.dumps({"metric": "polyfill skew A/B", "res": res,
                          "n_geoms": n_geoms, "num_cpus": NUM_CPUS,
                          **results}))
    finally:
        ray.shutdown()


def run_new_ops():
    """Labeled (non-headline) timings for the round-4/5 operators at
    $GRAFT_SF_DIR: each query runs through the shipped queries() plan
    and is consumed to completion (count() for Datasets; pa.Table
    results already executed).  The shuffle machinery is warmed once
    before timing (see BASELINE.md bench-warmup note)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    _enable_push_shuffle()
    try:
        from h3ray.pipelines.queries import QUERIES

        names = [
            "interval_join", "top_docs", "mode_per_group", "group_quantiles",
            "bloom_semijoin", "bloom_antijoin", "nearest_anchor",
            "ann_quantized", "quantile_sketch",
            "line_dedup", "sessionize", "session_stats", "vocab_stats",
            "term_search", "decontaminate", "group_distinct",
            # round-5 operators
            "pii_redact", "url_extract", "ring_size", "polyfill_split",
        ]

        def consume(res):
            return res.count() if hasattr(res, "count") else res.num_rows

        # warm: one small shuffle + worker spin-up outside the timed region
        consume(QUERIES["top_docs"](SF_DIR))
        out = {}
        rows = {}
        t_all = time.perf_counter()
        for name in names:
            t0 = time.perf_counter()
            rows[name] = int(consume(QUERIES[name](SF_DIR)))
            out[name] = round(time.perf_counter() - t0, 3)
        total = round(time.perf_counter() - t_all, 3)
        print(
            json.dumps(
                {
                    "metric": "non-headline operator wall time",
                    "value": total,
                    "unit": "sec",
                    "queries": out,
                    "rows": rows,
                    "sf": SF_DIR,
                    "num_cpus": NUM_CPUS,
                }
            )
        )
    finally:
        ray.shutdown()

if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        _scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--flagship" in sys.argv:
        run_flagship_sf1()
    elif "--pip-scale" in sys.argv:
        run_pip_scale()
    elif "--ts-scale" in sys.argv:
        run_ts_scale()
    elif "--ivf-recall" in sys.argv:
        run_ivf_recall()
    elif "--polyfill-skew" in sys.argv:
        run_polyfill_skew()
    elif "--lsh-scale" in sys.argv:
        run_lsh_scale()
    elif "--cc-scale" in sys.argv:
        run_cc_scale()
    elif "--vertex-scale" in sys.argv:
        run_vertex_scale()
    elif "--ops" in sys.argv:
        run_new_ops()
    else:
        run_bench()
