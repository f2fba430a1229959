"""Per-partition lineage + checkpoint/resume (the north-rule requirement).

Every finished partition of a pipeline writes its output as
``part-{key}.parquet`` plus one lineage row to a sidecar table
(``_lineage/part-{key}.parquet``) recording input fragments, cell range,
row count, checksum and wall time.  On resume, completed partition keys are
read from the sidecar and filtered OUT of the input scan *before* any work
is scheduled, so a restarted job only computes missing partitions.

The sidecar format is Parquet (the Lance-table analogue in this
environment); the schema is format-independent.
"""

from __future__ import annotations

import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LINEAGE_SCHEMA = pa.schema(
    [
        ("partition_key", pa.string()),
        ("input_fragments", pa.list_(pa.string())),
        ("cell_min", pa.uint64()),
        ("cell_max", pa.uint64()),
        ("row_count", pa.int64()),
        ("checksum", pa.uint32()),
        ("wall_ms", pa.float64()),
        ("finished_at", pa.float64()),
    ]
)


def _lineage_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "_lineage")


def completed_partitions(output_dir: str) -> set[str]:
    """Partition keys already committed (per the sidecar)."""
    d = _lineage_dir(output_dir)
    if not os.path.isdir(d):
        return set()
    done = set()
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            try:
                t = pq.read_table(os.path.join(d, f), columns=["partition_key"])
                done.update(t.column("partition_key").to_pylist())
            except OSError:
                continue
    return done


_NULL_SENTINEL = np.uint64(0x9AE16A3B2F90404F)
_MIX_MULT = np.uint64(0xFF51AFD7ED558CCD)


def _mix64(h: np.ndarray) -> np.ndarray:
    """Murmur3-style finalizer: breaks the linearity of the additive
    cross-row fold so per-row hash collisions can't cancel."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= _MIX_MULT
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _column_row_hashes(col) -> np.ndarray:
    """uint64 hash per row of one column, vectorized for the hot schemas
    (no to_pylist on strings/binaries/lists/structs/fixed-width).

    Strings/binaries hash their UTF-8 bytes (FNV-1a over the flat buffer);
    list columns hash their children's row hashes per PHYSICAL segment
    (``.values`` + raw offsets, gathered — correct even for non-canonical
    layouts where a null slot spans child values, which ``flatten()``
    would silently drop, misaligning every later row); structs fold their
    field hashes like table_checksum folds columns; dictionary decodes and
    recurses; fixed-size lists recurse through large_list.  Remaining
    exotic types (decimal, map, union, ...) fall back to a per-row repr
    fold — correctness over speed, and only off the hot path.  Nulls map
    to a sentinel."""
    from .functions._strkern import fnv1a_segments, utf8_view

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_dictionary(t):
        return _column_row_hashes(col.dictionary_decode())
    if pa.types.is_fixed_size_list(t):
        return _column_row_hashes(col.cast(pa.large_list(t.value_type)))
    null_mask = None
    if col.null_count:
        null_mask = col.is_null().to_numpy(zero_copy_only=False)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(
        t
    ) or pa.types.is_large_binary(t):
        data, off = utf8_view(col)
        h = fnv1a_segments(data, off)
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        # .offsets are physical indexes into the FULL child (.values);
        # gather each row's child hashes explicitly so null slots that
        # span values (legal Arrow) cannot shift later rows' segments
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ch = _column_row_hashes(col.values)
        starts = offs[:-1]
        lengths = np.diff(offs)
        if null_mask is not None:
            lengths = lengths.copy()
            lengths[null_mask] = 0  # content is irrelevant: sentinel below
        total = int(lengths.sum())
        idx = np.repeat(starts, lengths) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lengths) - lengths, lengths)
        )
        seq = ch[idx]
        off2 = np.zeros(len(col) + 1, dtype=np.int64)
        np.cumsum(lengths * 8, out=off2[1:])
        h = fnv1a_segments(seq.astype("<u8").view(np.uint8), off2)
    elif pa.types.is_struct(t):
        # same fold as table_checksum uses across columns
        h = np.full(len(col), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        with np.errstate(over="ignore"):
            for i in range(t.num_fields):
                h = h ^ _mix64(
                    _column_row_hashes(col.field(i))
                    + np.uint64(zlib.crc32(t.field(i).name.encode()))
                )
                h = h * prime
    elif pa.types.is_boolean(t):
        if col.null_count:
            import pyarrow.compute as pc

            col = pc.fill_null(col, False)
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _mix64(v + np.uint64(0x1D))
    else:
        # fixed-width (ints, floats, temporal): raw bytes per row
        if col.null_count:
            import pyarrow.compute as pc

            col = pc.fill_null(col, pa.scalar(0, type=t))
        v = np.ascontiguousarray(col.to_numpy(zero_copy_only=False))
        if v.dtype == object:
            # exotic scalar types (decimal, interval, ...): per-row fold
            h = np.fromiter(
                (zlib.crc32(repr(x).encode()) for x in v),
                dtype=np.uint64, count=len(v),
            )
            h = _mix64(h + np.uint64(0x51))
        else:
            w = v.dtype.itemsize
            if w <= 8:
                # one 64-bit lane per row: reinterpret the raw bits unsigned
                # (float NaN payloads and -0.0 vs 0.0 stay distinguishable,
                # matching bytewise semantics) and mix once — no byte loop.
                u = v.view(f"u{w}").astype(np.uint64)
                h = _mix64(u + np.uint64(w))
            else:
                off = np.arange(len(col) + 1, dtype=np.int64) * w
                h = fnv1a_segments(v.view(np.uint8), off)
    if null_mask is not None:
        h = h.copy()
        h[null_mask] = _NULL_SENTINEL
    return h


def table_checksum(table: pa.Table) -> int:
    """Order-insensitive 32-bit checksum, vectorized end-to-end: per-column
    uint64 row hashes (FNV over raw Arrow buffers — no ``to_pylist``),
    FNV-combined across columns in sorted-name order, finalizer-mixed, then
    summed mod 2^64 across rows (the commutative fold makes it
    row-order-insensitive, so repartitioned retries commit identical
    checksums).  Keeps the uint32 sidecar schema via a 64->32 fold."""
    if table.num_rows == 0:
        return 0
    acc = np.full(table.num_rows, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for name in sorted(table.column_names):
            acc ^= _mix64(
                _column_row_hashes(table.column(name))
                + np.uint64(zlib.crc32(name.encode()))
            )
            acc *= prime
        total = int(np.sum(_mix64(acc), dtype=np.uint64))
    return (total ^ (total >> 32)) & 0xFFFFFFFF


def commit_partition(
    output_dir: str,
    partition_key: str,
    table: pa.Table,
    input_fragments: list[str],
    wall_ms: float,
    cell_col: str = "cell",
) -> None:
    """Atomically commit one partition: data file first, sidecar row last
    (the sidecar row is the commit record; a crash in between leaves an
    orphan data file that is simply overwritten on retry)."""
    os.makedirs(output_dir, exist_ok=True)
    os.makedirs(_lineage_dir(output_dir), exist_ok=True)
    data_path = os.path.join(output_dir, f"part-{partition_key}.parquet")
    tmp = data_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, data_path)
    if cell_col in table.column_names and table.num_rows:
        cells = table.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        cmin, cmax = int(cells.min()), int(cells.max())
    else:
        cmin = cmax = 0
    row = pa.table(
        {
            "partition_key": pa.array([partition_key]),
            "input_fragments": pa.array([input_fragments], type=pa.list_(pa.string())),
            "cell_min": pa.array([cmin], type=pa.uint64()),
            "cell_max": pa.array([cmax], type=pa.uint64()),
            "row_count": pa.array([table.num_rows], type=pa.int64()),
            "checksum": pa.array([table_checksum(table)], type=pa.uint32()),
            "wall_ms": pa.array([wall_ms]),
            "finished_at": pa.array([time.time()]),
        },
        schema=LINEAGE_SCHEMA,
    )
    side_path = os.path.join(_lineage_dir(output_dir), f"part-{partition_key}.parquet")
    tmp = side_path + ".tmp"
    pq.write_table(row, tmp)
    os.replace(tmp, side_path)


def run_partitioned(
    fragments: list[str],
    output_dir: str,
    kernel,
    partition_key_of=None,
    read_columns=None,
):
    """Resumable fragment-parallel pipeline: each input parquet fragment is
    one partition; completed partitions (per the sidecar) are skipped before
    scheduling.  ``kernel`` maps a pa.Table -> pa.Table.

    Runs the per-partition work as Ray tasks over the *remaining* fragments
    (a Dataset would also work; explicit tasks make the partition->commit
    mapping exact, which is what resumability needs)."""
    import ray

    if partition_key_of is None:
        partition_key_of = lambda frag: os.path.splitext(os.path.basename(frag))[0]

    done = completed_partitions(output_dir)
    todo = [f for f in fragments if partition_key_of(f) not in done]

    @ray.remote
    def _work(frag: str):
        t0 = time.perf_counter()
        table = pq.read_table(frag, columns=read_columns)
        out = kernel(table)
        wall = (time.perf_counter() - t0) * 1000.0
        commit_partition(output_dir, partition_key_of(frag), out, [frag], wall)
        return partition_key_of(frag), out.num_rows

    results = ray.get([_work.remote(f) for f in todo])
    return {
        "completed_before": len(done),
        "computed_now": len(results),
        "results": results,
    }


def read_output(output_dir: str) -> pa.Table:
    files = [
        os.path.join(output_dir, f)
        for f in sorted(os.listdir(output_dir))
        if f.endswith(".parquet") and f.startswith("part-")
    ]
    return pa.concat_tables([pq.read_table(f) for f in files])
