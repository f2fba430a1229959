"""Driver-contract query pipelines and their DuckDB oracles.

Each ``q_*`` function takes an ``sf_dir`` and returns a Ray Dataset /
pyarrow Table; ``ORACLE_SQL`` holds the ANSI-SQL equivalent DuckDB runs on
the same parquet tables.  Column names match exactly (the driver hashes
values after sorting columns by name).

H3 cell *construction* is SQL-expressible via bit arithmetic when the cell
is built from integer columns, so the bit-op operator family (resolution,
parent, validity, strings, children, compact) gets full value-level
oracles.  The geometry family (latlng->cell encode, PIP join) is oracled
through exact planar semantics: the flagship q_pip_join's H3 cover+refine
must reproduce a plain SQL BETWEEN join bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..h3core import bits, faceijk
from .. import corpus as corpus_mod
from .. import join as join_mod
from .. import kernels

# ten non-pentagon base cells used for constructed cells
_BASES = [0, 1, 2, 3, 5, 6, 7, 8, 9, 10]
_BASES_SQL = "[" + ",".join(str(b) for b in _BASES) + "]"

# SQL fragment building the same uint64 cell as _construct_cells (res 5)
_CELL_SQL = f"""(
    (CAST(1 AS BIGINT) << 59)
    | (CAST(5 AS BIGINT) << 52)
    | (CAST(list_extract({_BASES_SQL}, 1 + CAST(event_id % 10 AS INTEGER)) AS BIGINT) << 45)
    | (CAST((event_id * 3) % 7 AS BIGINT) << 42)
    | (CAST((event_id * 4) % 7 AS BIGINT) << 39)
    | (CAST((event_id * 5) % 7 AS BIGINT) << 36)
    | (CAST((event_id * 6) % 7 AS BIGINT) << 33)
    | (CAST((event_id * 7) % 7 AS BIGINT) << 30)
    | (CAST((CAST(1 AS BIGINT) << 30) - 1 AS BIGINT))
)"""


def _construct_cells(event_id: np.ndarray) -> np.ndarray:
    """Deterministic valid res-5 cells from integer ids (numpy twin of
    _CELL_SQL)."""
    eid = event_id.astype(np.uint64)
    base = np.array(_BASES, dtype=np.uint64)[(eid % 10).astype(np.int64)]
    h = (
        (np.uint64(1) << np.uint64(59))
        | (np.uint64(5) << np.uint64(52))
        | (base << np.uint64(45))
        | (((eid * np.uint64(3)) % np.uint64(7)) << np.uint64(42))
        | (((eid * np.uint64(4)) % np.uint64(7)) << np.uint64(39))
        | (((eid * np.uint64(5)) % np.uint64(7)) << np.uint64(36))
        | (((eid * np.uint64(6)) % np.uint64(7)) << np.uint64(33))
        | (((eid * np.uint64(7)) % np.uint64(7)) << np.uint64(30))
        | np.uint64((1 << 30) - 1)
    )
    return h


def _events(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])


def _with_cells(batch: pa.Table) -> pa.Table:
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    cells = _construct_cells(eid)
    return batch.append_column("cell", pa.array(cells.astype(np.int64)))


# --- bit-op family (full value oracles) -------------------------------------


def q_cells_resolution(sf_dir: str):
    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        res = bits.get_resolution(cells).astype(np.int64)
        return batch.append_column("resolution", pa.array(res))

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_cells_parent_agg(sf_dir: str):
    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        parent = bits.cell_to_parent(cells, np.uint64(2)).astype(np.int64)
        return pa.table({"parent": pa.array(parent)})

    ds = _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby("parent").count()
    return out.map_batches(
        lambda b: b.rename_columns(["parent", "n"]),
        batch_format="pyarrow",
    )


def q_cells_valid(sf_dir: str):
    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        built = _construct_cells(eid)
        mixed = np.where(eid % 2 == 0, built, eid.astype(np.uint64))
        valid = bits.is_valid_cell(mixed)
        return pa.table(
            {"event_id": batch.column("event_id"), "valid": pa.array(valid)}
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_cells_to_string(sf_dir: str):
    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = bits.to_hex_strings(cells)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "cell_str": pa.array(s.tolist(), type=pa.string()),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_children_explode(sf_dir: str):
    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        t = kernels.change_resolution(batch, 6)
        c = t.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"), "cell": pa.array(c)})

    ds = _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def q_compact_invariant(sf_dir: str):
    """children(cells,6) -> distinct -> compact == distinct input cells."""

    def expand(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        return kernels.change_resolution(batch.select(["cell"]), 6)

    ds = _events(sf_dir).map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    # distinct children, then a single compact group (constructed cells span
    # 10 base cells; at sf scale this is small -- the large-scale path goes
    # through groupby(base cell), exercised in tests/test_ray_layer.py)
    distinct = ds.groupby("cell").count().drop_columns(["count()"])

    def compact_k(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        from ..h3core import hierarchy

        out = hierarchy.compact(np.unique(cells), mixed_resolutions=True)
        return pa.table({"cell": pa.array(out.astype(np.int64))})

    return distinct.repartition(1).map_batches(
        compact_k, batch_format="pyarrow", zero_copy_batch=True
    )


def q_disk_size(sf_dir: str):
    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = (
            batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        from ..h3core import traversal

        rows, disk, dist = traversal.grid_disk_distances(cells, 1)
        n = np.bincount(rows, minlength=len(batch)).astype(np.int64)
        return pa.table({"event_id": batch.column("event_id"), "disk_n": pa.array(n)})

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


# --- geometry family --------------------------------------------------------


def event_lat(eid: np.ndarray) -> np.ndarray:
    return ((eid * 37) % 16000) / 100.0 - 80.0


def event_lng(eid: np.ndarray) -> np.ndarray:
    return ((eid * 73) % 36000) / 100.0 - 180.0


def nation_rects(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    nk = t.column("n_nationkey").to_numpy().astype(np.int64)
    lat0 = (nk * 11 % 140) - 70
    lat1 = lat0 + 9
    lng0 = (nk * 29 % 340) - 170
    lng1 = lng0 + 13
    return nk, lng0.astype(np.float64), lat0.astype(np.float64), lng1.astype(
        np.float64
    ), lat1.astype(np.float64)


def q_pip_join(sf_dir: str):
    """Flagship: H3 cover + cell equi-join + exact refine == SQL BETWEEN."""
    nk, lng0, lat0, lng1, lat1 = nation_rects(sf_dir)
    lookup = join_mod.RectLookup(nk, lng0, lat0, lng1, lat1, res=3)
    lookup_ref = ray.put(lookup)

    def add_coords(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        batch = batch.append_column("lat", pa.array(event_lat(eid)))
        return batch.append_column("lng", pa.array(event_lng(eid)))

    refine = join_mod.make_pip_refine_kernel(
        lookup_ref, id_cols=("event_id",), rect_id_col="rect_id"
    )

    def cast_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "rect_id": batch.column("rect_id").cast(pa.int64()),
            }
        )

    return (
        _events(sf_dir)
        .map_batches(add_coords, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(cast_out, batch_format="pyarrow", zero_copy_batch=True)
    )


def q_latlng_cells(sf_dir: str):
    """Value-oracled res-7 encode of synthesized event coordinates, via the
    constant-invariant pattern (disk_agg_totals precedent): every encoded
    cell must be valid, at resolution 7, and stable under the
    centroid-re-encode roundtrip (cell_to_latlng -> latlng_to_cell returns
    the same cell — exercising decode+encode per row).  SQL reproduces the
    three invariant columns; the absolute cell values are anchored by the
    pip_join BETWEEN-join oracle (same encode path) and pytest goldens."""

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cells = faceijk.latlng_to_cell(event_lat(eid), event_lng(eid), 7)
        lat_c, lng_c = faceijk.cell_to_latlng(cells)
        rt = faceijk.latlng_to_cell(lat_c, lng_c, 7)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "res": pa.array(bits.get_resolution(cells).astype(np.int64)),
                "valid": pa.array(bits.is_valid_cell(cells)),
                "roundtrip_ok": pa.array(rt == cells),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


# --- corpus / text family ---------------------------------------------------


def q_corpus_structure(sf_dir: str):
    def k(batch: pa.Table) -> pa.Table:
        t = corpus_mod.interleave_documents(batch)
        spans = t.column("spans")
        n_spans = pa.compute.list_value_length(spans)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_spans": n_spans.cast(pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_corpus_geo_cells(sf_dir: str):
    """Value-oracled full interleaved pipeline: corpus -> geo spans ->
    coordinate cells_parse -> encode, then each cell is round-tripped
    through the HEX spelling of cells_parse (to_hex_strings -> parse must
    return the identical cell) — so both parse paths and the string kernel
    run per row.  SQL reproduces the synthesized resolution (5 + doc_id%4),
    validity, and the roundtrip invariant; absolute cell values are
    anchored by corpus_geo_res + the flagship BETWEEN oracle."""

    def k(batch: pa.Table) -> pa.Table:
        docs = corpus_mod.interleave_documents(batch)
        geo = corpus_mod.extract_geo_spans(docs)
        parsed = kernels.cells_parse(geo, "geo_text")
        cells = parsed.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        hexes = bits.to_hex_strings(cells)
        reparsed = kernels.cells_parse(
            pa.table({"s": pa.array(hexes.tolist(), type=pa.string())}), "s"
        )
        rt = reparsed.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "doc_id": parsed.column("doc_id"),
                "res": pa.array(bits.get_resolution(cells).astype(np.int64)),
                "valid": pa.array(bits.is_valid_cell(cells)),
                "hex_roundtrip_ok": pa.array(rt == cells),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_exact_dedup(sf_dir: str):
    """Exact dedup keyed on a u64 FINGERPRINT of the text, not the raw
    text: at 100 TB a `groupby(text)` ships full document bytes as the
    exchange/sort key; hashing first moves 8 bytes per doc through the
    shuffle instead.  Distinct texts colliding on FNV-64 is ~n^2/2^65 —
    negligible at any corpus size this engine targets (and the SQL twin
    still groups by text, so a collision would surface as a hash
    mismatch, never silently)."""
    from ..functions.text import hash_u64_batch

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fp": pa.array(
                    hash_u64_batch(batch.column("text")).astype(np.int64)
                ),
                "doc_id": batch.column("doc_id"),
            }
        )

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fp")
        .aggregate(ray.data.aggregate.Min("doc_id"), ray.data.aggregate.Count())
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "first_doc_id": batch.column("min(doc_id)"),
                "n": batch.column("count()").cast(pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def q_text_stats(sf_dir: str):
    import pyarrow.compute as pc

    def k(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.utf8_length(text).cast(pa.int64()),
                "n_spaces": pc.count_substring(text, " ").cast(pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


# --- oracle SQL -------------------------------------------------------------

ORACLE_SQL = {
    "cells_resolution": f"""
        SELECT event_id, {_CELL_SQL} AS cell,
               ({_CELL_SQL} >> 52) & 15 AS resolution
        FROM events
    """,
    "cells_parent_agg": f"""
        SELECT (({_CELL_SQL} & ~(CAST(15 AS BIGINT) << 52)) | (CAST(2 AS BIGINT) << 52))
               | ((CAST(1 AS BIGINT) << 39) - 1) AS parent,
               COUNT(*) AS n
        FROM events GROUP BY 1
    """,
    "cells_valid": f"""
        SELECT event_id, (event_id % 2 = 0) AS valid FROM events
    """,
    "cells_to_string": f"""
        SELECT event_id, printf('%x', {_CELL_SQL}) AS cell_str FROM events
    """,
    "children_explode": f"""
        SELECT event_id,
               (({_CELL_SQL} & ~(CAST(15 AS BIGINT) << 52)) | (CAST(6 AS BIGINT) << 52))
               & ~(CAST(7 AS BIGINT) << 27) | (CAST(d AS BIGINT) << 27) AS cell
        FROM events, (SELECT unnest(range(7)) AS d)
    """,
    "compact_invariant": f"""
        SELECT DISTINCT {_CELL_SQL} AS cell FROM events
    """,
    "disk_size": """
        SELECT event_id, CAST(7 AS BIGINT) AS disk_n FROM events
    """,
    "pip_join": """
        SELECT e.event_id, CAST(n.n_nationkey AS BIGINT) AS rect_id
        FROM events e, nation n
        WHERE ((e.event_id * 37) % 16000) / 100.0 - 80.0
                  BETWEEN (n.n_nationkey * 11 % 140) - 70
                      AND (n.n_nationkey * 11 % 140) - 70 + 9
          AND ((e.event_id * 73) % 36000) / 100.0 - 180.0
                  BETWEEN (n.n_nationkey * 29 % 340) - 170
                      AND (n.n_nationkey * 29 % 340) - 170 + 13
    """,
    "corpus_structure": """
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               CAST(4 + CASE WHEN length(text) > 200 THEN 1 ELSE 0 END AS BIGINT)
                   AS n_spans
        FROM documents
    """,
    "exact_dedup": """
        SELECT min(doc_id) AS first_doc_id, COUNT(*) AS n
        FROM documents GROUP BY text
    """,
    "text_stats": """
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
                   AS n_spaces
        FROM documents
    """,
}


QUERIES = {
    "cells_resolution": q_cells_resolution,
    "cells_parent_agg": q_cells_parent_agg,
    "cells_valid": q_cells_valid,
    "cells_to_string": q_cells_to_string,
    "children_explode": q_children_explode,
    "compact_invariant": q_compact_invariant,
    "disk_size": q_disk_size,
    "pip_join": q_pip_join,
    "latlng_cells": q_latlng_cells,
    "corpus_structure": q_corpus_structure,
    "corpus_geo_cells": q_corpus_geo_cells,
    "exact_dedup": q_exact_dedup,
    "text_stats": q_text_stats,
}


# --- extended operator families (round 1 additions) -------------------------


def q_text_quality(sf_dir: str):
    from ..functions import text as text_fns

    def k(batch: pa.Table) -> pa.Table:
        t = text_fns.token_stats(batch)
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_tokens_ws": t.column("n_tokens_ws")}
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_lang_quality(sf_dir: str):
    """Value-oracled language guess + quality features: the stopword-
    profile guess reuses the proven lang_id DuckDB twin, and the quality
    score's integer feature layer (chars, alpha+space, punct, words, word
    chars) plus the decile bucket of the float score are reproduced by SQL
    regex/arithmetic twins mirroring the kernel's exact IEEE op order
    (divide-then-scale, left-associated weighted sum, floor bucket)."""
    from ..functions import text as text_fns

    def k(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = text_fns.language_id(batch)
        t = text_fns.quality_score(t, counts=True)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang_guess": t.column("lang_guess"),
                "n_chars": pc.utf8_length(
                    pc.fill_null(t.column("text"), "")
                ).cast(pa.int64()),
                "n_alpha_space": t.column("n_alpha_space"),
                "n_punct": t.column("n_punct"),
                "n_words": t.column("n_words"),
                "word_chars": t.column("word_chars"),
                "quality_bucket": pa.array(
                    (t.column("quality").to_numpy(zero_copy_only=False) * 10).astype(
                        np.int64
                    )
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_lang_id(sf_dir: str):
    """Value-oracled language heuristic: the stopword-profile guess is
    reproduced exactly by a DuckDB twin (split + VALUES profile join +
    window tie-break matching the kernel's dict-order strict-> rule)."""
    from ..functions import text as text_fns

    def k(batch: pa.Table) -> pa.Table:
        t = text_fns.language_id(batch)
        return t.select(["doc_id", "lang_guess"])

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def _with_planted_dups(batch: pa.Table) -> pa.Table:
    """Corpus + deterministic planted exact duplicates: every doc with
    doc_id % 10 == 0 is re-added under doc_id + 1000000.  The corpus has no
    natural exact-duplicate texts, so the plant gives the dedup pipelines a
    nonzero, SQL-reproducible answer (the reference test strategy: plant,
    then find)."""
    import pyarrow.compute as pc

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    dup = batch.filter(pa.array(ids % 10 == 0))
    dup = dup.set_column(
        dup.schema.get_field_index("doc_id"),
        "doc_id",
        pc.add(dup.column("doc_id"), 1000000),
    )
    return pa.concat_tables([batch, dup])


_PLANTED_SQL = """
            WITH docs2 AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text
              FROM documents WHERE doc_id % 10 = 0
            )
"""


def q_minhash_pairs(sf_dir: str):
    """Value-oracled MinHash-LSH dedup over a planted-duplicate corpus:
    signatures -> 16 band buckets -> within-bucket all pairs ->
    exact-verify by full-text hash -> distinct.  Identical texts share
    every band bucket (recall 1 for the exact tier), and the verify stage
    drops near-dup-but-unequal candidates, so the emitted pair set equals
    the SQL self-join on text over the same planted corpus.  This is the
    LSH candidate->verify pipeline with the verify tier set to exact; the
    near-dup (Jaccard-threshold) tier is exercised in pytest
    (test_minhash_finds_planted_dups).

    Both exchanges are BUCKETED (hash(band, band_hash) % 64 for the
    candidate stage, hash(a, b) % 64 for the distinct stage): one
    vectorized lexsort/run kernel per hash bucket instead of one Python
    kernel per LSH group / per pair — per-group parity is pytest-anchored
    (test_bucketed_lsh_parity)."""
    from ..functions import dedup as dedup_fns
    from ..functions.text import hash_u64_batch

    def sig(batch: pa.Table) -> pa.Table:
        batch = _with_planted_dups(batch)
        t = dedup_fns.minhash_signatures(batch)
        t = t.append_column(
            "text_hash",
            pa.array(hash_u64_batch(batch.column("text")).astype(np.int64)),
        )
        t = dedup_fns.minhash_bands(t, 16, "doc_id", extra_cols=("text_hash",))
        return dedup_fns.with_band_bucket(t)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = (
        ds.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(dedup_fns.exact_pairs_bucketed, batch_format="pyarrow")
    )
    return dedup_fns.distinct_pairs_ds(pairs)


_JACCARD_TAIL = " planted near duplicate tail for jaccard verification"


def q_jaccard_verify(sf_dir: str):
    """Value-oracled EXACT n-gram Jaccard verification (the verify tier of
    the LSH dedup pipelines, run here over a deterministic candidate set
    so SQL can reproduce it): every doc with doc_id %% 10 == 0 gets a
    planted NEAR-duplicate (same text + a fixed tail) at doc_id + 1000000;
    candidates are (d, d+1000000) near-pairs plus (d, d+10) unrelated
    control pairs (d < 490 so both ends exist at every sf).  verify_pairs
    attaches both texts via groupby scatters and computes exact 5-gram set
    intersection/union per pair — the corpus is pure ASCII, so the byte
    5-gram hash sets match SQL's DISTINCT substring(text, i, 5) sets
    cardinality-for-cardinality.  Output: (a, b, inter, union_size) ints."""
    import pyarrow.compute as pc

    from ..functions import dedup as dedup_fns

    def docs_with_near_dups(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        # contract guard: the SQL twin's gram set is EMPTY for texts
        # shorter than the shingle (engine pads to one shingle) — fail
        # loudly instead of silently diverging if the corpus ever changes
        min_len = _pc.min(_pc.binary_length(batch.column("text"))).as_py()
        if min_len is not None and min_len < 5:
            raise ValueError(
                "jaccard_verify oracle requires every doc text >= 5 bytes "
                f"(shingle size); corpus has a {min_len}-byte text"
            )
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dup = batch.filter(pa.array(ids % 10 == 0))
        dup = dup.set_column(
            dup.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(dup.column("doc_id"), 1000000),
        )
        dup = dup.set_column(
            dup.schema.get_field_index("text"),
            "text",
            pc.binary_join_element_wise(
                dup.column("text"), pa.scalar(_JACCARD_TAIL), ""
            ),
        )
        return pa.concat_tables([batch, dup])

    def mk_pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sel = ids[ids % 10 == 0]
        ctrl = sel[sel < 490]
        return pa.table(
            {
                "a": pa.array(np.concatenate([sel, ctrl])),
                "b": pa.array(np.concatenate([sel + 1000000, ctrl + 10])),
            }
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(docs_with_near_dups, batch_format="pyarrow",
                  zero_copy_batch=True)
    pairs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(mk_pairs, batch_format="pyarrow", zero_copy_batch=True)
    out = dedup_fns.verify_pairs(pairs, docs, threshold=0.0)
    return out.map_batches(
        lambda b: b.select(["a", "b", "inter", "union_size"]),
        batch_format="pyarrow",
    )


def q_doc_chunks(sf_dir: str):
    """Value-oracled document chunking (the standard LLM pre-tokenization
    window split): fixed 200-char chunks with 20-char overlap, exploded
    per doc; the SQL twin reproduces every chunk's TEXT with substr over a
    generate-range of the same chunk-count formula — a full content-level
    oracle of the jagged slicing kernel."""
    from ..functions import sampling

    def k(batch: pa.Table) -> pa.Table:
        return sampling.chunk_documents(batch, size=200, overlap=20)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_sample(sf_dir: str):
    """Value-oracled deterministic stratified sampling (data-mixing
    weights): multiplicative-hash keep-rule with per-source rates (0.5 for
    src0-src9, 0.2 otherwise) — the SQL twin computes the identical
    32-bit Knuth hash arithmetic, so the sampled id set matches exactly
    and is invariant to partitioning / cluster size."""
    from ..functions import sampling

    rates = {f"src{i}": 0.5 for i in range(10)}

    def k(batch: pa.Table) -> pa.Table:
        out = sampling.hash_sample(
            batch, rates, key_col="doc_id", stratum_col="source",
            default_rate=0.2,
        )
        return out.select(["doc_id", "source"])

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_cell_cardinality(sf_dir: str):
    """Value-oracled streaming COUNT DISTINCT: the exact count comes from
    the groupby shuffle; the HyperLogLog sketch (fixed 4 KiB partial per
    block, elementwise-max merge, NO key shuffle) must agree within 5% —
    the 100 TB plan for cardinality probes (e.g. sizing a dedup shuffle
    before running it).  SQL reproduces the exact count via
    COUNT(DISTINCT _CELL_SQL) and the sketch-accuracy flag as TRUE."""
    from ..functions import sampling

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(_construct_cells(eid))})

    ds = _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)
    exact = ds.groupby("cell").count().count()
    est = sampling.hll_count_distinct(ds, "cell")
    ok = abs(est - exact) / max(exact, 1) <= 0.05
    return pa.table(
        {
            "n_distinct": pa.array([int(exact)], type=pa.int64()),
            "hll_within_5pct": pa.array([bool(ok)]),
        }
    )


def q_seq_pack(sf_dir: str):
    """Value-oracled sequence packing via a DISTRIBUTED PREFIX SUM: docs
    concatenated in doc_id order (one separator char apart) and cut into
    512-char training windows; each doc's (start_seq, end_seq, n_seqs)
    span depends on the exact global offset — bucket partial sums, a tiny
    driver scan of bucket bases, then per-bucket local cumsums.  The SQL
    twin is the straight window-function prefix sum."""
    from ..functions import sampling

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return sampling.pack_sequence_spans(ds, seq_len=512, bucket_size=100)


def q_dedup_clusters(sf_dir: str):
    """Value-oracled near-dup clustering — the step AFTER pair generation
    in a production dedup pipeline: exact-tier LSH pairs over the
    planted-duplicate corpus feed the distributed connected-components
    operator (join-free hash-to-min label propagation, 2 groupby scatters
    per round), and every document's cluster id must equal the smallest
    doc_id sharing its text — the SQL window twin over the same planted
    corpus.  Multi-hop convergence is pytest-anchored on a chain graph
    (test_connected_components_chain)."""
    from ..functions import dedup as dedup_fns

    pairs = q_minhash_pairs(sf_dir)

    def nodes_k(batch: pa.Table) -> pa.Table:
        batch = _with_planted_dups(batch)
        return pa.table({"node": batch.column("doc_id").cast(pa.int64())})

    nodes = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(nodes_k, batch_format="pyarrow", zero_copy_batch=True)
    return dedup_fns.connected_components(pairs, nodes)


def q_simhash_bands(sf_dir: str):
    """Value-oracled SimHash blocking over the planted-duplicate corpus:
    signatures -> 4x16-bit band buckets -> per-doc count of exact-text
    bucket mates, summed over bands.  Identical texts have identical
    simhash, hence co-bucket in all 4 bands: every doc's total equals
    4 * (its text-group size - 1) — the SQL window twin.  The candidate
    exchange is BUCKETED on hash(band, band_hash) % 64 — one vectorized
    run kernel per hash bucket, not one per LSH group."""
    from ..functions import dedup as dedup_fns
    from ..functions.text import hash_u64_batch

    def k(batch: pa.Table) -> pa.Table:
        batch = _with_planted_dups(batch)
        t = dedup_fns.simhash_signatures(batch)
        t = t.append_column(
            "text_hash",
            pa.array(hash_u64_batch(batch.column("text")).astype(np.int64)),
        )
        t = dedup_fns.simhash_bands(t, extra_cols=("text_hash",))
        return dedup_fns.with_band_bucket(t)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    mates = (
        ds.map_batches(k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(dedup_fns.exact_mates_bucketed, batch_format="pyarrow")
    )
    out = mates.groupby("doc_id").sum("n_mates")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_exact_band_mates": batch.column("sum(n_mates)").cast(pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def q_embedding_dup_pairs(sf_dir: str):
    """Value-oracled embedding near-dup join: with ``planes=0`` every
    vector shares one LSH bucket, the bucket is hot, and the triangle
    salting turns the verify stage into an EXACT distributed all-pairs
    cosine block join (each unordered pair computed exactly once across
    hot_parts*(hot_parts+1)/2 tasks) — reproducible in SQL via
    list_cosine_similarity.  The approximate (planes>0) tier is pytest-
    anchored (test_embedding_dedup_pipeline_with_hot_bucket)."""
    import shutil
    import tempfile

    from ..functions import dedup as dedup_fns

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ckpt = tempfile.mkdtemp(prefix="h3ray_embdedup_")
    try:
        pairs = dedup_fns.embedding_dedup_pipeline(
            ds, planes=0, threshold=0.3, hot_threshold=64, hot_parts=4,
            checkpoint_dir=ckpt,
        )

        def strip(batch: pa.Table) -> pa.Table:
            return batch.select(["a", "b"])

        out = pairs.map_batches(strip, batch_format="pyarrow").materialize()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def _query_vectors(sf_dir: str, n: int):
    """The first ``n`` (vec_id, embedding) rows via a BOUNDED driver read:
    only the first parquet row group, only the two needed columns — the
    driver never holds the full embeddings table (at 100 TB the query
    slice is the only thing that may sit on the driver)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    t = pf.read_row_group(0, columns=["vec_id", "embedding"])
    if t.num_rows < n:  # tiny files: append row groups until n rows
        parts = [t]
        g = 1
        while sum(p.num_rows for p in parts) < n and g < pf.num_row_groups:
            parts.append(pf.read_row_group(g, columns=["vec_id", "embedding"]))
            g += 1
        t = pa.concat_tables(parts)
    t = t.slice(0, n)
    flat = t.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    dim = len(flat) // t.num_rows
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    return ids, flat.reshape(t.num_rows, dim)


def _embeddings_ds(sf_dir: str):
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def q_ann_top1(sf_dir: str):
    """Brute-force cosine top-1 for the first 20 vectors: each query's best
    match must be itself (full value oracle)."""
    from ..functions import ann as ann_fns

    ids, Q = _query_vectors(sf_dir, 20)
    top = ann_fns.bruteforce_topk(_embeddings_ds(sf_dir), ids, Q, k=1)
    return pa.table(
        {
            "query_id": top.column("query_id"),
            "vec_id": top.column("vec_id"),
        }
    )


def q_ann_topk(sf_dir: str):
    """Value-oracled brute-force top-5 neighbors of 10 queries: the SQL
    twin recomputes every cosine with DuckDB's list_cosine_similarity and
    ranks with the same deterministic tie-break (cosine DESC, vec_id ASC)
    the merge kernel uses; only integer columns are compared.  Both sides
    accumulate in float64, so rank order agrees unless two distinct
    neighbors tie within ~1 ulp (never in this corpus — asserted by
    tools/check_oracles at sf0.001/0.01/0.1)."""
    from ..functions import ann as ann_fns

    ids, Q = _query_vectors(sf_dir, 10)
    top = ann_fns.bruteforce_topk(_embeddings_ds(sf_dir), ids, Q, k=5)
    return pa.table(
        {
            "query_id": top.column("query_id"),
            "vec_id": top.column("vec_id"),
            "rank": top.column("rank"),
        }
    )


def q_ann_ivf(sf_dir: str):
    """IVF ANN through a PERSISTED bucket-partitioned index: build once
    (write_parquet partitioned by ivf_bucket), then self-query the first 20
    vectors reading only the probed bucket directories.  Self top-1 must be
    the query itself (full value oracle); I/O pruning asserted in pytest."""
    import tempfile

    from ..functions import ann as ann_fns

    # centroid training uses a BOUNDED sample (first row groups, pruned
    # columns) — at scale this would be a Dataset.random_sample pulled
    # once; self-top-1 correctness is centroid-independent because a
    # query's own bucket is always among its probes.
    sample_ids, S = _query_vectors(sf_dir, 2048)
    cent = ann_fns.train_centroids(S[:: max(1, len(S) // 256)], 16)
    index_dir = tempfile.mkdtemp(prefix="h3ray_ivf_")
    try:
        ann_fns.ivf_build(_embeddings_ds(sf_dir), cent, index_dir)
        ids, Q = sample_ids[:20], S[:20]
        # ivf_topk_partitioned materializes its result, so the scratch
        # index can be removed before returning
        top, _ = ann_fns.ivf_topk_partitioned(index_dir, ids, Q, cent, k=1)
    finally:
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
    return pa.table(
        {"query_id": top.column("query_id"), "vec_id": top.column("vec_id")}
    )


def q_ivf_recall(sf_dir: str):
    """Recall@k metric for the IVF index, value-oracled through its
    exhaustive-probe invariant: with n_probe = n_centroids every bucket
    is searched, so IVF must recover the brute-force top-k EXACTLY
    (same kernel, same (cosine DESC, vec_id ASC) total order) — recall
    hits == truth_k == k for every query.  Partial-probe recall curves
    are measured in bench.py --ivf-recall (approximation quality is a
    measured number, not an oracle)."""
    import tempfile

    from ..functions import ann as ann_fns

    k = 10
    sample_ids, S = _query_vectors(sf_dir, 2048)
    cent = ann_fns.train_centroids(S[:: max(1, len(S) // 256)], 16)
    ids, Q = sample_ids[:15], S[:15]
    exact = ann_fns.bruteforce_topk(_embeddings_ds(sf_dir), ids, Q, k=k)
    index_dir = tempfile.mkdtemp(prefix="h3ray_ivfrec_")
    try:
        ann_fns.ivf_build(_embeddings_ds(sf_dir), cent, index_dir)
        approx, _ = ann_fns.ivf_topk_partitioned(
            index_dir, ids, Q, cent, k=k, n_probe=len(cent)
        )
    finally:
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
    return ann_fns.recall_at_k(approx, exact)


QUERIES.update({"ivf_recall": q_ivf_recall})
ORACLE_SQL.update(
    {
        "ivf_recall": """
            SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS hits,
                   CAST(10 AS BIGINT) AS truth_k
            FROM embeddings ORDER BY vec_id LIMIT 15
        """,
    }
)


def q_media_features(sf_dir: str):
    """Value-oracled multimodal decode: every interleaved media span runs
    through the actor-pool decoder exactly once and reports the decoded
    output size (target_size, constant for the stub codec); the DuckDB twin
    rebuilds the expected (media_ref, kind, decoded_size) set from the
    corpus formulas.  The float features (mean/std) are pytest-anchored
    (tiled-payload closed forms, test_media_actor_pool)."""
    from .. import corpus as corpus_mod
    from ..functions import multimodal

    def extract_media(batch: pa.Table) -> pa.Table:
        docs = corpus_mod.interleave_documents(batch)
        spans = docs.column("spans").combine_chunks()
        flat = spans.flatten()
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        is_media = (kinds == "image") | (kinds == "audio")
        refs = flat.field("media_ref").take(pa.array(np.nonzero(is_media)[0]))
        t = pa.table({"media_ref": refs})
        return multimodal.synthesize_media(t)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(extract_media, batch_format="pyarrow", zero_copy_batch=True)
    out = multimodal.media_pipeline(ds, mode="fake", concurrency=2, batch_size=128)
    return out.map_batches(
        lambda b: b.select(["media_ref", "kind", "decoded_size"]),
        batch_format="pyarrow",
    )


def q_media_refs(sf_dir: str):
    """Value-oracled multimodal plumbing: every interleaved media span's
    (media_ref, kind) must survive the synthesize -> actor-pool decode
    pipeline exactly once; DuckDB rebuilds the expected set from the corpus
    formulas (one image per doc, one audio per doc over 200 chars)."""
    from .. import corpus as corpus_mod
    from ..functions import multimodal

    def extract_media(batch: pa.Table) -> pa.Table:
        docs = corpus_mod.interleave_documents(batch)
        spans = docs.column("spans").combine_chunks()
        flat = spans.flatten()
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        is_media = (kinds == "image") | (kinds == "audio")
        refs = flat.field("media_ref").take(pa.array(np.nonzero(is_media)[0]))
        return multimodal.synthesize_media(pa.table({"media_ref": refs}))

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(extract_media, batch_format="pyarrow", zero_copy_batch=True)
    out = multimodal.media_pipeline(ds, mode="fake", concurrency=2, batch_size=128)
    return out.map_batches(
        lambda b: b.select(["media_ref", "kind"]), batch_format="pyarrow"
    )


def q_frame_sample(sf_dir: str):
    """Value-oracled frame sampling: every doc's image media ref becomes a
    fake video of 3 + doc_id %% 6 frames; FrameSampler(m=4) explodes it to
    uniformly sampled frame rows.  (media_ref, frame_idx, n_frames) are
    pure integer formulas the SQL twin reproduces; the byte-level slicing
    (frame windows, gather, full-cover concat) is pytest-anchored
    (test_frame_sampler)."""
    import pyarrow.compute as pc

    from ..functions import multimodal

    def mk_videos(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        refs = pc.binary_join_element_wise(
            "media:/", batch.column("source").cast(pa.string()),
            pa.compute.cast(batch.column("doc_id"), pa.string()), "0", "/"
        )
        t = multimodal.synthesize_media(pa.table({"media_ref": refs}))
        return t.append_column("n_frames", pa.array(3 + did % 6))

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(mk_videos, batch_format="pyarrow", zero_copy_batch=True)
    out = multimodal.frame_sample_pipeline(ds, m=4, concurrency=2,
                                           batch_size=256)
    return out.map_batches(
        lambda b: b.select(["media_ref", "frame_idx", "n_frames"]),
        batch_format="pyarrow",
    )


def q_polyfill_rects(sf_dir: str):
    """Value-oracled centroid-mode polyfill of the nation rectangles at
    res 4: the containment-mode invariants — every returned cell is
    res 4, valid, its centroid lies inside the rectangle (the
    containscentroid contract, lng-wraparound aware), and the fill is
    non-empty — fold into per-rect booleans the SQL twin reproduces.
    Absolute cell sets are pytest-anchored (mode nesting + self-polygon
    invariants, tests/test_vector_raster.py)."""
    from ..h3core import polyfill as polyfill_mod

    nk, lng0, lat0, lng1, lat1 = nation_rects(sf_dir)

    def k(batch: pa.Table) -> pa.Table:
        ids = batch.column("n_nationkey").to_numpy(zero_copy_only=False)
        n = len(ids)
        nonempty = np.zeros(n, dtype=bool)
        all_res4 = np.zeros(n, dtype=bool)
        centroids_in = np.zeros(n, dtype=bool)
        for i, key in enumerate(ids):
            j = int(np.nonzero(nk == key)[0][0])
            ring = np.array(
                [
                    [lng0[j], lat0[j]],
                    [lng1[j], lat0[j]],
                    [lng1[j], lat1[j]],
                    [lng0[j], lat1[j]],
                    [lng0[j], lat0[j]],
                ]
            )
            cells = polyfill_mod.polygon_to_cells(
                {"type": "Polygon", "rings": [ring]}, 4, "containscentroid"
            )
            nonempty[i] = len(cells) > 0
            if not len(cells):
                continue
            all_res4[i] = (
                bits.is_valid_cell(cells) & (bits.get_resolution(cells) == 4)
            ).all()
            clat, clng = faceijk.cell_to_latlng(cells)
            lat_in = (clat >= lat0[j]) & (clat <= lat1[j])
            lng_in = ((clng >= lng0[j]) & (clng <= lng1[j])) | (
                (clng + 360.0 >= lng0[j]) & (clng + 360.0 <= lng1[j])
            )
            centroids_in[i] = (lat_in & lng_in).all()
        return pa.table(
            {
                "rect_id": pa.array(ids.astype(np.int64)),
                "nonempty": pa.array(nonempty),
                "all_res4": pa.array(all_res4),
                "centroids_in": pa.array(centroids_in),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def _pentagon_anchor_cells(eid: np.ndarray) -> np.ndarray:
    """Deterministic res-2 cells on pentagon base cells (digit 1 avoided so
    every index is valid on a pentagon)."""
    from ..h3core import bits
    from ..h3core.constants import BASE_CELL_IS_PENTAGON

    pents = np.nonzero(BASE_CELL_IS_PENTAGON)[0].astype(np.uint64)
    e = eid.astype(np.uint64)
    h = bits.init_cell(2, len(e))
    h = bits.set_base_cell(h, pents[(e % np.uint64(12)).astype(np.int64)])
    nok = np.array([0, 2, 3, 4, 5, 6], dtype=np.uint64)  # no K digit
    h = bits.set_index_digit(h, 1, nok[(e % np.uint64(6)).astype(np.int64)])
    h = bits.set_index_digit(h, 2, nok[((e // np.uint64(6)) % np.uint64(6)).astype(np.int64)])
    return h


def q_hull_centroid(sf_dir: str):
    """Value-oracled centroid / convex hull / concave hull (the reference's
    Rust-only geo algorithms, crates/h3arrow/src/algorithm/centroid.rs:6-43
    / convex_hull.rs:9-16 / concave_hull.rs:9-16, now first-class here):
    per distinct constructed cell, the k=1 disk's convex hull must contain
    all 7 cell centers, the MultiPoint centroid must land inside the
    center cell (re-encode equality), and the hull ring has >= 6 vertices
    — invariants SQL states as TRUE per event.  One hull per distinct
    anchor (70), mapped back to events by anchor."""
    from .. import vector as vector_mod
    from ..h3core import traversal
    from ..h3core import wkb as wkb_mod

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cells = _construct_cells(eid)
        uniq, inv = np.unique(cells, return_inverse=True)
        contains = np.zeros(len(uniq), dtype=bool)
        cen_in = np.zeros(len(uniq), dtype=bool)
        verts6 = np.zeros(len(uniq), dtype=bool)
        for i, c in enumerate(uniq):
            ca = np.array([c], dtype=np.uint64)
            _, disk, _ = traversal.grid_disk_distances(ca, 1)
            ring = np.array(
                wkb_mod.loads(vector_mod.cells_convex_hull(disk))["parts"][0][
                    "rings"
                ][0]
            )
            dlat, dlng = faceijk.cell_to_latlng(disk)
            contains[i] = all(
                vector_mod._point_in_ring((x, y), ring)
                for x, y in zip(dlng, dlat)
            )
            cen = vector_mod.cells_centroid(disk)
            enc = faceijk.latlng_to_cell(
                np.array([cen[0]]), np.array([cen[1]]), 5
            )
            cen_in[i] = enc[0] == c
            verts6[i] = len(ring) - 1 >= 6
        return pa.table(
            {
                "event_id": pa.array(eid),
                "hull_contains_centers": pa.array(contains[inv]),
                "centroid_in_center": pa.array(cen_in[inv]),
                "hull_verts_ge_6": pa.array(verts6[inv]),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_localij(sf_dir: str):
    """Value-oracled local IJ over the k=2 disks of the constructed
    (provably pentagon-free) cells: the 19 ring offsets around any hexagon
    anchor are point-symmetric, so per event the pair count is 19 and both
    offset sums are exactly 0; every (i, j) must also invert back to its
    cell through localij_to_cells (forward+inverse per pair).  SQL
    reproduces the three aggregates and the roundtrip flag; the raw
    per-pair (di, dj) values are separately hash-matched by
    localij_offsets, and the pentagon seam paths run in
    q_localij_pentagon (rows-only) + exhaustive pytest roundtrips."""
    from ..h3core import localij as localij_mod
    from ..h3core import traversal

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cells = _construct_cells(eid)
        i0, j0, _ = localij_mod.cells_to_localij(cells, cells)
        rows, disk, dist = traversal.grid_disk_distances(cells, 2)
        i, j, ok = localij_mod.cells_to_localij(disk, cells[rows])
        inv, inv_ok = localij_mod.localij_to_cells(cells[rows], i, j)
        rt_ok = inv_ok & (inv == disk)
        di = i.astype(np.int64) - i0.astype(np.int64)[rows]
        dj = j.astype(np.int64) - j0.astype(np.int64)[rows]
        n = len(eid)
        n_pairs = np.bincount(rows[ok], minlength=n)
        sum_di = np.bincount(rows[ok], weights=di[ok].astype(np.float64),
                             minlength=n).astype(np.int64)
        sum_dj = np.bincount(rows[ok], weights=dj[ok].astype(np.float64),
                             minlength=n).astype(np.int64)
        all_rt = np.bincount(rows[ok & rt_ok], minlength=n) == n_pairs
        return pa.table(
            {
                "event_id": pa.array(eid),
                "n_pairs": pa.array(n_pairs.astype(np.int64)),
                "sum_di": pa.array(sum_di),
                "sum_dj": pa.array(sum_dj),
                "roundtrip_ok": pa.array(all_rt),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_localij_pentagon(sf_dir: str):
    """Pentagon-seam local IJ (rows-only): disks anchored on pentagon base
    cells exercise the rigid-unfold tables in the driver; the emitted
    (i, j) values are self-consistent (roundtrip-exact by construction,
    pytest test_localij_pentagon) but intentionally not SQL-expressible."""
    from ..h3core import localij as localij_mod
    from ..h3core import traversal

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        pcells = _pentagon_anchor_cells(eid)
        prow, pdisk, _ = traversal.grid_disk_distances(pcells, 1)
        pi, pj, pok = localij_mod.cells_to_localij(pdisk, pcells[prow])
        return pa.table(
            {
                "event_id": pa.array(eid[prow][pok]),
                "i": pa.array(pi[pok].astype(np.int64)),
                "j": pa.array(pj[pok].astype(np.int64)),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_localij_offsets(sf_dir: str):
    """Value-oracled local IJ: the ring-1 offsets (i - i0, j - j0) around any
    hexagon anchor are always the six axial unit vectors plus the center —
    a constant set DuckDB reproduces with a VALUES cross join.  The
    constructed cells provably never touch a pentagon (all 70 distinct
    cells enumerated in pytest)."""
    from ..h3core import localij as localij_mod
    from ..h3core import traversal

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cells = _construct_cells(eid)
        i0, j0, ok0 = localij_mod.cells_to_localij(cells, cells)
        rows, disk, dist = traversal.grid_disk_distances(cells, 1)
        i, j, ok = localij_mod.cells_to_localij(disk, cells[rows])
        di = i.astype(np.int64) - i0.astype(np.int64)[rows]
        dj = j.astype(np.int64) - j0.astype(np.int64)[rows]
        return pa.table(
            {
                "event_id": pa.array(eid[rows][ok]),
                "di": pa.array(di[ok]),
                "dj": pa.array(dj[ok]),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


QUERIES.update(
    {
        "text_quality": q_text_quality,
        "doc_chunks": q_doc_chunks,
        "doc_sample": q_doc_sample,
        "seq_pack": q_seq_pack,
        "cell_cardinality": q_cell_cardinality,
        "dedup_clusters": q_dedup_clusters,
        "lang_quality": q_lang_quality,
        "lang_id": q_lang_id,
        "minhash_pairs": q_minhash_pairs,
        "jaccard_verify": q_jaccard_verify,
        "simhash_bands": q_simhash_bands,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "ann_top1": q_ann_top1,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        "media_features": q_media_features,
        "media_refs": q_media_refs,
        "frame_sample": q_frame_sample,
        "polyfill_rects": q_polyfill_rects,
        "hull_centroid": q_hull_centroid,
        "localij": q_localij,
        "localij_pentagon": q_localij_pentagon,
        "localij_offsets": q_localij_offsets,
    }
)

ORACLE_SQL.update(
    {
        "latlng_cells": """
            SELECT event_id, CAST(7 AS BIGINT) AS res, TRUE AS valid,
                   TRUE AS roundtrip_ok
            FROM events
        """,
        "corpus_geo_cells": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(5 + doc_id % 4 AS BIGINT) AS res,
                   TRUE AS valid, TRUE AS hex_roundtrip_ok
            FROM documents
        """,
        "hull_centroid": """
            SELECT event_id, TRUE AS hull_contains_centers,
                   TRUE AS centroid_in_center, TRUE AS hull_verts_ge_6
            FROM events
        """,
        "localij": """
            SELECT event_id, CAST(19 AS BIGINT) AS n_pairs,
                   CAST(0 AS BIGINT) AS sum_di, CAST(0 AS BIGINT) AS sum_dj,
                   TRUE AS roundtrip_ok
            FROM events
        """,
        "localij_offsets": """
            SELECT e.event_id, o.di, o.dj
            FROM events e
            CROSS JOIN (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                               (-1, -1), (0, 1), (-1, 0),
                               (1, 0), (0, -1), (1, 1)) AS o(di, dj)
        """,
    }
)

ORACLE_SQL.update(
    {
        "grid_disk_aggregate_k": f"""
            SELECT DISTINCT {_CELL_SQL} AS cell, CAST(0 AS BIGINT) AS k
            FROM events
        """,
        "cell_cardinality": f"""
            SELECT CAST(COUNT(DISTINCT {_CELL_SQL}) AS BIGINT) AS n_distinct,
                   TRUE AS hll_within_5pct
            FROM events
        """,
    }
)

ORACLE_SQL.update(
    {
        "text_quality": """
            SELECT doc_id,
                   CAST(len(string_split_regex(
                       regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'))
                       AS BIGINT) AS n_tokens_ws
            FROM documents
        """,
        "ann_top1": """
            SELECT vec_id AS query_id, vec_id FROM embeddings
            ORDER BY vec_id LIMIT 20
        """,
    }
)


def q_raster_cells(sf_dir: str):
    """Synthetic per-partkey rasters -> tile datasets -> cells (rows-only;
    tiled-vs-whole equality is a pytest invariant).  Raster values derive
    from part keys so the pipeline is deterministic."""
    from .. import raster as raster_mod

    def k(batch: pa.Table) -> pa.Table:
        keys = batch.column("p_partkey").to_numpy(zero_copy_only=False)
        # deterministic, partition-invariant subset: every 16th part key gets
        # a raster (NOT first-N-per-batch, which depended on block bounds)
        keys = keys[keys % 16 == 0]
        out_v = []
        out_c = []
        for key in keys:
            t = raster_mod.Transform(
                0.02, 0, float((key * 29) % 300 - 150), 0, -0.02,
                float((key * 11) % 120 - 60),
            )
            ii, jj = np.meshgrid(np.arange(40), np.arange(40), indexing="ij")
            arr = ((int(key) + 7 * ii + 13 * jj) % 4).astype(np.int32)
            v, c = raster_mod.raster_to_cells(arr, t, 7, nodata_value=0)
            out_v.append(v)
            out_c.append(c.astype(np.int64))
        if not out_v:
            return pa.table(
                {"value": pa.array([], type=pa.int32()),
                 "cell": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "value": pa.array(np.concatenate(out_v)),
                "cell": pa.array(np.concatenate(out_c)),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_raster_pixel_agg(sf_dir: str):
    """Value-oracled raster leg: per-pixel raster rows run through the H3
    encode (pixel center -> cell, validity, resolution) and aggregate to
    per-key (n, sum_v, sum_res, n_valid) — each reproducible in SQL via a
    generate_series grid, while the Ray side actually exercises
    latlng_to_cell / is_valid_cell / get_resolution per pixel."""
    from .. import raster as raster_mod
    from ..h3core import bits, faceijk

    def k(batch: pa.Table) -> pa.Table:
        keys = batch.column("p_partkey").to_numpy(zero_copy_only=False)
        keys = keys[keys % 16 == 0]
        out = {"p_partkey": [], "n": [], "sum_v": [], "sum_res": [], "n_valid": []}
        for key in keys:
            t = raster_mod.Transform(
                0.02, 0, float((key * 29) % 300 - 150), 0, -0.02,
                float((key * 11) % 120 - 60),
            )
            ii, jj = np.meshgrid(np.arange(40), np.arange(40), indexing="ij")
            v = ((int(key) + 7 * ii + 13 * jj) % 4).astype(np.int64).ravel()
            col = jj.ravel() + 0.5
            row = ii.ravel() + 0.5
            lng = t.a * col + t.b * row + t.c
            lat = t.d * col + t.e * row + t.f
            keep = v != 0
            cells = faceijk.latlng_to_cell(lat[keep], lng[keep], 7)
            valid = bits.is_valid_cell(cells)
            res = bits.get_resolution(cells).astype(np.int64)
            out["p_partkey"].append(int(key))
            out["n"].append(int(keep.sum()))
            out["sum_v"].append(int(v[keep].sum()))
            out["sum_res"].append(int(res.sum()))
            out["n_valid"].append(int(valid.sum()))
        return pa.table({c: pa.array(out[c], type=pa.int64()) for c in out})

    return ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_rasterize_roundtrip(sf_dir: str):
    """Value-oracled rasterize: per rect, polyfill -> rasterize_cells ->
    verify every pixel of the produced image against an independent
    per-pixel re-encode (pixel center -> latlng_to_cell(res 4) -> value of
    that cell if in the set, else nodata), plus non-emptiness — the
    rasterize contract (reference raster.py:140-213) folded into booleans
    the SQL twin reproduces.  The pixel-count magnitudes are pytest-
    anchored (test_f7_rasterize roundtrip)."""
    from .. import raster as raster_mod
    from ..h3core import polyfill as polyfill_mod

    nk, lng0, lat0, lng1, lat1 = nation_rects(sf_dir)

    def k(batch: pa.Table) -> pa.Table:
        ids = batch.column("n_nationkey").to_numpy(zero_copy_only=False)
        n = len(ids)
        painted = np.zeros(n, dtype=bool)
        pixels_ok = np.zeros(n, dtype=bool)
        for i, key in enumerate(ids):
            j = int(np.nonzero(nk == key)[0][0])
            ring = np.array(
                [
                    [lng0[j], lat0[j]], [lng1[j], lat0[j]], [lng1[j], lat1[j]],
                    [lng0[j], lat1[j]], [lng0[j], lat0[j]],
                ]
            )
            cells = polyfill_mod.polygon_to_cells(
                {"type": "Polygon", "rings": [ring]}, 4
            )
            if not len(cells):
                continue
            vals = np.full(len(cells), int(key) + 1, dtype=np.int32)
            img, t = raster_mod.rasterize_cells(cells, vals, (60, 60))
            painted[i] = int((img != 0).sum()) > 0
            # independent per-pixel verification of the scatter
            col = np.tile(np.arange(60), 60)
            row = np.repeat(np.arange(60), 60)
            px, py = t.pixel_center(col, row)
            pix_cells = faceijk.latlng_to_cell(py, px, 4)
            srt = np.sort(cells)
            pos = np.clip(np.searchsorted(srt, pix_cells), 0, len(srt) - 1)
            inside = srt[pos] == pix_cells
            expect = np.where(inside, np.int32(int(key) + 1), np.int32(0))
            pixels_ok[i] = (img.ravel() == expect).all()
        return pa.table(
            {
                "rect_id": pa.array(ids.astype(np.int64)),
                "painted": pa.array(painted),
                "pixels_ok": pa.array(pixels_ok),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_grid_disk_aggregate_k(sf_dir: str):
    """Value-oracled disk-union min-k aggregation: the full pipeline runs
    (partial per batch + groupby('cell').min — the reference's
    grid_disk_aggregate_k), then the verified projection keeps the anchor
    cells, whose uint64 values SQL reconstructs via _CELL_SQL and whose
    min-k is 0 by construction.  The k>0 members of the same aggregation
    are value-anchored through disk_agg_totals (19/30 ring constants);
    anchors depend only on event_id mod 70, so the filter set is closed."""

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cells = _construct_cells(eid)
        return kernels.grid_disk_aggregate_k_partial(
            pa.table({"cell": pa.array(cells)}), 2
        )

    ds = _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby("cell").min("k_min")
    anchors = np.sort(_construct_cells(np.arange(70)).astype(np.int64))

    def rename(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(cells, anchors)
        return pa.table(
            {
                "cell": pa.array(cells[keep]),
                "k": batch.column("min(k_min)").cast(pa.int64()).take(
                    pa.array(np.nonzero(keep)[0])
                ),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def q_disk_agg_totals(sf_dir: str):
    """Value-oracled traversal aggregate: per event, the k=2 disk of its
    constructed cell (provably pentagon-free) has exactly 19 members whose
    ring distances sum to 30, and the flat and list disk variants must
    agree — all constants DuckDB reproduces."""
    from ..h3core import traversal

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cells = _construct_cells(eid)
        rows, disk, dist = traversal.grid_disk_distances(cells, 2)
        n_disk = np.bincount(rows, minlength=len(cells))
        sum_k = np.bincount(rows, weights=dist.astype(np.float64),
                            minlength=len(cells)).astype(np.int64)
        lists = kernels.grid_disk_list(
            pa.table({"cell": pa.array(cells)}), 2
        ).column("disk")
        import pyarrow.compute as pc

        n_list = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "n_disk": pa.array(n_disk.astype(np.int64)),
                "sum_k": pa.array(sum_k),
                "n_list": pa.array(n_list.astype(np.int64)),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_grid_distance_path(sf_dir: str):
    """Value-oracled gridDistance/gridPathCells (localij-based, an operator
    family the reference lacks): over each constructed cell's k=2 disk the
    unfolded distances must reproduce the BFS rings (sum 30 over 19
    members) and minimal paths must contain distance+1 cells (sum 49) —
    all SQL constants.  Exercises the full localij forward+inverse per
    path step."""
    from ..h3core import localij as localij_mod
    from ..h3core import traversal

    def k(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cells = _construct_cells(eid)
        rows, disk, dist = traversal.grid_disk_distances(cells, 2)
        d, ok = localij_mod.grid_distance(cells[rows], disk)
        prow, pcells, pok = localij_mod.grid_path_cells(cells[rows], disk)
        n_pairs = np.bincount(rows[ok], minlength=len(cells))
        sum_d = np.bincount(rows[ok], weights=d[ok].astype(np.float64),
                            minlength=len(cells)).astype(np.int64)
        path_per_pair = np.bincount(prow, minlength=len(rows))
        n_path = np.bincount(rows, weights=path_per_pair.astype(np.float64),
                             minlength=len(cells)).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "n_pairs": pa.array(n_pairs.astype(np.int64)),
                "sum_d": pa.array(sum_d),
                "n_path_cells": pa.array(n_path),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_minhash_dup_rank(sf_dir: str):
    """Value-oracled exact-dedup leg of the MinHash pipeline: docs grouped
    by full 64-hash signature (identical texts always collide), then
    exact-verified by full-text hash inside each group; emits every doc's
    rank and group size within its exact-text group — the SQL twin is a
    window function over GROUP BY text.  Near-dup signature collisions are
    filtered by the text-hash verify, mirroring the LSH verify stage.

    The exchange is BUCKETED on hash(sig) % 64: one vectorized
    (sig, text_hash)-run kernel per hash bucket instead of one Python
    kernel per signature group (signature cardinality ~ corpus size)."""
    from ..functions import dedup as dedup_fns
    from ..functions._strkern import FNV_OFFSET, FNV_PRIME
    from ..functions._util import bucket_single

    from ..functions.text import hash_u64_batch

    def sig_hash(batch: pa.Table) -> pa.Table:
        t = dedup_fns.minhash_signatures(batch)
        sigs = t.column("minhash").combine_chunks()
        flat = sigs.flatten().to_numpy(zero_copy_only=False)
        k64 = flat.reshape(len(t), 64)
        with np.errstate(over="ignore"):
            h = np.full(len(t), FNV_OFFSET, dtype=np.uint64)
            for c in range(64):
                h = (h ^ k64[:, c]) * FNV_PRIME
        sig = h.astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket_single(sig, 64)),
                "sig": pa.array(sig),
                "doc_id": t.column("doc_id"),
                # exact-verify key: near-dups can collide on all 64
                # minhashes, so pairs are confirmed by full-text hash
                "text_hash": pa.array(
                    hash_u64_batch(batch.column("text")).astype(np.int64)
                ),
            }
        )

    def ranks(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sig = batch.column("sig").to_numpy(zero_copy_only=False)
        th = batch.column("text_hash").to_numpy(zero_copy_only=False)
        order, first_idx, rank = dedup_fns._multi_key_runs([sig, th], docs)
        docs = docs[order]
        gsize = np.bincount(first_idx, minlength=len(docs))[first_idx]
        return pa.table(
            {
                "doc_id": pa.array(docs.astype(np.int64)),
                "dup_rank": pa.array(rank.astype(np.int64)),
                "group_n": pa.array(gsize.astype(np.int64)),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return (
        ds.map_batches(sig_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(ranks, batch_format="pyarrow")
    )


def q_corpus_geo_res(sf_dir: str):
    """Value-oracled flagship parse leg: every interleaved geo span parses
    to a VALID cell whose resolution equals the synthesized 5 + doc_id % 4
    — SQL reproduces both from the corpus formulas."""
    from .. import corpus as corpus_mod
    from ..h3core import bits

    def k(batch: pa.Table) -> pa.Table:
        docs = corpus_mod.interleave_documents(batch)
        geo = corpus_mod.extract_geo_spans(docs)
        parsed = kernels.cells_parse(geo, "geo_text")
        cells = parsed.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "doc_id": parsed.column("doc_id"),
                "res": pa.array(bits.get_resolution(cells).astype(np.int64)),
                "valid": pa.array(bits.is_valid_cell(cells)),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


QUERIES.update(
    {
        "raster_cells": q_raster_cells,
        "raster_pixel_agg": q_raster_pixel_agg,
        "rasterize_roundtrip": q_rasterize_roundtrip,
        "grid_disk_aggregate_k": q_grid_disk_aggregate_k,
        "disk_agg_totals": q_disk_agg_totals,
        "minhash_dup_rank": q_minhash_dup_rank,
        "grid_distance_path": q_grid_distance_path,
        "corpus_geo_res": q_corpus_geo_res,
    }
)


def q_flagship_resumable(sf_dir: str):
    from .flagship import q_flagship_resumable as _q

    return _q(sf_dir)


QUERIES.update({"flagship_resumable": q_flagship_resumable})
ORACLE_SQL.update(
    {
        "flagship_resumable": """
            SELECT 'documents' AS partition_key,
                   CAST((SELECT COUNT(*)
                         FROM documents d, nation n
                         WHERE ((d.doc_id * 37) % 16000) / 100.0 - 80.0
                                 BETWEEN (n.n_nationkey * 11 % 140) - 70
                                     AND (n.n_nationkey * 11 % 140) - 70 + 9
                           AND ((d.doc_id * 73) % 36000) / 100.0 - 180.0
                                 BETWEEN (n.n_nationkey * 29 % 340) - 170
                                     AND (n.n_nationkey * 29 % 340) - 170 + 13
                        ) AS BIGINT) AS row_count,
                   TRUE AS resumed_ok
        """,
    }
)


def q_pip_join_salted(sf_dir: str):
    """The same flagship join semantics through the *shuffle* path: both
    sides streamed as Datasets and keyed by cover cell, hot-cell salting,
    groupby co-group — the rectangle side's cover is computed inside its
    own map_batches stage (no driver-side materialization).  Shares the
    pip_join SQL BETWEEN oracle."""

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

    pds = _events(sf_dir).map_batches(
        add_coords, batch_format="pyarrow", zero_copy_batch=True
    )
    rds = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).map_batches(nation_to_rects, batch_format="pyarrow", zero_copy_batch=True)
    out = join_mod.pip_join_shuffle(pds, rds, res=3, salt=4)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("point_id"),
                "rect_id": batch.column("rect_id").cast(pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def q_pip_join_hash(sf_dir: str):
    """The PIP join through Ray Data's native hash join (Dataset.join on
    the cover cell) — the idiomatic both-sides-large exchange.  Shares the
    pip_join SQL BETWEEN oracle."""

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

    pds = _events(sf_dir).map_batches(
        add_coords, batch_format="pyarrow", zero_copy_batch=True
    )
    rds = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).map_batches(nation_to_rects, batch_format="pyarrow", zero_copy_batch=True)
    out = join_mod.pip_join_hash(pds, rds, res=3, num_partitions=4)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("point_id"),
                "rect_id": batch.column("rect_id").cast(pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def fine_rects(sf_dir: str):
    """The nation rectangles shrunk 1000x (spans ~0.009 x 0.013 deg) for a
    fine-resolution join — exercises the full-range cover tables
    (join.py imports polyfill's res 0-15 metrics; the reference's
    SpatialIndex queries are resolution-agnostic, spatial_index.rs:101-166).
    Decimal arithmetic mirrors the SQL twin's IEEE op order exactly."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    nk = t.column("n_nationkey").to_numpy().astype(np.int64)
    lat0 = (nk * 11 % 140) / 1000.0 - 0.07
    lng0 = (nk * 29 % 340) / 1000.0 - 0.17
    return nk, lng0, lat0, lng0 + 0.013, lat0 + 0.009


def q_pip_join_fine(sf_dir: str):
    """pip_join at res 11 (urban-scale cells, ~25 m edges): broadcast
    RectLookup cover + exact refine over sub-0.2-degree point coordinates.
    Same SQL BETWEEN oracle shape as pip_join, scaled 1000x down."""
    nk, lng0, lat0, lng1, lat1 = fine_rects(sf_dir)
    lookup = join_mod.RectLookup(nk, lng0, lat0, lng1, lat1, res=11)
    lookup_ref = ray.put(lookup)

    def add_coords(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        batch = batch.append_column(
            "lat", pa.array(((eid * 37) % 16000) / 100000.0 - 0.08)
        )
        return batch.append_column(
            "lng", pa.array(((eid * 73) % 36000) / 100000.0 - 0.18)
        )

    refine = join_mod.make_pip_refine_kernel(
        lookup_ref, id_cols=("event_id",), rect_id_col="rect_id"
    )

    def cast_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "rect_id": batch.column("rect_id").cast(pa.int64()),
            }
        )

    return (
        _events(sf_dir)
        .map_batches(add_coords, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(cast_out, batch_format="pyarrow", zero_copy_batch=True)
    )


def q_pip_join_adaptive(sf_dir: str):
    """The shuffle join with SKETCH-DRIVEN salting: a count-min pass over
    the point cells picks the actually-hot cells (threshold = 200 points
    at sf0.01's ~10k events) and only those fan out; cold cells keep one
    rect replica.  Identical pairs to the constant-salt plan — shares
    the pip_join SQL BETWEEN oracle."""

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

    pds = _events(sf_dir).map_batches(
        add_coords, batch_format="pyarrow", zero_copy_batch=True
    )
    rds = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).map_batches(nation_to_rects, batch_format="pyarrow", zero_copy_batch=True)
    out = join_mod.pip_join_shuffle_adaptive(pds, rds, res=3, threshold=200, salt=4)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("point_id"),
                "rect_id": batch.column("rect_id").cast(pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


QUERIES.update({"pip_join_adaptive": q_pip_join_adaptive})
QUERIES.update({"pip_join_salted": q_pip_join_salted})
QUERIES.update({"pip_join_hash": q_pip_join_hash})
QUERIES.update({"pip_join_fine": q_pip_join_fine})
ORACLE_SQL.update(
    {
        "pip_join_fine": """
            SELECT e.event_id, CAST(n.n_nationkey AS BIGINT) AS rect_id
            FROM events e, nation n
            WHERE ((e.event_id * 37) % 16000) / 100000.0 - 0.08
                      BETWEEN (n.n_nationkey * 11 % 140) / 1000.0 - 0.07
                          AND (n.n_nationkey * 11 % 140) / 1000.0 - 0.07 + 0.009
              AND ((e.event_id * 73) % 36000) / 100000.0 - 0.18
                      BETWEEN (n.n_nationkey * 29 % 340) / 1000.0 - 0.17
                          AND (n.n_nationkey * 29 % 340) / 1000.0 - 0.17 + 0.013
        """,
    }
)
ORACLE_SQL.update({"pip_join_salted": ORACLE_SQL["pip_join"]})
ORACLE_SQL.update({"pip_join_adaptive": ORACLE_SQL["pip_join"]})
ORACLE_SQL.update({"pip_join_hash": ORACLE_SQL["pip_join"]})
ORACLE_SQL.update({"ann_ivf": ORACLE_SQL["ann_top1"]})
ORACLE_SQL.update(
    {
        "disk_agg_totals": """
            SELECT event_id, CAST(19 AS BIGINT) AS n_disk,
                   CAST(30 AS BIGINT) AS sum_k, CAST(19 AS BIGINT) AS n_list
            FROM events
        """,
        "lang_id": """
            WITH words AS (
              SELECT doc_id,
                     unnest(list_slice(string_split_regex(
                         lower(regexp_replace(text, '^\\s+|\\s+$', '', 'g')),
                         '\\s+'), 1, 300)) AS word
              FROM documents
            ),
            profile(word, lang, prio) AS (
              VALUES ('the','en',0),('and','en',0),('of','en',0),('to','en',0),('in','en',0),
                     ('is','en',0),('that','en',0),('it','en',0),('for','en',0),('with','en',0),
                     ('der','de',1),('die','de',1),('und','de',1),('das','de',1),('ist','de',1),
                     ('nicht','de',1),('mit','de',1),('ein','de',1),('zu','de',1),('den','de',1),
                     ('le','fr',2),('la','fr',2),('et','fr',2),('les','fr',2),('des','fr',2),
                     ('est','fr',2),('pas','fr',2),('une','fr',2),('pour','fr',2),('que','fr',2),
                     ('el','es',3),('la','es',3),('de','es',3),('que','es',3),('los','es',3),
                     ('una','es',3),('por','es',3),('con','es',3),('para','es',3),('las','es',3)
            ),
            hits AS (
              SELECT w.doc_id, p.lang, p.prio, COUNT(*) AS c
              FROM words w JOIN profile p ON w.word = p.word
              GROUP BY w.doc_id, p.lang, p.prio
            ),
            best AS (
              SELECT doc_id, lang, c,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY c DESC, prio ASC) AS rn
              FROM hits
            )
            SELECT d.doc_id,
                   COALESCE(CASE WHEN b.c >= 2 THEN b.lang END, 'und') AS lang_guess
            FROM documents d
            LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
        """,
        "lang_quality": """
            WITH words AS (
              SELECT doc_id,
                     unnest(list_slice(string_split_regex(
                         lower(regexp_replace(text, '^\\s+|\\s+$', '', 'g')),
                         '\\s+'), 1, 300)) AS word
              FROM documents
            ),
            profile(word, lang, prio) AS (
              VALUES ('the','en',0),('and','en',0),('of','en',0),('to','en',0),('in','en',0),
                     ('is','en',0),('that','en',0),('it','en',0),('for','en',0),('with','en',0),
                     ('der','de',1),('die','de',1),('und','de',1),('das','de',1),('ist','de',1),
                     ('nicht','de',1),('mit','de',1),('ein','de',1),('zu','de',1),('den','de',1),
                     ('le','fr',2),('la','fr',2),('et','fr',2),('les','fr',2),('des','fr',2),
                     ('est','fr',2),('pas','fr',2),('une','fr',2),('pour','fr',2),('que','fr',2),
                     ('el','es',3),('la','es',3),('de','es',3),('que','es',3),('los','es',3),
                     ('una','es',3),('por','es',3),('con','es',3),('para','es',3),('las','es',3)
            ),
            hits AS (
              SELECT w.doc_id, p.lang, p.prio, COUNT(*) AS c
              FROM words w JOIN profile p ON w.word = p.word
              GROUP BY w.doc_id, p.lang, p.prio
            ),
            best AS (
              SELECT doc_id, lang, c,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY c DESC, prio ASC) AS rn
              FROM hits
            ),
            feat AS (
              SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(length(regexp_replace(text, '[^A-Za-z \\t\\n\\r]', '', 'g'))
                          AS BIGINT) AS n_alpha_space,
                     CAST(length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r]', '', 'g'))
                          AS BIGINT) AS n_punct,
                     CAST(len(string_split_regex(
                         regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'))
                          AS BIGINT) AS n_words,
                     CAST(length(regexp_replace(text, '[ \\t\\n\\r]', '', 'g'))
                          AS BIGINT) AS word_chars
              FROM documents
            )
            SELECT f.doc_id,
                   COALESCE(CASE WHEN b.c >= 2 THEN b.lang END, 'und') AS lang_guess,
                   f.n_chars, f.n_alpha_space, f.n_punct, f.n_words, f.word_chars,
                   CAST(floor((
                       0.35 * CASE WHEN f.n_chars > 0
                                   THEN LEAST(f.n_chars / 500.0, 1.0) ELSE 0 END
                     + 0.35 * CASE WHEN f.n_chars > 0
                                   THEN f.n_alpha_space * 1.0 / f.n_chars ELSE 0 END
                     + 0.15 * (1 - LEAST(CASE WHEN f.n_chars > 0
                                   THEN (f.n_punct * 1.0 / f.n_chars) * 4 ELSE 0 END, 1.0))
                     + 0.15 * GREATEST(LEAST(
                           1.0 - ABS(CASE WHEN f.n_words > 0
                                     THEN f.word_chars * 1.0 / f.n_words
                                     ELSE 0 END - 5.0) / 5.0, 1.0), 0.0)
                   ) * 10) AS BIGINT) AS quality_bucket
            FROM feat f
            LEFT JOIN best b ON f.doc_id = b.doc_id AND b.rn = 1
        """,
        "media_features": """
            SELECT 'media://' || source || '/' || CAST(doc_id AS VARCHAR) || '/0'
                       AS media_ref,
                   'image' AS kind, CAST(32 AS INTEGER) AS decoded_size
            FROM documents
            UNION ALL
            SELECT 'media://' || source || '/' || CAST(doc_id AS VARCHAR) || '/1',
                   'audio', 32
            FROM documents WHERE length(text) > 200
        """,
        "media_refs": """
            SELECT 'media://' || source || '/' || CAST(doc_id AS VARCHAR) || '/0'
                       AS media_ref,
                   'image' AS kind
            FROM documents
            UNION ALL
            SELECT 'media://' || source || '/' || CAST(doc_id AS VARCHAR) || '/1',
                   'audio'
            FROM documents WHERE length(text) > 200
        """,
        "grid_distance_path": """
            SELECT event_id, CAST(19 AS BIGINT) AS n_pairs,
                   CAST(30 AS BIGINT) AS sum_d,
                   CAST(49 AS BIGINT) AS n_path_cells
            FROM events
        """,
        "frame_sample": """
            WITH media AS (
              SELECT 'media://' || source || '/' || CAST(doc_id AS VARCHAR)
                         || '/0' AS media_ref,
                     3 + doc_id % 6 AS n
              FROM documents
            )
            SELECT media_ref,
                   CAST((k * n) // LEAST(4, n) AS BIGINT) AS frame_idx,
                   CAST(n AS BIGINT) AS n_frames
            FROM (SELECT media_ref, n, unnest(range(LEAST(4, n))) AS k
                  FROM media)
        """,
        "minhash_pairs": _PLANTED_SQL + """
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM docs2 a JOIN docs2 b
              ON a.text = b.text AND a.doc_id < b.doc_id
        """,
        "jaccard_verify": """
            WITH docs2 AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id,
                     text || ' planted near duplicate tail for jaccard verification' AS text
              FROM documents WHERE doc_id % 10 = 0
            ),
            pairs AS (
              SELECT doc_id AS a, doc_id + 1000000 AS b
              FROM documents WHERE doc_id % 10 = 0
              UNION ALL
              SELECT doc_id AS a, doc_id + 10 AS b
              FROM documents WHERE doc_id % 10 = 0 AND doc_id < 490
            ),
            grams AS (
              SELECT doc_id, substring(text, CAST(i AS INTEGER), 5) AS g
              FROM (SELECT doc_id, text,
                           unnest(range(1, length(text) - 3)) AS i
                    FROM docs2)
              GROUP BY 1, 2
            ),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
            inter AS (
              SELECT p.a, p.b, COUNT(*) AS inter
              FROM pairs p
              JOIN grams ga ON ga.doc_id = p.a
              JOIN grams gb ON gb.doc_id = p.b AND gb.g = ga.g
              GROUP BY 1, 2
            )
            SELECT p.a, p.b,
                   CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter,
                   CAST(ca.n + cb.n - COALESCE(i.inter, 0) AS BIGINT)
                       AS union_size
            FROM pairs p
            JOIN counts ca ON ca.doc_id = p.a
            JOIN counts cb ON cb.doc_id = p.b
            LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
        """,
        "simhash_bands": _PLANTED_SQL + """
            SELECT doc_id,
                   CAST(4 * (COUNT(*) OVER (PARTITION BY text) - 1) AS BIGINT)
                       AS n_exact_band_mates
            FROM docs2
        """,
        "doc_chunks": """
            WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
            c AS (
              SELECT doc_id, text, L,
                     unnest(range(CASE WHEN L <= 200 THEN 1
                                  ELSE 1 + (L - 200 + 179) // 180 END))
                         AS chunk_id
              FROM d
            )
            SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                   substr(text, CAST(chunk_id * 180 + 1 AS BIGINT),
                          CAST(LEAST(200, L - chunk_id * 180) AS BIGINT))
                       AS chunk_text
            FROM c
        """,
        "doc_sample": """
            SELECT doc_id, source FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 <
                  CASE WHEN length(source) = 4
                       THEN CAST(floor(0.5 * 4294967296) AS BIGINT)
                       ELSE CAST(floor(0.2 * 4294967296) AS BIGINT) END
        """,
        "seq_pack": """
            WITH w AS (
              SELECT doc_id, length(text) AS len,
                     COALESCE(SUM(length(text) + 1) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS o
              FROM documents
            )
            SELECT doc_id, CAST(o // 512 AS BIGINT) AS start_seq,
                   CAST((o + GREATEST(len, 1) - 1) // 512 AS BIGINT) AS end_seq,
                   CAST((o + GREATEST(len, 1) - 1) // 512 - o // 512 + 1
                        AS BIGINT) AS n_seqs
            FROM w
        """,
        "dedup_clusters": _PLANTED_SQL + """
            SELECT doc_id AS node,
                   CAST(MIN(doc_id) OVER (PARTITION BY text) AS BIGINT)
                       AS cluster
            FROM docs2
        """,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
        """,
        "ann_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding
              FROM embeddings ORDER BY vec_id LIMIT 10
            ),
            ranked AS (
              SELECT q.query_id, e.vec_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                DESC, e.vec_id ASC
                     ) - 1 AS rank
              FROM q CROSS JOIN embeddings e
            )
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank < 5
        """,
        "minhash_dup_rank": """
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) - 1
                        AS BIGINT) AS dup_rank,
                   CAST(COUNT(*) OVER (PARTITION BY text) AS BIGINT) AS group_n
            FROM documents
        """,
        "corpus_geo_res": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(5 + doc_id % 4 AS BIGINT) AS res,
                   TRUE AS valid
            FROM documents
        """,
        "polyfill_rects": """
            SELECT CAST(n_nationkey AS BIGINT) AS rect_id, TRUE AS nonempty,
                   TRUE AS all_res4, TRUE AS centroids_in
            FROM nation
        """,
        "rasterize_roundtrip": """
            SELECT CAST(n_nationkey AS BIGINT) AS rect_id, TRUE AS painted,
                   TRUE AS pixels_ok
            FROM nation
        """,
        "raster_pixel_agg": """
            SELECT p.p_partkey,
                   COUNT(*) AS n,
                   CAST(SUM((p.p_partkey + 7*i.g + 13*j.g) % 4) AS BIGINT) AS sum_v,
                   COUNT(*) * 7 AS sum_res,
                   COUNT(*) AS n_valid
            FROM part p
            CROSS JOIN (SELECT unnest(range(40)) AS g) i
            CROSS JOIN (SELECT unnest(range(40)) AS g) j
            WHERE p.p_partkey % 16 = 0
              AND (p.p_partkey + 7*i.g + 13*j.g) % 4 != 0
            GROUP BY p.p_partkey
        """,
    }
)


def q_dissolve(sf_dir: str):
    """Value-oracled distributed link_cells dissolve: every distinct
    constructed cell's 7 res-6 children shuffle by ``hash(parent) % 64``
    and ALL parents of a hash bucket dissolve in ONE kernel — boundary
    segments for the whole bucket in one vectorized pass with per-parent
    cancellation (`_boundary_segments_tagged`), then a segmented ring
    stitch per parent run (one Ray group per BUCKET, not per parent:
    parent cardinality grows with data; bucket count does not).  The
    aperture-7 child flower of ANY hexagon dissolves to exactly 1 shell
    of 18 edges (19 closed-ring vertices): 7x6 directed edges minus 2x12
    interior cancellations — an H3 invariant SQL reproduces as constants
    alongside the _CELL_SQL parent values.  The shells-with-holes rect
    dissolve stays pytest-anchored
    (test_distributed_dissolve_equals_local + annulus); bucketed-vs-
    per-parent parity is pytest-anchored (test_bucketed_dissolve_parity)."""
    from .. import vector as vector_mod
    from ..functions._util import bucket_single
    from ..h3core import hierarchy

    def expand(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cells = np.unique(_construct_cells(eid))
        ch, rows = hierarchy._expand_children(cells, 6)
        parent = cells[rows].astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket_single(parent, 64)),
                "parent": pa.array(parent),
                "cell": pa.array(ch),
            }
        )

    def dissolve_bucket(batch: pa.Table) -> pa.Table:
        parents = batch.column("parent").to_numpy(zero_copy_only=False)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        p, c = vector_mod._dedup_tagged_cells(parents, cells)
        # one vectorized boundary pass over ALL the bucket's cells,
        # cancellation restricted to within-parent
        a, b, tag = vector_mod._boundary_segments_tagged(c, p)
        sorder = np.argsort(tag, kind="stable")
        a, b, tag = a[sorder], b[sorder], tag[sorder]
        starts = np.nonzero(np.r_[True, tag[1:] != tag[:-1]])[0] \
            if len(tag) else np.zeros(0, dtype=np.int64)
        bounds = np.r_[starts, len(tag)]
        out_cell, out_rings, out_verts = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            rings = vector_mod._stitch_rings(
                list(zip(a[s:e].tolist(), b[s:e].tolist()))
            )
            polys = vector_mod.group_rings(rings)
            out_cell.append(int(tag[s]))
            out_rings.append(sum(len(pl) for pl in polys))
            out_verts.append(sum(len(r) for pl in polys for r in pl))
        return pa.table(
            {
                "cell": pa.array(out_cell, type=pa.int64()),
                "n_rings": pa.array(out_rings, type=pa.int64()),
                "n_verts": pa.array(out_verts, type=pa.int64()),
            }
        )

    return (
        _events(sf_dir)
        .map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(dissolve_bucket, batch_format="pyarrow")
    )


QUERIES.update({"dissolve": q_dissolve})
ORACLE_SQL.update(
    {
        "dissolve": f"""
            SELECT DISTINCT {_CELL_SQL} AS cell, CAST(1 AS BIGINT) AS n_rings,
                   CAST(19 AS BIGINT) AS n_verts
            FROM events
        """,
    }
)


# --- time-series family (no reference counterpart; see functions/timeseries) -


def _cents_events(sf_dir: str):
    """Shared window-query input: events as (event_id, user_id, ts_us,
    cents) with value scaled to integer cents.  ONE copy of the rounding
    parity rule for both window queries and their DuckDB twins:
    floor(x + 0.5), NOT np.round — numpy rounds half-to-even while
    DuckDB ROUND rounds half-away; floor(+0.5) is the same IEEE-double
    expression on both sides, so parity holds even for exact .5
    inputs."""

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts_us": pa.array(ts),
                "cents": pa.array(np.floor(val * 100 + 0.5).astype(np.int64)),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def q_window_agg(sf_dir: str):
    """Per-event sliding-window features: count, integer-cents sum, min
    and max of ``value`` over the same user's events in the preceding
    24 h (inclusive, peers included) — the rate-limit / activity-feature
    shape of a training-data pipeline.  Exactly SQL's RANGE frame; value
    is scaled to cents on BOTH sides (see _cents_events) so every
    aggregate is integer-exact (extremes via the kernel's sparse-table
    RMQ)."""
    from ..functions import timeseries

    hour_us = 3_600_000_000

    ds = _cents_events(sf_dir)
    out = timeseries.sliding_window_agg(
        ds,
        key_col="user_id",
        ts_col="ts_us",
        val_col="cents",
        id_col="event_id",
        window_us=24 * hour_us,
        num_buckets=64,
        extremes=True,
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["event_id", "w_count", "w_cents", "w_min_cents", "w_max_cents"]
        ),
        batch_format="pyarrow",
    )


def _asof_events_side(sf_dir: str, event_type: str):
    """One side of the attribution as-of join: events of one type with
    (event_id, user_id, ts_us) — shared by q_asof_join and
    q_asof_chunked so both queries stay byte-comparable against the one
    shared ASOF oracle."""
    import pyarrow.compute as pc

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
        filter=(pc.field("event_type") == event_type),
    ).map_batches(
        lambda b: pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_us": pa.array(
                    b.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_asof_join(sf_dir: str):
    """Attribution-style as-of join: each purchase event matched to the
    same user's most recent view event at-or-before it (SQL ASOF JOIN).
    Whole keys co-locate (per-user history in one bucket task); see
    functions/timeseries.py for the partitioning contract."""
    from ..functions import timeseries

    return timeseries.asof_join(
        _asof_events_side(sf_dir, "purchase"),
        _asof_events_side(sf_dir, "view"),
        key_col="user_id",
        ts_col="ts_us",
        left_id_col="event_id",
        right_id_col="event_id",
        out_right_col="view_event_id",
        num_buckets=64,
    )


QUERIES.update({"window_agg": q_window_agg, "asof_join": q_asof_join})
ORACLE_SQL.update(
    {
        "window_agg": """
            SELECT event_id,
                   COUNT(*) OVER w AS w_count,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
                        AS BIGINT) AS w_cents,
                   MIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
                        AS w_min_cents,
                   MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
                        AS w_max_cents
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                         AND CURRENT ROW)
        """,
        "asof_join": """
            SELECT l.event_id AS event_id, r.event_id AS view_event_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
    }
)


def q_asof_chunked(sf_dir: str):
    """Same attribution join as q_asof_join but through the
    bounded-memory chunked engine (per-(key, time-chunk) co-location +
    boundary snapshots; 4-day chunks force snapshots to cross many chunk
    boundaries over the 30-day span).  Must hash-match the identical
    ASOF oracle."""
    from ..functions import timeseries

    return timeseries.asof_join_chunked(
        _asof_events_side(sf_dir, "purchase"),
        _asof_events_side(sf_dir, "view"),
        key_col="user_id",
        ts_col="ts_us",
        left_id_col="event_id",
        right_id_col="event_id",
        chunk_us=4 * 24 * 3_600_000_000,
        out_right_col="view_event_id",
        num_buckets=64,
    )


QUERIES.update({"asof_chunked": q_asof_chunked})
ORACLE_SQL.update({"asof_chunked": ORACLE_SQL["asof_join"]})


def q_window_moments(sf_dir: str):
    """Windowed moments: count, sum and sum-of-squares of integer cents
    over the same 24 h per-user RANGE frame as q_window_agg, plus the
    integer-exact population-variance numerator
    ``w_var_num = w_count * w_sumsq - w_cents**2`` (variance =
    w_var_num / w_count**2; kept as the numerator so the value oracle
    stays ints-only).  Bounds: cents <= ~6e4, frames <= ~1e2 rows, so
    w_var_num <= ~4e13 — far inside int64 on both engines.  Input via
    the shared _cents_events (one copy of the rounding parity rule)."""
    from ..functions import timeseries

    hour_us = 3_600_000_000

    ds = _cents_events(sf_dir)
    out = timeseries.sliding_window_agg(
        ds,
        key_col="user_id",
        ts_col="ts_us",
        val_col="cents",
        id_col="event_id",
        window_us=24 * hour_us,
        num_buckets=64,
        moments=True,
    )

    def derive(batch: pa.Table) -> pa.Table:
        cnt = batch.column("w_count").to_numpy(zero_copy_only=False)
        tot = batch.column("w_sum").to_numpy(zero_copy_only=False)
        ssq = batch.column("w_sumsq").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "w_count": pa.array(cnt),
                "w_cents": pa.array(tot),
                "w_sumsq": pa.array(ssq),
                "w_var_num": pa.array(cnt * ssq - tot * tot),
            }
        )

    return out.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def q_are_neighbor(sf_dir: str):
    """areNeighborCells invariant oracle over constructed hexagon cells
    (disk_size's constant-7 oracle already certifies no pentagons):
    every ring-1 member of each event cell must be a neighbor (n_nb = 6),
    every ring-2 member must not (n_far = 12), the relation must be
    symmetric and self/err-free (all_ok).  SQL twin emits the constants."""
    from ..h3core import traversal

    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        rows, disk, dist = traversal.grid_disk_distances(cells, 2)
        origin = cells[rows]
        nb, err = traversal.are_neighbor_cells(origin, disk)
        back, berr = traversal.are_neighbor_cells(disk, origin)
        n = len(batch)
        n_nb = np.bincount(rows[nb], minlength=n).astype(np.int64)
        n_far = np.bincount(rows[(dist == 2) & ~nb], minlength=n).astype(np.int64)
        bad = (err != 0) | (berr != 0) | (nb != back) | ((dist == 0) & nb)
        all_ok = np.bincount(rows[bad], minlength=n) == 0
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "n_nb": pa.array(n_nb),
                "n_far": pa.array(n_far),
                "all_ok": pa.array(all_ok),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


QUERIES.update({"are_neighbor": q_are_neighbor})
ORACLE_SQL.update(
    {
        "are_neighbor": """
            SELECT event_id, CAST(6 AS BIGINT) AS n_nb,
                   CAST(12 AS BIGINT) AS n_far, TRUE AS all_ok
            FROM events
        """,
    }
)


def q_cell_vertexes(sf_dir: str):
    """cellToVertexes canonicality invariants over constructed hexagon
    cells: 6 distinct valid vertexes per cell (n_v), every ring-1
    neighbor shares EXACTLY 2 of them (an edge has two endpoints:
    n_shared = 12 over the 6 neighbors), and each vertex's owner cell
    is the cell itself or one of those neighbors (all_ok).  Canonical
    ownership is what these certify: all three sharers derive the
    identical uint64 per corner.  SQL twin emits the constants."""
    from ..h3core import traversal, vertex as vertex_mod
    from ..vector import vertex_owner

    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(cells)
        rows, disk, dist = traversal.grid_disk_distances(cells, 1)
        m = dist == 1
        nbr = disk[m].reshape(n, 6)  # hexagons only (disk_size oracle)
        rc, vc = vertex_mod.cells_to_vertexes(cells)
        vc = vc.reshape(n, 6)
        rn, vn = vertex_mod.cells_to_vertexes(nbr.reshape(-1))
        vn = vn.reshape(n, 6, 6)
        shared = (vc[:, None, :, None] == vn[:, :, None, :]).any(-1).sum((1, 2))
        own = vertex_owner(vc.reshape(-1)).reshape(n, 6)
        own_ok = (
            (own == cells[:, None]) | (own[:, :, None] == nbr[:, None, :]).any(-1)
        ).all(1)
        distinct6 = (np.diff(np.sort(vc, axis=1), axis=1) != 0).all(1)
        valid = bits.is_valid_vertex(vc.reshape(-1)).reshape(n, 6).all(1)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "n_v": pa.array(np.full(n, 6, dtype=np.int64) * valid),
                "n_shared": pa.array(shared.astype(np.int64)),
                "all_ok": pa.array(own_ok & distinct6),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_icosa_faces(sf_dir: str):
    """getIcosahedronFaces contract invariants over constructed hexagon
    cells: 1-2 faces per hexagon (H3 maxFaceCount), the centroid's
    decode face always present, face ids in 0..19, list sorted+deduped.
    SQL twin emits the constant."""
    from ..h3core import boundary as boundary_mod, faceijk as faceijk_mod

    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(cells)
        rows, faces = boundary_mod.get_icosahedron_faces(cells)
        counts = np.bincount(rows, minlength=n)
        face_c, _, _ = faceijk_mod.cell_to_faceijk(cells)
        has_center = np.bincount(
            rows[faces == face_c[rows]], minlength=n
        ) == 1
        in_range = np.bincount(rows[(faces < 0) | (faces > 19)], minlength=n) == 0
        all_ok = (counts >= 1) & (counts <= 2) & has_center & in_range
        return pa.table(
            {"event_id": batch.column("event_id"), "all_ok": pa.array(all_ok)}
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_edge_construct(sf_dir: str):
    """cellsToDirectedEdge invariants over constructed hexagon cells:
    an edge to each of the 6 ring-1 neighbors constructs (n_edges = 6),
    every constructed edge roundtrips origin and destination exactly,
    and ring-2 members refuse with the not-neighbors error (n_far = 12).
    SQL twin emits the constants."""
    from ..h3core import traversal
    from .. import vector as vector_fns

    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(cells)
        rows, disk, dist = traversal.grid_disk_distances(cells, 2)
        origin = cells[rows]
        e, err = vector_fns.cells_to_directededge(origin, disk)
        ok = err == 0
        rt = (
            ok
            & (vector_fns.directededge_origin(np.where(ok, e, np.uint64(0))) == origin)
            & (
                vector_fns.directededge_destination(np.where(ok, e, np.uint64(0)))
                == disk
            )
            & bits.is_valid_directededge(np.where(ok, e, np.uint64(0)))
        )
        n_edges = np.bincount(rows[rt & (dist == 1)], minlength=n).astype(np.int64)
        n_far = np.bincount(rows[(dist == 2) & (err == 3)], minlength=n).astype(
            np.int64
        )
        bad = (ok & ~rt) | ((dist == 1) & ~ok) | ((dist == 0) & (err != 3))
        all_ok = np.bincount(rows[bad], minlength=n) == 0
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "n_edges": pa.array(n_edges),
                "n_far": pa.array(n_far),
                "all_ok": pa.array(all_ok),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def q_cms_counts(sf_dir: str):
    """Count-min sketch vs exact: build the global 4x16384 sketch over
    res-2 parent cells (one mergeable 512 KiB matrix — the whole-stream
    frequency table never materializes), then per distinct parent emit
    the EXACT distributed count (value-checked against SQL GROUP BY) and
    the sketch's one-sided bound (cms_ge: estimate >= exact, always
    true for count-min).  With ~70 keys over 16384 columns, collisions
    are improbable but not impossible — the oracle pins the guaranteed
    bound, not estimate equality; estimate accuracy is pytest-anchored."""
    from ..functions import sketch

    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        cells = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        parent = bits.cell_to_parent(cells, np.uint64(2)).astype(np.int64)
        return pa.table({"parent": pa.array(parent)})

    ds = _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)
    mat, _ = sketch.cms_from_dataset(ds, "parent")
    exact = ds.groupby("parent").count()

    def attach(batch: pa.Table) -> pa.Table:
        parents = batch.column("parent").to_numpy(zero_copy_only=False)
        n = batch.column("count()").to_numpy(zero_copy_only=False)
        est = sketch.cms_query(mat, parents.astype(np.uint64))
        return pa.table(
            {
                "parent": pa.array(parents),
                "n": pa.array(n.astype(np.int64)),
                "cms_ge": pa.array(est >= n),
            }
        )

    return exact.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


QUERIES.update({"cms_counts": q_cms_counts})
ORACLE_SQL.update(
    {
        "cms_counts": f"""
            SELECT (({_CELL_SQL} & ~(CAST(15 AS BIGINT) << 52))
                    | (CAST(2 AS BIGINT) << 52))
                   | ((CAST(1 AS BIGINT) << 39) - 1) AS parent,
                   COUNT(*) AS n, TRUE AS cms_ge
            FROM events GROUP BY 1
        """,
    }
)


QUERIES.update({"edge_construct": q_edge_construct})
ORACLE_SQL.update(
    {
        "edge_construct": """
            SELECT event_id, CAST(6 AS BIGINT) AS n_edges,
                   CAST(12 AS BIGINT) AS n_far, TRUE AS all_ok
            FROM events
        """,
    }
)


QUERIES.update({"icosa_faces": q_icosa_faces})
ORACLE_SQL.update(
    {
        "icosa_faces": "SELECT event_id, TRUE AS all_ok FROM events",
    }
)


QUERIES.update({"cell_vertexes": q_cell_vertexes})
ORACLE_SQL.update(
    {
        "cell_vertexes": """
            SELECT event_id, CAST(6 AS BIGINT) AS n_v,
                   CAST(12 AS BIGINT) AS n_shared, TRUE AS all_ok
            FROM events
        """,
    }
)


QUERIES.update({"window_moments": q_window_moments})
ORACLE_SQL.update(
    {
        "window_moments": """
            WITH c AS (
                SELECT event_id, user_id, ts,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events
            )
            , m AS (
                -- DuckDB windowed SUM(BIGINT) yields DOUBLE: cast back
                -- before the variance arithmetic or precision drifts
                SELECT event_id,
                       COUNT(*) OVER w AS w_count,
                       CAST(SUM(cents) OVER w AS BIGINT) AS w_cents,
                       CAST(SUM(cents * cents) OVER w AS BIGINT) AS w_sumsq
                FROM c
                WINDOW w AS (PARTITION BY user_id ORDER BY ts
                             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                             AND CURRENT ROW)
            )
            SELECT event_id, w_count, w_cents, w_sumsq,
                   w_count * w_sumsq - w_cents * w_cents AS w_var_num
            FROM m
        """,
    }
)


# --- child position family (H3 v4 API; beyond the reference surface) --------


def q_child_pos(sf_dir: str):
    """cellToChildPos / childPosToCell roundtrip over constructed res-5
    cells against their res-2 ancestors.  For hexagon ancestors pos is
    pure digit arithmetic (d3*49 + d4*7 + d5), so the oracle recomputes
    it from event_id; the inverse applied to (ancestor, pos) must
    reproduce the original cell construction bit-for-bit."""

    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        t = kernels.cell_to_child_pos(batch, 2)
        cells = t.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = t.column("child_pos").to_numpy(zero_copy_only=False)
        anc = bits.cell_to_parent(cells, 2)
        rt, _ = bits.child_pos_to_cell(anc, pos, 5)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "child_pos": t.column("child_pos"),
                "rt_cell": pa.array(rt.astype(np.int64)),
            }
        )

    return _events(sf_dir).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


QUERIES.update({"child_pos": q_child_pos})
ORACLE_SQL.update(
    {
        "child_pos": f"""
            SELECT event_id,
                   CAST(((event_id * 5) % 7) * 49 + ((event_id * 6) % 7) * 7
                        + (event_id * 7) % 7 AS BIGINT) AS child_pos,
                   {_CELL_SQL} AS rt_cell
            FROM events
        """,
    }
)


# ---------------------------------------------------------------------------
# interval (temporal range) join
# ---------------------------------------------------------------------------

# promo-window interval parameters shared by the Ray plan and the SQL
# twin: 25 campaign windows derived deterministically from nation keys
# over the events table's January-2024 span
_IV_BASE_US = 1_704_067_200_000_000  # epoch_us(2024-01-01)
_IV_DAY_US = 86_400_000_000


def _promo_intervals(sf_dir: str):
    """25 keyed campaign intervals from nation keys: campaign n targets
    users with user_id % 25 == n, starting at day 2*(n%10) and lasting
    3*(1 + n%5) days — staggered, overlapping, several crossing the
    2-day chunk grid used by the join."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    nk = t.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    istart = _IV_BASE_US + (nk % 10) * 2 * _IV_DAY_US
    iend = istart + (1 + nk % 5) * 3 * _IV_DAY_US
    return ray.data.from_arrow(
        pa.table(
            {
                "interval_id": pa.array(nk),
                "ukey": pa.array(nk),
                "istart": pa.array(istart),
                "iend": pa.array(iend),
            }
        )
    )


def q_interval_join(sf_dir: str):
    """Temporal range join (functions/timeseries.interval_join): each
    event matched to every campaign window covering its timestamp for
    its user cohort (user_id % 25) — SQL BETWEEN join.  Points hash to
    one (key, 2-day-chunk) slot; intervals replicate per overlapped
    chunk (fanout <= 9 here); one exchange, blocked pair expansion."""
    from ..functions import timeseries

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ts_us": pa.array(ts),
                "ukey": pa.array(uid % 25),
            }
        )

    points = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return timeseries.interval_join(
        points,
        _promo_intervals(sf_dir),
        ts_col="ts_us",
        point_id_col="event_id",
        interval_id_col="interval_id",
        key_col="ukey",
        chunk_us=2 * _IV_DAY_US,
        num_buckets=64,
    )


QUERIES.update({"interval_join": q_interval_join})
ORACLE_SQL.update(
    {
        "interval_join": f"""
            SELECT e.event_id AS event_id, n.n_nationkey AS interval_id
            FROM events e
            JOIN nation n ON e.user_id % 25 = n.n_nationkey
             AND epoch_us(e.ts)
                 BETWEEN {_IV_BASE_US} + (n.n_nationkey % 10) * 2 * {_IV_DAY_US}
                     AND {_IV_BASE_US} + (n.n_nationkey % 10) * 2 * {_IV_DAY_US}
                         + (1 + n.n_nationkey % 5) * 3 * {_IV_DAY_US}
        """,
    }
)


# ---------------------------------------------------------------------------
# per-group top-N selection
# ---------------------------------------------------------------------------


def q_top_docs(sf_dir: str):
    """Best-k-per-domain curation (functions/ranking.top_n_per_group):
    the 5 longest documents of every source by n_chars, doc_id
    tie-break — SQL's row_number() PARTITION BY.  Stage-1 partials bound
    the exchange at (sources x 5) rows per block regardless of corpus
    size; string keys bucket via FNV, rank via dictionary densification
    (no Python compares)."""
    from ..functions import ranking

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return ranking.top_n_per_group(
        ds, key_col="source", val_col="n_chars", id_col="doc_id",
        n=5, num_buckets=16,
    )


QUERIES.update({"top_docs": q_top_docs})
ORACLE_SQL.update(
    {
        "top_docs": """
            SELECT source, doc_id, n_chars, rank
            FROM (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id ASC)
                           AS rank
                FROM documents
            )
            WHERE rank <= 5
        """,
    }
)


# ---------------------------------------------------------------------------
# bloom-pruned exact semi / anti joins
# ---------------------------------------------------------------------------


def _bloom_sides(sf_dir: str):
    """Probe = lineitem rows (composite line id for oracle stability);
    build = partkeys of large parts (p_size >= 40, ~20% of part)."""
    import pyarrow.compute as pc

    probe = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey"],
    )
    build = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filter=(pc.field("p_size") >= 40),
    )
    return probe, build


def q_bloom_semijoin(sf_dir: str):
    """Exact SQL IN-subquery semantics through the bloom-routed plan
    (functions/membership.bloom_semijoin): bloom-negative lineitem rows
    drop before the exchange (no false negatives), the positive
    fraction co-groups against per-block-deduped build keys for the
    exact verdict."""
    from ..functions import membership

    probe, build = _bloom_sides(sf_dir)
    return membership.bloom_semijoin(
        probe, build, probe_key_col="l_partkey", key_col="p_partkey",
        carry_cols=("l_orderkey", "l_linenumber", "l_partkey"),
        nbits=1 << 20, num_buckets=32,
    )


def q_bloom_antijoin(sf_dir: str):
    """Decontamination shape: lineitem rows whose partkey is NOT in the
    large-part set — bloom-negative rows bypass the exchange entirely
    (the dominant fraction here), only the positive sliver is verified."""
    from ..functions import membership

    probe, build = _bloom_sides(sf_dir)
    return membership.bloom_semijoin(
        probe, build, probe_key_col="l_partkey", key_col="p_partkey",
        carry_cols=("l_orderkey", "l_linenumber", "l_partkey"),
        anti=True, nbits=1 << 20, num_buckets=32,
    )


QUERIES.update({"bloom_semijoin": q_bloom_semijoin, "bloom_antijoin": q_bloom_antijoin})
ORACLE_SQL.update(
    {
        "bloom_semijoin": """
            SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
        """,
        "bloom_antijoin": """
            SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
            WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size >= 40)
        """,
    }
)


# ---------------------------------------------------------------------------
# distributed quantiles
# ---------------------------------------------------------------------------


def q_group_quantiles(sf_dir: str):
    """Exact per-source length quantiles (functions/quantiles.
    exact_group_quantiles == SQL quantile_disc GROUP BY): per-block
    (key, value) count combiner, one hash(key) exchange, vectorized
    multi-key quantile kernel — nothing on the driver.  Source names
    parse to their numeric suffix so the oracle output stays
    integer-only."""
    import pyarrow.compute as pc

    from ..functions import quantiles

    def prep(batch: pa.Table) -> pa.Table:
        num = pc.cast(
            pc.utf8_slice_codeunits(batch.column("source"), 3, 99), pa.int64()
        )
        return pa.table({"src_num": num, "n_chars": batch.column("n_chars")})

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return quantiles.exact_group_quantiles(
        ds, key_col="src_num", val_col="n_chars",
        qs=(0.25, 0.5, 0.75, 0.875), num_buckets=8,
    )


def q_quantile_sketch(sf_dir: str):
    """Histogram quantile sketch with its certified rank bound: the
    fixed-size mergeable histogram estimates each quantile, then ONE
    distributed strict-rank pass (per-block counter partials) checks
    |#values < estimate  -  ceil(q*n)| <= the chosen bin's count — true
    by construction (quantiles.sketch_quantile), surfaced as the
    bool the oracle pins to TRUE (the HLL exact-twin + flag pattern)."""
    from ..functions import quantiles

    qs = (0.25, 0.5, 0.875)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]
    )
    counts = quantiles.quantile_sketch(ds, "n_chars", lo=0, hi=1024, nbins=512)
    n = int(counts.sum())
    ests, errs = zip(*(quantiles.sketch_quantile(counts, 0, 1024, q) for q in qs))

    def rank_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        ranks = np.array([(v < e).sum() for e in ests], dtype=np.int64)
        return pa.table(
            {"ranks": pa.FixedSizeListArray.from_arrays(pa.array(ranks), len(qs))}
        )

    parts = ds.map_batches(
        rank_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    ranks = np.sum([np.asarray(r["ranks"]) for r in parts], axis=0)
    rows = []
    for q, est, err, rank in zip(qs, ests, errs, ranks):
        target = int(quantiles.disc_rank(q, n))
        rows.append(
            {
                "qmil": int(q * 1000),
                "n": n,
                "ok": bool(abs(int(rank) - target) <= err),
            }
        )
    return pa.table(
        {
            "qmil": pa.array([r["qmil"] for r in rows], pa.int64()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "ok": pa.array([r["ok"] for r in rows]),
        }
    )


QUERIES.update(
    {"group_quantiles": q_group_quantiles, "quantile_sketch": q_quantile_sketch}
)
ORACLE_SQL.update(
    {
        "group_quantiles": """
            SELECT CAST(substr(source, 4) AS BIGINT) AS src_num, qmil,
                   CAST(q_val AS BIGINT) AS q_val
            FROM (
                SELECT source, 250 AS qmil,
                       quantile_disc(n_chars, 0.25) AS q_val
                FROM documents GROUP BY source
                UNION ALL
                SELECT source, 500, quantile_disc(n_chars, 0.5)
                FROM documents GROUP BY source
                UNION ALL
                SELECT source, 750, quantile_disc(n_chars, 0.75)
                FROM documents GROUP BY source
                UNION ALL
                SELECT source, 875, quantile_disc(n_chars, 0.875)
                FROM documents GROUP BY source
            )
        """,
        "quantile_sketch": """
            SELECT q.qmil AS qmil,
                   (SELECT count(*) FROM documents) AS n,
                   TRUE AS ok
            FROM (VALUES (250), (500), (875)) q(qmil)
        """,
    }
)


# ---------------------------------------------------------------------------
# nearest-anchor assignment (geo Voronoi labeling)
# ---------------------------------------------------------------------------


def q_nearest_anchor(sf_dir: str):
    """Every event labeled with its nearest of 25 anchor sites by
    great-circle distance (join.nearest_anchor_join): anchors broadcast
    once, per-batch vectorized haversine matrix, NO exchange.  Ties
    break toward the smallest anchor id on both engines (anchors are
    ~14 degrees apart minimum, so cross-engine float noise at Voronoi
    boundaries is not reachable by the synthetic grid coordinates)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    nk = t.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    alat = ((nk * 13) % 140 - 70).astype(np.float64) + 0.5
    alng = ((nk * 53) % 340 - 170).astype(np.float64) + 0.5

    def add_coords(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        batch = batch.append_column("lat", pa.array(event_lat(eid)))
        return batch.append_column("lng", pa.array(event_lng(eid)))

    pts = _events(sf_dir).map_batches(
        add_coords, batch_format="pyarrow", zero_copy_batch=True
    )
    return join_mod.nearest_anchor_join(
        pts, nk, alat, alng, carry_cols=("event_id",), out_col="anchor_id"
    )


QUERIES.update({"nearest_anchor": q_nearest_anchor})
ORACLE_SQL.update(
    {
        "nearest_anchor": """
            WITH pts AS (
                SELECT event_id,
                       ((event_id * 37) % 16000) / 100.0 - 80.0 AS lat,
                       ((event_id * 73) % 36000) / 100.0 - 180.0 AS lng
                FROM events
            ), anchors AS (
                SELECT n_nationkey AS aid,
                       (n_nationkey * 13) % 140 - 70 + 0.5 AS alat,
                       (n_nationkey * 53) % 340 - 170 + 0.5 AS alng
                FROM nation
            ), d AS (
                SELECT p.event_id, a.aid,
                       2 * asin(sqrt(
                           sin(radians(a.alat - p.lat) / 2)
                             * sin(radians(a.alat - p.lat) / 2)
                           + cos(radians(p.lat)) * cos(radians(a.alat))
                             * sin(radians(a.alng - p.lng) / 2)
                             * sin(radians(a.alng - p.lng) / 2)
                       )) AS dist
                FROM pts p CROSS JOIN anchors a
            )
            SELECT event_id, aid AS anchor_id
            FROM (
                SELECT event_id, aid,
                       row_number() OVER (PARTITION BY event_id
                                          ORDER BY dist, aid) AS rn
                FROM d
            )
            WHERE rn = 1
        """,
    }
)


def q_ann_quantized(sf_dir: str):
    """int8-quantized ANN vs the float brute force (functions/ann.
    quantized_topk): both top-5 lists computed distributedly for the
    first 10 query vectors, per-query recall@5 must clear 0.8 (the HLL
    flag pattern — quantization error is deterministic for this fixed
    corpus, so the bool is stable; a quantizer regression flips it).
    Self-top-1 is additionally pinned exactly."""
    from ..functions import ann as ann_fns

    ids, Q = _query_vectors(sf_dir, 10)
    quant = ann_fns.quantized_topk(_embeddings_ds(sf_dir), ids, Q, k=5)
    exact = ann_fns.bruteforce_topk(_embeddings_ds(sf_dir), ids, Q, k=5)

    def per_query_sets(t: pa.Table):
        q = t.column("query_id").to_numpy(zero_copy_only=False)
        v = t.column("vec_id").to_numpy(zero_copy_only=False)
        out = {}
        for qq, vv in zip(q, v):
            out.setdefault(int(qq), set()).add(int(vv))
        return out

    gs, es = per_query_sets(quant), per_query_sets(exact)
    qt = quant.to_pandas()
    self1 = qt[qt["rank"] == 0].set_index("query_id")["vec_id"]
    rows = sorted(
        (
            int(qid),
            bool(len(gs[qid] & es[qid]) >= 4),
            bool(self1.loc[qid] == qid),
        )
        for qid in es
    )
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "recall_ok": pa.array([r[1] for r in rows]),
            "self_top1": pa.array([r[2] for r in rows]),
        }
    )


QUERIES.update({"ann_quantized": q_ann_quantized})
ORACLE_SQL.update(
    {
        "ann_quantized": """
            SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS self_top1
            FROM embeddings ORDER BY vec_id LIMIT 10
        """,
    }
)


def q_mode_per_group(sf_dir: str):
    """Most frequent quantity per part (ranking.mode_per_group ==
    SQL's count-ranked row_number): the (key, value)-count combiner
    bounds the exchange at per-block distinct pairs; ties break toward
    the smallest value on both engines."""
    from ..functions import ranking

    def prep(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": batch.column("l_partkey"),
                "qty": pa.array(np.floor(q + 0.5).astype(np.int64)),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return ranking.mode_per_group(
        ds, key_col="l_partkey", val_col="qty", num_buckets=16
    )


QUERIES.update({"mode_per_group": q_mode_per_group})
ORACLE_SQL.update(
    {
        "mode_per_group": """
            SELECT l_partkey, mode_val, mode_count
            FROM (
                SELECT l_partkey,
                       CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS mode_val,
                       count(*) AS mode_count,
                       row_number() OVER (
                           PARTITION BY l_partkey
                           ORDER BY count(*) DESC,
                                    CAST(FLOOR(l_quantity + 0.5) AS BIGINT) ASC
                       ) AS rn
                FROM lineitem
                GROUP BY 1, 2
            )
            WHERE rn = 1
        """,
    }
)


# ---------------------------------------------------------------------------
# cross-document repeated-segment removal (line dedup family)
# ---------------------------------------------------------------------------


def q_line_dedup(sf_dir: str):
    """CCNet-style duplicated-segment removal
    (functions/linedup.remove_duplicated_segments): segments occurring
    in >= 76% of documents are stripped from every document (on this
    single-line corpus the delimiter is ' ', i.e. boilerplate-token
    pruning; with '\\n' the identical plan is classic line dedup —
    pinned by tests/test_linedup.py on multi-line text).  The threshold
    is integer-exact on both sides: df * 100 >= 76 * n_docs."""
    import pyarrow.parquet as pq

    from ..functions import linedup

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    min_docs = -(-76 * n_docs // 100)  # ceil(0.76 * n) in exact ints
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = linedup.remove_duplicated_segments(
        ds, text_col="text", delim=b" ", min_docs=min_docs, num_buckets=16
    )
    return out.drop_columns(["text"])


QUERIES.update({"line_dedup": q_line_dedup})
ORACLE_SQL.update(
    {
        "line_dedup": r"""
            WITH toks AS (
                SELECT doc_id, unnest(arr) AS tok,
                       generate_subscripts(arr, 1) AS i
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(text), '\s+') AS arr
                      FROM documents)
            ),
            tk AS (SELECT * FROM toks WHERE tok <> ''),
            dup AS (
                SELECT tok FROM tk GROUP BY tok
                HAVING count(DISTINCT doc_id) * 100
                       >= 76 * (SELECT count(*) FROM documents)
            )
            SELECT d.doc_id AS doc_id,
                   coalesce(string_agg(
                       CASE WHEN tk.tok IN (SELECT tok FROM dup) THEN NULL
                            ELSE tk.tok END, ' ' ORDER BY tk.i), '')
                       AS kept_text,
                   CAST(count(CASE WHEN tk.tok IS NOT NULL AND tk.tok NOT IN
                                   (SELECT tok FROM dup) THEN 1 END) AS BIGINT)
                       AS n_kept,
                   CAST(count(CASE WHEN tk.tok IN (SELECT tok FROM dup)
                                   THEN 1 END) AS BIGINT) AS n_dropped
            FROM documents d LEFT JOIN tk ON d.doc_id = tk.doc_id
            GROUP BY d.doc_id
        """,
    }
)


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 12 * 3_600_000_000  # 12 h inactivity ends a session


def _session_events(sf_dir: str):
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(
        lambda b: pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_us": pa.array(
                    b.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_sessionize(sf_dir: str):
    """Per-event session labels (functions/timeseries.sessionize): a new
    session starts after > 12 h of inactivity for the same user — SQL's
    sum(gap_break) OVER (PARTITION BY user ORDER BY ts, id).  Whole-key
    buckets, one exchange, one lexsort+cumsum kernel per bucket."""
    from ..functions import timeseries

    return timeseries.sessionize(
        _session_events(sf_dir),
        key_col="user_id",
        ts_col="ts_us",
        id_col="event_id",
        gap_us=_SESSION_GAP_US,
        num_buckets=64,
        emit="events",
    )


def q_session_stats(sf_dir: str):
    """Session-level rollup of the same segmentation: one row per
    (user, session) with event count, duration and start — computed
    in-kernel from the contiguous sorted runs, no second exchange."""
    from ..functions import timeseries

    return timeseries.sessionize(
        _session_events(sf_dir),
        key_col="user_id",
        ts_col="ts_us",
        id_col="event_id",
        gap_us=_SESSION_GAP_US,
        num_buckets=64,
        emit="sessions",
    )


_SESSION_SQL_BASE = f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
    b AS (
        SELECT event_id, user_id, ts_us,
               CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    s AS (
        SELECT event_id, user_id, ts_us,
               CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us,
                    event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM b
    )
"""

QUERIES.update({"sessionize": q_sessionize, "session_stats": q_session_stats})
ORACLE_SQL.update(
    {
        "sessionize": _SESSION_SQL_BASE
        + "SELECT event_id, user_id, session_seq FROM s",
        "session_stats": _SESSION_SQL_BASE
        + """
            SELECT user_id, session_seq,
                   CAST(count(*) AS BIGINT) AS n_events,
                   max(ts_us) - min(ts_us) AS duration_us,
                   min(ts_us) AS start_us
            FROM s GROUP BY user_id, session_seq
        """,
    }
)


# ---------------------------------------------------------------------------
# vocabulary statistics + term search
# ---------------------------------------------------------------------------


def q_vocab_stats(sf_dir: str):
    """Corpus vocabulary table (functions/text.token_doc_stats): df and
    tf per distinct whitespace token — the document-frequency stats
    behind stopword pruning / idf / tokenizer vocab selection.
    Dictionary-encoded per-batch partials + one bucketed merge."""
    from ..functions import text as textops

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return textops.token_doc_stats(ds, num_buckets=16)


_SEARCH_TERMS = ["dup", "key", "line", "vector"]


def q_term_search(sf_dir: str):
    """Bag-of-words top-20 retrieval (functions/text.term_search):
    score = total query-term occurrences per doc, doc_id tie-break —
    SQL row_number over a grouped count.  Terms broadcast once; global
    top-k through the partial-top-k combiner (k rows per block)."""
    from ..functions import text as textops

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return textops.term_search(ds, _SEARCH_TERMS, k=20)


QUERIES.update({"vocab_stats": q_vocab_stats, "term_search": q_term_search})
ORACLE_SQL.update(
    {
        "vocab_stats": r"""
            SELECT tok AS term,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                   CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                  FROM documents)
            WHERE tok <> '' GROUP BY tok
        """,
        "term_search": r"""
            SELECT doc_id, CAST(score AS BIGINT) AS score,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank
            FROM (
                SELECT doc_id, count(*) AS score
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text), '\s+'))
                                 AS tok
                      FROM documents)
                WHERE tok IN ('dup', 'key', 'line', 'vector')
                GROUP BY doc_id
            ) QUALIFY rank <= 20
        """,
    }
)


# ---------------------------------------------------------------------------
# exact per-group distinct counts
# ---------------------------------------------------------------------------


def q_group_distinct(sf_dir: str):
    """Exact count(DISTINCT part) per supplier
    (functions/sampling.exact_group_distinct — the grouped exact twin of
    the HLL sketch): per-block pair dedupe, pair-bucketed global dedupe
    with per-key partials, key-bucketed sum — both exchanges ship
    pre-deduplicated rows, never raw occurrences."""
    from ..functions import sampling

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )
    return sampling.exact_group_distinct(
        ds, key_col="l_suppkey", val_col="l_partkey", num_buckets=16
    )


QUERIES.update({"group_distinct": q_group_distinct})
ORACLE_SQL.update(
    {
        "group_distinct": """
            SELECT l_suppkey,
                   CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
            FROM lineitem GROUP BY l_suppkey
        """,
    }
)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def q_decontaminate(sf_dir: str):
    """Eval-set leakage flagging (functions/decontam.flag_contaminated):
    docs sharing any word 3-gram with the 'benchmark' subset
    (doc_id % 97 == 0) are flagged; n_hits counts the overlapping gram
    instances.  Benchmark gram hashes tree-reduce once and broadcast;
    the corpus side is a single probe map with NO exchange."""
    from ..functions import decontam

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def bench_rows(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(did % 97 == 0))

    bench = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(bench_rows, batch_format="pyarrow", zero_copy_batch=True)
    out = decontam.flag_contaminated(docs, bench, n=3)
    return out.drop_columns(["text"])


QUERIES.update({"decontaminate": q_decontaminate})
ORACLE_SQL.update(
    {
        "decontaminate": r"""
            WITH toks AS (
                SELECT doc_id, unnest(arr) AS tok,
                       generate_subscripts(arr, 1) AS i
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(text), '\s+') AS arr
                      FROM documents)
            ),
            tk AS (SELECT * FROM toks WHERE tok <> ''),
            g AS (
                SELECT a.doc_id,
                       a.tok || ' ' || b.tok || ' ' || c.tok AS gram
                FROM tk a
                JOIN tk b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN tk c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            ),
            bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
            SELECT d.doc_id AS doc_id,
                   CAST(coalesce(sum(CASE WHEN g.gram IN
                       (SELECT gram FROM bench) THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS n_hits,
                   coalesce(sum(CASE WHEN g.gram IN (SELECT gram FROM bench)
                       THEN 1 ELSE 0 END), 0) > 0 AS contaminated
            FROM documents d LEFT JOIN g ON g.doc_id = d.doc_id
            GROUP BY d.doc_id
        """,
    }
)


def q_polyfill_split(sf_dir: str):
    """Value-oracled heavy-polygon WINDOW-SPLIT polyfill (round-5 skew
    operator, vector.polyfill_skew_routed): every nation rect polyfills
    at res 5 with split_cells=1 so each rect fans out over split_grid^2
    half-open ownership windows; the distributed result per rect must
    equal the single-task `polygon_to_cells` run cell-for-cell (the
    exactness claim of polygon_split_windows) — SQL states the equality
    and nonemptiness as TRUE per rect.  The rect corner columns ride
    through the explode as carry columns, so the verify kernel rebuilds
    each ring without re-reading the table."""
    from .. import vector as vector_mod
    from ..h3core import polyfill as polyfill_mod
    from ..h3core import wkb as wkb_mod

    def mk_geoms(batch: pa.Table) -> pa.Table:
        ids = batch.column("n_nationkey").to_numpy(zero_copy_only=False)
        lat0 = (ids * 11 % 140) - 70.0
        lng0 = (ids * 29 % 340) - 170.0
        lat1, lng1 = lat0 + 9.0, lng0 + 13.0
        geoms = []
        for j in range(len(ids)):
            ring = np.array(
                [[lng0[j], lat0[j]], [lng1[j], lat0[j]], [lng1[j], lat1[j]],
                 [lng0[j], lat1[j]], [lng0[j], lat0[j]]]
            )
            geoms.append(wkb_mod.dumps_polygon([ring]))
        return pa.table(
            {
                "rect_id": pa.array(ids.astype(np.int64)),
                "lng0": pa.array(lng0), "lat0": pa.array(lat0),
                "geometry": pa.array(geoms, type=pa.large_binary()),
            }
        )

    def verify(batch: pa.Table) -> pa.Table:
        rid = int(batch.column("rect_id")[0].as_py())
        lng0 = float(batch.column("lng0")[0].as_py())
        lat0 = float(batch.column("lat0")[0].as_py())
        ring = np.array(
            [[lng0, lat0], [lng0 + 13.0, lat0], [lng0 + 13.0, lat0 + 9.0],
             [lng0, lat0 + 9.0], [lng0, lat0]]
        )
        want = polyfill_mod.polygon_to_cells(
            {"type": "Polygon", "rings": [ring]}, 5, "containscentroid"
        )
        got = np.sort(
            batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table(
            {
                "rect_id": pa.array([rid], type=pa.int64()),
                "nonempty": pa.array([len(got) > 0]),
                "split_matches": pa.array([np.array_equal(got, want)]),
            }
        )

    geoms = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).map_batches(mk_geoms, batch_format="pyarrow", zero_copy_batch=True)
    cells = vector_mod.polyfill_skew_routed(
        geoms, resolution=5, split_cells=1, split_grid=3
    )
    # 25 rects: a bounded groupby — the per-rect set-equality check
    return cells.groupby("rect_id").map_groups(verify, batch_format="pyarrow")


def q_pii_redact(sf_dir: str):
    """Value-oracled PII scrub (functions/text.redact_pii — the standard
    pre-training redaction pass): deterministic PII is planted (every
    doc_id % 7 == 0 gets an email + IPv4 tail, % 13 == 0 a phone tail),
    then emails/IPv4s/phone runs redact to typed placeholders with a
    per-doc count.  Both pyarrow.compute and DuckDB compile regexes with
    RE2, so the SQL twin applies the IDENTICAL patterns via
    regexp_replace(..., 'g') / regexp_extract_all — full redacted-TEXT
    parity, not just counts."""
    import pyarrow.compute as pc

    from ..functions.text import redact_pii

    def k(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        text = batch.column("text")
        tail7 = np.where(ids % 7 == 0,
                         " contact bob@example.com or 192.168.1.1", "")
        tail13 = np.where(ids % 13 == 0, " call +1 (415) 555-0101 now", "")
        text = pc.binary_join_element_wise(
            text, pa.array(tail7), pa.array(tail13), ""
        )
        t = pa.table({"doc_id": batch.column("doc_id"), "text": text})
        return redact_pii(t)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def _pii_oracle_sql() -> str:
    """Build the pii_redact SQL twin FROM text.PII_PATTERNS, so the
    oracle's regexes are byte-identical to the engine's by construction
    (a hand-maintained copy would silently drift on any pattern edit).
    Counts are coalesce'd so a NULL text yields n_redactions = 0 on both
    sides (the engine fill_null's the count; text stays NULL on both)."""
    from ..functions.text import PII_PATTERNS

    # the SQL chain below applies stages in this exact order — must match
    # the engine's iteration order over PII_PATTERNS
    assert [n for n, _, _ in PII_PATTERNS] == ["email", "ipv4", "phone"]
    by_name = {name: (pat, repl) for name, pat, repl in PII_PATTERNS}
    p_email, p_ip, p_phone = (
        by_name["email"][0], by_name["ipv4"][0], by_name["phone"][0]
    )
    assert by_name["email"][1] == "<EMAIL>"  # SQL literals below mirror
    assert by_name["ipv4"][1] == "<IP>"
    assert by_name["phone"][1] == "<PHONE>"
    return f"""
        WITH planted AS (
            SELECT doc_id,
                   text ||
                   CASE WHEN doc_id % 7 = 0
                        THEN ' contact bob@example.com or 192.168.1.1'
                        ELSE '' END ||
                   CASE WHEN doc_id % 13 = 0
                        THEN ' call +1 (415) 555-0101 now'
                        ELSE '' END AS text
            FROM documents
        ), r1 AS (
            SELECT doc_id,
                   CAST(coalesce(len(regexp_extract_all(text, '{p_email}')),
                        0) AS BIGINT) AS n1,
                   regexp_replace(text, '{p_email}', '<EMAIL>', 'g') AS text
            FROM planted
        ), r2 AS (
            SELECT doc_id,
                   n1 + CAST(coalesce(len(regexp_extract_all(text, '{p_ip}')),
                        0) AS BIGINT) AS n2,
                   regexp_replace(text, '{p_ip}', '<IP>', 'g') AS text
            FROM r1
        )
        SELECT doc_id,
               regexp_replace(text, '{p_phone}', '<PHONE>', 'g') AS text,
               n2 + CAST(coalesce(len(regexp_extract_all(text, '{p_phone}')),
                    0) AS BIGINT) AS n_redactions
        FROM r2
    """


QUERIES.update({"pii_redact": q_pii_redact})
ORACLE_SQL.update({"pii_redact": _pii_oracle_sql()})


QUERIES.update({"polyfill_split": q_polyfill_split})
ORACLE_SQL.update(
    {
        "polyfill_split": """
            SELECT CAST(n_nationkey AS BIGINT) AS rect_id, TRUE AS nonempty,
                   TRUE AS split_matches
            FROM nation
        """,
    }
)


# ---------------------------------------------------------------------------
# registry ordering
# ---------------------------------------------------------------------------
#
# The driver's per-round CORRECTNESS window covers the FIRST 50 entries of
# `queries()` in insertion order.  Rounds 1-4 accumulated driver-green rows
# for the first 50 keys above, but everything registered after `dissolve`
# (the round-4 additions) never entered the window.  Reorder so the window
# covers (a) the 27 operators with no driver-green row yet, (b) the 5
# queries whose exchanges were reworked this round (bucketed LSH /
# fingerprint dedup / bucketed CC — re-verify after the change), and
# (c) representative keepers for the flagship / PIP / ANN / raster / localij
# families.  Already-green redundant twins (pip_join_salted/hash/adaptive,
# asof twin, scalar kernels) move past the window — their green rows stand
# in CORRECTNESS_r01..r04.


def q_ring_size(sf_dir: str):
    """Value-oracled distributed grid_ring (kernels.grid_ring flattened
    rows): rings 1..2 of every event cell have exactly 6+12 members (the
    synthesized res-5 event cells — _construct_cells — never sit within
    k=2 of a pentagon), and the origin is never its own ring member
    (k >= 1)."""
    from .. import kernels as kernels_mod

    def k(batch: pa.Table) -> pa.Table:
        batch = _with_cells(batch)
        withpos = batch.select(["event_id", "cell"]).append_column(
            "row", pa.array(np.arange(len(batch), dtype=np.int64))
        )
        rings = kernels_mod.grid_ring(withpos, 1, 2)
        rows = rings.column("row").to_numpy(zero_copy_only=False)
        cells = rings.column("cell").to_numpy(zero_copy_only=False)
        members = rings.column("ring_cell").to_numpy(zero_copy_only=False)
        # a ring explode never leaves its batch: count in-block, no exchange
        n = np.bincount(rows, minlength=len(batch)).astype(np.int64)
        hits = np.bincount(
            rows, weights=(cells == members), minlength=len(batch)
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ring_n": pa.array(n),
                "self_hits": pa.array(hits),
            }
        )

    return _events(sf_dir).map_batches(
        k, batch_format="pyarrow", zero_copy_batch=True
    )


def q_url_extract(sf_dir: str):
    """Value-oracled URL extraction (functions/text.extract_url_stats):
    deterministic links are planted (every 5th doc gets one, every 15th
    a second on another host) and the per-doc count + first host must
    match DuckDB applying the byte-identical RE2 patterns."""
    from ..functions import text as text_fns

    def k(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        host = pc.binary_join_element_wise(
            "site", pa.array((did % 7).astype(str)), ".example.org", ""
        )
        add1 = pc.binary_join_element_wise(
            " see https://", host, "/p/", pa.array(did.astype(str)), ""
        )
        text = batch.column("text")
        # binary_join_element_wise needs ALL operands (incl. the separator
        # literal) on one string type — corpora read via the JSONL/CSV
        # sources may carry large_string
        ttype = pa.large_string() if pa.types.is_large_string(text.type) \
            else pa.string()
        empty = pa.scalar("", type=ttype)
        text = pc.if_else(
            pa.array(did % 5 == 0),
            pc.binary_join_element_wise(text, add1.cast(ttype), empty),
            text,
        )
        text = pc.if_else(
            pa.array(did % 15 == 0),
            pc.binary_join_element_wise(
                text,
                pa.scalar(" and http://mirror.example.net/x", type=ttype),
                empty,
            ),
            text,
        )
        out = text_fns.extract_url_stats(
            pa.table({"doc_id": batch.column("doc_id"), "text": text})
        )
        return out.select(["doc_id", "n_urls", "first_host"])

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow", zero_copy_batch=True)


def _url_oracle_sql() -> str:
    """SQL twin built FROM the module's own patterns (byte-identical RE2
    on both sides; the engine's corpus text plants no urls of its own —
    asserted by the n_urls=0 branch for unplanted docs)."""
    from ..functions.text import URL_HOST_PATTERN, URL_PATTERN

    return f"""
        WITH planted AS (
            SELECT doc_id,
                   text ||
                   CASE WHEN doc_id % 5 = 0
                        THEN ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                             || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                        ELSE '' END ||
                   CASE WHEN doc_id % 15 = 0
                        THEN ' and http://mirror.example.net/x'
                        ELSE '' END AS text
            FROM documents
        )
        SELECT doc_id,
               CAST(coalesce(len(regexp_extract_all(text, '{URL_PATTERN}')),
                    0) AS BIGINT) AS n_urls,
               coalesce(regexp_extract(text, '{URL_HOST_PATTERN}', 1), '')
                   AS first_host
        FROM planted
    """


QUERIES.update({"url_extract": q_url_extract})
ORACLE_SQL.update({"url_extract": _url_oracle_sql()})


QUERIES.update({"ring_size": q_ring_size})
ORACLE_SQL.update(
    {
        "ring_size": """
            SELECT event_id, CAST(18 AS BIGINT) AS ring_n,
                   CAST(0 AS BIGINT) AS self_hits
            FROM events
        """,
    }
)


_WINDOW_PRIORITY = [
    # (a) driver-unverified round-4 operators
    "dissolve", "window_agg", "asof_join", "asof_chunked", "are_neighbor",
    "cms_counts", "edge_construct", "icosa_faces", "cell_vertexes",
    "window_moments", "child_pos", "interval_join", "top_docs",
    "bloom_semijoin", "bloom_antijoin", "group_quantiles", "quantile_sketch",
    "nearest_anchor", "ann_quantized", "mode_per_group", "line_dedup",
    "sessionize", "session_stats", "vocab_stats", "term_search",
    "group_distinct", "decontaminate",
    # (b) exchanges reworked in round 5
    "exact_dedup", "minhash_pairs", "simhash_bands", "minhash_dup_rank",
    "dedup_clusters",
    # (c) operators NEW in round 5 (driver-green nowhere yet)
    "polyfill_split", "pii_redact", "ring_size", "url_extract",
    # (d) family keepers (raster_pixel_agg / rasterize_roundtrip rotated
    # out: both r4 hash_match, value-anchored by goldens + pytest)
    "flagship_resumable", "pip_join", "pip_join_fine", "jaccard_verify",
    "embedding_dup_pairs", "ann_ivf", "ivf_recall", "compact_invariant",
    "polyfill_rects", "hull_centroid", "localij", "grid_distance_path",
    "latlng_cells", "corpus_geo_cells",
]

assert len(_WINDOW_PRIORITY) == 50, len(_WINDOW_PRIORITY)
_missing = [k for k in _WINDOW_PRIORITY if k not in QUERIES]
assert not _missing, _missing
QUERIES = {k: QUERIES[k] for k in _WINDOW_PRIORITY} | {
    k: v for k, v in QUERIES.items() if k not in _WINDOW_PRIORITY
}
