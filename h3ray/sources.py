"""Input sources: format-dispatched corpus reading + fragment discovery.

At production scale the corpus is a LANCE table of interleaved documents
(BASELINE input_hint); the driver's testdata is parquet.  Both formats
present the same two capabilities the engine needs:

  * a streaming ``ray.data.Dataset`` scan with column pruning, and
  * a stable FRAGMENT list — the unit of work for the resumable flagship
    (one lineage-committed partition per fragment; Lance fragments and
    parquet files are interchangeable here).

The Lance wheel is not installed in this environment, so the Lance branch
is import-gated with a precise error; the parquet branch is the fully
exercised path (same call sites, same semantics).  No other code needs to
know the storage format.
"""

from __future__ import annotations

import glob
import os


def detect_format(path: str) -> str:
    """'lance' for a .lance dataset dir, 'jsonl' / 'csv' by extension,
    else 'parquet'."""
    if path.endswith(".lance") or (
        os.path.isdir(path) and glob.glob(os.path.join(path, "*.lance"))
    ):
        return "lance"
    lowered = path.lower()
    if lowered.endswith((".jsonl", ".json", ".ndjson")) or (
        os.path.isdir(path)
        and any(glob.glob(os.path.join(path, p)) for p in _JSONL_GLOBS)
    ):
        # NOTE: routed to ray.data.read_json, which parses LINE-DELIMITED
        # JSON only — a single standard-JSON array file will fail to parse
        return "jsonl"
    if lowered.endswith((".csv", ".csv.gz")) or (
        os.path.isdir(path)
        and any(glob.glob(os.path.join(path, p)) for p in _CSV_GLOBS)
    ):
        return "csv"
    return "parquet"


_JSONL_GLOBS = ("*.jsonl", "*.ndjson", "*.json")
_CSV_GLOBS = ("*.csv", "*.csv.gz")


def _require_lance():
    try:
        import lance  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Lance support requires the 'pylance' package (unavailable in "
            "this environment); the parquet path is format-equivalent — "
            "point the same call at a parquet directory"
        ) from exc


def read_table_dataset(path: str, format: str = "auto", columns=None,
                       **read_kwargs):
    """Streaming Dataset scan of a corpus table in either format, with
    column pruning pushed into the read."""
    import ray

    fmt = detect_format(path) if format == "auto" else format
    if fmt == "lance":
        _require_lance()
        return ray.data.read_lance(path, columns=columns, **read_kwargs)
    if fmt == "jsonl":
        # Ray's JSON reader has no column pushdown; prune post-read so the
        # object store (not worker heaps) carries only the needed columns.
        # file_extensions=None: _expand already resolved explicit paths, and
        # Ray's default extension filter would silently drop .ndjson files.
        read_kwargs.setdefault("file_extensions", None)
        ds = ray.data.read_json(_expand(path, _JSONL_GLOBS), **read_kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if fmt == "csv":
        ds = ray.data.read_csv(_expand(path, _CSV_GLOBS), **read_kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not paths:
            raise FileNotFoundError(
                f"no *.parquet files in {path!r} — mistyped corpus path? "
                "(an empty scan would otherwise 'succeed' over zero rows)"
            )
    else:
        paths = path
    return ray.data.read_parquet(paths, columns=columns, **read_kwargs)


def _expand(path: str, patterns: tuple[str, ...]):
    """Directory -> sorted file list over all patterns (loud on empty);
    file -> itself."""
    if os.path.isdir(path):
        paths = sorted(
            f for p in patterns for f in glob.glob(os.path.join(path, p))
        )
        if not paths:
            raise FileNotFoundError(
                f"no files matching {patterns!r} in {path!r} — mistyped "
                "corpus path? (an empty scan would otherwise 'succeed' "
                "over zero rows)"
            )
        return paths
    return path


def list_fragments(path: str, format: str = "auto",
                   pattern: str = "*.parquet") -> list[str]:
    """Stable, sorted fragment identifiers — the partition unit for
    resumable lineage (lineage.run_partitioned).  Parquet: one file per
    fragment.  Lance: one dataset fragment id per entry (gated)."""
    fmt = detect_format(path) if format == "auto" else format
    if fmt == "lance":
        _require_lance()
        import lance

        ds = lance.dataset(path)
        return [f"{path}#fragment-{f.fragment_id}" for f in ds.get_fragments()]
    if os.path.isdir(path):
        frags = sorted(glob.glob(os.path.join(path, pattern)))
        if not frags:
            raise FileNotFoundError(
                f"no fragments matching {pattern!r} in {path!r} — a "
                "resumable run over zero partitions would report success "
                "with no output"
            )
        return frags
    return [path]
