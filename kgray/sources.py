"""Source/sink format adapters (SURVEY.md §2.1 widening).

Parquet is the production format: column pruning and row-group
parallelism happen AT the read, so a 2-column transform over a wide
table never ships the other columns. CSV and JSONL adapters cover
ingest/export interchange; both are row-oriented, so pruning can only
happen post-read (`select_columns` right after — Ray fuses it into
the read stage, but the bytes are still parsed). That asymmetry is
why every internal stage standardizes on parquet.
"""

from __future__ import annotations

from ray.data import Dataset


def read_table(
    path: str,
    *,
    format: str = "parquet",
    columns: list[str] | None = None,
    **kwargs,
) -> Dataset:
    """Read a table in `format`; prune to `columns` as early as the
    format allows (at the read for parquet, first post-read stage for
    CSV/JSONL)."""
    import ray.data as rd

    if format == "parquet":
        return rd.read_parquet(path, columns=columns, **kwargs)
    if format == "csv":
        ds = rd.read_csv(path, **kwargs)
    elif format in ("json", "jsonl"):
        ds = rd.read_json(path, **kwargs)
    else:
        raise ValueError(f"unknown format {format!r}")
    return ds.select_columns(columns) if columns else ds


def write_table(ds: Dataset, path: str, *, format: str = "parquet", **kwargs) -> None:
    """Write `ds` under `path` (one file per block — resumable,
    never one giant file)."""
    if format == "parquet":
        ds.write_parquet(path, **kwargs)
    elif format == "csv":
        ds.write_csv(path, **kwargs)
    elif format in ("json", "jsonl"):
        ds.write_json(path, **kwargs)
    else:
        raise ValueError(f"unknown format {format!r}")
