"""Source/sink format adapters (SURVEY.md §2.1 widening).

Parquet is the production format: column pruning and row-group
parallelism happen AT the read, so a 2-column transform over a wide
table never ships the other columns. CSV and JSONL adapters cover
ingest/export interchange; both are row-oriented, so pruning can only
happen post-read (`select_columns` right after — Ray fuses it into
the read stage, but the bytes are still parsed). That asymmetry is
why every internal stage standardizes on parquet.

Arrow IPC (feather v2) is the zero-parse interchange format: record
batches map 1:1 onto Ray blocks on both read (one block per IPC batch
— file-level AND batch-level parallelism) and write (one IPC file per
block, so output stays resumable per partition, never one giant
file). Ray 2.49 has no built-in IPC connector; these are thin
`FileBasedDatasource` / `BlockBasedFileDatasink` subclasses — the
same extension points Ray's own CSV/JSON connectors use.
"""

from __future__ import annotations

from ray.data import Dataset
from ray.data.datasource import FileBasedDatasource
from ray.data.datasource.file_datasink import BlockBasedFileDatasink


class IpcDatasource(FileBasedDatasource):
    """Arrow IPC file (feather v2) source: yields one table per record
    batch, so a many-batch file parallelizes beyond file granularity."""

    _FILE_EXTENSIONS = ["arrow", "ipc", "feather"]

    def _read_stream(self, f, path: str):
        import pyarrow as pa

        # the stream Ray hands over is not seekable and the IPC FILE
        # format needs random access for its footer — buffer the file
        # (bounded: the sink writes one block per file)
        reader = pa.ipc.open_file(pa.BufferReader(f.read()))
        for i in range(reader.num_record_batches):
            batch = reader.get_batch(i)
            yield pa.Table.from_batches([batch])


class IpcDatasink(BlockBasedFileDatasink):
    """Arrow IPC file sink: one `.arrow` file per block."""

    def __init__(self, path: str, **file_datasink_kwargs):
        super().__init__(path, file_format="arrow", **file_datasink_kwargs)

    def write_block_to_file(self, block, file) -> None:
        import pyarrow as pa

        table = block.to_arrow()
        with pa.ipc.new_file(file, table.schema) as writer:
            writer.write_table(table)


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
    if format in ("arrow", "ipc", "feather"):
        ds = rd.read_datasource(IpcDatasource(path, **kwargs))
        return ds.select_columns(columns) if columns else ds
    if format in ("binary", "binary_files"):
        # multimodal ingest: one row per file, (bytes, path) — the
        # idiomatic way raw image/audio/video blobs enter a pipeline;
        # columns does not apply (the row IS the payload + provenance)
        return rd.read_binary_files(path, include_paths=True, **kwargs)
    if format == "text":
        # one row per line ("text" column) — raw-corpus ingest for
        # line-delimited dumps that aren't even JSONL yet
        ds = rd.read_text(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
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
    elif format in ("arrow", "ipc", "feather"):
        ds.write_datasink(IpcDatasink(path, **kwargs))
    elif format == "csv":
        ds.write_csv(path, **kwargs)
    elif format in ("json", "jsonl"):
        ds.write_json(path, **kwargs)
    else:
        raise ValueError(f"unknown format {format!r}")
