"""Additional columnar file-format connectors: ORC and Feather
(Arrow IPC), built on Ray Data's ``FileBasedDatasource`` — the
idiomatic plug for a format without a native ``rd.read_*``: files are
the parallelism unit (one read task per file / file group, streaming
with backpressure like every other source), and column pruning is
pushed into the format reader itself (ORC reads only the selected
column streams per stripe; IPC projects record batches as they are
mapped), so a 2-column transform never decodes the whole table.

Registered in the connector registry (sources/catalog.py S5 surface)
as ``orc`` and ``feather``; row filters follow the registry's
post-scan contract for formats without row-group statistics
pushdown."""

from __future__ import annotations

from typing import Iterator, List, Optional

import pyarrow as pa

from ray.data.datasource import FileBasedDatasource


class _RandomAccessFileDatasource(FileBasedDatasource):
    """Base for formats that need a SEEKABLE file (footer-indexed:
    ORC stripes, Arrow-IPC file framing) — the default datasource
    open is a forward-only stream."""

    def _open_input_source(self, filesystem, path: str, **open_args):
        return filesystem.open_input_file(path)


class ORCDatasource(_RandomAccessFileDatasource):
    """One stripe-streaming read task per ORC file, columns pruned at
    the stripe reader."""

    _FILE_EXTENSIONS = ["orc"]

    def __init__(self, paths, columns: Optional[List[str]] = None, **kwargs):
        super().__init__(paths, **kwargs)
        self._columns = list(columns) if columns is not None else None

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        from pyarrow import orc

        reader = orc.ORCFile(f)
        for i in range(reader.nstripes):
            batch = reader.read_stripe(i, columns=self._columns)
            yield pa.Table.from_batches([batch])


class FeatherDatasource(_RandomAccessFileDatasource):
    """One batch-streaming read task per Feather / Arrow-IPC file;
    record batches are projected to the requested columns as they
    stream (the IPC reader is zero-copy off the file)."""

    _FILE_EXTENSIONS = ["feather", "arrow", "ipc"]

    def __init__(self, paths, columns: Optional[List[str]] = None, **kwargs):
        super().__init__(paths, **kwargs)
        self._columns = list(columns) if columns is not None else None

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        import pyarrow.ipc as ipc

        try:
            reader = ipc.open_file(f)
            batches = (reader.get_batch(i) for i in range(reader.num_record_batches))
        except pa.ArrowInvalid:
            f.seek(0)
            batches = iter(ipc.open_stream(f))
        for batch in batches:
            t = pa.Table.from_batches([batch])
            if self._columns is not None:
                t = t.select(self._columns)
            yield t


def _orc_connector(path: str, columns=None, filter=None):
    import ray.data as rd

    from .catalog import _post_prune

    ds = rd.read_datasource(ORCDatasource(path, columns=columns))
    # columns were pruned at the stripe reader; only the filter (no
    # row-group stats in this connector) applies post-scan
    return _post_prune(ds, None, filter)


def _feather_connector(path: str, columns=None, filter=None):
    import ray.data as rd

    from .catalog import _post_prune

    ds = rd.read_datasource(FeatherDatasource(path, columns=columns))
    return _post_prune(ds, None, filter)
