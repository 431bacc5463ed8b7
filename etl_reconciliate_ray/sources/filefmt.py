"""Additional columnar file-format connectors: ORC and Feather
(Arrow IPC), built on Ray Data's ``FileBasedDatasource`` — the
idiomatic plug for a format without a native ``rd.read_*``: files are
the parallelism unit (one read task per file, streaming with
backpressure like every other source).

Column pruning: with no row filter, the requested columns are pushed
into the ORC stripe reader (only the selected column streams are
decoded); the Feather/IPC reader necessarily materializes each record
batch full-width (the IPC format has no per-column read API) and
projects immediately after. With a row filter, BOTH formats read
full-width, filter, then project — the filter may reference columns
outside the projection, and that uniform (columns, filter) contract
(shared with the csv/json built-ins) takes precedence over reader
pruning.

Registered in the connector registry (sources/catalog.py S5 surface)
as ``orc`` and ``feather``."""

from __future__ import annotations

from typing import Iterator, List, Optional

import pyarrow as pa

from ray.data.datasource import FileBasedDatasource


class _RandomAccessFileDatasource(FileBasedDatasource):
    """Base for formats that need a SEEKABLE file (footer-indexed:
    ORC stripes, Arrow-IPC file framing) — the default datasource
    open is a forward-only stream. Also forwards the subclass's
    ``_FILE_EXTENSIONS`` so stray non-format files (_SUCCESS markers,
    .tmp leftovers) in a directory are skipped, matching the native
    ``rd.read_*`` wrappers (the base class does not read that
    attribute on its own)."""

    def __init__(self, paths, columns: Optional[List[str]] = None, **kwargs):
        kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS)
        super().__init__(paths, **kwargs)
        self._columns = list(columns) if columns is not None else None

    def _open_input_source(self, filesystem, path: str, **open_args):
        return filesystem.open_input_file(path)


class ORCDatasource(_RandomAccessFileDatasource):
    """One stripe-streaming read task per ORC file, columns pruned at
    the stripe reader."""

    _FILE_EXTENSIONS = ["orc"]

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        from pyarrow import orc

        reader = orc.ORCFile(f)
        for i in range(reader.nstripes):
            batch = reader.read_stripe(i, columns=self._columns)
            yield pa.Table.from_batches([batch])


class FeatherDatasource(_RandomAccessFileDatasource):
    """One batch-streaming read task per Feather / Arrow-IPC file
    (both file and stream framing); batches are projected to the
    requested columns right after they are read."""

    _FILE_EXTENSIONS = ["feather", "arrow", "ipc"]

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


def make_datasource_connector(datasource_cls):
    """Connector factory for FileBasedDatasource formats: reader-side
    column pruning when there is no filter; full-width read + filter +
    projection when there is one (the filter may reference columns
    outside the projection — same contract as the csv/json
    built-ins)."""

    def connector(path: str, columns=None, filter=None):
        import ray.data as rd

        from .catalog import _post_prune

        reader_columns = columns if filter is None else None
        ds = rd.read_datasource(datasource_cls(path, columns=reader_columns))
        return _post_prune(ds, columns if filter is not None else None, filter)

    return connector
