"""Exactly-once parquet sink — stateful actor-pool writer stage.

North-star requirement: "stateful actor-pool writers enforcing
exactly-once sink semantics (idempotent commit log + per-partition
epoch fencing)". The reference has NO exactly-once story (its report +
email are simply re-sent on re-run, ``ReportAndEmailTasklet.java:46-47``);
this stage is designed fresh for Ray's retry model (SURVEY.md §4):

- used as ``merged.map_batches(ExactlyOnceWriter, concurrency=N,
  batch_size=None)`` — a callable CLASS, so the commit-log snapshot and
  output-root handle are loaded ONCE per actor in ``__init__``;
- file names are **content-addressed** (sha256 of the partition piece's
  key->hash state), written tmp-file + atomic ``os.replace``: a retried
  task rewrites byte-identical bytes to the same name — idempotent;
- **epoch fencing**: a (epoch, part) already present in the commit-log
  snapshot is skipped (re-delivered epochs write nothing);
- visibility is manifest-gated: the writer only WRITES; the driver
  appends the commit records returned by this stage to the commit log
  and seals the epoch (single-writer log; see state/commitlog.py).

Output of the stage: a tiny manifest-row table (one row per written
partition piece) — the only thing the driver materializes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import table_state_sha256
from ..state.commitlog import CommitLog

MANIFEST_SCHEMA = pa.schema(
    [
        ("epoch", pa.int64()),
        ("part", pa.int32()),
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("state_sha256", pa.string()),
    ]
)


class ExactlyOnceWriter:
    """Actor-pool writer: one instance per pool actor, state in __init__."""

    def __init__(self, lake_root: str, epoch: int):
        self.lake_root = lake_root
        self.epoch = epoch
        os.makedirs(lake_root, exist_ok=True)
        # fence snapshot: (epoch, part) pairs committed before this run
        log = CommitLog.open(lake_root)
        self.fenced = {p for (e, p) in log._entries if e == epoch}

    def _write_piece(self, part: int, tbl: pa.Table) -> dict:
        # strip empty-partition tombstone rows (see merge.make_merge_fn)
        tbl = tbl.filter(pc.is_valid(tbl["repo"]))
        piece_sha = table_state_sha256(tbl, ("repo", "path"), "content_sha256")
        out_dir = os.path.join(self.lake_root, f"epoch={self.epoch:05d}", f"part={part:05d}")
        os.makedirs(out_dir, exist_ok=True)
        fname = os.path.join(out_dir, f"state-{piece_sha[:16]}.parquet")
        if not os.path.exists(fname):  # idempotent: same content -> same name
            tmp = fname + ".tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, fname)  # atomic publish of the file itself
        return {
            "epoch": self.epoch,
            "part": part,
            "file": fname,
            "rows": tbl.num_rows,
            "state_sha256": piece_sha,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        if batch.num_rows == 0 or "bucket" not in batch.column_names:
            return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)
        # one map_groups output block is normally one bucket, but be
        # correct if Ray coalesces blocks: split the batch per part id.
        for part_scalar in pc.unique(batch["bucket"]).to_pylist():
            part = int(part_scalar)
            if part in self.fenced:
                continue  # epoch fence: already committed for this part
            piece = batch.filter(pc.equal(batch["bucket"], part_scalar))
            rows.append(self._write_piece(part, piece))
        return pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)
