"""Merge-apply: per-bucket last-writer-wins upsert of CDC events onto
the lake, with additive schema evolution.

This is the Ray-Data-native replacement for the reference's in-heap
hash index + per-message loop (N3 ``LoadJpatBatchesTasklet.java:53,112``
builds a ``HashMap<String, List<BpBatchDTO>>`` over the whole right
side; the graft's north rule turns that into key-partitioned upserts).
Shape: ``events.groupby("bucket").map_groups(merge_fn)`` — the shuffle
moves ONLY the epoch's events (O(epoch), never O(lake)); each bucket
task reads its own previous lake partition files directly (no lake
shuffle), merges vectorized in Arrow, and emits the new partition
state. Buckets untouched by an epoch are carried forward by the commit
log, so per-epoch cost is O(events + touched partitions).

Semantics (SURVEY.md §2.6 "graft adds true dedup-like semantics"):
per key (repo, path), the event with max ``seq`` wins; ``D`` removes
the key; ``I``/``U`` upsert (a ``U`` on an absent key inserts — upsert
semantics, matching the oracle in datagen.oracle_replay).
Determinism under Ray task retries: the fn is pure (input events +
immutable prev files -> output), which is what makes the exactly-once
sink achievable (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import key_strings

#: lake state column order (extras like evolved columns append after)
LAKE_COLS = ["repo", "path", "commit", "lang", "content", "content_sha256"]
#: binlog bookkeeping columns dropped from lake state
EVENT_ONLY_COLS = ["seq", "ts", "op"]

LAKE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("content_sha256", pa.string()),
        ("bucket", pa.int32()),
    ]
)

_LAST_OPTS = pc.ScalarAggregateOptions(skip_nulls=False)  # keep D-row nulls


def lww_reduce(events: pa.Table) -> pa.Table:
    """Collapse events to the winning (max-seq) event per (repo, path).

    Vectorized: stable sort by seq then hash-group "last" with
    skip_nulls=False (delete rows carry null content/lang and must win
    as-is). O(n log n) in the bucket's event count, no per-key Python.
    """
    events = events.sort_by([("seq", "ascending")])
    keys = ["repo", "path"]
    aggs = [(c, "last", _LAST_OPTS) for c in events.column_names if c not in keys]
    red = events.group_by(keys, use_threads=False).aggregate(aggs)
    # rebuild with original names/order (aggregate outputs are "<col>_last")
    return pa.table(
        {c: (red[c] if c in keys else red[f"{c}_last"]) for c in events.column_names}
    )


def _unify_concat(tables: list[pa.Table]) -> pa.Table:
    """Additive schema evolution: concat with permissive promotion —
    columns present in only some inputs are null-filled in the others
    (``pyarrow.unify_schemas`` semantics; SURVEY.md §1.2)."""
    tables = [t for t in tables if t is not None]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


def read_prev_state(files: tuple[str, ...] | list[str]) -> pa.Table | None:
    """Read one bucket's previous lake partition (possibly heterogeneous
    schemas across epochs — unified permissively)."""
    if not files:
        return None
    return _unify_concat([pq.read_table(f) for f in files])


def merge_apply(events: pa.Table, prev: pa.Table | None) -> pa.Table:
    """Pure merge of one bucket: prev state + epoch events -> new state."""
    winners = lww_reduce(events)
    # lake rows = winners' new values (minus bookkeeping cols) for live keys
    keep = winners.filter(pc.not_equal(winners["op"], "D"))
    keep = keep.drop_columns([c for c in EVENT_ONLY_COLS if c in keep.column_names])
    if prev is None or prev.num_rows == 0:
        merged = keep
    else:
        wkeys = key_strings(winners["repo"], winners["path"])
        pkeys = key_strings(prev["repo"], prev["path"])
        untouched = prev.filter(pc.invert(pc.is_in(pkeys, value_set=wkeys.combine_chunks())))
        merged = _unify_concat([untouched, keep])
    # canonical column order: LAKE_COLS + bucket + evolved extras (sorted)
    extras = sorted(c for c in merged.column_names if c not in LAKE_COLS + ["bucket"])
    return merged.select([c for c in LAKE_COLS + ["bucket"] + extras if c in merged.column_names])


def make_merge_fn(manifest_ref, writers: list | None = None, epoch: int | None = None) -> Callable[[pa.Table], pa.Table]:
    """Build the ``map_groups`` fn. ``manifest_ref`` is a ``ray.put``
    ObjectRef of ``{part:int -> [prev parquet files]}`` — broadcast once
    per epoch, read per task (never re-shipped per batch).

    With ``writers`` (the persistent LakeWriterActor pool) the merged
    state is handed to ``writers[part % W]`` and the fn returns the tiny
    manifest row instead of the state table — the dataset output is then
    just the commit metadata (nothing big flows back to the driver).
    Without ``writers`` the fn returns the merged state (unit tests)."""
    import ray

    def merge_group(events: pa.Table) -> pa.Table:
        if events.num_rows == 0:
            return pa.table({})
        part = events["bucket"][0].as_py()
        manifest: dict[int, list[str]] = ray.get(manifest_ref)
        prev = read_prev_state(manifest.get(part, []))
        out = merge_apply(events, prev)
        if out.num_rows == 0:
            # all keys in this bucket were deleted: emit a null-key
            # tombstone row so the writer still commits the (now empty)
            # partition — otherwise the commit log would carry the stale
            # previous state forward. The writer strips null-repo rows.
            cols = {c: pa.array([None], pa.string()) for c in LAKE_COLS}
            cols["bucket"] = pa.array([part], pa.int32())
            out = pa.table(cols)
        if writers is None:
            return out
        row = ray.get(writers[part % len(writers)].write_piece.remote(epoch, part, out))
        return pa.Table.from_pylist([row])

    return merge_group
