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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import key_strings

#: lake state column order (extras like evolved columns append after)
LAKE_COLS = ["repo", "path", "commit", "lang", "content", "content_sha256"]
#: binlog bookkeeping columns dropped from lake state
EVENT_ONLY_COLS = ["seq", "ts", "op", "epoch"]

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


def lww_reduce(events: pa.Table, order_col: str = "seq", presorted: bool = False) -> pa.Table:
    """Collapse events to the winning (max-``order_col``) event per
    (repo, path).

    Vectorized: stable sort by the order column then hash-group "last"
    with skip_nulls=False (delete rows carry null content/lang and must
    win as-is). O(n log n) in the bucket's event count, no per-key
    Python. ``presorted=True`` skips the sort when the caller already
    ordered rows ascending by ``order_col`` — a full-table copy saved
    on the hot path (the pipeline is memory-bandwidth-bound at high
    core counts, so every copy of the content bytes costs throughput).
    """
    # sort_by and the hash "last" aggregate both gather through int32
    # offsets; a >~1.6 GiB column (hot bucket at sf1+) must widen first
    events, widened = _widen_big_offsets(events)
    if not presorted:
        events = events.sort_by([(order_col, "ascending")])
    keys = ["repo", "path"]
    aggs = [(c, "last", _LAST_OPTS) for c in events.column_names if c not in keys]
    red = events.group_by(keys, use_threads=False).aggregate(aggs)
    # rebuild with original names/order (aggregate outputs are "<col>_last")
    return _narrow_offsets(pa.table(
        {c: (red[c] if c in keys else red[f"{c}_last"]) for c in events.column_names}
    ), widened)


def _unify_concat(tables: list[pa.Table]) -> pa.Table:
    """Additive schema evolution: concat with permissive promotion —
    columns present in only some inputs are null-filled in the others
    (``pyarrow.unify_schemas`` semantics; SURVEY.md §1.2)."""
    tables = [t for t in tables if t is not None]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


# stay well under the int32 offset cap (2_147_483_647): take /
# combine_chunks CONCATENATE chunks internally, so a 32-bit-offset
# string/binary column whose chunks jointly near 2 GiB overflows even
# when the gathered OUTPUT is small (found by the sf1 stress run)
_INT32_OFFSET_BUDGET = 1_600_000_000


def _widen_array(arr, budget: int | None = None):
    """Widen ONE string/binary (chunked) array nearing the int32
    offset cap to its large_ (int64-offset) variant — the single place
    the overflow policy lives; a no-op otherwise."""
    if budget is None:
        budget = _INT32_OFFSET_BUDGET  # module global: tests shrink it
    if pa.types.is_string(arr.type) and arr.nbytes > budget:
        return pc.cast(arr, pa.large_string())
    if pa.types.is_binary(arr.type) and arr.nbytes > budget:
        return pc.cast(arr, pa.large_binary())
    return arr


def _widen_big_offsets(t: pa.Table, budget: int | None = None) -> tuple[pa.Table, list[str]]:
    """Cast any string/binary column whose buffers near the int32
    offset cap to its large_ (int64-offset) variant. Offsets-only
    rewrite per chunk — content bytes are not copied — and a no-op for
    every small-scale table, so the hot path is untouched. Returns the
    widened table plus the column names it touched (so the caller can
    narrow back exactly those, never a column that was large_ on
    input)."""
    widened = []
    for i, f in enumerate(t.schema):
        w = _widen_array(t.column(i), budget)
        if not w.type.equals(f.type):
            t = t.set_column(i, f.name, w)
            widened.append(f.name)
    return t, widened


def _narrow_offsets(t: pa.Table, names: list[str],
                    budget: int | None = None) -> pa.Table:
    """Inverse of ``_widen_big_offsets`` for the columns it widened
    that FIT 32-bit offsets again (winners are a small fraction of the
    chain), keeping the resolved schema identical to the unwidened
    path; a column still over budget stays large_ (parquet stores
    either as BYTE_ARRAY, and ``_unify_concat`` promotes mixed chains
    permissively)."""
    if budget is None:
        budget = _INT32_OFFSET_BUDGET
    for name in names:
        if name not in t.column_names:
            continue
        i = t.column_names.index(name)
        f = t.schema.field(i)
        if pa.types.is_large_string(f.type) and t.column(i).nbytes <= budget:
            t = t.set_column(i, name, pc.cast(t.column(i), pa.string()))
        elif pa.types.is_large_binary(f.type) and t.column(i).nbytes <= budget:
            t = t.set_column(i, name, pc.cast(t.column(i), pa.binary()))
    return t


def resolve_chain_tables(tables_by_epoch: list[tuple[int, pa.Table]]) -> pa.Table:
    """Resolve a merge-on-read chain (base + deltas, each tagged with
    its commit epoch) to the partition's current state.

    Last-writer-wins per (repo, path) ordered by (epoch, seq): delta
    rows override older epochs; within one epoch, partial deltas from
    different tasks may overlap keys and the greatest ``seq`` wins
    (deltas written without ``seq`` are whole-epoch pre-reduced, so
    they never overlap in-epoch and the null sorts first harmlessly).
    ``op == 'D'`` tombstones remove the key; base (full) rows carry no
    ``op`` — they unify to null, treated as live.
    """
    tagged = []
    for epoch, t in tables_by_epoch:
        t = t.append_column(
            "__epoch", pa.array(np.full(t.num_rows, epoch, np.int64))
        )
        tagged.append(t)
    merged = _unify_concat(tagged)
    if merged.num_rows == 0:
        return merged
    # huge chains (>~1.6 GiB in one column, e.g. a hot bucket's content
    # at sf1+) must gather through int64 offsets — see _widen_big_offsets
    merged, widened = _widen_big_offsets(merged)
    # Winner-INDEX selection (same trick as replay.direct_write): the
    # LWW order is computed over the SMALL columns only — dictionary
    # codes of the merge key + (__epoch, seq) int64 lexsort — and the
    # content payload is gathered ONCE, winners-only, by a single
    # ``take``. The previous full-table sort + hash "last" aggregate
    # copied every chain row's content bytes twice; chain resolution is
    # the whole of compaction and of merge-on-read scans, so those
    # copies dominated cdc_compact wall time.
    ep = merged["__epoch"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = merged.num_rows
    if "seq" in merged.column_names and not pa.types.is_null(
        merged.schema.field("seq").type
    ):
        # seq-null rows (whole-epoch pre-reduced deltas) must LOSE to
        # seq-carrying partial-delta rows of the same epoch if the two
        # kinds ever mix in one chain — fill with int64 min so they
        # sort first (the old sort's null_placement='at_start').
        seq = (
            pc.fill_null(pc.cast(merged["seq"], pa.int64()), np.iinfo(np.int64).min)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    else:
        seq = np.zeros(n, dtype=np.int64)
    # null-fill repo/path SEPARATELY before joining so (null, 'a') and
    # (null, 'b') stay distinct keys (matching the old
    # group_by(['repo','path']) null-group semantics) and dictionary
    # codes stay integral; the sentinel contains a NUL byte, which no
    # real repo/path may contain (documented key contract)
    keys = key_strings(
        pc.fill_null(merged["repo"], "\x00N"),
        pc.fill_null(merged["path"], "\x00N"),
    )
    if isinstance(keys, pa.ChunkedArray):
        # joined keys can near the cap even when repo/path alone
        # don't; combine_chunks concatenates, so widen first
        keys = _widen_array(keys).combine_chunks()
    codes = (
        pc.dictionary_encode(keys).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    )
    # stable lexsort by (code, epoch, seq): the last row of each code
    # run is the max-(epoch, seq) winner, ties resolved to the later
    # concat position — exactly the stable-sort + "last" semantics.
    perm = np.lexsort((seq, ep, codes))
    g = codes[perm]
    winner_idx = perm[np.flatnonzero(np.append(g[1:] != g[:-1], True))]
    winners = merged.take(pa.array(winner_idx))  # the ONE content gather
    if "op" in winners.column_names:
        live = pc.fill_null(winners["op"], "I")
        winners = winners.filter(pc.not_equal(live, "D"))
    drop = [c for c in ("__epoch", "op", "seq", "ts") if c in winners.column_names]
    return _narrow_offsets(winners.drop_columns(drop), widened)


from functools import lru_cache


@lru_cache(maxsize=256)
def _pqfile(path: str) -> pq.ParquetFile:
    """Per-worker ParquetFile cache: direct-mode delta files hold one
    row group per bucket, so a long chain re-opens the SAME files for
    many partitions — each open parses the footer (O(row groups)
    metadata). Lake files are content-addressed and immutable, so the
    cache can never serve stale metadata. Ray reuses worker processes
    across tasks, which is what makes this cache pay off at
    240-files-per-epoch layouts (a known 65s compaction pathology)."""
    return pq.ParquetFile(path)


@lru_cache(maxsize=4096)
def _schema_names(path: str) -> tuple[str, ...]:
    return tuple(_pqfile(path).schema_arrow.names)


def read_chain(
    chain: list[dict],
    columns: list[str] | None = None,
    part: int | None = None,
    key_filter: tuple[str, str | None] | None = None,
) -> pa.Table | None:
    """Read + resolve one bucket's chain of ``{"epoch", "files"}`` dicts
    (kind is implied by position: resolution is kind-agnostic).

    ``columns`` prunes the parquet read (merge keys, ``op`` and ``seq``
    are always read — resolution needs them); the result is projected
    to exactly the requested columns that exist. ``part`` adds a
    ``bucket == part`` parquet filter: direct-mode delta files hold one
    row group per bucket slice, so the filter prunes at row-group
    granularity and a file shared by many partitions is only decoded
    for the rows that matter.

    ``key_filter`` = (repo, path|None) pushes a point/repo equality
    predicate into the whole-file reads: compaction writes bases
    SORTED by (repo, path), so parquet row-group min/max stats skip
    every non-matching group/piece — a point lookup on a compacted
    bucket decodes O(one row group), not the bucket. Purely an
    optimization: callers still row-filter the result (parquet stats
    pruning is conservative, never wrong)."""
    if not chain:
        return None
    need = None
    if columns is not None:
        need = set(columns) | {"repo", "path", "op", "seq"}
    filters = [("bucket", "=", part)] if part is not None else None
    if key_filter is not None:
        kf = [("repo", "=", key_filter[0])]
        if key_filter[1] is not None:
            kf.append(("path", "=", key_filter[1]))
        filters = (filters or []) + kf
    tagged = []
    for link in chain:
        rgs = link.get("rgs") or [-1] * len(link["files"])
        if len(rgs) != len(link["files"]):
            # zip would silently skip trailing files — stale reads, no
            # error; a length-skewed link is a corrupt/foreign manifest
            raise ValueError(
                f"read_chain: manifest link epoch={link.get('epoch')} has "
                f"{len(link['files'])} files but {len(rgs)} row-group "
                "ordinals — refusing a partial chain read"
            )
        for f, rg in zip(link["files"], rgs):
            cols = None
            if need is not None:
                avail = _schema_names(f)
                cols = [c for c in avail if c in need or c == "bucket"]
            if rg is not None and int(rg) >= 0:
                # direct-mode delta: this partition's rows are exactly
                # one row group — O(1) access, no scanner/filter pass;
                # the ParquetFile (footer parse) is cached per worker
                t = _pqfile(f).read_row_group(int(rg), columns=cols)
            else:
                t = pq.read_table(f, columns=cols, filters=filters)
            tagged.append((int(link["epoch"]), t))
    if not tagged:
        return None
    out = resolve_chain_tables(tagged)
    if columns is not None:
        out = out.select([c for c in columns if c in out.column_names])
    return out


def merge_apply(events: pa.Table, prev: pa.Table | None) -> pa.Table:
    """Pure merge of one bucket: prev state + epoch events -> new state."""
    winners = lww_reduce(events)
    # lake rows = winners' new values (minus bookkeeping cols) for live keys
    keep = winners.filter(pc.not_equal(winners["op"], "D"))
    keep = keep.drop_columns([c for c in EVENT_ONLY_COLS if c in keep.column_names])
    if prev is None or prev.num_rows == 0:
        merged = keep
    else:
        # sentinel-fill null key components like resolve_chain_tables:
        # unjoined null keys all collapse to ONE null string and
        # is_in's null-matches-null would then delete every untouched
        # null-component lake row whenever any event carries one
        wkeys = key_strings(
            pc.fill_null(winners["repo"], "\x00N"),
            pc.fill_null(winners["path"], "\x00N"),
        )
        pkeys = key_strings(
            pc.fill_null(prev["repo"], "\x00N"),
            pc.fill_null(prev["path"], "\x00N"),
        )
        untouched = prev.filter(pc.invert(pc.is_in(pkeys, value_set=wkeys.combine_chunks())))
        merged = _unify_concat([untouched, keep])
    # canonical column order: LAKE_COLS + bucket + evolved extras (sorted)
    extras = sorted(c for c in merged.column_names if c not in LAKE_COLS + ["bucket"])
    return merged.select([c for c in LAKE_COLS + ["bucket"] + extras if c in merged.column_names])


def delta_of(events: pa.Table, keep_seq: bool = False, presorted: bool = False) -> pa.Table:
    """The epoch's merge-on-read DELTA for one bucket: per-key LWW
    winners INCLUDING delete tombstones (``op`` kept, ``D`` rows carry
    nulls). O(epoch events) — no previous-state read at all, which is
    what lets epochs run pipelined (an epoch's merge depends only on its
    own events; state materializes at compaction/read).

    ``keep_seq=True`` for PARTIAL deltas (direct task-side writes):
    several tasks may emit overlapping keys for the same epoch, and
    read-time resolution breaks the in-epoch tie on ``seq``."""
    winners = lww_reduce(events, presorted=presorted)
    drop = ["ts", "epoch"] if keep_seq else ["seq", "ts", "epoch"]
    winners = winners.drop_columns([c for c in drop if c in winners.column_names])
    keep_extra = ["op", "seq"] if keep_seq else ["op"]
    extras = sorted(c for c in winners.column_names if c not in LAKE_COLS + ["bucket"] + keep_extra)
    order = [c for c in LAKE_COLS + keep_extra + ["bucket"] + extras if c in winners.column_names]
    return winners.select(order)


def make_merge_fn(
    manifest_ref,
    writers: list | None = None,
    epoch: int | None = None,
    delta_threshold: int = 0,
    force_delta: bool = False,
) -> Callable[[pa.Table], pa.Table]:
    """Build the ``map_groups`` fn. ``manifest_ref`` is a ``ray.put``
    ObjectRef of ``{part:int -> chain}`` where chain is the bucket's
    merge-on-read file chain ``[{"epoch", "kind", "files"}, ...]`` —
    broadcast once per epoch, read per task (never re-shipped per batch).

    Mode per bucket (Hudi/Iceberg-style merge-on-read, SURVEY.md §4):
    - ``delta_threshold > 1`` and the chain is shorter than it: write a
      DELTA (O(events), no prev read);
    - otherwise (bootstrap, or chain at threshold): read+resolve the
      chain and write the compacted FULL state.

    With ``writers`` (the persistent LakeWriterActor pool) the output
    table is handed to ``writers[part % W]`` and the fn returns the tiny
    manifest row — nothing big flows back to the driver. Without
    ``writers`` the fn returns the resolved full state (unit tests)."""
    import ray

    def merge_group(events: pa.Table) -> pa.Table:
        if events.num_rows == 0:
            return pa.table({})
        part = events["bucket"][0].as_py()
        # multi-epoch execution: the group key is (epoch, bucket) and
        # each group's epoch rides in its own column
        this_epoch = epoch if epoch is not None else events["epoch"][0].as_py()
        # per-worker-process cache: the {part -> chain} manifest dict
        # deserializes ONCE per worker instead of once per bucket group
        # (an epoch touching hundreds of buckets re-paid the ray.get
        # dict deserialization per map_groups call)
        from ..functions.broadcast import fetch as _bfetch

        manifest: dict[int, list[dict]] = _bfetch(manifest_ref)
        chain = manifest.get(part, [])
        want_delta = force_delta or (chain and 1 < delta_threshold and len(chain) < delta_threshold)
        if writers is not None and want_delta:
            row = ray.get(writers[part % len(writers)].write_piece.remote(
                this_epoch, part, delta_of(events), "delta"))
            return pa.Table.from_pylist([row])
        prev = read_chain(chain, part=part)
        out = merge_apply(events, prev)
        if writers is None:
            return out
        if out.num_rows == 0:
            # all keys in this bucket were deleted: emit a null-key
            # tombstone row so the writer still commits the (now empty)
            # partition — otherwise the commit log would carry the stale
            # previous state forward. The writer strips null-repo rows.
            cols = {c: pa.array([None], pa.string()) for c in LAKE_COLS}
            cols["bucket"] = pa.array([part], pa.int32())
            out = pa.table(cols)
        row = ray.get(writers[part % len(writers)].write_piece.remote(this_epoch, part, out, "full"))
        return pa.Table.from_pylist([row])

    return merge_group
