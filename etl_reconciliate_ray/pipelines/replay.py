"""CDC replay pipeline: bootstrap + per-epoch upsert replay with
exactly-once commits and checkpoint-resume.

Replaces the reference's 4-step Spring Batch job lifecycle
(``config/BatchConfig.java:59-68``: load left -> load right -> reconcile
-> report, with inter-step state serialized to H2) with the target
lifecycle of SURVEY.md §3:

    for each epoch e:
        read binlog slice            read_parquet (pruned)
        normalize + sha256           map_batches (stateless tasks)
        hash-partition by salted repo   groupby("bucket")
        per-bucket merge-apply       map_groups (pure fn)
        exactly-once write           map_batches(ExactlyOnceWriter, actors)
        commit + seal epoch          commit-log append (driver, fenced)

Resume: ``replay()`` skips epochs already sealed in the commit log —
a kill/restart mid-stream converges to the identical sha256-verified
lake state (north_star; chaos-tested in tests/test_replay_e2e.py).

Ray session ownership: these functions NEVER call ray.init/shutdown
(driver contract in __ray_entry__.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import table_state_sha256
from ..stages.merge import _unify_concat, make_merge_fn, read_chain
from ..stages.normalize import make_normalizer
from ..stages.writer import make_writer_pool
from ..state.commitlog import CommitLog, PartEntry

# input_seq marker stamped on MAINTENANCE (compaction) entries: lets a
# compact() rerun distinguish its own crashed unsealed epoch (resumable
# under the fence) from a crashed replay's (refused — sealing over it
# would silently lose that epoch's remaining events)
_MAINT_SEQ = (-2, -2)


@dataclass
class ReplayConfig:
    lake_root: str
    num_buckets: int = 32
    salt_for_repo: dict[str, int] = field(default_factory=dict)
    writer_concurrency: int = 4
    # None = one batch per block, which lets Ray FUSE the whole chain
    # ReadParquet->normalize->tag->write into ONE task pipeline — no
    # object-store transit between stages (a fixed serial cost that
    # capped scaling). Set a number only if per-batch peak memory must
    # be bounded below the block size.
    normalize_batch_size: int | None = None
    # split each epoch's parquet into this many read blocks so the
    # normalize/hash stage parallelizes across the whole pool (a single
    # one-row-group file would otherwise read as 1-3 blocks and
    # serialize the pipeline); None = Ray's automatic choice
    read_parallelism: int | None = None
    # merge-on-read: a bucket whose chain (base + deltas) is shorter
    # than this writes an O(events) DELTA instead of rewriting its full
    # state; at the threshold the merge compacts (reads + resolves the
    # chain, writes a new base). <=1 disables deltas (always full).
    delta_threshold: int = 8
    # >1: process up to K binlog epochs per SINGLE Dataset execution in
    # forced-delta mode — grouped by (epoch, bucket), so per-epoch LWW
    # semantics are exact while the streaming executor pipelines all K
    # epochs through one shuffle (per-epoch driver barriers would
    # dominate at 10^4+ epochs; concurrent separate executions contend
    # pathologically). Epochs are committed + sealed in order after
    # each execution; a crash redoes at most K epochs (idempotent).
    pipeline_epochs: int = 1
    # run a distributed compaction after the last epoch so readers see
    # chain length 1 everywhere (end-of-stream housekeeping).
    post_compact: bool = False
    # roll the commit log up into its chains snapshot every N sealed
    # epochs (0 disables). Without a cadence a long --follow stream
    # appends forever: every CommitLog.open (one per follow poll) and
    # every in-memory chain resolution pays O(total commits ever) —
    # the snapshot keeps reopen parse work at O(partitions x chain
    # length + N x partitions), independent of stream age. Auto
    # delta->full compaction (delta_threshold) bounds chain length, so
    # the two knobs together bound the log regardless of epoch count.
    snapshot_every: int = 64
    # batched-epoch merge strategy:
    # - "direct": NO shuffle, NO object-store round trip — each map
    #   task partial-LWWs its block per (epoch, bucket) and writes the
    #   partial delta straight to the lake (one file per task+epoch,
    #   one row group per bucket for pruned reads); read-time LWW
    #   resolution on (epoch, seq) makes overlapping partials exact;
    # - "combine": map tasks push partial-LWW tables to the bucket's
    #   writer actor, which final-reduces on flush (one delta piece per
    #   (epoch, bucket), denser files, but pays an object-store copy);
    # - "shuffle": groupby(epoch, bucket) sort shuffle, one merge task
    #   per group (most general; group-local logic sees all rows).
    merge_strategy: str = "direct"
    # compaction splits a bucket's rewritten base into pieces of about
    # this many (in-memory Arrow) bytes — a commit-log part entry holds
    # a files TUPLE, so readers are unchanged. None = one file per
    # bucket, fine at sandbox scale; at 100 TB a 64-bucket lake would
    # otherwise write multi-TB single parquet files (unresumable,
    # unstreamable). 256 MiB is the Iceberg/Hudi-ish default target.
    compact_target_bytes: int | None = None

    def layout(self) -> dict:
        """The physical-layout fingerprint fenced by the commit log —
        resuming a lake under a different bucket routing is refused."""
        from ..state.commitlog import layout_fingerprint

        return layout_fingerprint(self.num_buckets, self.salt_for_repo)


def _commit_manifest_rows(
    log: CommitLog,
    epoch: int,
    rows: list[dict],
    input_seq: tuple[int, int] | None,
    seal: bool = True,
) -> int:
    """Driver-side commit: fold per-piece manifest rows into per-part
    entries, batch-append them under the (epoch, part) fence (ONE
    fsync), optionally seal the epoch (pipelined replay seals in epoch
    order after out-of-order commits)."""
    import hashlib

    by_part: dict[int, list[dict]] = {}
    for r in rows:
        by_part.setdefault(int(r["part"]), []).append(r)
    entries = []
    for part, pieces in sorted(by_part.items()):
        pieces.sort(key=lambda r: r["file"])
        combined = hashlib.sha256("".join(p["state_sha256"] for p in pieces).encode()).hexdigest()
        entries.append(PartEntry(
            epoch=epoch,
            part=part,
            files=tuple(p["file"] for p in pieces),
            rows=sum(int(p["rows"]) for p in pieces),
            state_sha256=combined,
            input_seq=input_seq,
            kind=pieces[0].get("kind", "full"),
            rgs=tuple(int(p.get("rg", -1)) for p in pieces),
        ))
    committed = log.commit_parts(entries)
    if seal:
        log.seal_epoch(epoch)
    return committed


def _chains_payload(log: CommitLog, upto_epoch: int) -> dict[int, list[dict]]:
    """Broadcastable merge-on-read chains: part -> [{"epoch", "kind",
    "files"}, ...] (newest full + later deltas, epoch order)."""
    return {
        part: [
            {
                "epoch": e.epoch,
                "kind": e.kind,
                "files": list(e.files),
                "rgs": list(e.rgs) if e.rgs else [-1] * len(e.files),
            }
            for e in chain
        ]
        for part, chain in log.part_chains(upto_epoch=upto_epoch).items()
    }


def run_epoch(
    events_ds,
    epoch: int,
    cfg: ReplayConfig,
    log: CommitLog | None = None,
    input_seq: tuple[int, int] | None = None,
    writers: list | None = None,
    mode: str = "auto",
    seal: bool = True,
) -> dict:
    """Apply one epoch (a ``ray.data.Dataset`` of binlog events) to the
    lake. Idempotent: a sealed epoch is skipped; a partially-committed
    epoch re-runs its uncommitted partitions only (writer-side fence).

    ``mode``: "auto" decides delta-vs-full per bucket from its chain
    length (needs the chain broadcast — requires all earlier epochs
    committed); "delta" forces O(events) deltas and reads NO previous
    state, so delta epochs are mutually independent and ``replay()``
    can run them concurrently; "full" forces compaction of every
    touched bucket.

    ``writers``: the persistent LakeWriterActor pool; created here if
    not passed (``replay()`` creates it once for all epochs)."""
    log = log or CommitLog.open(cfg.lake_root)
    log.ensure_layout(cfg.layout())
    t0 = time.monotonic()
    if log.is_sealed(epoch):
        return {"epoch": epoch, "skipped": True, "parts_committed": 0, "sec": 0.0}

    import ray

    if writers is None:
        writers = make_writer_pool(cfg.lake_root, cfg.writer_concurrency)

    if mode == "delta":
        manifest_ref = ray.put({})
        delta_threshold = 0
    else:
        manifest_ref = ray.put(_chains_payload(log, upto_epoch=epoch - 1))
        delta_threshold = 0 if mode == "full" else cfg.delta_threshold

    normalized = events_ds.map_batches(
        make_normalizer(cfg.num_buckets, cfg.salt_for_repo),
        batch_format="pyarrow",
        batch_size=cfg.normalize_batch_size,
    )
    manifest_rows_ds = normalized.groupby("bucket").map_groups(
        make_merge_fn(
            manifest_ref,
            writers=writers,
            epoch=epoch,
            delta_threshold=delta_threshold,
            force_delta=(mode == "delta"),
        ),
        batch_format="pyarrow",
    )
    rows = manifest_rows_ds.take_all()  # tiny: one row per touched partition piece
    committed = _commit_manifest_rows(log, epoch, [dict(r) for r in rows], input_seq, seal=seal)
    sec = time.monotonic() - t0
    metrics = {
        "epoch": epoch,
        "skipped": False,
        "mode": mode,
        "parts_committed": committed,
        "pieces": len(rows),
        "rows_written": sum(int(r["rows"]) for r in rows),
        "sec": round(sec, 4),
    }
    if seal:
        _write_lineage(cfg.lake_root, log, metrics)
    return metrics


def _write_lineage(lake_root: str, log: CommitLog, last_metrics: dict) -> None:
    """Per-partition lineage manifest + per-epoch metrics (north_star:
    'per-partition lineage manifests and metrics')."""
    payload = {"partitions": log.lineage(), "last_epoch_metrics": last_metrics}
    tmp = os.path.join(lake_root, "lineage.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
    os.replace(tmp, os.path.join(lake_root, "lineage.json"))


def _seed_as_insert(batch: pa.Table) -> pa.Table:
    """Seed-to-events transform (ONE definition for both replay paths):
    a lake-seed row becomes an all-insert event with seq=-1 so the
    bootstrap flows through the exact same replay machinery."""
    n = batch.num_rows
    return batch.append_column("seq", pa.array([-1] * n, pa.int64())).append_column(
        "op", pa.array(["I"] * n, pa.string())
    )


def bootstrap(
    lake_seed_path: str,
    cfg: ReplayConfig,
    log: CommitLog | None = None,
    writers: list | None = None,
) -> dict:
    """Epoch 0 = initial lake load, expressed as all-insert events with
    ``seq=-1`` so it flows through the exact same replay path."""
    import ray.data as rd

    kwargs = {"override_num_blocks": cfg.read_parallelism} if cfg.read_parallelism else {}
    ds = rd.read_parquet(lake_seed_path, **kwargs)
    ds = ds.map_batches(
        _seed_as_insert, batch_format="pyarrow", batch_size=cfg.normalize_batch_size
    )
    return run_epoch(ds, 0, cfg, log=log, input_seq=(-1, -1), writers=writers)


def replay(
    fixture_dir: str,
    cfg: ReplayConfig,
    stop_after_epoch: int | None = None,
) -> list[dict]:
    """Full (resumable) replay of a datagen fixture: bootstrap + all
    binlog epochs. ``stop_after_epoch`` simulates a mid-stream kill for
    the chaos tests; calling again resumes from the commit log.

    With ``cfg.pipeline_epochs > 1``, binlog epochs run CONCURRENTLY in
    forced-delta mode (each epoch's merge is independent — it reads no
    previous state), bounded by that many in-flight Dataset executions;
    commits land out of order under the (epoch, part) fence and the
    driver seals epochs strictly in order afterwards, so a crash leaves
    a prefix of sealed epochs + fenced partial commits that a restart
    completes idempotently."""
    with open(os.path.join(fixture_dir, "fixture.json")) as fh:
        fixture = json.load(fh)
    seed_path = os.path.join(fixture_dir, "lake_seed.parquet")
    return _replay_epoch_descs(fixture["epochs"], cfg, seed_path, stop_after_epoch)


def _discover_epochs(binlog_dir: str, stop_at_unreadable: bool = False) -> list[dict]:
    """Discover binlog epoch files in a directory WITHOUT a fixture
    manifest — the binlog/WAL-tail ingestion surface (north rule "tails
    a binlog/WAL stream"; reference trigger surface
    ``controller/ReconciliationController.java:35-42``).

    Epoch ordinal comes from ``epoch=NNNNN`` in the file name when
    present (rank order of the seq range otherwise); the seq range
    comes from the parquet FOOTER's row-group min/max statistics — a
    metadata-only read, no data pages decoded.

    Unreadable files: a one-shot replay (``stop_at_unreadable=False``)
    raises LOUDLY — silently skipping a file would seal the stream with
    an epoch missing, and rank-derived ordinals of later files would
    shift on a retry (events fenced out forever). In follow mode
    (``stop_at_unreadable=True``) an unreadable file is assumed to be a
    mid-copy arrival: discovery CUTS at the first one (name order), the
    earlier complete prefix processes, and the next poll retries from
    the cut. This is only safe under the documented producer contract —
    files land in seq order (standard WAL semantics), ideally published
    via atomic rename."""
    import glob as _g
    import re

    import pyarrow.parquet as pq

    files = sorted(_g.glob(os.path.join(binlog_dir, "*.parquet")))
    descs = []
    for f in files:
        try:
            pf = pq.ParquetFile(f)
        except Exception as e:
            if stop_at_unreadable:
                import logging

                logging.getLogger(__name__).warning(
                    "binlog tail: %s unreadable (mid-copy?) — processing the "
                    "prefix before it, retrying next poll", f
                )
                break
            raise ValueError(
                f"unreadable binlog file {f}: {e} — refusing to replay with a "
                "gap (a skipped file would be fenced out forever once later "
                "epochs seal)"
            ) from e
        md = pf.metadata
        si = pf.schema_arrow.names.index("seq")
        los, his = [], []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(si).statistics
            if st is None or st.min is None:
                los, his = [], []  # stats disabled: no seq ordering
                break
            los.append(int(st.min))
            his.append(int(st.max))
        m = re.search(r"epoch=(\d+)", os.path.basename(f))
        epoch = int(m.group(1)) if m else None
        if not los and epoch is None:
            # a zero-row or stats-less file carries no seq range: its
            # rank-derived ordinal would be arbitrary — silently picking
            # one could fence another file's events out forever
            raise ValueError(
                f"binlog file {f} has no usable seq statistics "
                f"({'empty file' if md.num_rows == 0 else 'stats disabled'}) "
                "and no epoch=N name — cannot order it; name it explicitly"
            )
        descs.append({
            "epoch": epoch,
            "file": f,
            "seq_range": [min(los), max(his) + 1] if los else None,
            "rows": md.num_rows,
        })
    # ranged files order by seq start; range-less (named, empty/stats-
    # less) files order by their explicit ordinal among them
    descs.sort(key=lambda e: (
        (0, e["seq_range"][0]) if e["seq_range"] else (1, e["epoch"])
    ))
    for rank, e in enumerate(descs):
        if e["epoch"] is None:
            e["epoch"] = rank
    by_ord: dict[int, str] = {}
    for e in descs:
        if e["epoch"] in by_ord:
            # the rank fallback can collide with an explicit epoch=N
            # name (or two files can carry the same name): both would
            # map to ONE engine epoch and the second file's events
            # would silently fence out forever
            raise ValueError(
                f"binlog files {by_ord[e['epoch']]} and {e['file']} both map "
                f"to epoch ordinal {e['epoch']} — name every file epoch=N "
                "explicitly (mixed named/unnamed sets can collide)"
            )
        by_ord[e["epoch"]] = e["file"]
    return descs


def replay_stream(
    binlog_dir: str,
    cfg: ReplayConfig,
    lake_seed: str | None = None,
    stop_after_epoch: int | None = None,
) -> list[dict]:
    """Tail-a-growing-binlog ingestion: replay every epoch file
    currently in ``binlog_dir`` (discovered by naming + footer seq
    stats — no ``fixture.json``), resumable via the commit log. Call
    again after new epoch files land and only the new ones run; a
    converged stream replay is sha256-identical to the one-shot batch
    replay (tested). ``lake_seed``: optional bootstrap parquet applied
    as epoch 0 on first call."""
    return _replay_epoch_descs(_discover_epochs(binlog_dir), cfg, lake_seed, stop_after_epoch)


def _replay_epoch_descs(
    epoch_descs: list[dict],
    cfg: ReplayConfig,
    seed_path: str | None,
    stop_after_epoch: int | None = None,
) -> list[dict]:
    """Shared replay core over epoch descriptors ``{"epoch", "file",
    "seq_range"}`` (from a fixture manifest or directory discovery)."""
    import ray.data as rd

    log = CommitLog.open(cfg.lake_root)
    log.ensure_layout(cfg.layout())
    writers = make_writer_pool(cfg.lake_root, cfg.writer_concurrency)
    kwargs = {"override_num_blocks": cfg.read_parallelism} if cfg.read_parallelism else {}

    todo = []
    for ep in epoch_descs:
        engine_epoch = ep["epoch"] + 1  # epoch 0 is the bootstrap
        if stop_after_epoch is not None and engine_epoch > stop_after_epoch:
            break
        todo.append((engine_epoch, ep))

    out: list[dict] = []

    def _maybe_snapshot() -> None:
        # log-growth bound: roll the log into its chains snapshot once
        # snapshot_every sealed epochs sit in the TAIL file. Keyed on
        # the log's DURABLE tail-seal count, not a local counter —
        # follow mode reopens the log every poll, so an in-process
        # counter would reset each poll and a slow 1-epoch-per-poll
        # stream would never snapshot
        if cfg.snapshot_every > 0 and log.seals_since_snapshot >= cfg.snapshot_every:
            log.write_snapshot()

    def _run_one(engine_epoch: int, ep: dict) -> dict:
        if os.path.isdir(ep["file"]):
            import glob as _g

            epoch_files = sorted(_g.glob(os.path.join(ep["file"], "*.parquet")))
        else:
            epoch_files = [ep["file"]]
        ds = rd.read_parquet(
            ep["file"], schema=_binlog_scan_schema(epoch_files), **kwargs
        )
        return run_epoch(
            ds, engine_epoch, cfg, log=log,
            input_seq=tuple(ep["seq_range"]) if ep.get("seq_range") else None,
            writers=writers,
        )

    if cfg.pipeline_epochs > 1:
        # bootstrap through the same scaled batch path (the sequential
        # bootstrap's shuffle is a fixed cost that would cap scaling)
        if seed_path is None or log.is_sealed(0):
            if seed_path is not None:
                out.append({"epoch": 0, "skipped": True, "parts_committed": 0, "sec": 0.0})
        else:
            out.extend(_run_epoch_batch(
                [(0, {"file": seed_path, "seq_range": (-1, 0)})],
                cfg, log, writers, prep_fn=_seed_as_insert,
            ))
        for i in range(0, len(todo), cfg.pipeline_epochs):
            window = todo[i : i + cfg.pipeline_epochs]
            out.extend(
                {"epoch": e, "skipped": True, "parts_committed": 0, "sec": 0.0}
                for e, _ in window if log.is_sealed(e)
            )
            chunk = [t for t in window if not log.is_sealed(t[0])]
            # a range-less desc (zero-row / stats-less named epoch) has
            # no seqs to tag: run it individually; the batch kernel's
            # seq->epoch bounds need real ranges
            ranged = [t for t in chunk if t[1].get("seq_range")]
            if ranged:
                out.extend(_run_epoch_batch(ranged, cfg, log, writers))
            for engine_epoch, ep in (t for t in chunk if not t[1].get("seq_range")):
                out.append(_run_one(engine_epoch, ep))
            if chunk:
                _maybe_snapshot()
    else:
        if seed_path is not None:
            out.append(bootstrap(seed_path, cfg, log=log, writers=writers))
        for engine_epoch, ep in todo:
            if log.is_sealed(engine_epoch):
                # skip BEFORE building the scan: a long-lived follow
                # stream would otherwise pay O(stream-age) parquet
                # footer reads per poll just for run_epoch to no-op
                out.append({"epoch": engine_epoch, "skipped": True,
                            "parts_committed": 0, "sec": 0.0})
                continue
            m = _run_one(engine_epoch, ep)
            out.append(m)
            if not m.get("skipped"):
                _maybe_snapshot()

    if cfg.post_compact:
        out.append(compact(cfg, log=log, writers=writers))
    return out


def replay_multiplexed(
    binlog_dir: str,
    tables: dict[str, ReplayConfig],
    coordinator_root: str,
    table_col: str = "tbl",
    stop_mid_epoch: int | None = None,
    stop_at_unreadable: bool = False,
) -> list[dict]:
    """Ingest a MULTIPLEXED CDC stream — one binlog carrying N logical
    tables (the shape a Debezium/WAL feed actually has) — into N
    independent lakes with per-epoch CROSS-TABLE atomic visibility via
    the transaction coordinator (``state/txn.py``).

    Per epoch file: each table's slice stages UNSEALED through the
    normal replay engine (``read_parquet`` with a pushed-down
    ``table_col == name`` filter — a table-sorted epoch file prunes at
    row-group granularity, so N tables do not mean N full scans), then
    ONE coordinator COMMIT flips all N lakes together. A reader joining
    orders to order_lines therefore never sees epoch k of one table
    against epoch k-1 of the other — the consistency the reference gets
    free from its single metadata store (springbatch-schema.sql:1-76).

    Resumable at every crash point: completed epochs skip via the
    per-lake seals; an in-doubt txn (PREPARE without COMMIT) rolls
    forward through ``recover()``/``resume_in_doubt`` (staging is
    deterministic); un-prepared leftovers resume through the
    (epoch, part) fence (``stage(resume=True)``).

    ``stop_mid_epoch``: chaos hook — crash after staging (and
    preparing) epoch k's tables but before the COMMIT mark.
    ``stop_at_unreadable``: tail mode (set by ``follow_multiplexed``) —
    a half-copied epoch file cuts discovery at the readable prefix
    instead of raising, so a poll that races the producer's copy still
    ingests every complete earlier file.
    """
    import ray.data as rd

    from ..state.txn import TxnCoordinator

    co = TxnCoordinator.open(coordinator_root)
    rep = co.recover()
    for txn_id in rep["in_doubt"]:
        co.resume_in_doubt(txn_id).commit()  # staging finished => roll forward

    out: list[dict] = []
    # one log open per table per CALL, not per epoch: each open parses
    # the snapshot + tail from disk, and a 10^4-epoch stream would pay
    # O(epochs x tables) redundant parses. Safe because epochs sealed
    # within this loop are strictly below every later iteration's check
    # (the sealed set only matters for the fresh-open state).
    logs = {name: CommitLog.open(cfg.lake_root) for name, cfg in tables.items()}
    for ep in _discover_epochs(binlog_dir, stop_at_unreadable=stop_at_unreadable):
        engine_epoch = ep["epoch"] + 1  # 0 is reserved for bootstrap
        todo = {
            name: cfg for name, cfg in tables.items()
            if not logs[name].is_sealed(engine_epoch)
        }
        if not todo:
            out.append({"epoch": engine_epoch, "skipped": True})
            continue
        txn = co.begin()
        for name in sorted(todo):
            cfg = todo[name]
            import pyarrow.dataset as pads

            slice_ds = rd.read_parquet(
                ep["file"], filter=pads.field(table_col) == name
            ).drop_columns([table_col])
            txn.stage(
                name, cfg, slice_ds, epoch=engine_epoch,
                input_seq=tuple(ep["seq_range"]) if ep.get("seq_range") else None,
                resume=True,  # un-prepared crash leftovers: fence skips them
            )
        txn.prepare()
        if stop_mid_epoch is not None and engine_epoch >= stop_mid_epoch:
            return out  # chaos: in-doubt txn left behind
        res = txn.commit()
        out.append({"epoch": engine_epoch, "skipped": False, "tables": res["tables"]})
    return out


def follow_stream(
    binlog_dir: str,
    cfg: ReplayConfig,
    lake_seed: str | None = None,
    poll_sec: float = 1.0,
    idle_polls: int = 5,
    on_batch=None,
    poll_hook=None,
) -> list[dict]:
    """Continuous-tail mode (the reference's cron/trigger surface,
    ``ReconciliationController.java:41-42``): poll ``binlog_dir`` for
    new epoch files, replay each batch as it lands, stop when an
    ``_EOS`` marker file appears or ``idle_polls`` consecutive polls
    find nothing new. Polling is control-plane only — the data path
    stays deterministic (epoch content + commit log define the state,
    never the wall clock).

    ``on_batch(cfg)``: called after each fresh batch is replayed and
    sealed — the downstream-consumer hook (advance a ``MaintainedView``,
    spool ``export_changelog``); exceptions propagate (the lake state
    is already committed, so a crashed hook resumes cleanly).

    ``poll_hook()``: called at the top of every poll, BEFORE epoch
    discovery — the upstream-adapter hook (e.g. convert newly landed
    CDC envelope JSONL into binlog epochs, forward an upstream ``_EOS``
    marker); exceptions propagate."""
    out: list[dict] = []
    seen: set[str] = set()
    idle = 0
    while True:
        if poll_hook is not None:
            poll_hook()
        descs = _discover_epochs(binlog_dir, stop_at_unreadable=True)
        fresh = [d for d in descs if d["file"] not in seen]
        if fresh:
            idle = 0
            out.extend(_replay_epoch_descs(descs, cfg, lake_seed))
            seen.update(d["file"] for d in descs)
            if on_batch is not None:
                on_batch(cfg)
        else:
            idle += 1
        if os.path.exists(os.path.join(binlog_dir, "_EOS")):
            # STRICT discovery for the final drain: the producer is done
            # (_EOS lands after the last file), so an unreadable file is
            # corruption, not a mid-copy — a lenient cut here would
            # declare the drain complete and silently drop the stream's
            # final epoch(s)
            descs = _discover_epochs(binlog_dir, stop_at_unreadable=False)
            if all(d["file"] in seen for d in descs):
                break
        elif idle >= idle_polls:
            break
        time.sleep(poll_sec)
    return out


def follow_multiplexed(
    binlog_dir: str,
    tables: dict[str, ReplayConfig],
    coordinator_root: str,
    table_col: str = "tbl",
    poll_sec: float = 1.0,
    idle_polls: int = 5,
    on_batch=None,
) -> list[dict]:
    """Continuous-tail mode for a MULTIPLEXED stream: poll for new
    epoch files and land each batch through ``replay_multiplexed`` —
    per-epoch cross-table atomic commits, resumable at every crash
    point (replay_multiplexed re-derives everything from the seals, the
    coordinator log and the fences, so each poll is just a re-entry).
    Stops on ``_EOS`` (after draining) or ``idle_polls`` empty polls.

    ``on_batch(tables)``: downstream hook after each fresh atomic batch
    (advance views, spool feeds); exceptions propagate — the commits
    are already durable, so a crashed hook resumes cleanly."""
    out: list[dict] = []
    seen: set[str] = set()
    idle = 0
    while True:
        descs = _discover_epochs(binlog_dir, stop_at_unreadable=True)
        fresh = [d for d in descs if d["file"] not in seen]
        if fresh:
            idle = 0
            out.extend(replay_multiplexed(
                binlog_dir, tables, coordinator_root, table_col=table_col,
                stop_at_unreadable=True,
            ))
            seen.update(d["file"] for d in descs)
            if on_batch is not None:
                on_batch(tables)
        else:
            idle += 1
        if os.path.exists(os.path.join(binlog_dir, "_EOS")):
            # strict discovery for the final drain (see follow_stream)
            descs = _discover_epochs(binlog_dir, stop_at_unreadable=False)
            if all(d["file"] in seen for d in descs):
                break
        elif idle >= idle_polls:
            break
        time.sleep(poll_sec)
    return out


_INT_WIDTH = {pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64}
_UINT_WIDTH = {pa.uint8(): 8, pa.uint16(): 16, pa.uint32(): 32, pa.uint64(): 64}
_FLOAT_WIDTH = {pa.float16(): 16, pa.float32(): 32, pa.float64(): 64}


def _safe_widen(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """The LOSSLESS common type of two evolved column types, or None if
    no safe promotion exists. Same-kind widening only (Debezium-style
    additive type evolution): signed↔signed / unsigned↔unsigned /
    float↔float width bumps, (large_)string and (large_)binary offset
    widening, decimal128 precision growth at the SAME scale. Signed vs
    unsigned, int vs float (int64→float64 loses above 2^53), and
    timestamp unit changes stay refused."""
    for widths in (_INT_WIDTH, _UINT_WIDTH, _FLOAT_WIDTH):
        if a in widths and b in widths:
            return a if widths[a] >= widths[b] else b
    strs = (pa.string(), pa.large_string())
    if a in strs and b in strs:
        return pa.large_string()
    bins = (pa.binary(), pa.large_binary())
    if a in bins and b in bins:
        return pa.large_binary()
    if (
        pa.types.is_decimal128(a)
        and pa.types.is_decimal128(b)
        and a.scale == b.scale
    ):
        return pa.decimal128(max(a.precision, b.precision), a.scale)
    return None


def _binlog_scan_schema(files: list[str], drop: tuple[str, ...] = ("ts",)) -> "pa.Schema":
    """Unified scan schema across binlog files — the schema-evolution
    contract: a payload column ADDED mid-stream appears in the unified
    schema (older files surface it as nulls via the explicit
    ``schema=`` read); a column absent from later files likewise reads
    as null there. A type change for an existing column unifies to the
    LOSSLESS wider type when one exists (``_safe_widen`` — int/float
    width bumps, string/binary offset widening, decimal precision
    growth; the parquet scanner casts narrower fragments up, and the
    lake's chain resolution already promotes permissively) and is
    refused loudly otherwise (silently coercing CDC payloads corrupts
    the lake). ``drop`` columns (``ts``: dead weight in replay — LWW
    orders on seq) are pruned at the scan. Field order is
    first-appearance, so the pre-evolution prefix stays stable.

    Without this, ``read_parquet(files)`` infers the schema from the
    FIRST fragment and a column added in a later epoch of the same
    chunk would be silently dropped."""
    import pyarrow.parquet as _pq

    fields: dict[str, pa.Field] = {}
    for f in files:
        for fld in _pq.read_schema(f):
            if fld.name in drop:
                continue
            prev = fields.get(fld.name)
            if prev is None:
                fields[fld.name] = fld
            elif not prev.type.equals(fld.type):
                # an all-null file leg may carry `null` type; the real
                # type (from any other file) wins
                if pa.types.is_null(prev.type):
                    fields[fld.name] = fld
                elif not pa.types.is_null(fld.type):
                    wide = _safe_widen(prev.type, fld.type)
                    if wide is None:
                        raise ValueError(
                            f"binlog schema evolution changed the TYPE of column "
                            f"{fld.name!r} ({prev.type} -> {fld.type} in {f}) with "
                            "no lossless promotion; rewrite upstream, refusing"
                        )
                    fields[fld.name] = pa.field(fld.name, wide)
    return pa.schema(list(fields.values()))


def _run_epoch_batch(
    chunk: list[tuple[int, dict]],
    cfg: ReplayConfig,
    log: CommitLog,
    writers: list,
    prep_fn=None,
) -> list[dict]:
    """ONE Dataset execution over K binlog epochs in forced-delta mode.

    Every event is tagged with its engine epoch (from the fixture's
    per-epoch seq ranges), then grouped by (epoch, bucket): each group
    is exactly one epoch's events for one bucket, so the per-group LWW
    delta is bit-identical to K sequential delta epochs — but the
    streaming executor pipelines read/normalize/shuffle/merge across
    all K epochs with no driver barrier between them. Epochs are then
    committed and sealed strictly in order."""
    import numpy as np
    import ray.data as rd

    t0 = time.monotonic()
    kwargs = {"override_num_blocks": cfg.read_parallelism} if cfg.read_parallelism else {}

    def _expand(p: str) -> list[str]:
        import glob as _g

        return sorted(_g.glob(os.path.join(p, "*.parquet"))) if os.path.isdir(p) else [p]

    files = [f for _, ep in chunk for f in _expand(ep["file"])]
    # seq -> engine epoch boundaries (upper-exclusive), fixture order
    bounds = [int(ep["seq_range"][1]) for _, ep in chunk]
    epochs = [engine_epoch for engine_epoch, _ in chunk]
    seq_by_epoch = {engine_epoch: tuple(ep["seq_range"]) for engine_epoch, ep in chunk}

    # projection pushdown at the binlog scan (`ts` pruned) + unified
    # schema across the chunk's files so mid-stream column additions
    # survive (see _binlog_scan_schema)
    ds = rd.read_parquet(files, schema=_binlog_scan_schema(files), **kwargs)
    if prep_fn is not None:
        ds = ds.map_batches(prep_fn, batch_format="pyarrow")

    def tag_epoch(batch: pa.Table) -> pa.Table:
        if "epoch" in batch.column_names:
            # hive-partitioned layouts (binlog/epoch=N/...) surface a
            # partition column; the engine epoch is derived from seq
            batch = batch.drop_columns(["epoch"])
        seq = np.asarray(batch["seq"].to_numpy(zero_copy_only=False), dtype=np.int64)
        idx = np.searchsorted(np.asarray(bounds, dtype=np.int64), seq, side="right")
        ep_col = np.asarray(epochs, dtype=np.int64)[idx]
        return batch.append_column("epoch", pa.array(ep_col, pa.int64()))

    normalized = ds.map_batches(
        make_normalizer(cfg.num_buckets, cfg.salt_for_repo),
        batch_format="pyarrow",
        batch_size=cfg.normalize_batch_size,
    ).map_batches(tag_epoch, batch_format="pyarrow")

    import ray

    if cfg.merge_strategy == "direct":
        import hashlib

        import pyarrow.compute as pc

        from ..functions.hashing import table_state_sha256

        lake_root = cfg.lake_root

        def direct_write(batch: pa.Table) -> pa.Table:
            """Write this block's partial deltas straight to the lake:
            data never leaves the task (read -> CPU -> disk; no shuffle,
            no object-store round trip). One file per (task, epoch) with
            one row group per bucket slice so chain readers prune by the
            ``bucket`` filter; file names are content-addressed, so a
            retried task rewrites byte-identical bytes — idempotent.

            The LWW winner per (epoch, bucket, repo, path) is computed
            as an index permutation over the SMALL columns only (int64
            lexsort + dictionary-coded keys); the content payload is
            then gathered ONCE, winners-only, by a single ``take``.
            The previous full-table ``sort_by`` copied every event's
            content bytes before dropping the losers — on this
            memory-bandwidth-bound stage that copy was the scaling
            bottleneck (BENCH/BASELINE.md)."""
            if batch.num_rows == 0:
                return pa.table({})
            from ..functions.hashing import key_strings

            ge0 = batch["epoch"].to_numpy(zero_copy_only=False).astype(np.int64)
            gb0 = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            seq0 = batch["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
            keys = key_strings(batch["repo"], batch["path"])
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            codes = (
                pc.dictionary_encode(keys)
                .indices.to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            ncodes = int(codes.max()) + 1
            nb = int(gb0.max()) + 1
            gid = (ge0 * nb + gb0) * ncodes + codes
            # stable sort by (gid, seq): last row of each gid run is the
            # max-seq winner (ties -> later batch position, matching the
            # stable-sort + "last" aggregate semantics of lww_reduce)
            perm = np.lexsort((seq0, gid))
            g = gid[perm]
            winners = perm[np.flatnonzero(np.append(g[1:] != g[:-1], True))]
            t = batch.take(pa.array(winners))  # the ONE content gather
            t = t.drop_columns([c for c in ("ts", "epoch") if c in t.column_names])
            from ..stages.merge import LAKE_COLS

            extras = sorted(
                c for c in t.column_names if c not in LAKE_COLS + ["bucket", "op", "seq"]
            )
            order = [
                c for c in LAKE_COLS + ["op", "seq", "bucket"] + extras
                if c in t.column_names
            ]
            t = t.select(order)  # delta_of's column contract (zero-copy)
            ge = ge0[winners]
            gb = gb0[winners]
            sid = ge * nb + gb  # winners are grouped: gid asc => (epoch, bucket) asc
            cuts = np.flatnonzero(np.diff(sid)) + 1
            starts = np.concatenate([[0], cuts]).astype(np.int64)
            ends = np.concatenate([cuts, [len(sid)]]).astype(np.int64)
            by_epoch: dict[int, list[tuple[int, pa.Table, str]]] = {}
            for s, e in zip(starts, ends):
                sl = t.slice(int(s), int(e - s))
                sha = table_state_sha256(sl, ("repo", "path"), "content_sha256")
                by_epoch.setdefault(int(ge[s]), []).append((int(gb[s]), sl, sha))
            import pyarrow.parquet as pq

            rows = []
            for ep_id, slices in sorted(by_epoch.items()):
                digest = hashlib.sha256(
                    (str(ep_id) + "".join(sha for _, _, sha in slices)).encode()
                ).hexdigest()[:16]
                out_dir = os.path.join(lake_root, f"epoch={ep_id:05d}")
                os.makedirs(out_dir, exist_ok=True)
                fname = os.path.join(out_dir, f"delta-{digest}.parquet")
                if not os.path.exists(fname):
                    tmp = fname + f".tmp{os.getpid()}"
                    with pq.ParquetWriter(tmp, slices[0][1].schema) as w:
                        for _, sl, _ in slices:
                            # row_group_size=num_rows: EXACTLY one row
                            # group per bucket slice — pyarrow would
                            # otherwise silently split slices over 1Mi
                            # rows, desyncing every later rg ordinal
                            w.write_table(sl, row_group_size=max(1, sl.num_rows))
                    os.replace(tmp, fname)
                for rg, (part, sl, sha) in enumerate(slices):
                    rows.append({
                        "epoch": ep_id, "part": part, "file": fname, "rg": rg,
                        "rows": sl.num_rows, "state_sha256": sha, "kind": "delta",
                    })
            return pa.Table.from_pylist(rows)

        rows_ds = normalized.map_batches(direct_write, batch_format="pyarrow", batch_size=None)
        rows = [dict(r) for r in rows_ds.take_all()]
    elif cfg.merge_strategy == "combine":
        from ..stages.merge import lww_reduce

        nw = len(writers)

        def send_partials(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"n": pa.array([0], pa.int64())})
            t = batch.sort_by([("epoch", "ascending"), ("bucket", "ascending")])
            ge = t["epoch"].to_numpy(zero_copy_only=False).astype(np.int64)
            gb = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            gid = ge * (gb.max() + 1) + gb
            cuts = np.flatnonzero(np.diff(gid)) + 1
            starts = np.concatenate([[0], cuts])
            ends = np.concatenate([cuts, [len(gid)]])
            refs, sent = [], 0
            for s, e in zip(starts, ends):
                sl = t.slice(int(s), int(e - s))
                partial = lww_reduce(sl)
                if "ts" in partial.column_names:
                    partial = partial.drop_columns(["ts"])
                sent += partial.num_rows
                refs.append(
                    writers[int(gb[s]) % nw].add_partial.remote(
                        int(ge[s]), int(gb[s]), partial
                    )
                )
            ray.get(refs)  # barrier: stage completion => partials received
            return pa.table({"n": pa.array([sent], pa.int64())})

        normalized.map_batches(
            send_partials, batch_format="pyarrow", batch_size=None
        ).count()  # drives the execution; output is a tiny count per block
        rows = [dict(r) for w in writers for r in ray.get(w.flush_all.remote())]
    else:
        manifest_rows_ds = normalized.groupby(["epoch", "bucket"]).map_groups(
            make_merge_fn(ray.put({}), writers=writers, epoch=None, force_delta=True),
            batch_format="pyarrow",
        )
        rows = [dict(r) for r in manifest_rows_ds.take_all()]
    sec = time.monotonic() - t0

    by_epoch: dict[int, list[dict]] = {}
    for r in rows:
        by_epoch.setdefault(int(r["epoch"]), []).append(r)
    out = []
    for engine_epoch in epochs:  # commit + seal strictly in order
        committed = _commit_manifest_rows(
            log, engine_epoch, by_epoch.get(engine_epoch, []),
            seq_by_epoch[engine_epoch], seal=True,
        )
        out.append({
            "epoch": engine_epoch,
            "skipped": False,
            "mode": "delta",
            "parts_committed": committed,
            "pieces": len(by_epoch.get(engine_epoch, [])),
            "rows_written": sum(int(r["rows"]) for r in by_epoch.get(engine_epoch, [])),
            "sec": round(sec / len(epochs), 4),
        })
    if out:
        _write_lineage(cfg.lake_root, log, out[-1])
    return out


def compact(cfg: ReplayConfig, log: CommitLog | None = None, writers: list | None = None) -> dict:
    """Distributed end-of-stream compaction: every bucket whose
    merge-on-read chain is longer than 1 file is resolved and rewritten
    as a single base file, committed as a new (maintenance) epoch.

    One Ray task per bucket via a Dataset over part descriptors — each
    task reads ONLY its own chain (no shuffle). NOTE: the maintenance
    epoch takes the next epoch number, so call this at a stream
    checkpoint/end, not between fixture epochs with fixed numbering.

    Refuses while a feed apply is IN FLIGHT on this lake: a replica's
    ``feed_map.json`` reserves a segment's epoch durably BEFORE the
    epoch seals, and compaction stealing that number would make the
    restarted ``replicate_feed`` see its reserved epoch sealed and skip
    the segment — silent data loss. (Compaction's own crashed epoch is
    not a reservation; its rerun resumes under the (epoch, part)
    fence as before.)"""
    import ray
    import ray.data as rd

    log = log or CommitLog.open(cfg.lake_root)
    t0 = time.monotonic()
    chains = _chains_payload(log, upto_epoch=log.latest_sealed_epoch())
    todo = {p: c for p, c in chains.items() if len(c) > 1 or any(l["kind"] != "full" for l in c)}
    if not todo:
        return {"epoch": None, "compacted": 0, "sec": 0.0, "skipped": True}
    fm_path = os.path.join(cfg.lake_root, "feed_map.json")
    if os.path.exists(fm_path):
        try:
            with open(fm_path) as fh:
                reserved = [int(v) for v in json.load(fh).values()]
        except (ValueError, TypeError):
            reserved = []  # unreadable/legacy map: replicate_feed migrates it
        pending = sorted(e for e in reserved if not log.is_sealed(e))
        if pending:
            raise ValueError(
                f"compact: feed epoch(s) {pending} are reserved but "
                "unsealed (an in-flight replicate_feed apply) — drain "
                "the feed first; a maintenance epoch stealing the "
                "reserved number would make the restarted apply skip "
                "its segment"
            )
    epoch = (log.latest_sealed_epoch() or 0) + 1
    if epoch in log.unsealed_epochs():
        # a crashed REPLAY's fenced partial commits at this epoch:
        # compacting into it would mix maintenance bases with the
        # crashed attempt's deltas and seal the mix — the restarted
        # replay would see the epoch sealed and skip it, silently
        # losing its remaining events. Compaction's OWN crashed attempt
        # (entries stamped with the maintenance input_seq marker)
        # resumes under the fence as before.
        leftover = [e for e in log.all_entries() if e.epoch == epoch]
        if any(e.input_seq != _MAINT_SEQ for e in leftover):
            raise ValueError(
                f"compact: epoch {epoch} has committed-unsealed entries from "
                "a crashed replay or txn — resume that replay to completion, "
                "or drop_unsealed_epoch() to discard it, before compacting"
            )

    from ..stages.merge import read_chain
    from ..stages.writer import write_piece_local

    lake_root = cfg.lake_root
    items = [{"part": p, "chain": json.dumps(c)} for p, c in sorted(todo.items())]

    target = cfg.compact_target_bytes

    def compact_one(batch: pa.Table) -> pa.Table:
        # task-side write (write_piece_local): the task already holds
        # the resolved state, so shipping it through the object store to
        # a writer actor would add a full serialization hop and funnel
        # 64 buckets through writer_concurrency actors; the commit-log
        # fence + content-addressed names keep retries idempotent
        rows = []
        for rec in batch.to_pylist():
            part = int(rec["part"])
            state = read_chain(json.loads(rec["chain"]), part=part)
            if state is None or state.num_rows == 0:
                from ..stages.merge import LAKE_COLS
                cols = {c: pa.array([None], pa.string()) for c in LAKE_COLS}
                cols["bucket"] = pa.array([part], pa.int32())
                state = pa.table(cols)
            # rewritten bases are SORTED by key: parquet row-group
            # min/max stats then prune point/repo lookups to O(one row
            # group) (read_chain key_filter), pieces sliced below get
            # tight disjoint key ranges, and sorted content compresses
            # better. All state digests are order-insensitive
            # (table_state_sha256 canonicalizes), so this is free.
            if state.num_rows > 1:
                state = state.sort_by([("repo", "ascending"), ("path", "ascending")])
            # target-size split: slice the rewritten base into ~equal
            # row ranges sized by in-memory bytes; each slice is its own
            # content-addressed piece, folded into ONE multi-file part
            # entry by _commit_manifest_rows (readers are unchanged —
            # read_chain reads every file of a link). Deterministic
            # given the chain, so retries stay idempotent.
            n_pieces = 1
            if target and state.num_rows and state.nbytes > target:
                n_pieces = min(state.num_rows, -(-state.nbytes // target))
            if n_pieces == 1:
                rows.append(write_piece_local(lake_root, epoch, part, state, "full"))
            else:
                step = -(-state.num_rows // n_pieces)
                for off in range(0, state.num_rows, step):
                    rows.append(write_piece_local(
                        lake_root, epoch, part,
                        state.slice(off, step), "full",
                    ))
        return pa.Table.from_pylist(rows)

    rows_ds = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        compact_one, batch_format="pyarrow", batch_size=1
    )
    rows = [dict(r) for r in rows_ds.take_all()]
    # the maintenance marker lets a rerun distinguish compaction's own
    # crashed entries (resumable) from a crashed replay's (refused)
    _commit_manifest_rows(log, epoch, rows, _MAINT_SEQ, seal=True)
    live = log.write_snapshot()  # chains are shortest right after compaction
    metrics = {
        "epoch": epoch,
        "skipped": False,
        "mode": "compact",
        "compacted": len(rows),
        "rows_written": sum(int(r["rows"]) for r in rows),
        "log_live_entries": live,
        "sec": round(time.monotonic() - t0, 4),
    }
    _write_lineage(cfg.lake_root, log, metrics)
    return metrics


def rebucket(
    cfg_or_root,
    dest_root: str,
    num_buckets: int,
    salt_for_repo: dict[str, int] | None = None,
) -> dict:
    """Bucket-layout migration (Iceberg partition-spec-evolution
    equivalent): rewrite the lake's CURRENT resolved state into a fresh
    lake at ``dest_root`` under a new (num_buckets, salt) layout.

    The commit log's layout fence makes a lake's bucket routing
    immutable IN PLACE — correctly so, since every persisted file and
    chain entry embeds its bucket id. Changing the partition count
    (scale the cluster up, onboard a hotter key distribution) is
    therefore an explicit rewrite: resolve the source chains, re-tag
    every row under the new layout, ONE all-to-all shuffle on the new
    bucket id (inherent to any re-partitioning), one full base file per
    new part committed + sealed as the destination's epoch 0. The
    source lake is untouched (rollback = keep using it); the state
    sha256 is layout-independent, so migration success is checkable as
    ``lake_state_hash(src) == lake_state_hash(dest)``."""
    import ray.data as rd

    from ..functions.hashing import bucket_of
    from ..stages.writer import write_piece_local
    from ..state.commitlog import layout_fingerprint

    src_root = _root_of(cfg_or_root)
    src_log = CommitLog.open(src_root)
    if src_log.latest_sealed_epoch() is None:
        raise ValueError(f"source lake at {src_root} has no sealed epochs")
    os.makedirs(dest_root, exist_ok=True)
    dest_log = CommitLog.open(dest_root)
    if dest_log.latest_sealed_epoch() is not None or dest_log.lineage():
        raise ValueError(
            f"destination {dest_root} already holds committed state; "
            "rebucket only writes into an empty lake root"
        )
    dest_log.ensure_layout(layout_fingerprint(num_buckets, salt_for_repo))

    t0 = time.monotonic()

    def retag(batch: pa.Table) -> pa.Table:
        if "bucket" in batch.column_names:
            batch = batch.drop_columns(["bucket"])
        return batch.append_column(
            "bucket", bucket_of(batch["repo"], batch["path"], num_buckets, salt_for_repo)
        )

    def write_part(t: pa.Table) -> pa.Table:
        part = int(t["bucket"][0].as_py())
        return pa.Table.from_pylist([write_piece_local(dest_root, 0, part, t, "full")])

    rows_ds = (
        lake_dataset(src_root)
        .map_batches(retag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_part, batch_format="pyarrow")
    )
    rows = [dict(r) for r in rows_ds.take_all()]  # manifest rows: O(parts)
    _commit_manifest_rows(dest_log, 0, rows, None, seal=True)
    metrics = {
        "epoch": 0,
        "mode": "rebucket",
        "parts": len(rows),
        "rows_written": sum(int(r["rows"]) for r in rows),
        "sec": round(time.monotonic() - t0, 4),
    }
    _write_lineage(dest_root, dest_log, metrics)
    return metrics


def bucket_stats(cfg_or_root) -> dict:
    """Per-bucket skew audit from commit-log METADATA only — no data
    file is opened. For each partition's current merge-on-read chain:
    chain row volume (the resolve work a reader pays; full + delta
    rows, so overlapping keys count per layer), delta depth, and file
    references. The summary's ``skew`` (max/mean chain rows) is the
    ops signal that a hot key needs ``salt_for_repo`` splitting or a
    ``rebucket`` migration. Returns {"parts": pa.Table, "summary":
    dict}."""
    root = cfg_or_root if isinstance(cfg_or_root, str) else cfg_or_root.lake_root
    log = CommitLog.open(root)
    chains = log.part_chains()
    parts, rows, files, deltas, epochs = [], [], [], [], []
    for p in sorted(chains):
        c = chains[p]
        parts.append(int(p))
        rows.append(int(sum(e.rows for e in c)))
        files.append(int(sum(len(e.files) for e in c)))
        deltas.append(int(sum(1 for e in c if e.kind != "full")))
        epochs.append(int(c[-1].epoch))
    tbl = pa.table({
        "part": pa.array(parts, pa.int64()),
        "chain_rows": pa.array(rows, pa.int64()),
        "chain_files": pa.array(files, pa.int64()),
        "delta_depth": pa.array(deltas, pa.int64()),
        "latest_epoch": pa.array(epochs, pa.int64()),
    })
    mean_rows = (sum(rows) / len(rows)) if rows else 0.0
    summary = {
        "parts": len(parts),
        "total_chain_rows": int(sum(rows)),
        "max_chain_rows": int(max(rows)) if rows else 0,
        "mean_chain_rows": round(mean_rows, 1),
        "skew": round(max(rows) / mean_rows, 3) if mean_rows else 0.0,
        "max_delta_depth": int(max(deltas)) if deltas else 0,
    }
    return {"parts": tbl, "summary": summary}


def auto_salt_plan(cfg_or_root, skew_threshold: float = 2.0,
                   max_salt: int = 64) -> dict:
    """Threshold-triggered salt proposal from MEASURED skew: when
    ``bucket_stats`` reports max/mean chain rows above
    ``skew_threshold``, read ONLY the hot buckets' chains (one task per
    hot part — never the whole lake), find each one's dominant repo,
    and propose a ``salt_for_repo`` split sized to flatten it
    (current_salt x ceil(hot_rows / mean_rows), capped). A repo is
    proposed only when it DOMINATES its bucket (>50% of the bucket's
    RESOLVED rows — chain rows double-count superseded keys on
    update-heavy buckets) — salting a minority repo cannot fix the
    bucket.

    Returns {"salt_for_repo": {...}, "hot_parts": [...], "summary":
    bucket_stats summary}. The plan is advisory: the commit-log layout
    fence makes salt immutable in place, so applying it is an explicit
    ``auto_rebucket``/``rebucket`` migration."""
    import math

    import ray.data as rd

    root = _root_of(cfg_or_root)
    stats = bucket_stats(root)
    summary = stats["summary"]
    mean = float(summary["mean_chain_rows"]) or 0.0
    out = {"salt_for_repo": {}, "hot_parts": [], "summary": summary}
    if mean <= 0 or summary["skew"] <= skew_threshold:
        return out
    t = stats["parts"]
    hot = [
        (int(p), int(r))
        for p, r in zip(t["part"].to_pylist(), t["chain_rows"].to_pylist())
        if r > skew_threshold * mean
    ]
    out["hot_parts"] = [p for p, _ in hot]
    log = CommitLog.open(root)
    cur_salt = (log.layout or {}).get("salt", {})
    chains = _chains_payload(log, upto_epoch=log.latest_sealed_epoch())

    def repo_counts(batch: pa.Table) -> pa.Table:
        # one hot part per task: resolve its chain, count rows per repo
        import pyarrow.compute as pc

        tbls = []
        for rec in batch.to_pylist():
            part = int(rec["part"])
            state = read_chain(json.loads(rec["chain"]), columns=["repo"], part=part)
            if state is None or state.num_rows == 0:
                continue
            red = (
                pa.table({"repo": state["repo"]})
                .group_by(["repo"], use_threads=False)
                .aggregate([([], "count_all")])
            )
            tbls.append(pa.table({
                "part": pa.array([part] * red.num_rows, pa.int64()),
                "repo": red["repo"],
                "rows": pc.cast(red["count_all"], pa.int64()),
                # the part's RESOLVED row total — dominance must compare
                # resolved-to-resolved; chain rows count superseded keys
                # per delta layer, so update-heavy hot buckets would
                # spuriously fail a resolved-vs-chain comparison
                "part_rows": pa.array([state.num_rows] * red.num_rows, pa.int64()),
            }))
        return (
            pa.concat_tables(tbls) if tbls
            else pa.table({"part": pa.array([], pa.int64()),
                           "repo": pa.array([], pa.string()),
                           "rows": pa.array([], pa.int64()),
                           "part_rows": pa.array([], pa.int64())})
        )

    items = [{"part": p, "chain": json.dumps(chains[p])} for p, _ in hot]
    counts = (
        rd.from_items(items, override_num_blocks=max(1, len(items)))
        .map_batches(repo_counts, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    for (part, chain_rows) in hot:
        mine = counts[counts["part"] == part]
        if mine.empty:
            continue
        top = mine.loc[mine["rows"].idxmax()]
        if int(top["rows"]) * 2 <= int(top["part_rows"]):
            continue  # no dominant repo: salting cannot flatten this part
        repo = str(top["repo"]) if top["repo"] is not None else None
        if repo is None:
            continue
        # factor sized against MEAN CHAIN rows (the only fleet-wide
        # denominator available without reading every part) — chain >=
        # resolved, so the split can only be UNDERSIZED, which is safe:
        # a re-run of auto_rebucket strictly reduces the hot bucket
        factor = max(2, math.ceil(int(top["rows"]) / mean))
        proposed = min(max_salt, int(cur_salt.get(repo, 1)) * factor)
        out["salt_for_repo"][repo] = max(
            proposed, out["salt_for_repo"].get(repo, 0)
        )
    return out


def auto_rebucket(cfg_or_root, dest_root: str, skew_threshold: float = 2.0,
                  max_salt: int = 64) -> dict:
    """One-call skew remediation: measure, plan, and (iff the threshold
    trips) run the ``rebucket`` migration into ``dest_root`` with the
    proposed salts MERGED over the lake's current salt config, keeping
    the bucket count. State is layout-independent — success is
    ``lake_state_hash(src) == lake_state_hash(dest)`` (the rebucket
    contract); a below-threshold lake returns ``{"skipped": True}`` and
    writes nothing."""
    root = _root_of(cfg_or_root)
    plan = auto_salt_plan(root, skew_threshold=skew_threshold, max_salt=max_salt)
    if not plan["salt_for_repo"]:
        return {"skipped": True, "plan": plan}
    log = CommitLog.open(root)
    layout = log.layout or {}
    merged = {**layout.get("salt", {}), **plan["salt_for_repo"]}
    m = rebucket(
        root, dest_root,
        num_buckets=int(layout.get("num_buckets") or 32),
        salt_for_repo=merged,
    )
    return {"skipped": False, "plan": plan, "salt_for_repo": merged, **m}


def _erase_rewrite_file(src: str, dst: str, repo: str, path: str | None) -> dict:
    """Rewrite one parquet file with every row of the target key
    removed, PRESERVING row-group count and order (0-row groups are
    written for fully-erased slices) so entries that address this file
    by row-group ordinal stay valid. Atomic publish via tmp + rename.
    Runs as a Ray task when a session exists (files are independent)."""
    import pyarrow.parquet as _pq

    f = _pq.ParquetFile(src)
    tmp = dst + ".tmp"
    erased = 0
    rg_rows = []
    writer = _pq.ParquetWriter(tmp, f.schema_arrow)
    try:
        for i in range(f.num_row_groups):
            t = f.read_row_group(i)
            keep = pc.invert(pc.equal(t["repo"], repo))
            if path is not None:
                keep = pc.or_(keep, pc.invert(pc.equal(t["path"], path)))
            kept = t.filter(pc.fill_null(keep, True))
            erased += t.num_rows - kept.num_rows
            writer.write_table(kept, row_group_size=max(kept.num_rows, 1))
            rg_rows.append(kept.num_rows)
    finally:
        writer.close()
    with open(tmp, "rb") as fh:
        os.fsync(fh.fileno())
    os.replace(tmp, dst)
    return {"src": src, "dst": dst, "erased": erased, "rg_rows": rg_rows}


def erase_key(cfg_or_root, repo: str, path: str | None = None) -> dict:
    """PHYSICAL erasure (right-to-be-forgotten): remove every surviving
    stored version of one ``(repo, path)`` key — or a whole repo — from
    the lake's data files, across bases, merge-on-read deltas and the
    still-answerable time-travel history. A logical delete (a 'D'
    event) hides a key from the current state but keeps its bytes in
    older epochs; GDPR/CCPA erasure demands the bytes themselves go.

    How: candidate buckets via the layout fence (O(salt) buckets, not
    O(lake)); their entries' files are probed with a pushed-down key
    filter; each affected file is rewritten WITHOUT the key's rows,
    preserving row-group count/order (0-row groups keep ordinal
    addressing valid for every entry sharing the file — direct-mode
    files hold one group per bucket). Every log entry referencing a
    rewritten file is then atomically REPLACEd (same (epoch, part)
    slot, new files/rows/sha — ``CommitLog.replace_entries``), and the
    old files are deleted once nothing references them.

    Crash-safety: rewrites publish atomically and the REPLACE batch is
    one fsynced append BEFORE any old file is deleted; a crash earlier
    leaves the lake untouched plus orphan rewrite files (vacuum
    collects them), a re-run converges (the probe no longer matches
    erased files). Erasure intentionally changes history: as-of reads
    and ``key_history`` see the redacted state, ``lake_state_hash``
    changes, and downstream copies (changelog export spools, maintained
    views) must be erased by their own owners."""
    import hashlib

    import pyarrow.parquet as pq

    from ..functions.hashing import buckets_for_key, table_state_sha256

    log = CommitLog.open(_root_of(cfg_or_root))
    num_buckets, salt = _layout_of(log)
    cands = set(buckets_for_key(repo, path, num_buckets, salt))

    # probe: which files actually hold the key (pushdown; candidate
    # buckets only — a file shared across buckets can only hold the key
    # in a candidate bucket's rows)
    kf = [("repo", "=", repo)] + ([("path", "=", path)] if path is not None else [])
    affected: list[str] = []
    seen: set[str] = set()
    for entry in log.all_entries():
        if entry.part not in cands:
            continue
        for f in entry.files:
            if f in seen:
                continue
            seen.add(f)
            t = pq.read_table(f, columns=["repo"], filters=kf)
            if t.num_rows:
                affected.append(f)
    if not affected:
        return {"files_rewritten": 0, "rows_erased": 0, "entries_replaced": 0,
                "files_deleted": 0}

    renames: dict[str, str] = {}
    for f in affected:
        tag = hashlib.sha256(f"{os.path.basename(f)}|{repo}|{path}".encode()).hexdigest()[:16]
        renames[f] = os.path.join(os.path.dirname(f), f"erased-{tag}.parquet")

    import ray

    jobs = [(f, renames[f]) for f in affected]
    if ray.is_initialized():
        task = ray.remote(_erase_rewrite_file)
        results = ray.get([task.remote(src, dst, repo, path) for src, dst in jobs])
    else:
        results = [_erase_rewrite_file(src, dst, repo, path) for src, dst in jobs]
    rows_erased = sum(r["erased"] for r in results)

    # rebuild every entry that references a rewritten file: new names,
    # recounted rows, recomputed state sha (per-piece digest combined in
    # file order — the same scheme _commit_manifest_rows commits)
    replaced: list[PartEntry] = []
    for entry in log.all_entries():
        if not any(f in renames for f in entry.files):
            continue
        new_files = tuple(renames.get(f, f) for f in entry.files)
        rgs = entry.rgs or (-1,) * len(entry.files)
        pieces = []
        total = 0
        for f, rg in zip(new_files, rgs):
            if rg is not None and int(rg) >= 0:
                piece = pq.ParquetFile(f).read_row_group(int(rg))
            else:
                piece = pq.read_table(f)
            total += piece.num_rows
            pieces.append((f, table_state_sha256(piece, ("repo", "path"), "content_sha256")))
        pieces.sort(key=lambda x: x[0])
        combined = hashlib.sha256("".join(s for _, s in pieces).encode()).hexdigest()
        replaced.append(PartEntry(
            epoch=entry.epoch, part=entry.part, files=new_files, rows=total,
            state_sha256=combined, input_seq=entry.input_seq, kind=entry.kind,
            rgs=entry.rgs,
        ))
    log.replace_entries(replaced)

    still = log.referenced_files()
    deleted = 0
    for f in affected:
        if f not in still and os.path.exists(f):
            os.remove(f)
            deleted += 1
    _write_lineage(_root_of(cfg_or_root), log, {
        "erase": {"repo": repo, "path": path, "rows_erased": rows_erased},
    })
    return {
        "files_rewritten": len(affected),
        "rows_erased": rows_erased,
        "entries_replaced": len(replaced),
        "files_deleted": deleted,
    }


def erase_key_from_feed(out_dir: str, repo: str, path: str | None = None) -> dict:
    """Scrub one key from an ``export_changelog`` spool at rest — the
    downstream half of ``erase_key``: the lake's own files forget the
    key, but a spooled CDC feed still carries its images until the
    owner scrubs it. Every parquet file in every segment (sealed or
    in-flight) is rewritten in place without the key's rows (atomic
    tmp+rename; segment names, ``_SEALED`` markers and the ``_CURSOR``
    are untouched, so consumer positioning is unaffected — consumers
    that already applied the rows must erase their own sinks)."""
    import glob as _glob

    import pyarrow.parquet as pq

    feed = os.path.join(out_dir, "feed")
    rows_erased = 0
    files_rewritten = 0
    for f in sorted(_glob.glob(os.path.join(feed, "**", "*.parquet"), recursive=True)):
        t = pq.read_table(f)
        keep = pc.invert(pc.equal(t["repo"], repo))
        if path is not None:
            keep = pc.or_(keep, pc.invert(pc.equal(t["path"], path)))
        kept = t.filter(pc.fill_null(keep, True))
        if kept.num_rows == t.num_rows:
            continue
        tmp = f + ".tmp"
        pq.write_table(kept, tmp)
        with open(tmp, "rb") as fh:
            os.fsync(fh.fileno())
        os.replace(tmp, f)
        rows_erased += t.num_rows - kept.num_rows
        files_rewritten += 1
    return {"feed_files_rewritten": files_rewritten, "feed_rows_erased": rows_erased}


def vacuum(cfg_or_root, dry_run: bool = False) -> dict:
    """Lake garbage collection: delete data files no commit-log entry
    references any more. ``CommitLog.write_snapshot`` (run after every
    compaction) prunes superseded chain ENTRIES — each part's pre-base
    history — from the log, but the parquet files those entries pointed
    at stay on disk forever; vacuum reclaims them. (The lake-lifecycle
    counterpart of Iceberg's remove-orphan-files / Hudi cleaner;
    nothing in the reference — its H2 metadata store grows unbounded.)

    Safety rules:
    - the retention set is ``CommitLog.referenced_files()``: every
      entry still in the log keeps its files, so every as-of read the
      retention floor permits still resolves. Vacuum never tightens
      time-travel — only ``write_snapshot`` advances the floor.
    - only files inside epoch directories <= the latest SEALED epoch
      are candidates: a crashed-but-retryable epoch's content-addressed
      files must survive until that epoch seals (single-writer
      assumption, same as the commit log: vacuum runs from the driver,
      never concurrently with an active writer).
    - sidecar state (_reconcile_detail spill, _snapshot_spool,
      lineage.json, commitlog*) is not lake data and is never touched.

    Returns ``{checked, deleted, bytes_freed, dry_run, files}``
    (``files`` lists the victims only under ``dry_run``)."""
    import glob as _glob
    import re as _re

    root = os.path.abspath(_root_of(cfg_or_root))
    log = CommitLog.open(root)
    sealed = log.latest_sealed_epoch()
    out = {"checked": 0, "deleted": 0, "bytes_freed": 0, "dry_run": dry_run, "files": []}
    if sealed is None:
        return out

    def _tail(f: str) -> str | None:
        """Layout-canonical identity of a lake data file: its path from
        the LAST ``epoch=...`` segment down. Commit-log entries may
        record paths relative to a different cwd, or the lake may have
        been moved — resolving against the current cwd (abspath) would
        then match NOTHING and delete live bases. The epoch-tail is
        unique within one lake by construction (every data file lives
        at root/epoch=X/[part=Y/]name.parquet)."""
        parts = f.replace(os.sep, "/").split("/")
        for i in range(len(parts) - 1, -1, -1):
            if parts[i].startswith("epoch="):
                return "/".join(parts[i:])
        return None

    keep = {t for t in (_tail(f) for f in log.referenced_files()) if t is not None}
    if not keep:
        # a sealed lake whose entries yield no resolvable tails would
        # mark EVERYTHING as garbage — refuse instead of mass-deleting
        raise ValueError(
            f"lake at {root} has sealed epochs but no commit-log entry resolves "
            "to an epoch=* data path; refusing to vacuum"
        )
    for path in _glob.glob(os.path.join(root, "epoch=*", "**", "*.parquet"), recursive=True):
        m = _re.search(r"epoch=(\d+)", os.path.relpath(path, root))
        if m is None or int(m.group(1)) > sealed:
            continue
        out["checked"] += 1
        rel = _tail(path)
        if rel in keep:
            continue
        out["bytes_freed"] += os.path.getsize(path)
        out["deleted"] += 1
        if dry_run:
            out["files"].append(rel)
        else:
            os.remove(path)
    if not dry_run:
        # drop now-empty part/epoch dirs, deepest first
        dirs = _glob.glob(os.path.join(root, "epoch=*", "part=*")) + _glob.glob(
            os.path.join(root, "epoch=*")
        )
        for d in sorted(dirs, key=len, reverse=True):
            try:
                os.rmdir(d)
            except OSError:
                pass  # not empty — still holds live files
    return out


def _root_of(cfg_or_root) -> str:
    return cfg_or_root.lake_root if isinstance(cfg_or_root, ReplayConfig) else cfg_or_root


def _as_of_upto(log: CommitLog, as_of_epoch: int | None) -> int | None:
    """Validated chain horizon for an (optional) time-travel read.

    Refuses LOUDLY instead of answering wrong: an as-of beyond the
    sealed head would read uncommitted state; an as-of below the
    snapshot-truncation retention floor cannot be reconstructed (the
    older fulls/deltas are gone) and silently returning the partial
    chains would fabricate a lake state that never existed."""
    sealed = log.latest_sealed_epoch()
    if as_of_epoch is None:
        return sealed
    if sealed is None or as_of_epoch > sealed:
        raise ValueError(
            f"as_of_epoch={as_of_epoch} is beyond the sealed head ({sealed})"
        )
    floor = log.time_travel_floor()
    if as_of_epoch < floor:
        raise ValueError(
            f"as_of_epoch={as_of_epoch} predates the retention floor "
            f"({floor}): history was truncated by compaction/snapshot"
        )
    return as_of_epoch


def lake_dataset(
    cfg_or_root,
    columns: list[str] | None = None,
    as_of_epoch: int | None = None,
    repos: list[str] | None = None,
):
    """Committed lake state as a streaming ``ray.data.Dataset`` —
    current by default, or AS OF a past sealed epoch (time travel over
    the merge-on-read chains; Iceberg/Hudi snapshot-read semantics).

    Fully-compacted lakes (every chain is one base file) read as a
    plain pruned ``read_parquet``. Lakes with merge-on-read deltas are
    resolved DISTRIBUTED: one task per bucket reads + LWW-resolves its
    own chain (no shuffle — the chain is already partitioned by
    bucket), streaming resolved blocks downstream.

    Pass ``columns`` to prune at the read; restrict to pre-evolution
    columns when files span a schema change (Ray unifies blocks lazily,
    but a pruned uniform projection is both safer and cheaper).
    ``as_of_epoch`` reads are answerable back to the commit log's
    retention floor (``CommitLog.time_travel_floor``, persisted at
    snapshot time) and refused below it — see ``_as_of_upto``.

    ``repos`` prunes the read to the named repos: only the bucket
    chains those repos can route to (``buckets_for_key`` over the
    layout fence) are opened at all — a keyed scan of a few repos on a
    100 TB lake reads O(their buckets), not O(lake) — and the surviving
    blocks are row-filtered to exactly the requested repos."""
    import ray.data as rd

    log = CommitLog.open(_root_of(cfg_or_root))
    chains = _chains_payload(log, upto_epoch=_as_of_upto(log, as_of_epoch))
    repo_set = None
    if repos is not None:
        from ..functions.hashing import buckets_for_key

        num_buckets, salt = _layout_of(log)
        keep: set[int] = set()
        for r in repos:
            keep.update(buckets_for_key(r, None, num_buckets, salt))
        chains = {p: c for p, c in chains.items() if int(p) in keep}
        repo_set = pa.array(sorted(set(repos)), pa.string())
    # the bucket filter keeps false positives (other repos sharing a
    # candidate bucket) and the placeholder row filter needs `repo`
    # present even when the caller's projection drops it — read it
    # always, project it back out below
    read_cols = columns
    if columns is not None and "repo" not in columns:
        read_cols = ["repo", *columns]

    def repo_prune(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["repo"], value_set=repo_set))
        if columns is not None:
            t = t.select([c for c in columns if c in t.column_names])
        return t

    if all(len(c) == 1 and c[0]["kind"] == "full" for c in chains.values()):
        files = [f for c in chains.values() for link in c for f in link["files"]]
        files = [f for f in sorted(files) if os.path.getsize(f) > 0]
        if not files:
            return rd.from_arrow(pa.table({c: pa.array([], pa.string()) for c in (columns or ["repo", "path"])}))
        ds = rd.read_parquet(files, columns=read_cols)
        if repo_set is not None:
            return ds.map_batches(repo_prune, batch_format="pyarrow")
        if read_cols != columns and columns is not None:
            return ds.map_batches(
                lambda t: t.select(
                    [c for c in columns if c in t.column_names]
                ),
                batch_format="pyarrow",
            )
        return ds

    items = [{"part": p, "chain": json.dumps(c)} for p, c in sorted(chains.items())]

    def resolve_part(batch: pa.Table) -> pa.Table:
        out = []
        for rec in batch.to_pylist():
            t = read_chain(json.loads(rec["chain"]), columns=read_cols, part=int(rec["part"]))
            if t is not None and t.num_rows > 0:
                t = t.filter(pa.compute.is_valid(t["repo"]))
                if repo_set is not None:
                    t = repo_prune(t)
                elif columns is not None:
                    t = t.select([c for c in columns if c in t.column_names])
                if t.num_rows:
                    out.append(t)
        if not out:
            return pa.table({c: pa.array([], pa.string()) for c in (columns or ["repo", "path"])})
        return _unify_concat(out)

    if not items:
        return rd.from_arrow(pa.table({c: pa.array([], pa.string()) for c in (columns or ["repo", "path"])}))
    return rd.from_items(items, override_num_blocks=max(1, len(items))).map_batches(
        resolve_part, batch_format="pyarrow", batch_size=1
    )


def _layout_of(log: CommitLog) -> tuple[int, dict[str, int]]:
    """(num_buckets, salt map) from the commit log's layout fence —
    the read-side source of truth for bucket routing (refuses on a
    pre-fence lake, where routing is unknown)."""
    layout = log.layout
    if not layout or not layout.get("num_buckets"):
        raise ValueError(
            f"lake at {log.root} has no recorded layout; keyed reads "
            "need the bucket routing the lake was written under"
        )
    return int(layout["num_buckets"]), dict(layout.get("salt") or {})


def lake_lookup(
    cfg_or_root,
    repo: str,
    path: str | None = None,
    columns: list[str] | None = None,
    as_of_epoch: int | None = None,
) -> pa.Table:
    """Pruned point / keyed read: the committed lake rows for one
    ``(repo, path)`` key or one whole ``repo``, touching ONLY the
    bucket chain(s) that can hold it (``buckets_for_key`` — the
    read-side inverse of the writer's routing). O(1 bucket) work for a
    point key and O(salt) buckets for a salted monorepo, on a lake of
    any size — the Iceberg/Hudi "partition pruning" answer to the
    reference's per-key JDBC SELECT (LoadJpatBatchesTasklet.java:91's
    row-at-a-time lookup), done over the layout fence instead of an
    index table.

    Time-travel composes: ``as_of_epoch`` prunes the same way over the
    historical chain horizon. Returns a (small) driver-side table —
    point results are O(key's rows); for bulk keyed scans use
    ``lake_dataset(repos=[...])``."""
    log = CommitLog.open(_root_of(cfg_or_root))
    num_buckets, salt = _layout_of(log)
    from ..functions.hashing import buckets_for_key

    cands = buckets_for_key(repo, path, num_buckets, salt)
    chains = _chains_payload(log, upto_epoch=_as_of_upto(log, as_of_epoch))
    need = None if columns is None else sorted({*columns, "repo", "path"})
    parts = []
    for p in cands:
        chain = chains.get(p)
        if not chain:
            continue
        t = read_chain(chain, columns=need, part=p, key_filter=(repo, path))
        if t is None or t.num_rows == 0:
            continue
        mask = pc.equal(t["repo"], repo)
        if path is not None:
            mask = pc.and_(mask, pc.equal(t["path"], path))
        t = t.filter(mask)
        if t.num_rows:
            parts.append(t)
    if not parts:
        return pa.table({})
    out = _unify_concat(parts)
    if columns is not None:
        out = out.select([c for c in columns if c in out.column_names])
    return out


def key_history(cfg_or_root, repo: str, path: str, columns: list[str] | None = None) -> pa.Table:
    """Version history of ONE ``(repo, path)`` key — every change the
    commit log can still answer, one row per epoch that wrote the key,
    in epoch order: ``(epoch, op, repo, path, *columns)`` with op ∈
    {'I','U','D'} as recorded by the ingest events (the key-level
    audit/debug read every CDC store grows: "who changed this row,
    when, to what").

    How: the key routes to exactly one bucket (``buckets_for_key`` over
    the layout fence); every surviving log entry of that bucket is read
    key-filtered (row-group stats pruning via the same pushdown as
    ``lake_lookup``). A delta entry carries exactly its own epoch's LWW
    winner for the key (direct-mode partial pieces may overlap — those
    carry ``seq`` and resolve by max seq, the engine's own read-time
    rule); a FULL entry (bootstrap / compacted base) carries collapsed
    state with no per-event op, surfacing as 'I' at the base's epoch —
    exactly the horizon time travel can still reconstruct; older
    history is gone by the same retention ``time_travel_floor``
    enforces.

    Scale shape: O(entries of ONE bucket) small pruned reads, driver
    work O(this key's writes) — independent of lake size. Each epoch
    stores only its LWW winner, so intra-epoch overwrites are
    pre-collapsed by the engine's own semantics."""
    import pyarrow.parquet as pq

    from ..functions.hashing import buckets_for_key
    from ..stages.merge import _pqfile, _schema_names

    log = CommitLog.open(_root_of(cfg_or_root))
    num_buckets, salt = _layout_of(log)
    [part] = buckets_for_key(repo, path, num_buckets, salt)
    payload = [c for c in (columns or []) if c not in ("repo", "path", "op")]
    need = {"repo", "path", "op", "seq", *payload}

    by_epoch: dict[int, list[dict]] = {}
    for entry in log.entries_for_part(part):
        rgs = entry.rgs or (-1,) * len(entry.files)
        for f, rg in zip(entry.files, rgs):
            cols = [c for c in _schema_names(f) if c in need]
            if rg is not None and int(rg) >= 0:
                t = _pqfile(f).read_row_group(int(rg), columns=cols)
            else:
                t = pq.read_table(
                    f, columns=cols,
                    filters=[("repo", "=", repo), ("path", "=", path)],
                )
            t = t.filter(pc.and_(pc.equal(t["repo"], repo), pc.equal(t["path"], path)))
            if t.num_rows:
                by_epoch.setdefault(entry.epoch, []).extend(t.to_pylist())

    rows = []
    for epoch in sorted(by_epoch):
        cands = by_epoch[epoch]
        # direct-mode overlapping partials carry seq: max seq is the
        # epoch winner (the engine's read-time rule); collapsed files
        # have no seq and hold exactly one winner row already
        win = max(cands, key=lambda r: (r.get("seq") is not None, r.get("seq") or 0))
        rows.append({
            "epoch": int(epoch),
            "op": win.get("op") or "I",
            "repo": repo,
            "path": path,
            **{c: win.get(c) for c in payload},
        })
    fields = ["epoch", "op", "repo", "path", *payload]
    if not rows:
        return pa.table({
            "epoch": pa.array([], pa.int64()), "op": pa.array([], pa.string()),
            "repo": pa.array([], pa.string()), "path": pa.array([], pa.string()),
            **{c: pa.array([], pa.string()) for c in payload},
        })
    return pa.Table.from_pylist(rows).select(fields)


def lake_table(cfg_or_root, as_of_epoch: int | None = None) -> pa.Table:
    """Driver-side full lake state (schema-unified, chain-resolved),
    current or AS OF a past sealed epoch. Small scales / tests only —
    the distributed path is ``lake_dataset``."""
    log = CommitLog.open(_root_of(cfg_or_root))
    chains = _chains_payload(log, upto_epoch=_as_of_upto(log, as_of_epoch))
    parts = []
    for p, chain in sorted(chains.items()):
        t = read_chain(chain, part=int(p))
        if t is not None and t.num_rows > 0:
            t = t.filter(pa.compute.is_valid(t["repo"]))
            if t.num_rows:
                parts.append(t)
    tbl = _unify_concat(parts) if parts else None
    return tbl if tbl is not None else pa.table({})


def _payload_schema(log: CommitLog, upto_epoch: int | None) -> dict[str, pa.DataType]:
    """The lake's unified logical payload schema at ``upto_epoch``, from
    surviving entries' parquet FOOTERS only (O(files) metadata reads —
    the same discipline as ``lake_schema_history``). Engine-internal
    columns are elided; types that widened mid-stream unify via
    ``_safe_widen`` (newest wins when no lossless widening exists,
    matching what chain resolution itself produces)."""
    import pyarrow.parquet as pq

    out: dict[str, pa.DataType] = {}
    for entry in sorted(log.all_entries(), key=lambda e: (e.epoch, e.part)):
        if upto_epoch is not None and entry.epoch > upto_epoch:
            continue
        for f in entry.files:
            schema = pq.read_schema(f)
            for name, typ in zip(schema.names, schema.types):
                if name in ("bucket", "op", "seq", "ts", "epoch"):
                    continue
                prev = out.get(name)
                if prev is None or prev.equals(typ):
                    out[name] = typ
                else:
                    out[name] = _safe_widen(prev, typ) or typ
    return out


def lake_changelog(
    cfg_or_root,
    from_epoch: int,
    to_epoch: int | None = None,
    image_cols: list[str] | str | None = None,
):
    """CDC feed OUT of the lake: the per-key changes between two sealed
    states, as a streaming Dataset of ``(repo, path, change,
    content_sha256)`` with change ∈ {'I','U','D'} ('U' = key present in
    both states with differing content sha; 'D' rows carry the OLD
    sha). The downstream-consumer side of the engine's own ingest
    surface (Debezium-style outbound feed / incremental-view input).

    ``image_cols``: lake payload columns to carry as before/after
    images — each requested column ``c`` is emitted as ``{c}_old``
    (null on 'I') and ``{c}_new`` (null on 'D'), the input an
    incremental view maintainer (``stages.ivm``) needs to apply signed
    deltas without re-reading either state. Request only the columns
    the view consumes: images ride the feed, so an unpruned request
    ships the whole payload twice. ``"all"`` expands to the lake's
    full payload schema (footer-derived) — the full-fidelity feed a
    lake-to-lake replica (``replicate_feed``) consumes. Columns absent
    from one side of the diff (mid-stream schema evolution) surface as
    typed nulls, so a feed spanning an evolution stays one schema per
    segment.

    Scale shape: both states' chains share the SAME bucket layout, so
    the diff is one task per partition over its own two chains — no
    shuffle, no driver materialization; pandas outer-merge per bucket.
    Subject to the same retention-floor refusal as time travel
    (``_as_of_upto``)."""
    import ray.data as rd

    log = CommitLog.open(_root_of(cfg_or_root))
    upto_to = _as_of_upto(log, to_epoch)
    upto_from = _as_of_upto(log, from_epoch)
    if upto_to is None or upto_from > upto_to:
        raise ValueError(
            f"from_epoch={from_epoch} must be <= to_epoch "
            f"({upto_to}): an inverted changelog would feed a consumer "
            "reversed I/D semantics"
        )
    old = _chains_payload(log, upto_epoch=upto_from)
    new = _chains_payload(log, upto_epoch=upto_to)
    parts = sorted(set(old) | set(new))
    items = [
        {
            "part": p,
            "old": json.dumps(old.get(p, [])),
            "new": json.dumps(new.get(p, [])),
        }
        for p in parts
    ]
    if image_cols == "all":
        image_cols = sorted(_payload_schema(log, upto_to))
    images = [c for c in (image_cols or []) if c not in ("repo", "path")]
    cols = ["repo", "path", "content_sha256"] + [
        c for c in images if c != "content_sha256"
    ]
    # image types resolved driver-side from footers (metadata-only):
    # a bucket whose state predates an evolved column null-fills it at
    # this exact type, so every diff block shares one schema
    img_types: dict[str, pa.DataType] = {}
    if images:
        sch = _payload_schema(log, upto_to)
        img_types = {c: sch.get(c, pa.string()) for c in images}

    def diff_part(batch: pa.Table) -> pa.Table:
        import pandas as pd

        out = []
        for rec in batch.to_pylist():
            part = int(rec["part"])

            def state(chain_json: str) -> "pd.DataFrame":
                t = read_chain(json.loads(chain_json), columns=cols, part=part)
                if t is None or t.num_rows == 0:
                    return pd.DataFrame(columns=cols)
                t = t.filter(pa.compute.is_valid(t["repo"]))
                for c in cols:
                    if c not in t.column_names:
                        t = t.append_column(
                            c, pa.nulls(t.num_rows, img_types.get(c, pa.string()))
                        )
                return t.select(cols).to_pandas()

            a, b = state(rec["old"]), state(rec["new"])
            m = a.merge(
                b, on=["repo", "path"], how="outer", suffixes=("_old", "_new"),
                indicator=True,
            )
            ins = m["_merge"] == "right_only"
            del_ = m["_merge"] == "left_only"
            changed = m["content_sha256_old"] != m["content_sha256_new"]
            # sha covers `content` only — a payload/image column can
            # change under an unchanged content (e.g. a mid-stream
            # added column landing its first value). A feed that
            # carries images must surface those as 'U' too, or image
            # consumers (IVM views, replicas) silently miss the change.
            for c in images:
                a, b = m[f"{c}_old"], m[f"{c}_new"]
                changed |= (a != b) & ~(a.isna() & b.isna())
            upd = (m["_merge"] == "both") & changed
            frames = []
            for mask, tag, sha_col in (
                (ins, "I", "content_sha256_new"),
                (upd, "U", "content_sha256_new"),
                (del_, "D", "content_sha256_old"),
            ):
                sel = m[mask]
                if len(sel):
                    f = pd.DataFrame({
                        "repo": sel["repo"],
                        "path": sel["path"],
                        "change": tag,
                        "content_sha256": sel[sha_col],
                    })
                    for c in images:
                        # outer-merge already nulled the absent side
                        # (old on 'I', new on 'D'); pass both through
                        f[f"{c}_old"] = sel[f"{c}_old"].to_numpy()
                        f[f"{c}_new"] = sel[f"{c}_new"].to_numpy()
                    frames.append(f)
            if frames:
                t = pa.Table.from_pandas(
                    pd.concat(frames, ignore_index=True), preserve_index=False
                )
                if images:
                    # pandas' outer merge floats nulled numeric images
                    # (missing side AND genuine lake nulls both become
                    # NaN); restore null-ness BEFORE casting back to
                    # the lake's own types — a bare safe=False cast
                    # would turn NaN into garbage ints. (Caveat: a
                    # genuine NaN float payload is indistinguishable
                    # from null after pandas and surfaces as null.)
                    for c in images:
                        typ = img_types[c]
                        for side in (f"{c}_old", f"{c}_new"):
                            i = t.column_names.index(side)
                            col = t[side]
                            if pa.types.is_floating(col.type):
                                col = pc.if_else(
                                    pc.is_nan(col),
                                    pa.scalar(None, col.type),
                                    col,
                                )
                            t = t.set_column(
                                i, side, pc.cast(col, typ, safe=False)
                            )
                out.append(t)
        if not out:
            empty: dict[str, pa.Array] = {
                "repo": pa.array([], pa.string()),
                "path": pa.array([], pa.string()),
                "change": pa.array([], pa.string()),
                "content_sha256": pa.array([], pa.string()),
            }
            for c in images:
                typ = img_types[c]
                empty[f"{c}_old"] = pa.array([], typ)
                empty[f"{c}_new"] = pa.array([], typ)
            return pa.table(empty)
        return pa.concat_tables(out)

    return rd.from_items(items, override_num_blocks=max(1, len(items))).map_batches(
        diff_part, batch_format="pyarrow", batch_size=1
    )


def export_changelog(
    cfg_or_root,
    out_dir: str,
    image_cols: list[str] | str | None = None,
) -> dict:
    """Durable, exactly-once spool of the outbound CDC feed for
    NON-Ray consumers (the Debezium-outbox completion of the engine's
    own ``lake_changelog``): each call exports the changes between the
    consumer cursor and the lake's sealed head as a parquet segment
    directory ``<out_dir>/feed/epochs=<from>-<to>/`` (bootstrap:
    ``epochs=0-snapshot-<to>``, which sorts FIRST) with a ``_SEALED``
    marker, then atomically advances ``<out_dir>/_CURSOR``. Folding all
    sealed segments in plain name order reproduces the lake state.

    First call bootstraps Debezium-style: the FULL current state spools
    as one ``'I'`` snapshot segment (a consumer needs a base to apply
    deltas to). Later calls spool only the per-key diff between sealed
    states — work O(changed buckets' chains), never a rescan of
    unchanged history.

    Exactly-once under crash/retry, mirroring the lake's own publish
    discipline: segments are derived deterministically from SEALED
    inputs, an unsealed leftover directory is rebuilt in place, and the
    cursor only moves after the ``_SEALED`` marker lands. The SEALED
    segment names are the AUTHORITATIVE cursor — ``_CURSOR`` is a cache
    that can lag exactly one crash behind (crash between ``_SEALED``
    and the cursor rename), so every call first recovers the cursor to
    the highest sealed to-epoch; without that, a retry after the lake
    head advanced would export an OVERLAPPING segment (or a second
    bootstrap snapshot) whose name-order fold resurrects
    deleted/reverted keys. A consumer that reads only sealed segments
    in name order therefore sees each change exactly once. Writes are
    distributed (``Dataset.write_parquet``); nothing data-scale lands
    on the driver."""
    import shutil as _shutil

    root = _root_of(cfg_or_root)
    log = CommitLog.open(root)
    head = log.latest_sealed_epoch()
    os.makedirs(os.path.join(out_dir, "feed"), exist_ok=True)
    cursor_path = os.path.join(out_dir, "_CURSOR")
    cur = None
    if os.path.exists(cursor_path):
        with open(cursor_path) as fh:
            cur = int(fh.read().strip())
    sealed_cur = _sealed_to_epoch(out_dir)
    if sealed_cur is not None and (cur is None or sealed_cur > cur):
        # crashed between _SEALED and the cursor rename: the sealed
        # segment is durable and consumers may already have applied it
        # — heal the cursor file and export FROM it, never over it
        cur = sealed_cur
        tmp = cursor_path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{cur}\n")
        os.replace(tmp, cursor_path)
    if head is None or (cur is not None and head <= cur):
        return {"skipped": True, "cursor": cur, "head": head}

    if cur is None:
        # "0-snapshot": the '-' byte sorts below every digit, so the
        # bootstrap segment is FIRST in name order regardless of later
        # delta names — dumb consumers can fold the feed with a plain
        # lexicographic walk (snapshot, then deltas, in apply order)
        seg = os.path.join(out_dir, "feed", f"epochs=0-snapshot-{head:05d}")
        feed = _snapshot_feed(log, root, head, image_cols)
    else:
        seg = os.path.join(out_dir, "feed", f"epochs={cur:05d}-{head:05d}")
        feed = lake_changelog(
            root, from_epoch=cur, to_epoch=head, image_cols=image_cols
        )
    _shutil.rmtree(seg, ignore_errors=True)  # crashed unsealed attempt
    feed.write_parquet(seg)
    with open(os.path.join(seg, "_SEALED"), "w") as fh:
        fh.write("ok\n")
    tmp = cursor_path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"{head}\n")
    os.replace(tmp, cursor_path)
    return {
        "skipped": False,
        "segment": seg,
        "from_epoch": cur,
        "to_epoch": head,
        "snapshot": cur is None,
    }


def _snapshot_feed(log: CommitLog, root: str, head: int, image_cols):
    """The full current state as an 'I'-changes feed Dataset — the
    bootstrap/compaction snapshot body shared by ``export_changelog``
    and ``compact_feed``."""
    sch = _payload_schema(log, head)
    if image_cols == "all":
        image_cols = sorted(sch)
    images = [c for c in (image_cols or []) if c not in ("repo", "path")]
    cols = ["repo", "path", "content_sha256"] + [
        c for c in images if c != "content_sha256"
    ]
    img_types = {c: sch.get(c, pa.string()) for c in images}

    def as_inserts(t: pa.Table) -> pa.Table:
        out: dict[str, object] = {
            "repo": t["repo"],
            "path": t["path"],
            "change": pa.repeat(pa.scalar("I"), t.num_rows),
            "content_sha256": t["content_sha256"],
        }
        for c in images:
            typ = img_types[c]
            col = (
                pc.cast(t[c], typ, safe=False)
                if c in t.column_names
                else pa.nulls(t.num_rows, typ)
            )
            out[f"{c}_old"] = pa.nulls(t.num_rows, typ)
            out[f"{c}_new"] = col
        return pa.table(out)

    return lake_dataset(root, columns=cols, as_of_epoch=head).map_batches(
        as_inserts, batch_format="pyarrow"
    )


def compact_feed(
    cfg_or_root,
    out_dir: str,
    image_cols: list[str] | str = "all",
    stop_before_delete: bool = False,
) -> dict:
    """Kafka-style log compaction for the export spool: replace EVERY
    sealed segment with ONE fresh snapshot of the source lake at its
    sealed head. Without this a long-lived feed grows O(total changes
    ever) and a new consumer must fold the whole history; after
    compaction a bootstrap is one snapshot read.

    Crash-safe protocol (each step idempotent, fold correct at every
    crash point):

    1. write + seal the new snapshot ``epochs=0-snapshot-<head>``
       (skipped if already sealed — a retry);
    2. advance ``_CURSOR`` to head (later ``export_changelog`` calls
       diff from head);
    3. delete every other sealed segment.

    A crash between 2 and 3 leaves old segments beside the new
    snapshot; that fold is STILL correct — replica epochs follow name
    order, snapshot names sort before delta names, and every delta
    re-applies at a LATER epoch than the snapshot, so per-key LWW
    resolves each key to its true head state (tested). Consumers that
    already applied deleted segments are unaffected (their cursor is
    their own commit log); consumers mid-history see the new snapshot
    as an unknown sealed segment and ``replicate_feed`` applies it
    with REPLACE semantics (tombstones for replica keys absent from
    the snapshot), so partially-caught-up replicas converge too.
    ``stop_before_delete``: chaos hook for the crash window."""
    import shutil as _shutil

    root = _root_of(cfg_or_root)
    log = CommitLog.open(root)
    head = log.latest_sealed_epoch()
    if head is None:
        return {"skipped": True, "reason": "nothing sealed"}
    os.makedirs(os.path.join(out_dir, "feed"), exist_ok=True)
    seg = os.path.join(out_dir, "feed", f"epochs=0-snapshot-{head:05d}")
    name = os.path.basename(seg)
    existing = [os.path.basename(s) for s in _feed_segments(out_dir)]
    if existing == [name]:
        return {"skipped": True, "reason": "already compacted", "segment": seg}
    if name not in existing:  # retry after a crash-post-seal skips the build
        _shutil.rmtree(seg, ignore_errors=True)  # crashed unsealed attempt
        _snapshot_feed(log, root, head, image_cols).write_parquet(seg)
        with open(os.path.join(seg, "_SEALED"), "w") as fh:
            fh.write("ok\n")
    cursor_path = os.path.join(out_dir, "_CURSOR")
    tmp = cursor_path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"{head}\n")
    os.replace(tmp, cursor_path)
    if stop_before_delete:
        return {"skipped": False, "segment": seg, "deleted": 0, "head": head}
    deleted = 0
    for s in _feed_segments(out_dir):
        if os.path.basename(s) != name:
            _shutil.rmtree(s, ignore_errors=True)
            deleted += 1
    return {"skipped": False, "segment": seg, "deleted": deleted, "head": head}


def _sealed_to_epoch(out_dir: str) -> int | None:
    """Highest to-epoch among SEALED segments (segment names embed it
    as the final ``-``-separated field, for both ``epochs=A-B`` and
    ``epochs=0-snapshot-B``) — the authoritative consumer cursor."""
    best = None
    for seg in _feed_segments(out_dir):
        to = int(os.path.basename(seg).rsplit("-", 1)[1])
        best = to if best is None else max(best, to)
    return best


def _feed_segments(out_dir: str) -> list[str]:
    """SEALED segments of an ``export_changelog`` spool in apply order.
    Name order IS apply order by construction (the snapshot's ``-``
    byte sorts below every digit; delta names embed their monotone
    from-epoch), so a plain sorted listdir is the whole protocol."""
    feed = os.path.join(out_dir, "feed")
    if not os.path.isdir(feed):
        return []
    return sorted(
        os.path.join(feed, d)
        for d in os.listdir(feed)
        if d.startswith("epochs=")
        and os.path.exists(os.path.join(feed, d, "_SEALED"))
    )


def _feed_to_events(t: pa.Table) -> pa.Table:
    """One feed row -> one binlog event: ``change`` D stays a delete,
    I/U become upserts; ``*_new`` image columns carry the payload under
    their own names (``*_old`` and ``change`` are consumer-diagnostic
    only). ``seq`` is constant 0 — a changelog segment is a keyed diff
    between two sealed states, so each key appears at most once and
    epoch order alone decides the winner."""
    out: dict[str, object] = {
        "repo": t["repo"],
        "path": t["path"],
        "op": pc.if_else(
            pc.equal(t["change"], "D"), pa.scalar("D"), pa.scalar("U")
        ),
        "seq": pa.repeat(pa.scalar(0, pa.int64()), t.num_rows),
        "content_sha256": t["content_sha256"],
    }
    for c in t.column_names:
        if c.endswith("_new") and c[:-4] not in out:
            out[c[:-4]] = t[c]
    return pa.table(out)


def _apply_snapshot_replace(
    files: list[str],
    epoch: int,
    replica_cfg: ReplayConfig,
    log: CommitLog,
    writers: list,
) -> dict:
    """Apply a snapshot segment onto a NON-EMPTY replica with REPLACE
    semantics: the snapshot's images upsert every key it carries, and
    replica keys ABSENT from the snapshot get tombstones — they were
    deleted in history a compacted spool (``compact_feed``) no longer
    carries, so insert-only application would resurrect them. The
    tombstone derivation is a keys-only distributed outer join (repo,
    path — two narrow columns of each side; payload never rides the
    shuffle); the union then flows through the normal epoch engine."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.joins import hash_join

    sch = pq.read_schema(files[0])
    payload = [n[:-4] for n in sch.names if n.endswith("_new")]
    ptypes = {n[:-4]: sch.field(n).type for n in sch.names if n.endswith("_new")}

    ev = rd.read_parquet(files).map_batches(
        _feed_to_events, batch_format="pyarrow"
    )
    feed_keys = rd.read_parquet(files, columns=["repo", "path"]).map_batches(
        lambda t: t.append_column(
            "__in_feed", pa.array(np.ones(t.num_rows, np.int64))
        ),
        batch_format="pyarrow",
    )
    replica_keys = lake_dataset(
        replica_cfg.lake_root, columns=["repo", "path"]
    )
    joined = hash_join(
        replica_keys, feed_keys, on=["repo", "path"], how="outer",
        num_buckets=replica_cfg.num_buckets,
    )

    def as_deletes(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["__in_feed"]))
        out: dict[str, object] = {
            "repo": t["repo"],
            "path": t["path"],
            "op": pa.repeat(pa.scalar("D"), t.num_rows),
            "seq": pa.repeat(pa.scalar(0, pa.int64()), t.num_rows),
            "content_sha256": pa.nulls(t.num_rows, pa.string()),
        }
        for c in payload:
            if c not in out:
                out[c] = pa.nulls(t.num_rows, ptypes[c])
        return pa.table(out)

    ds = ev.union(joined.map_batches(as_deletes, batch_format="pyarrow"))
    return run_epoch(ds, epoch, replica_cfg, log=log, writers=writers)


def replicate_feed(
    out_dir: str,
    replica_cfg: ReplayConfig,
    max_segments: int | None = None,
) -> dict:
    """Apply an ``export_changelog`` spool into a REPLICA lake through
    the normal replay engine — the consumer half of the CDC loop (the
    reference system's downstream is a human report; a lake-to-lake
    replica is what a 100 TB deployment actually runs). Each sealed
    segment becomes one replica epoch, assigned durably in
    ``feed_map.json`` BEFORE the epoch seals (replica-side maintenance
    epochs — compact/vacuum — interleave freely, so the assignment is
    next-free-epoch at apply time, not list position);
    ``run_epoch``'s idempotence makes the replica's own commit log the
    consumer cursor, so crash/retry re-applies nothing and a
    partially-applied segment completes under the (epoch, part)
    fence. Replication is exactly-once end to end with NO coordination
    between producer and consumer beyond the segment ``_SEALED``
    markers.

    The replica is an independent lake: its own bucket count/salting,
    its own compaction/vacuum schedule, full read surface (lookups,
    time travel at segment granularity, its own changelog/export —
    feeds can be chained). Requires the feed to have been exported with
    ``image_cols`` covering the payload columns the replica should
    carry (``content_sha256`` always flows; a sha-only feed replicates
    a sha-only lake).

    Erasure (right-to-be-forgotten) does NOT propagate through the
    feed: ``erase_key`` rewrites surviving history without advancing
    the sealed head, so a later diff sees the key in neither state and
    emits nothing. A compliant deployment erases at every hop —
    ``erase_key`` on the source, ``erase_key_from_feed`` on each spool,
    ``erase_key`` on each replica (each is O(key's buckets/segments),
    never O(lake); see tests/test_replication.py).

    ``max_segments`` bounds one call (chaos tests / incremental
    draining); returns per-segment metrics and the replica head."""
    from glob import glob as _glob

    import ray.data as rd

    log = CommitLog.open(replica_cfg.lake_root)
    log.ensure_layout(replica_cfg.layout())
    writers = make_writer_pool(
        replica_cfg.lake_root, replica_cfg.writer_concurrency
    )
    segs = _feed_segments(out_dir)
    applied: list[dict] = []
    # the persisted feed map is the AUTHORITATIVE segment -> replica
    # epoch assignment (not the segment's list position): replica-side
    # maintenance epochs (compact) interleave with feed epochs, so a
    # positional mapping would collide with a sealed maintenance epoch
    # and silently skip a segment. The map is written BEFORE the epoch
    # seals (durable intent): a crash between the two re-runs the
    # recorded epoch idempotently on restart.
    map_path = os.path.join(replica_cfg.lake_root, "feed_map.json")
    feed_map: dict[str, int] = {}
    if os.path.exists(map_path):
        with open(map_path) as fh:
            raw = json.load(fh)
        if any(isinstance(v, dict) for v in raw.values()):
            # legacy (pre-authoritative) format: epoch-str -> {segment}
            feed_map = {
                v["segment"]: int(k) for k, v in raw.items()
                if isinstance(v, dict)
            }
        else:
            feed_map = {k: int(v) for k, v in raw.items()}

    def _publish_map() -> None:
        # durable intent, matching the commit log's discipline: the
        # reservation must survive the same crash the seal survives
        tmp = map_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(feed_map, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, map_path)

    for seg in segs:
        name = os.path.basename(seg)
        if name in feed_map and log.is_sealed(int(feed_map[name])):
            continue  # applied in a previous call
        if max_segments is not None and len(applied) >= max_segments:
            break
        if name in feed_map:
            # crash between map publish and seal: finish this epoch
            epoch = int(feed_map[name])
        else:
            taken = [log.latest_sealed_epoch(), *map(int, feed_map.values())]
            live = [e for e in taken if e is not None]
            epoch = 1 + max(live) if live else 0
            feed_map[name] = epoch
            _publish_map()
        files = sorted(_glob(os.path.join(seg, "*.parquet")))
        if not files:  # an all-quiet delta window: seal the empty epoch
            _commit_manifest_rows(log, epoch, [], None, seal=True)
            m = {"epoch": epoch, "skipped": False, "parts_committed": 0}
        elif "snapshot" in name and log.latest_sealed_epoch() is not None:
            # a snapshot landing on a NON-EMPTY replica is a compacted
            # spool's re-baseline (compact_feed): REPLACE semantics —
            # insert-only application would resurrect keys whose
            # deletes the compaction folded away
            m = _apply_snapshot_replace(files, epoch, replica_cfg, log, writers)
        elif replica_cfg.merge_strategy == "direct":
            # fused read -> feed-to-events -> normalize -> direct
            # partial-delta write: no shuffle, no object-store hop —
            # the same fast path the flagship replay uses. seq is a
            # constant 0 per segment (each key appears once), so the
            # single-epoch seq_range (0, 1) maps every row to this
            # segment's epoch.
            m = _run_epoch_batch(
                [(epoch, {"file": seg, "seq_range": (0, 1)})],
                replica_cfg, log, writers, prep_fn=_feed_to_events,
            )[0]
        else:
            ds = rd.read_parquet(files).map_batches(
                _feed_to_events, batch_format="pyarrow"
            )
            m = run_epoch(ds, epoch, replica_cfg, log=log, writers=writers)
        m["segment"] = name
        applied.append(m)
    return {
        "applied": applied,
        "segments_seen": len(segs),
        "replica_head": log.latest_sealed_epoch(),
    }


def follow_feed(
    out_dir: str,
    replica_cfg: ReplayConfig,
    poll_sec: float = 1.0,
    idle_polls: int = 5,
    on_batch=None,
) -> list[dict]:
    """Continuous replica: poll the export spool for newly SEALED
    segments and apply each batch as it lands (the consumer mirror of
    ``follow_stream`` — a producer running ``--follow --export-feed``
    plus a consumer running ``follow_feed`` is live lake-to-lake
    replication with no shared state). Stops when ``<out_dir>/_EOS``
    appears and the feed is drained, or after ``idle_polls`` empty
    polls. ``on_batch(replica_cfg)`` fires after each applied batch
    (advance a view on the REPLICA, chain another export); exceptions
    propagate — the replica commits are already durable."""
    out: list[dict] = []
    idle = 0
    while True:
        res = replicate_feed(out_dir, replica_cfg)
        if res["applied"]:
            idle = 0
            out.extend(res["applied"])
            if on_batch is not None:
                on_batch(replica_cfg)
        else:
            idle += 1
        if os.path.exists(os.path.join(out_dir, "_EOS")):
            drain = replicate_feed(out_dir, replica_cfg)
            if not drain["applied"]:
                break
            out.extend(drain["applied"])
            if on_batch is not None:
                on_batch(replica_cfg)
        elif idle >= idle_polls:
            break
        time.sleep(poll_sec)
    return out


def lake_schema_history(cfg_or_root) -> pa.Table:
    """Schema evolution audit: for every sealed epoch that introduced a
    column, one row ``(epoch, column, dtype)`` — read from the commit
    log's surviving entries' parquet FOOTERS only (O(files) metadata
    reads, no data). The first epoch lists the base schema; later rows
    are the additive/widened columns the evolving stream brought in.
    Engine-internal columns (``bucket``, ``op``, ``seq``) are elided —
    they are the merge machinery, not the table's logical schema.
    History truncated by compaction collapses into the base's epoch,
    like every other still-answerable read."""
    import pyarrow.parquet as pq

    log = CommitLog.open(_root_of(cfg_or_root))
    head = log.latest_sealed_epoch()
    seen: dict[str, tuple[int, str]] = {}
    if head is None:  # nothing sealed: no visible schema yet
        return pa.table({
            "epoch": pa.array([], pa.int64()),
            "column": pa.array([], pa.string()),
            "dtype": pa.array([], pa.string()),
        })
    for entry in sorted(log.all_entries(), key=lambda e: (e.epoch, e.part)):
        if entry.epoch > head:
            continue
        for f in entry.files:
            schema = pq.read_schema(f)
            for name, typ in zip(schema.names, schema.types):
                if name in ("bucket", "op", "seq"):
                    continue
                if name not in seen:
                    seen[name] = (entry.epoch, str(typ))
    rows = sorted(seen.items(), key=lambda kv: (kv[1][0], kv[0]))
    return pa.table({
        "epoch": pa.array([e for _, (e, _) in rows], pa.int64()),
        "column": pa.array([c for c, _ in rows], pa.string()),
        "dtype": pa.array([t for _, (_, t) in rows], pa.string()),
    })


def lake_state_hash(cfg_or_root) -> str:
    """Global order-insensitive sha256 of (repo, path -> content_sha256)
    — the kill/restart convergence invariant."""
    tbl = lake_table(cfg_or_root)
    if tbl.num_rows == 0:
        return table_state_sha256(pa.table({}), ("repo", "path"), "content_sha256")
    return table_state_sha256(tbl, ("repo", "path"), "content_sha256")
