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

from ..functions.hashing import table_state_sha256
from ..stages.merge import make_merge_fn, read_prev_state, _unify_concat
from ..stages.normalize import make_normalizer
from ..stages.writer import make_writer_pool
from ..state.commitlog import CommitLog, PartEntry


@dataclass
class ReplayConfig:
    lake_root: str
    num_buckets: int = 32
    salt_for_repo: dict[str, int] = field(default_factory=dict)
    writer_concurrency: int = 4
    normalize_batch_size: int = 8192
    # split each epoch's parquet into this many read blocks so the
    # normalize/hash stage parallelizes across the whole pool (a single
    # one-row-group file would otherwise read as 1-3 blocks and
    # serialize the pipeline); None = Ray's automatic choice
    read_parallelism: int | None = None


def _commit_manifest_rows(
    log: CommitLog, epoch: int, rows: list[dict], input_seq: tuple[int, int] | None
) -> int:
    """Driver-side commit: fold per-piece manifest rows into per-part
    entries, append under the (epoch, part) fence, seal the epoch."""
    import hashlib

    by_part: dict[int, list[dict]] = {}
    for r in rows:
        by_part.setdefault(int(r["part"]), []).append(r)
    committed = 0
    for part, pieces in sorted(by_part.items()):
        pieces.sort(key=lambda r: r["file"])
        combined = hashlib.sha256("".join(p["state_sha256"] for p in pieces).encode()).hexdigest()
        entry = PartEntry(
            epoch=epoch,
            part=part,
            files=tuple(p["file"] for p in pieces),
            rows=sum(int(p["rows"]) for p in pieces),
            state_sha256=combined,
            input_seq=input_seq,
        )
        if log.commit_part(entry):
            committed += 1
    log.seal_epoch(epoch)
    return committed


def run_epoch(
    events_ds,
    epoch: int,
    cfg: ReplayConfig,
    log: CommitLog | None = None,
    input_seq: tuple[int, int] | None = None,
    writers: list | None = None,
) -> dict:
    """Apply one epoch (a ``ray.data.Dataset`` of binlog events) to the
    lake. Idempotent: a sealed epoch is skipped; a partially-committed
    epoch re-runs its uncommitted partitions only (writer-side fence).

    ``writers``: the persistent LakeWriterActor pool; created here if
    not passed (``replay()`` creates it once for all epochs)."""
    log = log or CommitLog.open(cfg.lake_root)
    t0 = time.monotonic()
    if log.is_sealed(epoch):
        return {"epoch": epoch, "skipped": True, "parts_committed": 0, "sec": 0.0}

    import ray

    if writers is None:
        writers = make_writer_pool(cfg.lake_root, cfg.writer_concurrency)

    prev_manifest = {
        part: list(entry.files) for part, entry in log.current_manifest(upto_epoch=epoch - 1).items()
    }
    manifest_ref = ray.put(prev_manifest)

    normalized = events_ds.map_batches(
        make_normalizer(cfg.num_buckets, cfg.salt_for_repo),
        batch_format="pyarrow",
        batch_size=cfg.normalize_batch_size,
    )
    manifest_rows_ds = normalized.groupby("bucket").map_groups(
        make_merge_fn(manifest_ref, writers=writers, epoch=epoch), batch_format="pyarrow"
    )
    rows = manifest_rows_ds.take_all()  # tiny: one row per touched partition piece
    committed = _commit_manifest_rows(log, epoch, [dict(r) for r in rows], input_seq)
    sec = time.monotonic() - t0
    metrics = {
        "epoch": epoch,
        "skipped": False,
        "parts_committed": committed,
        "pieces": len(rows),
        "rows_written": sum(int(r["rows"]) for r in rows),
        "sec": round(sec, 4),
    }
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


def bootstrap(
    lake_seed_path: str,
    cfg: ReplayConfig,
    log: CommitLog | None = None,
    writers: list | None = None,
) -> dict:
    """Epoch 0 = initial lake load, expressed as all-insert events with
    ``seq=-1`` so it flows through the exact same replay path."""
    import ray.data as rd
    import pyarrow.compute as pc  # noqa: F401

    kwargs = {"override_num_blocks": cfg.read_parallelism} if cfg.read_parallelism else {}
    ds = rd.read_parquet(lake_seed_path, **kwargs)

    def as_insert(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return batch.append_column("seq", pa.array([-1] * n, pa.int64())).append_column(
            "op", pa.array(["I"] * n, pa.string())
        )

    ds = ds.map_batches(as_insert, batch_format="pyarrow", batch_size=cfg.normalize_batch_size)
    return run_epoch(ds, 0, cfg, log=log, input_seq=(-1, -1), writers=writers)


def replay(
    fixture_dir: str,
    cfg: ReplayConfig,
    stop_after_epoch: int | None = None,
) -> list[dict]:
    """Full (resumable) replay of a datagen fixture: bootstrap + all
    binlog epochs. ``stop_after_epoch`` simulates a mid-stream kill for
    the chaos tests; calling again resumes from the commit log."""
    import ray.data as rd

    with open(os.path.join(fixture_dir, "fixture.json")) as fh:
        fixture = json.load(fh)
    log = CommitLog.open(cfg.lake_root)
    writers = make_writer_pool(cfg.lake_root, cfg.writer_concurrency)
    out = [bootstrap(os.path.join(fixture_dir, "lake_seed.parquet"), cfg, log=log, writers=writers)]
    kwargs = {"override_num_blocks": cfg.read_parallelism} if cfg.read_parallelism else {}
    for ep in fixture["epochs"]:
        engine_epoch = ep["epoch"] + 1  # epoch 0 is the bootstrap
        if stop_after_epoch is not None and engine_epoch > stop_after_epoch:
            break
        ds = rd.read_parquet(ep["file"], **kwargs)
        out.append(
            run_epoch(ds, engine_epoch, cfg, log=log, input_seq=tuple(ep["seq_range"]), writers=writers)
        )
    return out


def lake_dataset(cfg_or_root, columns: list[str] | None = None):
    """Current committed lake state as a streaming ``ray.data.Dataset``.

    Pass ``columns`` to prune at the read; restrict to pre-evolution
    columns when files span a schema change (Ray unifies blocks lazily,
    but a pruned uniform projection is both safer and cheaper)."""
    import ray.data as rd

    root = cfg_or_root.lake_root if isinstance(cfg_or_root, ReplayConfig) else cfg_or_root
    files = CommitLog.open(root).lake_files()
    files = [f for f in files if os.path.getsize(f) > 0]
    return rd.read_parquet(files, columns=columns)


def lake_table(cfg_or_root) -> pa.Table:
    """Driver-side full lake state (schema-unified). Small scales /
    tests only — the distributed path is ``lake_dataset``."""
    root = cfg_or_root.lake_root if isinstance(cfg_or_root, ReplayConfig) else cfg_or_root
    files = CommitLog.open(root).lake_files()
    tbl = read_prev_state(files)
    return tbl if tbl is not None else pa.table({})


def lake_state_hash(cfg_or_root) -> str:
    """Global order-insensitive sha256 of (repo, path -> content_sha256)
    — the kill/restart convergence invariant."""
    tbl = lake_table(cfg_or_root)
    if tbl.num_rows == 0:
        return table_state_sha256(pa.table({}), ("repo", "path"), "content_sha256")
    return table_state_sha256(tbl, ("repo", "path"), "content_sha256")
