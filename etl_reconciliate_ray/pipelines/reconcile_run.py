"""Reconciliation phase: replayed lake <-> reference snapshot, plus the
group-level rollup and the exact per-status count report.

Mirrors the reference's two output tables
(``dto/ReconciliationResultDTO.java:6-13``: ``transactionResults``
detail + ``batchResults`` rollup) and the A3 rollup priority cascade
(``service/ReconciliationService.java:194-201``):

    reference cascade                  ->  this engine (per repo)
    batches.isEmpty()   -> "ERROR"         no snapshot rows -> "ERROR"
    size() > 1          -> "LOTE           any DUP_RIGHT_* ordinal rows
                            DUPLICADO          -> "DUP_IN_RIGHT"
                            JPAT"
    any trx status != OK-> "TRANSACCIONES  any MISSING_*/VALUE_DIFF rows
                            CON ERROR"         -> "ROWS_WITH_ERRORS"
    amounts differ      -> "DIFERENCIA     (folds into VALUE_DIFF rows —
                            EN VALOR"       sha-equality makes the group
                                            aggregate check redundant)
    else                -> "OK"            else -> "OK"

The cascade ORDER is preserved bit-for-bit because the discrepancy
class counts depend on it (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.reconcile import (
    STATUS_DUP_PREFIX,
    STATUS_MATCHED,
    reconcile_datasets,
)
from .replay import lake_dataset

ROLLUP_ERROR = "ERROR"
ROLLUP_DUP = "DUP_IN_RIGHT"
ROLLUP_ROWS_WITH_ERRORS = "ROWS_WITH_ERRORS"
ROLLUP_OK = "OK"


def rollup_group(g: pd.DataFrame) -> pd.DataFrame:
    """A3 cascade for one partition-key group (reference priority order,
    ``ReconciliationService.java:194-201``)."""
    statuses = g["status"]
    has_right = statuses.ne("MISSING_RIGHT").any()
    if not has_right:
        status = ROLLUP_ERROR
    elif statuses.str.startswith(STATUS_DUP_PREFIX).any():
        status = ROLLUP_DUP
    elif statuses.ne(STATUS_MATCHED).any():
        status = ROLLUP_ROWS_WITH_ERRORS
    else:
        status = ROLLUP_OK
    key = g.iloc[0][g.columns[0]]
    return pd.DataFrame(
        {
            g.columns[0]: [key],
            "n_rows": [len(g)],
            "n_matched": [int(statuses.eq(STATUS_MATCHED).sum())],
            "rollup_status": [status],
        }
    )


def status_counts(detail_ds) -> pd.DataFrame:
    """Exact per-status counts WITHOUT shuffling the wide detail rows:
    each batch collapses to a tiny (status, n) table map-side, and only
    those few rows go through the final groupby — the full-detail
    ``groupby(status).count()`` would sort-shuffle every row."""
    part = detail_ds.map_batches(
        lambda df: df["status"].value_counts().rename_axis("status").reset_index(name="n"),
        batch_format="pandas",
    )
    out = part.groupby("status").sum("n").to_pandas()
    out = out.rename(columns={"sum(n)": "n"}).sort_values("status").reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


def _spool_bucketed(ds, spool_dir: str, columns: list[str]) -> dict[int, list[tuple[str, int]]]:
    """Spool a (already bucket-tagged) Dataset to disk partitioned by
    bucket: one file per input block, one row group per bucket slice —
    the direct-write layout, so cogroup tasks later read exactly their
    bucket's row groups with no shuffle. Returns part -> [(file, rg)]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(spool_dir, exist_ok=True)

    def spool(batch: pa.Table) -> pa.Table:
        import hashlib
        import time as _time

        if batch.num_rows == 0:
            return pa.table({})
        t = batch.select([c for c in columns + ["bucket"] if c in batch.column_names])
        t = t.sort_by([("bucket", "ascending")])
        gb = t["bucket"].to_numpy(zero_copy_only=False).astype("int64")
        import numpy as np

        cuts = np.flatnonzero(np.diff(gb)) + 1
        starts = np.concatenate([[0], cuts]).astype(np.int64)
        ends = np.concatenate([cuts, [len(gb)]]).astype(np.int64)
        name = hashlib.sha256(f"{os.getpid()}-{_time.monotonic_ns()}".encode()).hexdigest()[:16]
        fname = os.path.join(spool_dir, f"snap-{name}.parquet")
        rows = []
        with pq.ParquetWriter(fname + ".tmp", t.schema) as w:
            for rg, (s, e) in enumerate(zip(starts, ends)):
                sl = t.slice(int(s), int(e - s))
                # one row group per bucket slice, even past 1Mi rows —
                # rg ordinals below index into exactly these writes
                w.write_table(sl, row_group_size=max(1, sl.num_rows))
                rows.append({"part": int(gb[s]), "file": fname, "rg": rg})
        os.replace(fname + ".tmp", fname)
        return pa.Table.from_pylist(rows)

    rows = ds.map_batches(spool, batch_format="pyarrow", batch_size=None).take_all()
    out: dict[int, list[tuple[str, int]]] = {}
    for r in rows:
        out.setdefault(int(r["part"]), []).append((r["file"], int(r["rg"])))
    return out


def _make_cogroup_fn(spill: str, cols: list[str]):
    """Per-bucket reconcile task body shared by the full and the
    incremental phases: read the bucket's lake chain + spooled snapshot
    row groups, reconcile vectorized, spill the wide detail rows
    task-side (deterministic per-part file name — a retry or an
    incremental recompute overwrites its own output idempotently), and
    return only tiny (part, repo, status, n) partial-count rows."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..stages.merge import _pqfile, read_chain
    from ..stages.reconcile import reconcile_pair_pdf

    def cogroup_part(batch: pa.Table) -> pd.DataFrame:
        out = []
        for rec in batch.to_pylist():
            part = int(rec["part"])
            lake_t = read_chain(_json.loads(rec["chain"]), columns=cols, part=part)
            left = lake_t.to_pandas() if lake_t is not None else pd.DataFrame(columns=cols)
            snaps = [
                _pqfile(f).read_row_group(rg, columns=cols).to_pandas()
                for f, rg in _json.loads(rec["snap"])
            ]
            right = pd.concat(snaps, ignore_index=True) if snaps else pd.DataFrame(columns=cols)
            fname = os.path.join(spill, f"detail-part{part:05d}.parquet")
            if len(left) == 0 and len(right) == 0:
                # a recomputed part may have become empty: drop its
                # stale detail spill instead of leaving ghost rows
                if os.path.exists(fname):
                    os.remove(fname)
                continue
            det = reconcile_pair_pdf(
                left, right, ["repo", "path"], "content_sha256", attr_cols=["commit"]
            )
            pq.write_table(pa.Table.from_pandas(det, preserve_index=False), fname + ".tmp")
            os.replace(fname + ".tmp", fname)
            # dropna=False: a null-repo detail row (supported — bucket_of
            # routes nulls via a sentinel, reconcile_pair_pdf groups with
            # dropna=False) must COUNT too, or counts silently diverge
            # from the detail spill
            p = (det.groupby(["repo", "status"], sort=False, dropna=False)
                 .size().rename("n").reset_index())
            p.insert(0, "part", part)
            out.append(p)
        if not out:
            return pd.DataFrame(columns=["part", "repo", "status", "n"])
        return pd.concat(out, ignore_index=True)

    return cogroup_part


def reconcile_lake_vs_snapshot(
    lake_root: str,
    snapshot_ds,
    num_buckets: int = 32,
    salt_for_repo: dict[str, int] | None = None,
):
    """Full reconciliation phase. Returns (detail_ds, rollup_ds,
    counts_df); rollup re-aggregates across salted sub-buckets by
    grouping on ``repo`` (SURVEY.md §4 'rollups re-aggregated across
    salts'); counts are the exact per-status report (north rule:
    'matching its match/discrepancy report counts exactly').

    Shuffle-free bucket cogroup: the lake side is ALREADY partitioned
    by bucket on disk (the commit-log chains), so only the snapshot is
    spooled once into the same bucketed layout (an O(n) partitioned
    write, not an all-to-all sort); then one task per bucket reads both
    sides directly and reconciles vectorized."""
    import json as _json
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from ..state.commitlog import CommitLog
    from .replay import _chains_payload

    cols = ["repo", "path", "commit", "content_sha256"]
    spool_dir = os.path.join(lake_root, "_snapshot_spool")
    shutil.rmtree(spool_dir, ignore_errors=True)

    retag = _make_retag(num_buckets, salt_for_repo)

    # layout fence FIRST — before any O(snapshot) work: the snapshot
    # MUST be bucketed exactly as the lake was written (same bucket
    # count, salt map, hash impl) or keys land on different sides of
    # the cogroup and every one reads as a missing/extra pair — a
    # silent total mis-reconcile. The fingerprint is the SHARED
    # definition (state.commitlog.layout_fingerprint), so writer and
    # reader can never drift apart.
    from ..state.commitlog import layout_fingerprint

    log = CommitLog.open(lake_root)
    log.check_layout(layout_fingerprint(num_buckets, salt_for_repo))

    snap_map = _spool_bucketed(
        snapshot_ds.map_batches(retag, batch_format="pyarrow"), spool_dir, cols
    )

    chains = _chains_payload(log, upto_epoch=log.latest_sealed_epoch())
    parts = sorted(set(chains) | set(snap_map))
    items = [
        {
            "part": p,
            "chain": _json.dumps(chains.get(p, [])),
            "snap": _json.dumps(snap_map.get(p, [])),
        }
        for p in parts
    ]

    # Task-side detail spill (same trick as replay's direct_write /
    # task-side compaction): each cogroup task reconciles its bucket AND
    # writes the wide detail rows straight to partitioned parquet —
    # detail bytes never enter the object store and never shuffle. Only
    # a tiny (repo, status, n) partial-count table leaves each task;
    # rollup + exact status counts are derived from those partials, so
    # the detail is written ONCE and re-read ZERO times in this call.
    # File names are deterministic per bucket (tmp + atomic rename), so
    # a retried task overwrites its own output idempotently.
    spill = os.path.join(lake_root, "_reconcile_detail")
    shutil.rmtree(spill, ignore_errors=True)
    os.makedirs(spill, exist_ok=True)

    cogroup_part = _make_cogroup_fn(spill, cols)

    partials = (
        rd.from_items(items, override_num_blocks=max(1, len(items)))
        .map_batches(cogroup_part, batch_format="pyarrow", batch_size=1)
        .materialize()  # tiny: O(repos x statuses) rows — both consumers
        # below read it without re-running the reconcile
    )
    rollup = rollup_from_partials(partials, "repo")
    pc_df = partials.to_pandas()
    counts = (
        pc_df.groupby("status", sort=True)["n"].sum().astype("int64").reset_index()
        if len(pc_df)
        else pd.DataFrame({"status": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")})
    )
    import glob as _glob

    if _glob.glob(os.path.join(spill, "*.parquet")):
        detail = rd.read_parquet(spill)
    else:  # empty reconcile: keep the typed empty dataset contract
        detail = _empty_detail_ds()
    return detail, rollup, counts


def _make_retag(num_buckets: int, salt_for_repo: dict[str, int] | None):
    """ONE definition of the snapshot re-bucketing transform for the
    full and incremental reconcile paths — this is the bucketing
    contract ('must match the lake or every key reads as a
    missing/extra pair'); two copies could silently desynchronize."""
    from ..functions.hashing import bucket_of

    def retag(batch: pa.Table) -> pa.Table:
        # never trust an incoming bucket column
        if "bucket" in batch.column_names:
            batch = batch.drop_columns(["bucket"])
        return batch.append_column(
            "bucket", bucket_of(batch["repo"], batch["path"], num_buckets, salt_for_repo)
        )

    return retag


def _empty_detail_ds():
    """Typed empty detail dataset (the reconcile output contract when
    nothing spilled) — one definition for both reconcile paths."""
    import ray.data as rd

    empty = pd.DataFrame(
        columns=["repo", "path", "content_sha256_l", "commit_l",
                 "content_sha256_r", "commit_r", "status"]
    ).astype(str)
    return rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))


def _cascade_fn(key: str):
    """Vectorized A3 cascade over reduced per-key counters (shared by
    the detail-scan and partial-count rollup paths)."""

    def cascade(df: pd.DataFrame) -> pd.DataFrame:
        status = np.where(
            df["n_right"] == 0, ROLLUP_ERROR,
            np.where(
                df["n_dup"] > 0, ROLLUP_DUP,
                np.where(df["n_matched"] < df["n_rows"], ROLLUP_ROWS_WITH_ERRORS, ROLLUP_OK),
            ),
        )
        return pd.DataFrame(
            {
                key: df[key],
                "n_rows": df["n_rows"].astype("int64"),
                "n_matched": df["n_matched"].astype("int64"),
                "rollup_status": status,
            }
        )

    return cascade


def rollup_from_partials(partials_ds, key: str):
    """A3 cascade rollup from (key, status, n) partial-count rows (the
    task-side spill path): the cascade's any()/all() terms are all sums
    of per-status counts, so only O(keys x statuses) tiny rows are
    aggregated — the wide detail never moves."""
    from ray.data.aggregate import Sum

    from ..stages.reconcile import STATUS_DUP_PREFIX, STATUS_MATCHED

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        s = df["status"]
        n = df["n"].astype("int64")
        return pd.DataFrame(
            {
                key: df[key],
                "n_rows": n,
                "n_matched": n.where(s.eq(STATUS_MATCHED), 0),
                "n_dup": n.where(s.str.startswith(STATUS_DUP_PREFIX), 0),
                "n_right": n.where(s.ne("MISSING_RIGHT"), 0),
            }
        )

    red = partials_ds.map_batches(widen, batch_format="pandas").groupby(key).aggregate(
        Sum(on="n_rows", alias_name="n_rows"),
        Sum(on="n_matched", alias_name="n_matched"),
        Sum(on="n_dup", alias_name="n_dup"),
        Sum(on="n_right", alias_name="n_right"),
    )
    return red.map_batches(_cascade_fn(key), batch_format="pandas")


def rollup_by_key(detail_ds, key: str):
    """A3 cascade rollup per key, decomposed into map-side partial
    counters + a tiny final groupby (the cascade's any()/all() terms
    are all sums, so the wide detail rows never shuffle). Cascade
    order preserved bit-for-bit (ReconciliationService.java:194-201)."""
    from ray.data.aggregate import Sum

    from ..stages.reconcile import STATUS_DUP_PREFIX, STATUS_MATCHED

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        s = df["status"]
        # dropna=False: null-key detail rows must roll up too (see
        # _make_cogroup_fn's partial counts)
        agg = pd.DataFrame(
            {
                "n_rows": s.groupby(df[key], dropna=False).size(),
                "n_matched": s.eq(STATUS_MATCHED).groupby(df[key], dropna=False).sum(),
                "n_dup": s.str.startswith(STATUS_DUP_PREFIX).groupby(df[key], dropna=False).sum(),
                "n_right": s.ne("MISSING_RIGHT").groupby(df[key], dropna=False).sum(),
            }
        )
        return agg.rename_axis(key).reset_index()

    red = detail_ds.map_batches(partials, batch_format="pandas").groupby(key).aggregate(
        Sum(on="n_rows", alias_name="n_rows"),
        Sum(on="n_matched", alias_name="n_matched"),
        Sum(on="n_dup", alias_name="n_dup"),
        Sum(on="n_right", alias_name="n_right"),
    )
    return red.map_batches(_cascade_fn(key), batch_format="pandas")


def reconcile_incremental(
    lake_root: str,
    snapshot_ds,
    num_buckets: int = 32,
    salt_for_repo: dict[str, int] | None = None,
    snapshot_token: str | None = None,
):
    """Delta-aware reconciliation: recompute ONLY the buckets whose
    merge-on-read chains changed since the previous call; every clean
    bucket's detail spill and partial counts are reused verbatim.

    The CDC shape this serves: the lake advances by a few epochs
    between reconcile runs, each epoch touching a subset of buckets —
    a full reconcile re-reads O(lake + snapshot) every run, this one
    reads O(changed buckets). State lives in
    ``<lake>/_reconcile_state``: the bucketed snapshot spool (built
    once, reused while ``snapshot_token`` matches) and, per part, the
    chain fingerprint + its (repo, status, n) partial counts. Crash
    safety: state.json is republished atomically AFTER the recomputed
    parts' detail files — a crash in between just re-marks those parts
    dirty on the next call (the per-part file overwrite is idempotent).

    ``snapshot_token``: any caller-chosen string identifying the
    snapshot's content/version (path + mtime, a manifest sha, ...). A
    mismatch with the stored token invalidates the spool AND all parts.
    With ``None`` the caller asserts the snapshot is unchanged.

    Returns ``(detail_ds, rollup_ds, counts_df, metrics)`` — the first
    three exactly as ``reconcile_lake_vs_snapshot`` would produce for
    the same lake + snapshot; ``metrics`` reports the reuse:
    ``{"parts_total", "parts_recomputed", "snapshot_respooled"}``."""
    import glob as _glob
    import hashlib
    import json as _json
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from ..state.commitlog import CommitLog, layout_fingerprint
    from .replay import _chains_payload

    cols = ["repo", "path", "commit", "content_sha256"]
    state_dir = os.path.join(lake_root, "_reconcile_state")
    spool_dir = os.path.join(state_dir, "snap_spool")
    spill = os.path.join(state_dir, "detail")
    state_path = os.path.join(state_dir, "state.json")
    os.makedirs(state_dir, exist_ok=True)

    log = CommitLog.open(lake_root)
    log.check_layout(layout_fingerprint(num_buckets, salt_for_repo))

    state = {"snapshot_token": None, "snap_map": {}, "parts": {}}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state = _json.load(fh)

    respool = (
        not os.path.isdir(spool_dir)
        # snapshot_token=None means "caller asserts the snapshot is
        # unchanged" (docstring): skip the comparison rather than treat
        # None as a mismatch against the stored token — that forced a
        # full respool + all-parts recompute on every tokenless call,
        # silently negating the incremental path
        or (snapshot_token is not None
            and state.get("snapshot_token") != snapshot_token)
        or not state.get("snap_map")
    )
    def publish_state() -> None:
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(state, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, state_path)

    if respool:
        retag = _make_retag(num_buckets, salt_for_repo)

        # invalidate BEFORE destroying the spool/spill: a crash between
        # the rmtree and the new state publish must re-mark everything
        # dirty on the next call — never serve the old token's counts
        # over a deleted detail spill
        if os.path.exists(state_path):
            os.remove(state_path)
        shutil.rmtree(spool_dir, ignore_errors=True)
        shutil.rmtree(spill, ignore_errors=True)
        snap_map = _spool_bucketed(
            snapshot_ds.map_batches(retag, batch_format="pyarrow"), spool_dir, cols
        )
        state = {
            "snapshot_token": snapshot_token,
            "snap_map": {str(p): rgs for p, rgs in snap_map.items()},
            "parts": {},  # snapshot changed -> everything is dirty
        }
        publish_state()
    snap_map = {int(p): [tuple(x) for x in rgs] for p, rgs in state["snap_map"].items()}

    chains = _chains_payload(log, upto_epoch=log.latest_sealed_epoch())
    parts = sorted(set(chains) | set(snap_map))
    os.makedirs(spill, exist_ok=True)

    def fp_of(part: int) -> str:
        payload = _json.dumps(
            {"chain": chains.get(part, []), "snap": snap_map.get(part, [])},
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()

    fps = {p: fp_of(p) for p in parts}  # once: reused by scan AND store
    dirty = [
        p for p in parts if state["parts"].get(str(p), {}).get("fp") != fps[p]
    ]
    if dirty:
        items = [
            {
                "part": p,
                "chain": _json.dumps(chains.get(p, [])),
                "snap": _json.dumps(snap_map.get(p, [])),
            }
            for p in dirty
        ]
        fresh = (
            rd.from_items(items, override_num_blocks=max(1, len(items)))
            .map_batches(_make_cogroup_fn(spill, cols), batch_format="pyarrow", batch_size=1)
            .to_pandas()  # aggregate-sized: O(dirty parts x repos x statuses)
        )
        by_part = {p: [] for p in dirty}
        for _, r in fresh.iterrows():
            by_part[int(r["part"])].append([r["repo"], r["status"], int(r["n"])])
        for p in dirty:
            state["parts"][str(p)] = {"fp": fps[p], "partials": by_part[p]}
    # Drop state AND the detail spill files of parts that vanished from
    # the lake+snapshot universe — otherwise read_parquet(spill) would
    # re-surface ghost detail rows for them. Runs unconditionally (a
    # part can vanish without any surviving part turning dirty).
    live = set(parts)
    ghosts = [k for k in state["parts"] if int(k) not in live]
    for k in ghosts:
        del state["parts"][k]
        ghost_file = os.path.join(spill, f"detail-part{int(k):05d}.parquet")
        if os.path.exists(ghost_file):
            os.remove(ghost_file)
    if dirty or ghosts:
        publish_state()

    rows = [
        {"part": int(p), "repo": r, "status": s, "n": int(n)}
        for p, rec in state["parts"].items()
        for r, s, n in rec["partials"]
    ]
    pc_df = pd.DataFrame(rows, columns=["part", "repo", "status", "n"])
    partials = rd.from_pandas(pc_df) if len(pc_df) else rd.from_items([])
    if len(pc_df):
        rollup = rollup_from_partials(partials, "repo")
        counts = (
            pc_df.groupby("status", sort=True)["n"].sum().astype("int64").reset_index()
        )
    else:
        # typed empty matching the full path's rollup schema — a
        # schema-less from_items([]) broke callers selecting columns
        rollup = rd.from_arrow(pa.table({
            "repo": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "n_matched": pa.array([], pa.int64()),
            "rollup_status": pa.array([], pa.string()),
        }))
        counts = pd.DataFrame(
            {"status": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")}
        )
    if _glob.glob(os.path.join(spill, "*.parquet")):
        detail = rd.read_parquet(spill)
    else:
        detail = _empty_detail_ds()
    metrics = {
        "parts_total": len(parts),
        "parts_recomputed": len(dirty),
        "snapshot_respooled": bool(respool),
    }
    return detail, rollup, counts, metrics
