"""Debezium-style CDC envelope source: JSONL change events -> binlog.

The reference ingests changes by re-querying JDBC sources
(``LoadJpatBatchesTasklet.java``); real CDC feeds arrive as change
*envelopes* — the public Debezium JSON shape ``{op, ts_ms, before,
after, source}`` with ``op`` in {c(reate), u(pdate), d(elete),
r(ead/snapshot)} and row images under ``before``/``after``. This module
adapts that feed to the engine's binlog schema (``seq, op(I/U/D),
repo, path, <payload cols...>``) so the standard replay path —
commit-log fencing, LWW merge, schema evolution, follow mode — ingests
Debezium-shaped streams unchanged.

Scale shape: conversion is a map-only Arrow stage (``struct_field``
gathers + one dictionary op remap; no per-row Python) run as its own
distributed Dataset per epoch file; the write is ``repartition(1)``
per epoch (an epoch is a producer micro-batch, bounded by contract —
one task, never the driver). Conversion is RESUMABLE: finished epoch
parquets are detected by name and skipped, and outputs publish via
atomic rename, so a killed convert never leaves a half-written epoch
for discovery to trip on.

Additive schema evolution falls out naturally: every field of the
``after`` image is carried to the binlog row, so a field that appears
mid-stream becomes a new column exactly like the parquet path
(``_binlog_scan_schema`` null-fills older epochs).
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow as pa
import pyarrow.compute as pc

# Debezium op -> engine op. 'r' (snapshot read) is an upsert-style
# initial load, same as create for an LWW lake.
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}

# envelope bookkeeping fields that are not row payload
_META_FIELDS = ("op", "ts_ms", "before", "after", "source", "transaction")


def _struct_field(col: pa.ChunkedArray | pa.Array, name: str, n: int):
    """Null-safe struct field get: a JSON-inferred all-null image
    column (e.g. ``before`` in an all-insert epoch) arrives as Arrow
    null type with no fields — return typed nulls instead of crashing."""
    if col is None or pa.types.is_null(col.type) or not pa.types.is_struct(col.type):
        return None
    typ = col.type
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if typ.get_field_index(name) < 0:
        return None
    return pc.struct_field(col, name)


def _image_fields(batch: pa.Table, image: str) -> list[str]:
    if image not in batch.column_names:
        return []
    t = batch.schema.field(image).type
    if not pa.types.is_struct(t):
        return []
    return [t.field(i).name for i in range(t.num_fields)]


def envelope_to_binlog(batch: pa.Table) -> pa.Table:
    """Vectorized envelope -> binlog row conversion (one batch).

    Accepts the flat unwrapped layout (``op/before/after/source`` as
    top-level columns — Debezium's ExtractNewRecordState sits upstream
    in many deployments) or the full envelope nested under ``payload``.
    Key columns (``repo, path``) come from ``after`` for I/U and
    ``before`` for D; every other ``after`` field rides along as a
    payload column (null on deletes, exactly like the parquet binlog).
    ``seq`` comes from ``source.seq`` (or a top-level ``seq``) — the
    feed's total order, required. Unknown ``op`` values refuse loudly:
    a silently dropped change would desync the lake forever."""
    if "payload" in batch.column_names:
        pay = batch["payload"].combine_chunks()
        names = _image_fields(batch, "payload")
        sub = {f: pc.struct_field(pay, f) for f in names}
        batch = pa.table(sub)

    n = batch.num_rows
    op_raw = batch["op"]
    idx = pc.index_in(op_raw, value_set=pa.array(list(_OP_MAP)))
    if n and (idx.null_count > op_raw.null_count or op_raw.null_count):
        bad = pc.unique(op_raw.filter(pc.is_null(idx))).to_pylist()
        raise ValueError(
            f"cdc envelope: unknown op value(s) {bad!r} — expected one of "
            f"{sorted(_OP_MAP)} (refusing to drop changes silently)"
        )
    op = pc.take(pa.array(list(_OP_MAP.values())), idx)
    is_del = pc.equal(op, "D")

    before = batch["before"] if "before" in batch.column_names else None
    after = batch["after"] if "after" in batch.column_names else None

    # seq: the feed's total order. source.seq, else top-level seq.
    seq = None
    if "source" in batch.column_names:
        seq = _struct_field(batch["source"], "seq", n)
    if seq is None and "seq" in batch.column_names:
        seq = batch["seq"]
    if seq is None:
        raise ValueError(
            "cdc envelope: no sequence field (source.seq or seq) — the "
            "engine needs the feed's total order for LWW replay"
        )

    any_del = n > 0 and pc.any(is_del).as_py()

    def keyed(name: str):
        a = _struct_field(after, name, n)
        b = _struct_field(before, name, n)
        if a is None and b is None:
            raise ValueError(f"cdc envelope: key field {name!r} in neither image")
        if b is None and any_del:
            raise ValueError(
                f"cdc envelope: delete rows present but no before.{name} "
                "image — a keyless tombstone cannot be applied"
            )
        if a is None:
            return b
        if b is None:
            return a
        return pc.if_else(is_del, b, a)

    cols: dict[str, object] = {
        "seq": pc.cast(seq, pa.int64()),
        "op": op,
        "repo": keyed("repo"),
        "path": keyed("path"),
    }
    if "ts_ms" in batch.column_names and not pa.types.is_null(
        batch.schema.field("ts_ms").type
    ):
        cols["ts"] = pc.cast(
            pc.cast(batch["ts_ms"], pa.int64()), pa.timestamp("ms")
        )
    # payload: every non-key after field (deletes carry nulls)
    for f in _image_fields(batch, "after"):
        if f in ("repo", "path"):
            continue
        cols[f] = _struct_field(after, f, n)
    return pa.table(cols)


def convert_envelope_dir(env_dir: str, out_dir: str) -> list[str]:
    """Convert every ``*.jsonl`` epoch file under ``env_dir`` into a
    binlog epoch parquet under ``out_dir`` (same ``epoch=NNNNN`` stem),
    ready for ``replay_stream``/``follow`` discovery. Distributed
    (one map-only Dataset per epoch), resumable (existing outputs are
    skipped), atomic (tmp dir + rename publish). Returns the converted
    output paths (skipped ones included, in epoch order)."""
    import shutil

    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    outs: list[str] = []
    files = sorted(glob.glob(os.path.join(env_dir, "*.jsonl")))
    if not files:
        raise ValueError(f"cdc envelope: no *.jsonl epoch files under {env_dir}")
    for f in files:
        stem = re.sub(r"\.jsonl$", "", os.path.basename(f))
        out = os.path.join(out_dir, f"{stem}.parquet")
        outs.append(out)
        if os.path.exists(out):
            continue
        tmp = os.path.join(out_dir, f"_tmp_{stem}")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            rd.read_json(f)
            .map_batches(envelope_to_binlog, batch_format="pyarrow")
            .repartition(1)  # one epoch file = one discovery unit
            .write_parquet(tmp)
        )
        part = sorted(os.listdir(tmp))
        if len(part) != 1:  # repartition(1) contract
            raise RuntimeError(f"expected one part in {tmp}, got {part}")
        os.replace(os.path.join(tmp, part[0]), out)
        shutil.rmtree(tmp, ignore_errors=True)
    return outs


def binlog_epoch_to_envelope_jsonl(epoch_parquet: str, out_path: str) -> int:
    """Inverse adapter for tests/demos: render one binlog epoch parquet
    as a Debezium-style JSONL envelope file (I->c, U->u, D->d; key
    fields under ``before`` for deletes, full row under ``after``
    otherwise, ``seq`` under ``source``). Driver-side and row-wise —
    fixture-scale tooling, not a data-path stage."""
    import json

    import pyarrow.parquet as pq

    t = pq.read_table(epoch_parquet)
    cols = t.column_names
    payload = [c for c in cols if c not in ("seq", "ts", "op")]
    rows = t.to_pylist()
    with open(out_path + ".tmp", "w") as fh:
        for r in rows:
            op = r["op"]
            img = {c: r[c] for c in payload}
            ts = r.get("ts")
            env = {
                "op": {"I": "c", "U": "u", "D": "d"}[op],
                "ts_ms": int(ts.timestamp() * 1000) if ts is not None else None,
                "before": {"repo": r["repo"], "path": r["path"]} if op == "D" else None,
                "after": None if op == "D" else img,
                "source": {"seq": r["seq"]},
            }
            fh.write(json.dumps(env, default=str) + "\n")
    os.replace(out_path + ".tmp", out_path)
    return len(rows)
