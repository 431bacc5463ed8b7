"""Model-based fuzz of the transaction coordinator protocol
(state/txn.py) — the state machine WITHOUT the Ray staging leg:
"staging" writes committed-unsealed entries straight into the per-lake
CommitLogs (exactly what run_epoch(seal=False) durably leaves behind),
then random interleavings of prepare / commit-mark / abort / recover /
snapshot / reopen run against a plain-dict model.

Invariants checked after every op:
- in_doubt() == the model's prepared set, in PREPARE order;
- snapshot_epochs() == the cumulative committed cut in decision order;
- recover() seals exactly the committed-but-unsealed participants and
  is idempotent;
- a lake's sealed head only ever advances when a txn holding it
  commits (atomic visibility), and aborted epochs leave no entries;
- everything survives coordinator reopen and write_snapshot.
"""

from __future__ import annotations

import os

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from etl_reconciliate_ray.state.commitlog import CommitLog, PartEntry
from etl_reconciliate_ray.state.txn import TxnCoordinator

LAKES = ("lk0", "lk1", "lk2")

OPS = st.lists(
    st.tuples(
        st.sampled_from(["begin_stage_prepare", "commit_mark", "abort",
                         "recover", "snapshot", "reopen"]),
        st.integers(min_value=0, max_value=2),   # which in-doubt txn / lake subset seed
        st.booleans(),                           # two lakes instead of one?
    ),
    min_size=1,
    max_size=30,
)


def _stage_fake(root: str, epoch: int) -> None:
    """What run_epoch(seal=False) durably leaves: fenced entries, no seal."""
    log = CommitLog.open(root)
    log.ensure_layout({"num_buckets": 2, "salt": {}, "hash_impl": "t"})
    log.commit_parts([PartEntry(
        epoch=epoch, part=0, files=(f"{root}/e{epoch}.parquet",),
        rows=1, state_sha256=f"s{epoch}", kind="delta",
    )])


@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(OPS)
def test_txn_coordinator_matches_model(tmp_path_factory, ops):
    base = tmp_path_factory.mktemp("txnfuzz")
    roots = {n: str(base / n) for n in LAKES}
    co = TxnCoordinator.open(str(base / "co"))

    prepared: list[tuple[str, dict]] = []  # (txn_id, tables) in PREPARE order
    cut: dict[str, dict] = {}              # model of snapshot_epochs
    heads: dict[str, int] = {n: 0 for n in LAKES}  # model sealed head (0 = none)
    busy: set[str] = set()                 # lakes held by an in-doubt txn

    def lake_head(name: str) -> int:
        h = CommitLog.open(roots[name]).latest_sealed_epoch()
        return 0 if h is None else h

    for verb, pick, two in ops:
        if verb == "begin_stage_prepare":
            names = [LAKES[pick]] + ([LAKES[(pick + 1) % 3]] if two else [])
            names = [n for n in dict.fromkeys(names) if n not in busy]
            if not names:
                continue
            txn = co.begin()
            tables = {}
            for n in names:
                epoch = heads[n] + 1
                _stage_fake(roots[n], epoch)
                tables[n] = {"root": roots[n], "epoch": epoch}
            co._record_prepare(txn.txn_id, tables)
            prepared.append((txn.txn_id, tables))
            busy.update(names)
        elif verb == "commit_mark":
            # decide (but crash before seals): recover() must finish it
            if not prepared:
                continue
            txn_id, tables = prepared.pop(pick % len(prepared))
            co._record_decision(txn_id, "COMMIT")
            cut.update({k: dict(v) for k, v in tables.items()})
            for n, spec in tables.items():
                heads[n] = spec["epoch"]  # decided: recover() will seal
                busy.discard(n)
        elif verb == "abort":
            if not prepared:
                continue
            txn_id, tables = prepared.pop(pick % len(prepared))
            co.abort_prepared(txn_id)
            for n, spec in tables.items():
                busy.discard(n)
                # the aborted epoch is gone; earlier decided-but-unsealed
                # epochs (awaiting recover()) may legitimately remain
                assert spec["epoch"] not in CommitLog.open(roots[n]).unsealed_epochs()
        elif verb == "recover":
            rep = co.recover()
            assert sorted(t for t, _ in prepared) == sorted(rep["in_doubt"])
            # all committed participants sealed now, and idempotently so
            assert co.recover()["sealed"] == []
        elif verb == "snapshot":
            co.write_snapshot()
        elif verb == "reopen":
            co = TxnCoordinator.open(co.root)

        # ---- invariants ------------------------------------------------
        assert co.in_doubt() == [t for t, _ in prepared]
        assert co.snapshot_epochs() == cut
        assert co._busy_roots() == {roots[n] for n in busy}
        for n in LAKES:
            # visibility: the lake head never exceeds the decided epoch,
            # and never reflects an undecided stage
            assert lake_head(n) <= heads[n]

    # drain: finish every decision, then every head must match the model
    co.recover()
    for txn_id, tables in list(prepared):
        co.abort_prepared(txn_id)
    for n in LAKES:
        assert lake_head(n) == heads[n]
        assert CommitLog.open(roots[n]).unsealed_epochs() == []
