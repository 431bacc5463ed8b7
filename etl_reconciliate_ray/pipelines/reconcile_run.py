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

import pandas as pd

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


def reconcile_lake_vs_snapshot(
    lake_root: str,
    snapshot_ds,
    num_buckets: int = 32,
    salt_for_repo: dict[str, int] | None = None,
):
    """Full reconciliation phase. Returns (detail_ds, rollup_ds,
    counts_df) — detail is streaming; rollup re-aggregates across salted
    sub-buckets by grouping on ``repo`` (SURVEY.md §4 'rollups
    re-aggregated across salts'); counts are the exact per-status report
    (north rule: 'matching its match/discrepancy report counts
    exactly')."""
    lake = lake_dataset(
        lake_root, columns=["repo", "path", "commit", "content_sha256"]
    )
    detail = reconcile_datasets(
        lake,
        snapshot_ds,
        key_cols=["repo", "path"],
        value_col="content_sha256",
        attr_cols=["commit"],
        num_buckets=num_buckets,
        salt_for_repo=salt_for_repo,
    )
    detail = detail.materialize()  # reused by rollup + counts below
    rollup = detail.groupby("repo").map_groups(rollup_group, batch_format="pandas")
    counts = (
        detail.groupby("status").count().to_pandas().sort_values("status").reset_index(drop=True)
    )
    counts = counts.rename(columns={"count()": "n"})
    return detail, rollup, counts
