"""Ordered-step funnel conversion and cohort-retention matrices —
the two canonical behavioral aggregates over an event stream.

Both are within-key computations: bucket by user hash once, compute
exact per-bucket partials (each user's whole history is local), then
global-sum a result bounded by steps / days², not by the data. That is
the only shape that survives 10^10 events: nothing data-sized crosses
the shuffle after the first key-hash exchange.

NULL policy: rows with NULL user_id (or NULL ts for cohorts) are
excluded up front — the SQL formulations join on user_id, and an
equality join drops NULLs while GROUP BY would keep them; filtering
both sides identically is the only consistent contract.
"""

from __future__ import annotations

import pandas as pd


def funnel_partial(
    df: pd.DataFrame,
    steps: list[str],
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
) -> pd.DataFrame:
    """One bucket's funnel counts: a user reaches step i+1 if they have
    an event of that type at-or-after their step-i reach time (the
    standard min-time cascade; re-ordering within equal timestamps is
    allowed by the >= contract). Returns one (step, n_users) row per
    step — the partial a global per-step sum combines."""
    d = df[df[key].notna()]
    thresh: pd.Series | None = None
    counts: list[int] = []
    for step in steps:
        e = d[d[attr] == step]
        if thresh is not None:
            t0 = e[key].map(thresh)
            e = e[e[ts] >= t0]
        thresh = e.groupby(key)[ts].min()
        counts.append(len(thresh))
    return pd.DataFrame({
        "step": [f"{i + 1}:{s}" for i, s in enumerate(steps)],
        "n_users": pd.array(counts, dtype="int64"),
    })


def cohort_partial(
    df: pd.DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> pd.DataFrame:
    """One bucket's cohort-retention partials: cohort = calendar day of
    the user's first event; one distinct (user, active day) pair per
    cell. Output (cohort_day, days_since, n_users) is bounded by the
    span in days squared, whatever the row count."""
    d = df[df[key].notna() & df[ts].notna()]
    if d.empty:
        return pd.DataFrame({
            "cohort_day": pd.array([], dtype="datetime64[us]"),
            "days_since": pd.array([], dtype="int64"),
            "n_users": pd.array([], dtype="int64"),
        })
    day = d[ts].dt.normalize()
    first = day.groupby(d[key]).transform("min")
    cells = pd.DataFrame({
        "u": d[key],
        "cohort_day": first,
        "days_since": (day - first).dt.days.astype("int64"),
    }).drop_duplicates()
    out = (
        cells.groupby(["cohort_day", "days_since"], as_index=False)
        .size()
        .rename(columns={"size": "n_users"})
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out
