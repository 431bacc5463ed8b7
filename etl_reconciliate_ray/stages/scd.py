"""Slowly-changing-dimension (SCD Type 2) builds and Markov transition
counts over a change stream — the two classic "history" derivations a
CDC pipeline materializes from its changelog.

The reference reconciler only compares final states (ReconciliationService.java:129-210);
SCD2 is the standard warehouse extension of the same changelog: instead
of keeping the last version per key (LWW, stages/lww.py), keep EVERY
distinct version with its validity interval [valid_from, valid_to).

Scale shape: both operators are one key-hash shuffle (all rows of one
key land in one bucket — the same invariant the lake layout already
enforces), then vectorized per-bucket pandas. Per-key work is the key's
own history, the bound any engine has. Transition counts additionally
pre-aggregate per bucket so only (src, dst, partial_n) rows — bounded
by the event-type-alphabet squared, not the data — leave the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# pandas cannot express "NULL == NULL is true" with plain eq(); both
# operators need it for SQL IS NOT DISTINCT FROM semantics.


def _null_safe_eq(a: pd.Series, b: pd.Series) -> pd.Series:
    return (a == b) | (a.isna() & b.isna())


def scd2_intervals(
    df: pd.DataFrame,
    key: str,
    attr: str,
    order: list[str],
) -> pd.DataFrame:
    """One bucket's SCD2 build: collapse consecutive equal ``attr``
    values per ``key`` (ordered by ``order``), then emit one row per
    surviving version with [valid_from, valid_to) and a 1-based
    version ordinal. valid_from/valid_to are the first ``order``
    column; valid_to of the live version is NULL and is_current=1.

    NULL semantics match SQL: NULL keys form one partition (PARTITION
    BY groups NULLs together) and consecutive NULL attrs collapse
    (IS DISTINCT FROM, not <>).
    """
    if df.empty:
        return pd.DataFrame({
            key: pd.array([], dtype="Int64"),
            attr: pd.array([], dtype="object"),
            "valid_from": pd.array([], dtype="datetime64[us]"),
            "valid_to": pd.array([], dtype="datetime64[us]"),
            "version": pd.array([], dtype="int64"),
            "is_current": pd.array([], dtype="int64"),
        })
    d = df.sort_values([key] + order, kind="stable").reset_index(drop=True)
    # factorize: every NaN key gets code -1 → one shared NULL partition
    codes = pd.factorize(d[key], use_na_sentinel=True)[0]
    same_key = pd.Series(codes).eq(pd.Series(codes).shift())
    same_attr = _null_safe_eq(d[attr], d[attr].shift())
    keep = (~same_key | ~same_attr).to_numpy()
    c = d[keep].reset_index(drop=True)
    ckey = pd.Series(pd.factorize(c[key], use_na_sentinel=True)[0])
    grp = c.groupby(ckey.values, sort=False)
    tcol = order[0]
    valid_to = grp[tcol].shift(-1)
    return pd.DataFrame({
        key: c[key],
        attr: c[attr],
        "valid_from": c[tcol],
        "valid_to": valid_to,
        "version": (grp.cumcount() + 1).astype("int64"),
        "is_current": valid_to.isna().astype("int64"),
    })


def transition_partial_counts(
    df: pd.DataFrame,
    key: str,
    attr: str,
    order: list[str],
    null_token: str = "\x00N",
) -> pd.DataFrame:
    """One bucket's partial Markov-edge counts: for each key ordered by
    ``order``, count (previous attr → attr) pairs; the first row of a
    key has no predecessor and SQL's LAG-IS-NOT-NULL filter drops it
    ONLY when the predecessor is genuinely absent — a NULL attr that
    exists as a row still forms edges, encoded as ``null_token`` so the
    downstream Ray groupby never sees a null key (un-encoded by the
    caller after the global sum). The token carries a trailing
    non-NUL byte: pandas fillna routes through a numpy unicode buffer
    that TRUNCATES trailing NULs, so a bare "\\x00" comes back ''."""
    if df.empty:
        return pd.DataFrame({"src": [], "dst": [], "n": pd.array([], dtype="int64")})
    d = df.sort_values([key] + order, kind="stable").reset_index(drop=True)
    codes = pd.Series(pd.factorize(d[key], use_na_sentinel=True)[0])
    same_key = codes.eq(codes.shift()).to_numpy()
    src = d[attr].shift()[same_key]
    dst = d[attr][same_key]
    pairs = pd.DataFrame({
        "src": src.fillna(null_token).to_numpy(),
        "dst": dst.fillna(null_token).to_numpy(),
    })
    out = pairs.groupby(["src", "dst"], sort=False).size().reset_index(name="n")
    out["n"] = out["n"].astype("int64")
    return out


def fk_orphan_count(ds, on: str, keys: np.ndarray) -> int:
    """Count rows of ``ds`` whose ``on`` value is absent from the
    broadcast key set (NULL FK counts as an orphan, matching NOT
    EXISTS over an equality predicate). Map-side partial counts; only
    one int per batch leaves the task — the audit shape that stays
    O(1) per block at any scale. For big-big FK pairs swap the
    broadcast set for the bloom prefilter (stages/joins.bloom_semi)."""
    import pyarrow.compute as pc
    import ray

    ref = ray.put(pa.array(keys))

    def count_orphans(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        hit = pc.is_in(t[on], value_set=vs)
        # NULL FK: is_in yields null → fill false → counted as orphan
        ok = pc.fill_null(hit, False)
        n = t.num_rows - pc.sum(pc.cast(ok, pa.int64())).as_py()
        return pa.table({"orphans": pa.array([n], pa.int64())})

    part = ds.map_batches(count_orphans, batch_format="pyarrow")
    return int(part.sum("orphans") or 0)
