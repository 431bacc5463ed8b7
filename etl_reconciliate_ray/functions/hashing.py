"""Vectorized hashing / partitioning primitives.

Covers the graft's F6 scalar function (``sha256(content)``; reference
has no hashing — the north rule's ``input_hint`` replaces the
reference's BigDecimal amount equality at
``service/ReconciliationService.java:151`` with content-sha256
equality) and the explicit hash-partitioning + salted-key splitting
required at 10^10-event scale (SURVEY.md §4).

All functions are deterministic: no wall clock, no process-local seeds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# pandas hash_array uses SipHash-1-3 with this fixed key -> deterministic
# across processes and runs (same library versions).
_HASH_KEY = "etl_rec_ray_0001"  # must be exactly 16 bytes (SipHash key)


def sha256_hex_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 hex digest per element of a string array; null -> null.

    hashlib releases the GIL per call and is C-speed; the Python loop is
    O(rows) with tiny constant vs. the O(bytes) digest work, so this is
    effectively vectorized for document-sized payloads.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out: list[str | None] = [
        None if v is None else hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest()
        for v in col.to_pylist()
    ]
    return pa.array(out, type=pa.string())


def hash64(values: np.ndarray | pa.Array | pa.ChunkedArray | list) -> np.ndarray:
    """Deterministic 64-bit hash of a string column (uint64 ndarray)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = np.asarray(values.to_pylist(), dtype=object)
    else:
        values = np.asarray(values, dtype=object)
    return pd.util.hash_array(values, hash_key=_HASH_KEY, categorize=True)


def bucket_of(
    repo: pa.Array | pa.ChunkedArray,
    path: pa.Array | pa.ChunkedArray,
    num_buckets: int,
    salt_for_repo: dict[str, int] | None = None,
) -> pa.Array:
    """Physical partition id for each row: hash-partition by ``repo``
    with salted-key splitting for skewed monorepos (SURVEY.md §4,
    north_star "explicit hash-partitioning on repo with salted-key
    splitting").

    effective key = (repo, hash64(path) % salt_for_repo.get(repo, 1)).
    The merge key ``(repo, path)`` is strictly finer than the effective
    key, so all rows of one merge key land in one bucket — salting is
    correctness-preserving; rollups re-aggregate across salts.
    """
    repo_np = np.asarray(
        (repo.combine_chunks() if isinstance(repo, pa.ChunkedArray) else repo).to_pylist(),
        dtype=object,
    )
    h_repo = pd.util.hash_array(repo_np, hash_key=_HASH_KEY, categorize=True)
    # NOTE: the formula must depend only on (repo, path, salt config,
    # num_buckets) — never on batch composition — or the same key could
    # land in different buckets on different sides of a cogroup.
    eff = h_repo * np.uint64(1000003)
    if salt_for_repo and any(s > 1 for s in salt_for_repo.values()):
        salts = np.fromiter(
            (salt_for_repo.get(r, 1) for r in repo_np), dtype=np.uint64, count=len(repo_np)
        )
        if (salts > 1).any():
            eff = eff + (hash64(path) % salts)
    return pa.array((eff % np.uint64(num_buckets)).astype(np.int32))


def key_strings(repo: pa.Array | pa.ChunkedArray, path: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Combined merge-key column ``repo\\x00path`` (string) — a single
    comparable/hashable column for joins, is_in membership and sorts."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(repo, path, "\x00")


def table_state_sha256(tbl: pa.Table, key_cols: tuple[str, ...], value_col: str) -> str:
    """Order-insensitive digest of a table's (key -> value-hash) state.

    Used for partition-level lineage hashes and for the kill/restart
    convergence check (north_star: "converges to the identical
    sha256-verified state").

    Vectorized: canonical sort by key, element-wise join of the key and
    value columns with separators (Arrow C kernel), then ONE sha256
    over the combined column's offsets+data buffers — no per-row
    Python. The writer actors call this per partition piece, so it must
    run at memory bandwidth, not interpreter speed.
    """
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return hashlib.sha256(b"EMPTY").hexdigest()
    tbl = tbl.sort_by([(c, "ascending") for c in key_cols])
    cols = [
        pc.fill_null(pc.cast(tbl[c], pa.large_string()), "\x00NULL\x00")
        for c in (*key_cols, value_col)
    ]
    joined = pc.binary_join_element_wise(
        *cols, pa.scalar("\x01", pa.large_string())
    ).combine_chunks()
    h = hashlib.sha256()
    # offsets + data buffers canonically encode the string column
    for buf in joined.buffers():
        if buf is not None:
            h.update(buf)
    return h.hexdigest()
