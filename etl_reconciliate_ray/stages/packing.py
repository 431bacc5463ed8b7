"""Training-set assembly operators: deterministic dataset splits and
sequence packing.

Both are pure map-side transforms (zero shuffle): the properties a
training pipeline needs — every document lands in exactly one
split/bin, assignment is reproducible across runs and parallelism
levels — must come from the DATA (key residues, in-batch order), never
from task-local RNG or row arrival order (SURVEY.md §4 determinism
contract; same principle as datagen's seeded generators).

Packing is the standard LLM pre-training step (greedy first-fit into a
fixed token budget). It packs WITHIN each batch: bins never span
batches, so the operator streams at 100 TB and a bin's membership
depends only on its batch's content. Greedy first-fit wastes at most
one under-full bin per batch — with batch >> budget the overhead is
negligible, and no cross-batch coordination (a distributed bin-packing
shuffle) is ever worth that waste.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def split_assign(
    ids: pa.Array | pa.ChunkedArray, splits: dict[str, int], modulus: int = 100
) -> pa.Array:
    """Deterministic split label per id: ``id % modulus`` falls into
    consecutive ranges sized by ``splits`` (e.g. {"train": 90, "val":
    5, "test": 5}). Key-derived, so the same id lands in the same split
    at any parallelism level and in any engine."""
    if sum(splits.values()) != modulus:
        raise ValueError(f"split sizes {splits} must sum to modulus {modulus}")
    if any(w < 0 for w in splits.values()):
        # a negative width passes the sum check while later ranges
        # silently overwrite earlier labels — refuse
        raise ValueError(f"split sizes must be >= 0, got {splits}")
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if ids.null_count:
        # NaN -> int64 casts to INT64_MIN, whose residue lands the row
        # deterministically in SOME split — a silent data-quality leak
        # into the training set; assignment must come from real ids
        raise ValueError(
            f"split_assign: {ids.null_count} null id(s) — every document "
            "must carry a real id (pre-filter or repair upstream)"
        )
    r = np.mod(
        np.asarray(ids.to_numpy(zero_copy_only=False), dtype=np.int64),
        modulus,
    )
    labels = np.empty(len(r), dtype=object)
    lo = 0
    for name, width in splits.items():
        labels[(r >= lo) & (r < lo + width)] = name
        lo += width
    return pa.array(labels, pa.string())


def pack_batch(
    batch: pa.Table, id_col: str, ntok_col: str, budget: int
) -> pa.Table:
    """Greedy first-fit packing of one batch's documents into bins of
    at most ``budget`` tokens (an over-budget single document gets its
    own bin). Vectorized where it counts (token extraction, output
    assembly); the first-fit scan is a tight O(rows x open-bins) loop
    over ints with the open-bin list capped, never over content.

    Output: one row per bin — ``bin_id`` (the batch-local ordinal),
    ``doc_ids`` (list<int64> in packing order), ``n_docs``,
    ``total_tokens``.
    """
    nulls = batch[id_col].null_count + batch[ntok_col].null_count
    if nulls:
        # a null token count NaN->int64-casts to INT64_MIN, 'fits'
        # every bin and drives totals hugely negative — silent
        # training-set corruption; refuse like split_assign
        raise ValueError(
            f"pack_batch: {nulls} null {id_col}/{ntok_col} value(s) — "
            "token counts and ids must be non-null (pre-filter upstream)"
        )
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = batch[ntok_col].to_numpy(zero_copy_only=False).astype(np.int64)
    bin_used: list[int] = []  # tokens packed per open bin
    bin_docs: list[list[int]] = []
    for doc, t in zip(ids.tolist(), toks.tolist()):
        placed = False
        for j in range(len(bin_used) - 1, max(-1, len(bin_used) - 64), -1):
            # scan newest-first with a bounded window: old bins are
            # almost-full; an unbounded scan would be O(rows x bins)
            if bin_used[j] + t <= budget:
                bin_used[j] += t
                bin_docs[j].append(doc)
                placed = True
                break
        if not placed:  # new bin (an over-budget doc rides alone)
            bin_used.append(int(t))
            bin_docs.append([doc])
    offsets = np.zeros(len(bin_docs) + 1, dtype=np.int32)
    np.cumsum([len(d) for d in bin_docs], out=offsets[1:])
    flat = pa.array([d for ds_ in bin_docs for d in ds_], pa.int64())
    return pa.table({
        "bin_id": pa.array(np.arange(len(bin_docs), dtype=np.int64)),
        "doc_ids": pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat),
        "n_docs": pa.array([len(d) for d in bin_docs], pa.int64()),
        "total_tokens": pa.array(bin_used, pa.int64()),
    })


def pack_documents(ds, id_col: str, ntok_col: str, budget: int):
    """Dataset-level packing: greedy first-fit within each batch (bins
    never span batches — see module docstring for why)."""

    def fn(batch: pa.Table) -> pa.Table:
        # pack_batch yields the correct 4-column schema even for an
        # empty batch — never return a schema-less table (it would break
        # downstream column ops and block unification)
        return pack_batch(batch, id_col, ntok_col, budget)

    return ds.map_batches(fn, batch_format="pyarrow")
