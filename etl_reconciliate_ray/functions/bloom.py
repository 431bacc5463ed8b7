"""Bloom filter over a key column — the broadcast-set scale path.

At 100 TB the broadcast value set of ``broadcast_semi_join`` /
``anti_join`` (joins.py) stops fitting in an actor's heap; the standard
fix is a Bloom filter PREFILTER: ~10 bits/key regardless of key size,
no false negatives (a key in the set always passes), tunable false
positives (a passing key might not be in the set). That asymmetry
dictates usage — a Bloom result is NEVER the final answer for an exact
join; it prunes the stream BEFORE the exact operator:

    probe = bloom_prefilter(big_ds, bloom, on="k")   # drops most misses
    out   = hash_join(probe, right_ds, on="k")       # exact, tiny input

(For an ANTI join the filter prunes the opposite way: rows that fail
the Bloom are definitely-absent and can bypass the join entirely.)

Everything is vectorized: build and probe run ``hash64`` once per key
(one SIMD pass) and derive the k probe positions with the standard
double-hashing scheme h_i = h1 + i*h2 (Kirsch-Mitzenmacher) over a
power-of-two bit table, so membership is numpy gather + bit tests —
no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import _mix64, hash64


def _h1h2(values) -> tuple[np.ndarray, np.ndarray]:
    h1 = hash64(values)
    h2 = _mix64(h1) | np.uint64(1)  # odd: full-period stride over 2^m table
    return h1, h2


def build_bloom(values, bits_log2: int = 20, k: int = 7) -> dict:
    """Build a Bloom filter over a key column. ``bits_log2=20`` is 1 Mi
    bits = 128 KiB; size for ~10 bits/key (FP ~1% at k=7)."""
    m = np.uint64(1) << np.uint64(bits_log2)
    mask = m - np.uint64(1)
    bits = np.zeros(int(m) // 64, dtype=np.uint64)
    h1, h2 = _h1h2(values)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return {"bits": bits, "bits_log2": bits_log2, "k": k}


def bloom_contains(bloom: dict, values) -> np.ndarray:
    """Vectorized membership mask: True = possibly in set (FP rate per
    sizing), False = DEFINITELY not in set (never a false negative)."""
    mask = (np.uint64(1) << np.uint64(bloom["bits_log2"])) - np.uint64(1)
    bits = bloom["bits"]
    h1, h2 = _h1h2(values)
    out = np.ones(len(h1), dtype=bool)
    for i in range(bloom["k"]):
        pos = (h1 + np.uint64(i) * h2) & mask
        word = bits[(pos >> np.uint64(6)).astype(np.int64)]
        out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return out


def bloom_prefilter(ds, bloom: dict, on: str, invert: bool = False, batch_size: int = 65536):
    """Prune a Dataset's stream by Bloom membership of ``on`` before an
    exact join: ``invert=False`` keeps possibly-present rows (semi/join
    prefilter), ``invert=True`` keeps definitely-absent rows (anti-join
    fast path). The filter dict is broadcast once via ``ray.put`` and
    fetched into a per-worker-process cache — a task pool scaling to
    every core, no fixed actor cap."""
    import ray

    from .broadcast import fetch

    ref = ray.put(bloom)

    def bloom_stage(batch: pa.Table) -> pa.Table:
        m = bloom_contains(fetch(ref), batch[on])
        return batch.filter(pa.array(~m if invert else m))

    return ds.map_batches(
        bloom_stage, batch_format="pyarrow", batch_size=batch_size
    )
