"""Training-consumption surface: the last hop between the curated
Dataset and a set of trainer workers.

- ``seeded_shuffle``: global random shuffle with a fixed seed — the
  training-order randomization step. Deterministic for a fixed seed
  AND a fixed block layout (Ray's shuffle seeds per-block permutations,
  so a different partitioning yields a different — equally valid —
  order; pin the layout with ``repartition`` first if bit-identical
  orders across runs matter).
- ``loader_splits``: fan the dataset out to N concurrent consumers via
  ``Dataset.streaming_split`` — each trainer worker pulls its own
  stream with backpressure, nothing materializes. ``equal=True`` makes
  the splits the same row count (required by synchronous data-parallel
  training); rows are then dropped/duplicated only as streaming_split
  defines.

Both are thin, deliberately: the value is pinning the engine's
contract (determinism caveats, disjoint-and-complete splits) in one
place with tests, not wrapping Ray's API.
"""

from __future__ import annotations


def seeded_shuffle(ds, seed: int = 42):
    """Global random shuffle, deterministic for (seed, block layout).
    An all-to-all exchange — O(dataset) network at scale; prefer local
    per-file shuffles upstream when global order is not required."""
    return ds.random_shuffle(seed=seed)


def loader_splits(ds, n: int, equal: bool = False, locality_hints=None):
    """N backpressured iterators over disjoint shards covering the
    dataset (see module docstring). Returns the list of
    ``DataIterator``s from ``Dataset.streaming_split``."""
    return ds.streaming_split(n, equal=equal, locality_hints=locality_hints)
