"""Training-consumption surface tests (stages/mlio).

Kept in the alphabetically LAST test file on purpose: streaming_split
spawns a coordinator actor whose lifetime is tied to iterator GC; if it
ever lingered it must not be able to starve unrelated tests' resources
in the shared 4-cpu session.
"""

from __future__ import annotations

import gc



def test_loader_splits_disjoint_and_complete(ray_session):
    """streaming_split shards must be disjoint and cover every row when
    consumed concurrently (the trainer-worker contract)."""
    import threading

    import ray.data as rd

    from etl_reconciliate_ray.stages.mlio import loader_splits

    ds = rd.range(2000, override_num_blocks=8)
    splits = loader_splits(ds, 3)
    chunks = []

    def consume(it):
        rows = []
        for b in it.iter_batches(batch_format="pyarrow"):
            rows.extend(b["id"].to_pylist())
        chunks.append(rows)

    ts = [threading.Thread(target=consume, args=(s,)) for s in splits]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    all_rows = [r for rows in chunks for r in rows]
    assert len(all_rows) == 2000
    assert sorted(all_rows) == list(range(2000))


def test_seeded_shuffle_deterministic_and_permutes(ray_session):
    """Same (seed, layout) -> identical order; different seed -> a
    different permutation of the same rows."""
    import ray.data as rd

    from etl_reconciliate_ray.stages.mlio import seeded_shuffle

    def order(seed):
        ds = rd.range(500, override_num_blocks=4)
        return [r["id"] for r in seeded_shuffle(ds, seed=seed).take_all()]

    a, b, c = order(7), order(7), order(8)
    assert a == b
    assert a != c
    assert sorted(a) == list(range(500)) and sorted(c) == list(range(500))
    assert a != list(range(500))  # actually shuffled

