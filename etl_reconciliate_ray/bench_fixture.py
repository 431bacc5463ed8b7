"""Vectorized bench-scale fixture generator (10^6+ events in seconds).

Same logical shape as datagen.write_fixture (lake seed + epoch-sliced
binlog + oracle snapshot) but fully numpy-vectorized: contents come
from a seeded pool, keys from a bounded pathid space with a skewed
monorepo share. Deterministic in (seed, sizes) — safe to cache across
the N- and 4N-CPU scaling runs so both see identical input and a warm
page cache.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_POOL_SIZE = 1024


def _write_sharded(df: pd.DataFrame, out_dir: str, rows_per_file: int = 50_000) -> None:
    """Write a directory of parquet shards (min 8) so Ray's read stage
    gets one task per file instead of one serialized read — a single
    one-file 'epoch' reads as 1 task no matter what override_num_blocks
    asks for (SplitBlocks happens after the read)."""
    os.makedirs(out_dir, exist_ok=True)
    n_files = max(8, (len(df) + rows_per_file - 1) // rows_per_file)
    per = (len(df) + n_files - 1) // n_files
    for i in range(n_files):
        sl = df.iloc[i * per : (i + 1) * per]
        if len(sl) == 0:
            continue
        pq.write_table(
            pa.Table.from_pandas(sl, preserve_index=False),
            os.path.join(out_dir, f"shard-{i:04d}.parquet"),
            row_group_size=8192,
        )


def _content_pool(rng: np.random.Generator, n_chars: int = 300) -> np.ndarray:
    import string

    letters = np.array(list(string.ascii_lowercase + "      "))
    pool = ["".join(rng.choice(letters, size=n_chars)) for _ in range(_POOL_SIZE)]
    return np.array(pool, dtype=object)


def _key_arrays(pathids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (repo, path) per pathid; ~30% of the key space
    lives in one hot monorepo (skew for salted-key splitting) and the
    rest spreads over 128 normal repos — realistic cardinality, so
    hash-partitioning has real fan-out. Fully vectorized (no per-row
    Python) so 10^7-event fixtures generate in seconds."""
    mono = (pathids % 10) < 3
    rid = pathids % 128
    repo = np.where(
        mono,
        "org0/monorepo",
        np.char.add(
            np.char.add("org", (rid % 5 + 1).astype("U1")),
            np.char.add("/repo", rid.astype("U3")),
        ),
    ).astype(object)
    path = np.char.add(
        np.char.add(
            np.char.add("src/pkg", (pathids % 97).astype("U2")),
            np.char.add("/file", pathids.astype("U12")),
        ),
        ".py",
    ).astype(object)
    return repo, path


def write_bench_fixture(
    out_dir: str,
    num_events: int = 1_000_000,
    lake_rows: int = 100_000,
    num_epochs: int = 4,
    seed: int = 42,
    content_chars: int = 300,
) -> dict:
    os.makedirs(f"{out_dir}/binlog", exist_ok=True)
    rng = np.random.default_rng(seed)
    pool = _content_pool(rng, n_chars=content_chars)

    # lake seed: pathids 0..lake_rows-1
    ids = np.arange(lake_rows)
    repo, path = _key_arrays(ids)
    lake = pd.DataFrame(
        {
            "repo": repo,
            "path": path,
            "commit": np.char.add("c", ids.astype("U12")).astype(object),
            "lang": "py",
            "content": pool[ids % _POOL_SIZE],
        }
    )
    _write_sharded(lake, f"{out_dir}/lake_seed.parquet")

    # binlog: uniform pathids over 1.2x the seed key space (some inserts)
    ev_ids = rng.integers(0, int(lake_rows * 1.2), size=num_events)
    ops = rng.choice(np.array(["I", "U", "D"], dtype=object), size=num_events, p=[0.3, 0.6, 0.1])
    erepo, epath = _key_arrays(ev_ids)
    content = pool[(ev_ids * 31 + np.arange(num_events)) % _POOL_SIZE].copy()
    lang = np.full(num_events, "py", dtype=object)
    dmask = ops == "D"
    content[dmask] = None
    lang[dmask] = None
    binlog = pd.DataFrame(
        {
            "seq": np.arange(num_events, dtype=np.int64),
            "op": ops,
            "repo": erepo,
            "path": epath,
            "commit": np.char.add("c", (ev_ids * 7 + np.arange(num_events)).astype("U16")).astype(object),
            "lang": lang,
            "content": content,
        }
    )
    binlog["ts"] = pd.Timestamp("2025-01-01") + pd.to_timedelta(binlog["seq"], unit="ms")

    per = num_events // num_epochs
    epochs = []
    for e in range(num_epochs):
        lo, hi = e * per, (e + 1) * per if e < num_epochs - 1 else num_events
        sl = binlog.iloc[lo:hi]
        f = f"{out_dir}/binlog/epoch={e:05d}"
        _write_sharded(sl, f)
        epochs.append({"epoch": e, "file": f, "seq_range": [lo, hi], "rows": len(sl)})

    # oracle snapshot = pandas LWW replay of the full stream
    last = binlog.drop_duplicates(subset=["repo", "path"], keep="last")
    base = lake.set_index(["repo", "path"])
    touched = last.set_index(["repo", "path"])
    keep = base[~base.index.isin(touched.index)].reset_index()
    winners = touched[touched["op"] != "D"].reset_index()
    cols = ["repo", "path", "commit", "lang", "content"]
    snap = pd.concat([keep[cols], winners[cols]], ignore_index=True)
    _write_sharded(snap, f"{out_dir}/snapshot.parquet")

    manifest = {
        "seed": seed,
        "epochs": epochs,
        "num_events": num_events,
        "lake_rows": lake_rows,
        "final_rows": len(snap),
        "expected_status_counts": {"MATCHED": len(snap)},
        "salt_hot_repos": {"org0/monorepo": 16},
    }
    with open(f"{out_dir}/fixture.json", "w") as fh:
        json.dump(manifest, fh)
    return manifest


def ensure_bench_fixture(
    cache_root: str,
    num_events: int,
    lake_rows: int,
    seed: int = 42,
    num_epochs: int = 4,
    content_chars: int = 300,
) -> str:
    """Create-or-reuse the cached fixture dir for these parameters."""
    d = os.path.join(cache_root, f"fix_e{num_events}_l{lake_rows}_s{seed}_c{content_chars}_p{num_epochs}")
    marker = os.path.join(d, "fixture.json")
    if os.path.exists(marker):
        return d
    write_bench_fixture(d, num_events=num_events, lake_rows=lake_rows, seed=seed,
                        num_epochs=num_epochs, content_chars=content_chars)
    return d
