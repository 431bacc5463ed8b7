"""Deterministic synthetic data generator (FIXTURES.md §1).

Generates, from a single seed and with no wall-clock dependence:

- ``lake`` seed table: (repo, path, commit, lang, content) with a skewed
  repo-size distribution (one "monorepo" holds a large share of paths to
  exercise salted-key splitting — SURVEY.md §7 hard part 3),
- ``binlog``: seq-ordered I/U/D change events sliced into epochs
  (~60% U / 30% I / 10% D, per-key re-insert-after-delete and multiple
  same-key updates within one epoch exercising last-writer-wins),
  with an *additive column* ``size_bytes`` appearing from a configured
  epoch onward (schema evolution),
- ``snapshot``: the oracle replay result perturbed with seeded
  discrepancies covering every reconciliation status class, with the
  expected per-status counts recorded at generation time (the reference
  statuses they mirror: OK / "NO EN JPAT" / "NO EN SWIFT" /
  "DIFERENCIA EN VALOR" / "TRANSACCION DUPLICADA JPAT n" —
  ``service/ReconciliationService.java:23-30``).

The oracle replay (`oracle_replay`) is an independent pure-pandas
implementation of last-writer-wins-by-seq used by the golden tests; the
engine's distributed replay must match it per-row by content sha256.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "java", "ts", "go", "rs", "md"]
_WORDS = (
    "def class import return if else for while try except yield lambda self "
    "public static void int string map list stream final new null true false "
    "fn let mut impl struct enum match trait pub use mod async await"
).split()


@dataclass
class DatagenConfig:
    seed: int = 42
    num_repos: int = 8
    lake_rows: int = 400
    num_events: int = 4000
    num_epochs: int = 4
    monorepo_share: float = 0.5  # share of lake paths in repo 0 ("the monorepo")
    evolve_from_epoch: int | None = 2  # epochs >= this carry size_bytes
    content_len: tuple[int, int] = (100, 2000)
    wide_row_every: int = 997  # every Nth row gets ~1e5-char content
    # snapshot perturbation counts (status-class coverage)
    perturb_missing_right: int = 5  # delete from snapshot  -> MISSING_RIGHT
    perturb_missing_left: int = 5  # add only to snapshot   -> MISSING_LEFT
    perturb_value_diff: int = 5  # mutate content          -> VALUE_DIFF
    perturb_dup: int = 3  # duplicate key rows      -> DUP ordinals (k=2)
    salt_hot_repos: dict[str, int] = field(default_factory=lambda: {"org0/monorepo": 4})


def _rng(cfg: DatagenConfig, stream: str) -> np.random.Generator:
    return np.random.default_rng(
        np.random.SeedSequence([cfg.seed, int.from_bytes(hashlib.sha256(stream.encode()).digest()[:4], "big")])
    )


def _content(rng: np.random.Generator, n_chars: int) -> str:
    words = rng.choice(_WORDS, size=max(1, n_chars // 6))
    return " ".join(words.tolist())[:n_chars]


def _commit(rng: np.random.Generator) -> str:
    return bytes(rng.integers(0, 256, 20, dtype=np.uint8)).hex()


def repo_names(cfg: DatagenConfig) -> list[str]:
    return ["org0/monorepo"] + [f"org{1 + i // 4}/repo{i % 4}" for i in range(cfg.num_repos - 1)]


def gen_lake(cfg: DatagenConfig) -> pd.DataFrame:
    """Seed lake table; repo 0 is the skewed monorepo."""
    rng = _rng(cfg, "lake")
    repos = repo_names(cfg)
    n_mono = int(cfg.lake_rows * cfg.monorepo_share)
    per_rest = max(1, (cfg.lake_rows - n_mono) // max(1, len(repos) - 1))
    rows = []
    for ri, repo in enumerate(repos):
        n = n_mono if ri == 0 else per_rest
        for j in range(n):
            ext = LANGS[int(rng.integers(0, len(LANGS)))]
            path = f"src/pkg{j % 23}/mod{j % 7}/file{j}.{ext}"
            n_chars = int(rng.integers(*cfg.content_len))
            if (len(rows) + 1) % cfg.wide_row_every == 0:
                n_chars = 100_000
            rows.append(
                {
                    "repo": repo,
                    "path": path,
                    "commit": _commit(rng),
                    "lang": ext,
                    "content": _content(rng, n_chars),
                }
            )
    return pd.DataFrame(rows)


def gen_binlog(cfg: DatagenConfig, lake: pd.DataFrame) -> tuple[pd.DataFrame, list[tuple[int, int]]]:
    """Seq-ordered I/U/D event stream + epoch (start_seq, end_seq) ranges.

    Per-key histories include delete -> re-insert and multiple updates of
    one key inside a single epoch (LWW-by-seq coverage, SURVEY.md §2.6).
    """
    rng = _rng(cfg, "binlog")
    repos = repo_names(cfg)
    live = {(r.repo, r.path) for r in lake.itertuples()}
    known: list[tuple[str, str]] = sorted(live)
    new_ctr = 0
    recs = []
    for seq in range(cfg.num_events):
        p = rng.random()
        if p < 0.30 or not live:
            op = "I"
            if rng.random() < 0.3 and len(known) > len(live):
                dead = [k for k in known if k not in live]
                key = dead[int(rng.integers(0, len(dead)))]  # re-insert after delete
            else:
                repo = repos[int(rng.integers(0, len(repos)))] if rng.random() > 0.5 else repos[0]
                key = (repo, f"src/new/file{new_ctr}.py")
                new_ctr += 1
                known.append(key)
            live.add(key)
        elif p < 0.90:
            op = "U"
            key = known[int(rng.integers(0, len(known)))]
            if key not in live:  # upsert semantics: U on dead key inserts
                live.add(key)
        else:
            op = "D"
            alive = sorted(live)
            key = alive[int(rng.integers(0, len(alive)))]
            live.discard(key)
        repo, path = key
        if op == "D":
            recs.append(
                {"seq": seq, "op": "D", "repo": repo, "path": path, "commit": _commit(rng), "lang": None, "content": None}
            )
        else:
            ext = path.rsplit(".", 1)[-1]
            lang = ext if ext in LANGS else "py"
            recs.append(
                {
                    "seq": seq,
                    "op": op,
                    "repo": repo,
                    "path": path,
                    "commit": _commit(rng),
                    "lang": lang,
                    "content": _content(rng, int(rng.integers(*cfg.content_len))),
                }
            )
    df = pd.DataFrame(recs)
    df["ts"] = pd.Timestamp("2025-01-01") + pd.to_timedelta(df["seq"] * 137, unit="ms")
    per = cfg.num_events // cfg.num_epochs
    epochs = [
        (e * per, (e + 1) * per if e < cfg.num_epochs - 1 else cfg.num_events)
        for e in range(cfg.num_epochs)
    ]
    return df, epochs


def oracle_replay(lake: pd.DataFrame, binlog: pd.DataFrame, upto_seq: int | None = None) -> pd.DataFrame:
    """Independent LWW-by-seq replay oracle (pure pandas, no Ray).

    Upserts I/U, removes D; last event per key by seq wins — the
    correctness yardstick for the distributed replay (FIXTURES.md §1).
    """
    ev = binlog if upto_seq is None else binlog[binlog["seq"] < upto_seq]
    ev = ev.sort_values("seq", kind="stable")
    last = ev.drop_duplicates(subset=["repo", "path"], keep="last")
    base = lake.set_index(["repo", "path"])
    touched = last.set_index(["repo", "path"])
    keep_base = base[~base.index.isin(touched.index)].reset_index()
    winners = touched[touched["op"] != "D"].reset_index()
    cols = ["repo", "path", "commit", "lang", "content"]
    extra = [c for c in winners.columns if c in ("size_bytes",)]
    out = pd.concat([keep_base[cols], winners[cols + extra]], ignore_index=True)
    return out.sort_values(["repo", "path"], kind="stable").reset_index(drop=True)


def gen_snapshot(cfg: DatagenConfig, final_lake: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, int]]:
    """Perturbed copy of the oracle final state + expected status counts.

    Perturbation -> status mapping mirrors FIXTURES.md §1 /
    ``ReconciliationService.java``: drop rows -> MISSING_RIGHT ("NO EN
    JPAT" :96-105); add rows -> MISSING_LEFT ("NO EN SWIFT" :154-171);
    mutate content -> VALUE_DIFF ("DIFERENCIA EN VALOR" :199); duplicate
    keys -> DUP ordinals ("TRANSACCION DUPLICADA JPAT n" :137-144).
    """
    rng = _rng(cfg, "snapshot")
    snap = final_lake.copy().reset_index(drop=True)
    n = len(snap)
    idx = rng.permutation(n)
    mr = idx[: cfg.perturb_missing_right]
    vd = idx[cfg.perturb_missing_right : cfg.perturb_missing_right + cfg.perturb_value_diff]
    dup = idx[
        cfg.perturb_missing_right + cfg.perturb_value_diff :
        cfg.perturb_missing_right + cfg.perturb_value_diff + cfg.perturb_dup
    ]
    snap.loc[vd, "content"] = snap.loc[vd, "content"] + " <mutated>"
    dup_rows = snap.loc[dup].copy()
    added = pd.DataFrame(
        {
            "repo": ["orgX/only-in-snapshot"] * cfg.perturb_missing_left,
            "path": [f"ghost/file{i}.py" for i in range(cfg.perturb_missing_left)],
            "commit": [_commit(rng) for _ in range(cfg.perturb_missing_left)],
            "lang": ["py"] * cfg.perturb_missing_left,
            "content": [_content(rng, 200) for _ in range(cfg.perturb_missing_left)],
        }
    )
    snap = snap.drop(index=mr)
    snap = pd.concat([snap, dup_rows, added], ignore_index=True)
    counts = {
        "MATCHED": n - cfg.perturb_missing_right - cfg.perturb_value_diff - cfg.perturb_dup,
        "MISSING_RIGHT": cfg.perturb_missing_right,
        "MISSING_LEFT": cfg.perturb_missing_left,
        "VALUE_DIFF": cfg.perturb_value_diff,
        "DUP_RIGHT_1": cfg.perturb_dup,
        "DUP_RIGHT_2": cfg.perturb_dup,
    }
    return snap.reset_index(drop=True), counts


_BINLOG_BASE = ["seq", "ts", "op", "repo", "path", "commit", "lang", "content"]


def write_fixture(cfg: DatagenConfig, out_dir: str) -> dict:
    """Materialize lake seed, per-epoch binlog parquet (with additive
    ``size_bytes`` from ``evolve_from_epoch`` on), snapshot, and a JSON
    sidecar with epoch boundaries + expected reconcile counts.
    Returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)
    lake = gen_lake(cfg)
    binlog, epochs = gen_binlog(cfg, lake)
    final = oracle_replay(lake, binlog)
    snap, counts = gen_snapshot(cfg, final)

    pq.write_table(pa.Table.from_pandas(lake, preserve_index=False), f"{out_dir}/lake_seed.parquet")
    pq.write_table(pa.Table.from_pandas(snap, preserve_index=False), f"{out_dir}/snapshot.parquet")
    os.makedirs(f"{out_dir}/binlog", exist_ok=True)
    epoch_files = []
    for e, (lo, hi) in enumerate(epochs):
        sl = binlog[(binlog["seq"] >= lo) & (binlog["seq"] < hi)].copy()
        cols = list(_BINLOG_BASE)
        if cfg.evolve_from_epoch is not None and e >= cfg.evolve_from_epoch:
            sl["size_bytes"] = sl["content"].str.len().astype("Int64")
            cols = cols + ["size_bytes"]
        f = f"{out_dir}/binlog/epoch={e:05d}.parquet"
        pq.write_table(pa.Table.from_pandas(sl[cols], preserve_index=False), f)
        epoch_files.append({"epoch": e, "file": f, "seq_range": [lo, hi], "rows": len(sl)})
    manifest = {
        "seed": cfg.seed,
        "epochs": epoch_files,
        "expected_status_counts": counts,
        "lake_rows": len(lake),
        "final_rows": len(final),
        "num_events": cfg.num_events,
        "salt_hot_repos": cfg.salt_hot_repos,
    }
    with open(f"{out_dir}/fixture.json", "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest
