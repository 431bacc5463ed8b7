"""Golden end-to-end + chaos tests (SURVEY.md §5.2-5.3).

- distributed replay == independent pandas oracle (per-row sha256),
- kill after epoch k + restart from commit log -> identical state,
- re-delivering a committed epoch is a no-op (fencing/idempotence),
- additive schema evolution lands in the lake state.
"""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from etl_reconciliate_ray.datagen import oracle_replay
from etl_reconciliate_ray.pipelines.replay import (
    ReplayConfig,
    lake_state_hash,
    lake_table,
    replay,
)
from etl_reconciliate_ray.state.commitlog import CommitLog


def _oracle_final(fixture_dir):
    import pandas as pd

    lake = pq.read_table(f"{fixture_dir}/lake_seed.parquet").to_pandas()
    import glob

    parts = [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{fixture_dir}/binlog/*.parquet"))]
    binlog = pd.concat(parts, ignore_index=True)
    return oracle_replay(lake, binlog)


def _cfg(tmp_path, name, manifest):
    return ReplayConfig(
        lake_root=str(tmp_path / name),
        num_buckets=8,
        salt_for_repo=manifest["salt_hot_repos"],
        writer_concurrency=2,
    )


def test_replay_matches_oracle(fixture_small, tmp_path):
    fixture_dir, cfg_gen, manifest = fixture_small
    cfg = _cfg(tmp_path, "lake", manifest)
    metrics = replay(fixture_dir, cfg)
    assert all(not m["skipped"] for m in metrics)

    got = lake_table(cfg).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = _oracle_final(fixture_dir)
    assert len(got) == len(want) == manifest["final_rows"]
    # per-row content sha256 equality vs independently computed oracle
    want_sha = want["content"].map(lambda s: hashlib.sha256(s.encode()).hexdigest())
    assert (got["repo"].values == want["repo"].values).all()
    assert (got["path"].values == want["path"].values).all()
    assert (got["content_sha256"].values == want_sha.values).all()
    assert (got["content"].values == want["content"].values).all()


def test_schema_evolution_additive_column(fixture_small, tmp_path):
    fixture_dir, cfg_gen, manifest = fixture_small
    cfg = _cfg(tmp_path, "lake_evo", manifest)
    replay(fixture_dir, cfg)
    tbl = lake_table(cfg)
    assert "size_bytes" in tbl.column_names
    df = tbl.to_pandas()
    assert df["size_bytes"].notna().any()  # evolved rows carry it
    assert df["size_bytes"].isna().any()  # pre-evolution rows null-filled


def test_kill_restart_converges(fixture_small, tmp_path):
    fixture_dir, cfg_gen, manifest = fixture_small
    cfg_a = _cfg(tmp_path, "lake_uninterrupted", manifest)
    replay(fixture_dir, cfg_a)

    cfg_b = _cfg(tmp_path, "lake_interrupted", manifest)
    replay(fixture_dir, cfg_b, stop_after_epoch=2)  # "kill" mid-stream
    log = CommitLog.open(cfg_b.lake_root)
    assert log.latest_sealed_epoch() == 2
    metrics = replay(fixture_dir, cfg_b)  # restart: resumes from commit log
    assert [m["skipped"] for m in metrics][:3] == [True, True, True]
    assert lake_state_hash(cfg_a.lake_root) == lake_state_hash(cfg_b.lake_root)


def test_redelivered_epoch_is_noop(fixture_small, tmp_path):
    import json
    import ray.data as rd

    from etl_reconciliate_ray.pipelines.replay import run_epoch

    fixture_dir, cfg_gen, manifest = fixture_small
    cfg = _cfg(tmp_path, "lake_redeliver", manifest)
    replay(fixture_dir, cfg)
    before = lake_state_hash(cfg.lake_root)
    log = CommitLog.open(cfg.lake_root)
    with open(f"{fixture_dir}/fixture.json") as fh:
        ep1 = json.load(fh)["epochs"][1]
    m = run_epoch(rd.read_parquet(ep1["file"]), ep1["epoch"] + 1, cfg, log=log)
    assert m["skipped"] is True
    assert lake_state_hash(cfg.lake_root) == before


def test_lineage_manifest_written(fixture_small, tmp_path):
    import json
    import os

    fixture_dir, cfg_gen, manifest = fixture_small
    cfg = _cfg(tmp_path, "lake_lineage", manifest)
    replay(fixture_dir, cfg)
    with open(os.path.join(cfg.lake_root, "lineage.json")) as fh:
        lineage = json.load(fh)
    assert lineage["partitions"], "per-partition lineage entries present"
    entry = lineage["partitions"][0]
    assert {"epoch", "part", "rows", "files", "state_sha256", "input_seq"} <= set(entry)
