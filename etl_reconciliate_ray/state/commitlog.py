"""Commit log + checkpoint manifest — the exactly-once / resume substrate.

Replaces the reference's Spring Batch H2 metadata store
(``src/main/resources/springbatch-schema.sql:1-76`` — job/step
executions and the serialized inter-step ``ExecutionContext``) with a
lake-native design (SURVEY.md §2.1 K3, §4):

- an append-only JSONL log of per-partition commit records
  ``{epoch, part, files, rows, state_sha256, input_seq}``,
- an ``EPOCH_COMMIT`` marker sealing each epoch (atomic publish:
  readers resolve only manifest-listed files),
- **per-partition epoch fencing**: a (epoch, part) pair already present
  is skipped on re-delivery — replaying a committed epoch is a no-op,
  which together with deterministic merge functions and
  content-addressed file names gives exactly-once sink semantics under
  Ray task retries (SURVEY.md §7 hard part 1).

Single-writer assumption: the driver process is the only appender
(Ray tasks WRITE data files but never the log). On a real multi-node
deployment this file becomes a conditional-put object-store key or a
small DB table; the protocol (fence on (epoch, part), seal with a
marker) is unchanged.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PartEntry:
    epoch: int
    part: int
    files: tuple[str, ...]
    rows: int
    state_sha256: str
    input_seq: tuple[int, int] | None = None


@dataclass
class CommitLog:
    root: str
    _entries: dict[tuple[int, int], PartEntry] = field(default_factory=dict)
    _sealed: set[int] = field(default_factory=set)

    @property
    def path(self) -> str:
        return os.path.join(self.root, "commitlog.jsonl")

    @classmethod
    def open(cls, root: str) -> "CommitLog":
        log = cls(root=root)
        os.makedirs(root, exist_ok=True)
        if os.path.exists(log.path):
            with open(log.path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("type") == "EPOCH_COMMIT":
                        log._sealed.add(rec["epoch"])
                    else:
                        e = PartEntry(
                            epoch=rec["epoch"],
                            part=rec["part"],
                            files=tuple(rec["files"]),
                            rows=rec["rows"],
                            state_sha256=rec["state_sha256"],
                            input_seq=tuple(rec["input_seq"]) if rec.get("input_seq") else None,
                        )
                        log._entries[(e.epoch, e.part)] = e
        return log

    def _append(self, rec: dict) -> None:
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec, sort_keys=True) + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    # -- fencing ---------------------------------------------------------
    def is_committed(self, epoch: int, part: int) -> bool:
        return (epoch, part) in self._entries

    def is_sealed(self, epoch: int) -> bool:
        return epoch in self._sealed

    def commit_part(self, entry: PartEntry) -> bool:
        """Append a per-partition commit; returns False (no-op) if the
        (epoch, part) fence rejects it — idempotent under re-delivery."""
        key = (entry.epoch, entry.part)
        if key in self._entries:
            return False
        self._append(
            {
                "epoch": entry.epoch,
                "part": entry.part,
                "files": list(entry.files),
                "rows": entry.rows,
                "state_sha256": entry.state_sha256,
                "input_seq": list(entry.input_seq) if entry.input_seq else None,
            }
        )
        self._entries[key] = entry
        return True

    def seal_epoch(self, epoch: int) -> None:
        if epoch in self._sealed:
            return
        self._append({"type": "EPOCH_COMMIT", "epoch": epoch})
        self._sealed.add(epoch)

    # -- manifest resolution --------------------------------------------
    def latest_sealed_epoch(self) -> int | None:
        return max(self._sealed) if self._sealed else None

    def current_manifest(self, upto_epoch: int | None = None) -> dict[int, PartEntry]:
        """part -> newest committed entry with epoch <= upto_epoch
        (default: newest sealed epoch). Untouched partitions carry
        forward their older entries — readers see exactly the files the
        manifest lists, nothing else (atomic publish)."""
        if upto_epoch is None:
            upto_epoch = self.latest_sealed_epoch()
            if upto_epoch is None:
                return {}
        best: dict[int, PartEntry] = {}
        for (e, p), entry in self._entries.items():
            if e <= upto_epoch and (p not in best or e > best[p].epoch):
                best[p] = entry
        return best

    def lake_files(self, upto_epoch: int | None = None) -> list[str]:
        files: list[str] = []
        for entry in self.current_manifest(upto_epoch).values():
            files.extend(entry.files)
        return sorted(files)

    def lineage(self) -> list[dict]:
        """Per-partition lineage records (north_star: 'per-partition
        lineage manifests and metrics')."""
        return [
            {
                "epoch": e.epoch,
                "part": e.part,
                "rows": e.rows,
                "files": list(e.files),
                "state_sha256": e.state_sha256,
                "input_seq": list(e.input_seq) if e.input_seq else None,
            }
            for e in sorted(self._entries.values(), key=lambda x: (x.epoch, x.part))
        ]
