"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by actor-pool stages.

The image/audio codecs are NOT in this container, so the decode kernel
is stubbed (``decode_stub`` raises ``NotImplementedError`` unless the
deterministic fake is enabled) — but the Ray-side plumbing is real and
tested: binary column schema, small batch sizes for wide payloads,
actor signature, and output layout all match what a real
libjpeg/ffmpeg-backed stage would use.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),  # opaque encoded bytes
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


def decode_stub(payload: bytes, media_type: str, deterministic_fake: bool = False) -> np.ndarray:
    """Placeholder for the real decoder (PIL/libjpeg, ffmpeg, ...).

    With ``deterministic_fake=True`` returns a seeded pseudo-decode (a
    small float array derived from the payload hash) so downstream
    plumbing is testable without codecs.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "run with deterministic_fake=True or install PIL/ffmpeg"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(16).astype(np.float32)


class MediaFeatures:
    """Actor-pool stage: decode + featurize binary payloads.

    Real-deployment notes encoded in the defaults: ``batch_size`` must
    be SMALL (payloads are MBs; batch x concurrency must fit worker
    heap) and the stage is an actor pool so codec init happens once.
    """

    def __init__(self, deterministic_fake: bool = True):
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, sizes = [], []
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            arr = decode_stub(payload, mtype, deterministic_fake=self.fake)
            feats.append(arr.tolist())
            sizes.append(len(payload))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload_bytes": pa.array(sizes, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_features(media_ds, concurrency=(1, 4), batch_size: int = 64):
    """Wire MediaFeatures as an actor pool with wide-payload-safe
    batch sizing."""
    return media_ds.map_batches(
        MediaFeatures,
        fn_constructor_kwargs={"deterministic_fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def payload_meta_stage(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Treat a text column as an opaque utf-8 payload and surface its
    byte size — the binary-column metadata path exercised on driver
    data (oracle: DuckDB ``strlen`` = utf-8 byte length)."""
    sizes = [len(t.encode("utf-8")) if t is not None else None for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "payload_bytes": pa.array(sizes, pa.int64())})
