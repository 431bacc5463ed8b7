"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by actor-pool stages.

Image decode is REAL everywhere: ``codec="auto"`` resolves PIL when
installed and otherwise falls back to the in-repo pure-Python PNG
codec (``functions/minipng.py``, stdlib zlib only) — so the decode ->
featurize / resize branch runs and is tested even in containers that
ship no media libraries. Audio/video codecs are still stubbed
(``decode_stub`` raises ``NotImplementedError`` unless the
deterministic fake is enabled); the Ray-side plumbing — binary column
schema, small batch sizes for wide payloads, actor signature, output
layout — matches what a libjpeg/ffmpeg-backed stage would use.
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


def _import_pil():
    """Optional codec probe — called ONCE per actor in ``__init__``
    (never per batch). Returns PIL's ``Image`` module when the codec is
    installed, else None (this container ships no media libs)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _resolve_codec(codec: str):
    """Map the ``codec`` knob to an Image backend or None (= fake).
    ``"auto"`` uses PIL when importable, else the pure-Python PNG
    fallback (``functions/minipng`` — real decode, stdlib only);
    ``"pil"`` requires PIL; ``"minipng"`` forces the fallback;
    ``"fake"`` forces the deterministic fake."""
    if codec == "fake":
        return None
    if codec == "minipng":
        from ..functions import minipng

        return minipng
    img = _import_pil()
    if codec == "pil" and img is None:
        raise ImportError("codec='pil' requested but PIL is not installed")
    if codec in ("pil",):
        return img
    if codec == "auto":
        if img is not None:
            return img
        from ..functions import minipng

        return minipng
    raise ValueError(f"unknown codec mode: {codec!r}")


def decode_stub(payload: bytes, media_type: str, deterministic_fake: bool = False) -> np.ndarray:
    """Placeholder decode for environments without codecs.

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


def decode_image_features(Image, payload: bytes) -> np.ndarray:
    """REAL image featurization (backend-agnostic: PIL or the minipng
    fallback — both expose open/convert/resize/asarray):
    decode -> grayscale -> 4x4 thumbnail -> 16 normalized floats — the
    same output shape as the fake, so downstream schema/layout is
    identical in both modes."""
    import io

    img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    return (np.asarray(img, dtype=np.float32) / 255.0).reshape(16)


class MediaFeatures:
    """Actor-pool stage: decode + featurize binary payloads.

    Real-deployment notes encoded in the defaults: ``batch_size`` must
    be SMALL (payloads are MBs; batch x concurrency must fit worker
    heap) and the stage is an actor pool so codec init happens once.
    """

    def __init__(self, deterministic_fake: bool = True, codec: str = "fake"):
        # codec resolution happens ONCE per actor — the actor-pool
        # point: "auto" = PIL when importable (real decode) else the
        # deterministic fake; "pil" = require it; "fake" = force fake
        self.fake = deterministic_fake
        self.Image = _resolve_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, sizes = [], []
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if self.Image is not None and mtype == "image":
                try:
                    arr = decode_image_features(self.Image, payload)
                except Exception:
                    # corrupt/truncated payload: fall back PER ROW (an
                    # unhandled decode error would kill the whole
                    # actor task for one bad image in the corpus).
                    # Strict mode re-raises the REAL decode error —
                    # routing through decode_stub would mislabel a
                    # corrupt payload as "no codecs installed"
                    if not self.fake:
                        raise
                    arr = decode_stub(payload, mtype, deterministic_fake=True)
            else:
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


def media_features(media_ds, concurrency=(1, 4), batch_size: int = 64, codec: str = "fake"):
    """Wire MediaFeatures as an actor pool with wide-payload-safe
    batch sizing. ``codec="auto"`` decodes with PIL wherever it is
    installed (each actor probes once at init) and falls back to the
    deterministic fake elsewhere — this container has no media libs,
    so driver queries pin ``"fake"`` for reproducibility."""
    return media_ds.map_batches(
        MediaFeatures,
        fn_constructor_kwargs={"deterministic_fake": True, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def payload_meta_stage(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Treat a text column as an opaque utf-8 payload and surface its
    byte size — the binary-column metadata path exercised on driver
    data (oracle: DuckDB ``strlen`` = utf-8 byte length). Vectorized:
    string -> large_binary cast is a zero-copy view; ``binary_length``
    counts BYTES over the offsets buffer (never decodes)."""
    import pyarrow.compute as pc

    sizes = pc.binary_length(pc.cast(batch[text_col], pa.large_binary()))
    return pa.table({id_col: batch[id_col], "payload_bytes": pc.cast(sizes, pa.int64())})


class MediaResize:
    """Actor-pool stage: decode -> resize -> re-encode (the standard
    image-normalization step before feature extraction / training).
    The pixel kernel is the deterministic fake (real deployment:
    PIL.Image.resize / cv2.resize initialized once per actor in
    ``__init__``); the Ray plumbing — target dims as constructor args,
    small batches, per-row output metadata — is real and tested."""

    def __init__(self, width: int = 224, height: int = 224,
                 deterministic_fake: bool = True, codec: str = "fake"):
        self.w, self.h, self.fake = width, height, deterministic_fake
        self.Image = _resolve_codec(codec)  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        out_payloads, out_w, out_h = [], [], []
        for payload, mtype in zip(
            batch["payload"].to_pylist(), batch["media_type"].to_pylist()
        ):
            if self.Image is not None and mtype == "image":
                try:
                    # RGB-convert before the PNG save: P/CMYK-mode
                    # sources raise OSError on save otherwise
                    img = self.Image.open(io.BytesIO(payload)).convert("RGB").resize((self.w, self.h))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out_payloads.append(buf.getvalue())
                except Exception:
                    if not self.fake:
                        # strict mode: never emit synthetic bytes
                        raise
                    # corrupt payload: content-derived fake, per row
                    digest = hashlib.sha256(payload + f"{self.w}x{self.h}".encode()).digest()
                    out_payloads.append(digest * 4)
            else:
                if not self.fake:
                    # strict mode: non-image (or codec-less) rows have
                    # no real resize path — say so directly instead of
                    # computing and discarding a fake decode
                    raise NotImplementedError(
                        f"media_resize: no real codec path for {mtype!r} "
                        "payloads (deterministic_fake=False)"
                    )
                # fake re-encode: content-derived bytes sized like a thumbnail
                digest = hashlib.sha256(payload + f"{self.w}x{self.h}".encode()).digest()
                out_payloads.append(digest * 4)
            out_w.append(self.w)
            out_h.append(self.h)
        return pa.table({
            "media_id": batch["media_id"],
            "payload": pa.array(out_payloads, pa.large_binary()),
            "meta_width": pa.array(out_w, pa.int32()),
            "meta_height": pa.array(out_h, pa.int32()),
        })


class FrameSampler:
    """Actor-pool stage: sample one frame reference every
    ``interval_ms`` of a video payload's duration (flat_map shape: one
    input row -> ceil(duration/interval) output rows). Real deployment
    seeks keyframes via ffmpeg; here the frame payload is the
    deterministic fake, while the row expansion, timestamps, and
    (media_id, frame_idx) layout — what downstream training jobs key
    on — are real."""

    def __init__(self, interval_ms: int = 1000, deterministic_fake: bool = True):
        if not int(interval_ms) > 0:
            # 0 would ZeroDivisionError per batch deep inside the actor
            # task; negative would silently emit one frame per video
            raise ValueError(f"interval_ms must be > 0, got {interval_ms!r}")
        self.interval = int(interval_ms)
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, ts, frames = [], [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta_duration_ms"].to_pylist(),
        ):
            n = max(1, -(-int(dur or 0) // self.interval))  # ceil, >= 1
            for i in range(n):
                ids.append(mid)
                idxs.append(i)
                ts.append(i * self.interval)
                frames.append(
                    hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
                    if self.fake else b""
                )
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_ts_ms": pa.array(ts, pa.int32()),
            "frame": pa.array(frames, pa.large_binary()),
        })


def media_resize(media_ds, width=224, height=224, concurrency=(1, 4),
                 batch_size: int = 64, codec: str = "fake"):
    """Wire MediaResize as an actor pool. ``codec`` plumbs through like
    ``media_features``: "auto" resizes with a real codec (PIL, or the
    pure-Python minipng fallback) wherever one resolves; the default
    "fake" keeps driver queries deterministic."""
    return media_ds.map_batches(
        MediaResize,
        fn_constructor_kwargs={"width": width, "height": height,
                               "deterministic_fake": True, "codec": codec},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def frame_sample(media_ds, interval_ms=1000, concurrency=(1, 4), batch_size: int = 16):
    """batch_size deliberately smaller: output fan-out is
    duration/interval rows per input row."""
    return media_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"interval_ms": interval_ms, "deterministic_fake": True},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
