"""Minimal pure-Python PNG codec (stdlib ``zlib``/``struct`` only)
with a PIL-shaped surface — the fallback image backend for the
multimodal stages in containers that ship no media libraries.

Implements the PNG spec (RFC 2083 / ISO 15948) subset the engine's
image plumbing needs: 8-bit depth, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), non-interlaced, all five scanline filters on
decode; encode writes filter-0 gray or RGB. Palette and Adam7 images
refuse loudly (the per-row corrupt-payload fallback in the stages
handles them like any undecodable payload).

API mirrors the PIL calls the stages make — ``open(fp)``,
``new(mode, size, color)``, ``.convert("L"/"RGB")``,
``.resize((w, h))`` (nearest-neighbor, deterministic),
``.save(fp, format="PNG")``, ``.size``, ``np.asarray(img)`` — so
``_resolve_codec`` can hand either backend to the same kernels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type (palette=3 unsupported)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class MiniImage:
    """In-memory image: ``arr`` is (h, w) uint8 for mode L or
    (h, w, 3) uint8 for mode RGB."""

    def __init__(self, arr: np.ndarray, mode: str):
        if mode not in ("L", "RGB"):
            raise ValueError(f"unsupported mode {mode!r}")
        self.arr = np.ascontiguousarray(arr, dtype=np.uint8)
        self.mode = mode

    @property
    def size(self) -> tuple[int, int]:
        h, w = self.arr.shape[:2]
        return (w, h)

    def __array__(self, dtype=None, copy=None):
        # numpy>=2 trusts this method to honor copy=True — returning
        # the backing buffer there would alias the image's pixels
        if dtype is not None:
            return self.arr.astype(dtype, copy=bool(copy) or copy is None)
        return self.arr.copy() if copy else self.arr

    def convert(self, mode: str) -> "MiniImage":
        if mode == self.mode:
            return self
        if mode == "L":  # ITU-R 601 luma, PIL's integer weighting
            a = self.arr.astype(np.uint32)
            luma = (a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) // 1000
            return MiniImage(luma.astype(np.uint8), "L")
        if mode == "RGB":
            return MiniImage(np.repeat(self.arr[..., None], 3, axis=2), "RGB")
        raise ValueError(f"unsupported convert target {mode!r}")

    def resize(self, size: tuple[int, int]) -> "MiniImage":
        w2, h2 = int(size[0]), int(size[1])
        if w2 <= 0 or h2 <= 0:
            raise ValueError(f"bad resize target {size!r}")
        h, w = self.arr.shape[:2]
        # nearest-neighbor with pixel-center sampling: deterministic,
        # exact for integer up/downscales
        yi = np.minimum(((np.arange(h2) + 0.5) * h / h2).astype(np.int64), h - 1)
        xi = np.minimum(((np.arange(w2) + 0.5) * w / w2).astype(np.int64), w - 1)
        return MiniImage(self.arr[yi][:, xi], self.mode)

    def save(self, fp, format: str = "PNG") -> None:
        if format.upper() != "PNG":
            raise ValueError(f"minipng encodes PNG only, not {format!r}")
        h, w = self.arr.shape[:2]
        color_type = 0 if self.mode == "L" else 2
        raw = self.arr.reshape(h, -1)
        # filter byte 0 per scanline
        body = np.concatenate(
            [np.zeros((h, 1), np.uint8), raw], axis=1
        ).tobytes()
        out = [_SIG]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        for tag, data in ((b"IHDR", ihdr), (b"IDAT", zlib.compress(body)),
                          (b"IEND", b"")):
            out.append(struct.pack(">I", len(data)) + tag + data)
            out.append(struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
        fp.write(b"".join(out))


def new(mode: str, size: tuple[int, int], color=0) -> MiniImage:
    w, h = int(size[0]), int(size[1])
    if mode == "L":
        return MiniImage(np.full((h, w), int(color), np.uint8), "L")
    if mode == "RGB":
        c = (color, color, color) if isinstance(color, int) else tuple(color)
        return MiniImage(
            np.broadcast_to(np.array(c, np.uint8), (h, w, 3)).copy(), "RGB"
        )
    raise ValueError(f"unsupported mode {mode!r}")


def _unfilter(comp: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). Row-sequential by spec
    (each row's reconstruction feeds the next); the per-row work is
    numpy except Sub/Paeth's inherently serial byte recurrences, which
    run over a python loop bounded by stride — fixture-scale decode,
    not a data-path kernel."""
    rows = comp.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint16)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.uint16)
        if ftype == 0:
            rec = cur
        elif ftype == 1:  # Sub
            rec = cur.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = cur.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = cur.copy()
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def open(fp) -> MiniImage:  # noqa: A001 - mirrors PIL.Image.open
    data = fp.read() if hasattr(fp, "read") else bytes(fp)
    if data[:8] != _SIG:
        raise ValueError("png: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("png: truncated chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif tag == b"IDAT":
            idat.append(chunk)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    w, h, depth, color_type, comp_m, filt_m, interlace = ihdr
    if depth != 8 or comp_m != 0 or filt_m != 0:
        raise ValueError(f"png: unsupported depth/compression ({depth},{comp_m})")
    if interlace != 0:
        raise ValueError("png: Adam7 interlace unsupported")
    if color_type not in _CHANNELS:
        raise ValueError(f"png: unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("png: bad decompressed length")
    px = _unfilter(np.frombuffer(raw, np.uint8), h, stride, ch).reshape(h, w, ch)
    if ch == 1:
        return MiniImage(px[..., 0], "L")
    if ch == 2:  # gray+alpha: drop alpha
        return MiniImage(px[..., 0], "L")
    return MiniImage(px[..., :3], "RGB")  # RGB / RGBA (alpha dropped)
