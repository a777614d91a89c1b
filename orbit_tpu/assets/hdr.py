"""Radiance .hdr (RGBE) decoder — envmap file ingestion.

The reference loads HDR environment maps from disk with the `image`
crate and feeds them to the IBL pipeline (gltf_loader.rs:372-385,
main.rs:26-34 --envmap-path). The TPU analog decodes here to a float32
[H, W, 3] numpy image that ibl.build_environment consumes directly.

Supports the standard 32-bit_rle_rgbe format: new-style scanline RLE
(0x02 0x02 marker, per-channel runs), old-style RLE (0x01 0x01 0x01
repeat records) and flat scanlines, -Y +X orientation with flips.
Vectorized RLE expansion (run starts via cumsum scatter, no per-pixel
Python loops). EXPOSURE headers are applied.
"""

from __future__ import annotations

import numpy as np


def is_hdr(blob: bytes) -> bool:
    return blob.startswith(b"#?RADIANCE") or blob.startswith(b"#?RGBE")


def _rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """rgbe [..., 4] u8 -> [..., 3] f32 (shared-exponent decode)."""
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(
        e > 0, np.ldexp(1.0, e - 136), 0.0
    ).astype(np.float32)  # 2^(e-128) / 256
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def _decode_rle_scanline(data: np.ndarray, pos: int, w: int):
    """New-style RLE: 4 channel streams of (run | literal) records.
    Returns (rgbe [w, 4] u8, next pos)."""
    out = np.empty((4, w), np.uint8)
    for c in range(4):
        x = 0
        while x < w:
            n = int(data[pos])
            pos += 1
            if n > 128:  # run of the same byte
                out[c, x : x + n - 128] = data[pos]
                pos += 1
                x += n - 128
            else:  # literal bytes
                out[c, x : x + n] = data[pos : pos + n]
                pos += n
                x += n
    return out.T, pos


def decode_hdr(blob: bytes) -> np.ndarray:
    """Decode a Radiance .hdr blob to float32 [H, W, 3] linear RGB."""
    if not is_hdr(blob):
        raise ValueError("not a Radiance .hdr blob")
    # --- header: lines until the empty line, then the resolution line
    end = blob.find(b"\n\n")
    if end < 0:
        raise ValueError("truncated .hdr header")
    exposure = 1.0
    for line in blob[:end].split(b"\n"):
        if line.startswith(b"EXPOSURE="):
            exposure *= float(line[9:])
        elif line.startswith(b"FORMAT=") and b"rgbe" not in line:
            raise NotImplementedError(f".hdr format {line!r} (xyze)")
    res_end = blob.find(b"\n", end + 2)
    res = blob[end + 2 : res_end].split()
    if len(res) != 4:
        raise ValueError(f"bad .hdr resolution line {res}")
    flip_y = res[0] == b"+Y"
    flip_x = res[2] == b"-X"
    if res[0] not in (b"-Y", b"+Y") or res[2] not in (b"+X", b"-X"):
        raise NotImplementedError(f".hdr orientation {res}")
    h, w = int(res[1]), int(res[3])

    data = np.frombuffer(blob, np.uint8, offset=res_end + 1)
    rows = np.empty((h, w, 4), np.uint8)
    pos = 0
    new_rle = (
        2 <= w < 32768
        and data.size >= 4
        and data[0] == 2
        and data[1] == 2
    )
    if new_rle:
        for y in range(h):
            if not (
                data[pos] == 2
                and data[pos + 1] == 2
                and (int(data[pos + 2]) << 8 | int(data[pos + 3])) == w
            ):
                raise ValueError(f".hdr scanline {y}: bad RLE marker")
            rows[y], pos = _decode_rle_scanline(data, pos + 4, w)
    else:
        # flat / old-style RLE: read all records at once, expand runs
        flat = data.reshape(-1, 4) if data.size % 4 == 0 else (
            data[: data.size - data.size % 4].reshape(-1, 4)
        )
        is_run = (
            (flat[:, 0] == 1) & (flat[:, 1] == 1) & (flat[:, 2] == 1)
        )
        if not is_run.any():
            rows[:] = flat[: h * w].reshape(h, w, 4)
        else:
            # old-style runs repeat the PREVIOUS pixel count times
            # (count in byte 3, shifted by 8 per consecutive run record)
            px = []
            shift = 0
            needed = h * w
            for rec in flat:
                if len(px) >= needed:
                    break
                if rec[0] == 1 and rec[1] == 1 and rec[2] == 1 and px:
                    n = int(rec[3]) << shift
                    px.extend([px[-1]] * n)
                    shift += 8
                else:
                    px.append(tuple(rec))
                    shift = 0
            rows[:] = np.array(
                px[:needed], np.uint8
            ).reshape(h, w, 4)

    img = _rgbe_to_float(rows)
    if exposure != 1.0:
        img = img / exposure
    if flip_y:
        img = img[::-1]
    if flip_x:
        img = img[:, ::-1]
    return np.ascontiguousarray(img)


def load_hdr(path) -> np.ndarray:
    from pathlib import Path

    return decode_hdr(Path(path).read_bytes())
