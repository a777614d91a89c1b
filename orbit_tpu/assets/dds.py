"""DDS container parsing + vectorized BCn block decompression.

The reference uploads DDS/BCn textures straight to the GPU, which
samples the compressed blocks in hardware (gltf_loader.rs:24-216
dxgi_format_to_vk + upload_dds_image). A TPU has no BCn sampler and this
framework re-bakes every texture into its flat f32 mip atlas anyway
(assets/textures.py), so the TPU-native equivalent is a load-time CPU
decode to RGBA8 — done here fully vectorized in numpy (one pass of
integer ops over all blocks; no per-block Python loops).

Supported: DXT1/2/3/4/5 fourCC and DX10 BC1-BC5 (UNORM/sRGB/typeless),
plus uncompressed R8G8B8A8/B8G8R8A8/B8G8R8X8. The 8-mode bit-packed
BC6H/BC7 formats decode in assets/bc67.py (BC6H returns float32 HDR
RGB; everything else RGBA8). Only the top mip is decoded — the atlas
bakes its own mip chain.
"""

from __future__ import annotations

import struct

import numpy as np

DDS_MAGIC = b"DDS "

# DXGI format ids (DX10 header)
_DXGI_BC = {
    70: ("bc1", False), 71: ("bc1", False), 72: ("bc1", True),
    73: ("bc2", False), 74: ("bc2", False), 75: ("bc2", True),
    76: ("bc3", False), 77: ("bc3", False), 78: ("bc3", True),
    79: ("bc4", False), 80: ("bc4", False), 81: ("bc4", False),
    82: ("bc5", False), 83: ("bc5", False), 84: ("bc5", False),
}
_DXGI_RGBA8 = {27: False, 28: False, 29: True}  # typeless/unorm/srgb
_DXGI_BGRA8 = {90: False, 91: True}
_DXGI_BC67 = {94, 95, 96, 97, 98, 99}


def is_dds(blob: bytes) -> bool:
    return blob[:4] == DDS_MAGIC


def _rgb565(c):
    """[N] u16 -> [N, 3] u8 with standard 565 expansion."""
    r = ((c >> 11) & 31).astype(np.uint16)
    g = ((c >> 5) & 63).astype(np.uint16)
    b = (c & 31).astype(np.uint16)
    return np.stack(
        [(r * 255 + 15) // 31, (g * 255 + 31) // 63, (b * 255 + 15) // 31],
        axis=-1,
    ).astype(np.uint8)


def _bc1_colors(cblk):
    """cblk: [N, 8] u8 color blocks -> [N, 16, 4] u8 RGBA.

    4-color mode when c0 > c1, else 3-color + transparent black
    (the BC1 punch-through convention)."""
    c0 = cblk[:, 0].astype(np.uint16) | (cblk[:, 1].astype(np.uint16) << 8)
    c1 = cblk[:, 2].astype(np.uint16) | (cblk[:, 3].astype(np.uint16) << 8)
    p0 = _rgb565(c0).astype(np.int32)  # [N, 3]
    p1 = _rgb565(c1).astype(np.int32)
    four = (c0 > c1)[:, None]  # [N, 1]
    p2 = np.where(four, (2 * p0 + p1) // 3, (p0 + p1) // 2)
    p3 = np.where(four, (p0 + 2 * p1) // 3, 0)
    pal = np.stack([p0, p1, p2, p3], axis=1)  # [N, 4, 3]
    a3 = np.where(four[:, 0], 255, 0).astype(np.uint8)  # idx-3 alpha
    palA = np.stack(
        [
            np.full(c0.shape, 255, np.uint8),
            np.full(c0.shape, 255, np.uint8),
            np.full(c0.shape, 255, np.uint8),
            a3,
        ],
        axis=1,
    )  # [N, 4]
    bits = (
        cblk[:, 4].astype(np.uint32)
        | (cblk[:, 5].astype(np.uint32) << 8)
        | (cblk[:, 6].astype(np.uint32) << 16)
        | (cblk[:, 7].astype(np.uint32) << 24)
    )
    idx = (bits[:, None] >> (2 * np.arange(16, dtype=np.uint32))) & 3  # [N,16]
    rgb = np.take_along_axis(
        pal.astype(np.uint8), idx[:, :, None].astype(np.intp), axis=1
    )  # [N, 16, 3]
    a = np.take_along_axis(palA, idx.astype(np.intp), axis=1)  # [N, 16]
    return np.concatenate([rgb, a[:, :, None]], axis=-1)


def _bc4_channel(ablk):
    """ablk: [N, 8] u8 BC4/BC3-alpha blocks -> [N, 16] u8."""
    a0 = ablk[:, 0].astype(np.int32)
    a1 = ablk[:, 1].astype(np.int32)
    # 8-entry palette, both interpolation modes
    k = np.arange(1, 7, dtype=np.int32)
    pal8 = np.concatenate(
        [
            a0[:, None],
            a1[:, None],
            ((7 - k)[None, :] * a0[:, None] + k[None, :] * a1[:, None] + 3)
            // 7,
        ],
        axis=1,
    )  # [N, 8] for a0 > a1
    k4 = np.arange(1, 5, dtype=np.int32)
    pal6 = np.concatenate(
        [
            a0[:, None],
            a1[:, None],
            ((5 - k4)[None, :] * a0[:, None] + k4[None, :] * a1[:, None] + 2)
            // 5,
            np.zeros_like(a0[:, None]),
            np.full_like(a0[:, None], 255),
        ],
        axis=1,
    )  # [N, 8] for a0 <= a1
    pal = np.where((a0 > a1)[:, None], pal8, pal6).astype(np.uint8)
    bits = np.zeros(ablk.shape[0], np.uint64)
    for i in range(6):
        bits |= ablk[:, 2 + i].astype(np.uint64) << np.uint64(8 * i)
    idx = (
        bits[:, None] >> (3 * np.arange(16, dtype=np.uint64))
    ).astype(np.int64) & 7
    return np.take_along_axis(pal, idx, axis=1)


def _blocks_to_image(texels, h, w):
    """texels: [N, 16, C] u8 block texels (row-major inside the 4x4
    block) -> [h, w, C] image."""
    bh, bw = -(-h // 4), -(-w // 4)
    img = (
        texels.reshape(bh, bw, 4, 4, -1)
        .transpose(0, 2, 1, 3, 4)
        .reshape(bh * 4, bw * 4, -1)
    )
    return img[:h, :w]


def decode_bcn(data: bytes, h: int, w: int, kind: str) -> np.ndarray:
    """Decode one mip of BCn blocks to RGBA8 [h, w, 4]."""
    bh, bw = -(-h // 4), -(-w // 4)
    n = bh * bw
    bs = 8 if kind in ("bc1", "bc4") else 16
    blk = np.frombuffer(data, np.uint8, count=n * bs).reshape(n, bs)
    if kind == "bc1":
        tex = _bc1_colors(blk)
    elif kind == "bc2":
        rgb = _bc1_colors(blk[:, 8:])[:, :, :3]
        abits = np.zeros(n, np.uint64)
        for i in range(8):
            abits |= blk[:, i].astype(np.uint64) << np.uint64(8 * i)
        a4 = (
            abits[:, None] >> (4 * np.arange(16, dtype=np.uint64))
        ).astype(np.uint16) & 15
        a = (a4 * 17).astype(np.uint8)
        tex = np.concatenate([rgb, a[:, :, None]], axis=-1)
    elif kind == "bc3":
        rgb = _bc1_colors(blk[:, 8:])[:, :, :3]
        a = _bc4_channel(blk[:, :8])
        tex = np.concatenate([rgb, a[:, :, None]], axis=-1)
    elif kind == "bc4":
        r = _bc4_channel(blk)
        tex = np.stack(
            [r, np.zeros_like(r), np.zeros_like(r), np.full_like(r, 255)],
            axis=-1,
        )
    elif kind == "bc5":
        r = _bc4_channel(blk[:, :8])
        g = _bc4_channel(blk[:, 8:])
        tex = np.stack(
            [r, g, np.zeros_like(r), np.full_like(r, 255)], axis=-1
        )
    else:
        raise ValueError(f"unknown BC kind {kind}")
    return _blocks_to_image(tex, h, w)


def decode_dds(blob: bytes):
    """Decode a DDS blob's top mip. Returns (rgba8 [h, w, 4], srgb_hint:
    bool | None) — srgb_hint is the DX10 header's say (None when the
    legacy header carries no colorspace)."""
    if not is_dds(blob):
        raise ValueError("not a DDS blob")
    (
        size, flags, h, w, pitch, depth, mips,
    ) = struct.unpack_from("<7I", blob, 4)
    # pixel format at offset 76: size, flags, fourCC, bits, masks
    pf_flags, fourcc = struct.unpack_from("<II", blob, 80)
    data_off = 4 + 124
    srgb = None
    if fourcc == struct.unpack("<I", b"DX10")[0]:
        dxgi, rdim, misc, asize, misc2 = struct.unpack_from(
            "<5I", blob, data_off
        )
        data_off += 20
        if dxgi in _DXGI_BC:
            kind, srgb = _DXGI_BC[dxgi]
            return decode_bcn(blob[data_off:], h, w, kind), srgb
        if dxgi in _DXGI_RGBA8:
            img = np.frombuffer(
                blob, np.uint8, count=h * w * 4, offset=data_off
            ).reshape(h, w, 4)
            return img.copy(), _DXGI_RGBA8[dxgi]
        if dxgi in _DXGI_BGRA8:
            img = np.frombuffer(
                blob, np.uint8, count=h * w * 4, offset=data_off
            ).reshape(h, w, 4)
            return img[..., [2, 1, 0, 3]].copy(), _DXGI_BGRA8[dxgi]
        if dxgi in (97, 98, 99):  # BC7 typeless/unorm/srgb
            from orbit_tpu.assets.bc67 import decode_bc7

            return decode_bc7(blob[data_off:], h, w), dxgi == 99
        if dxgi in (94, 95, 96):  # BC6H typeless/UF16/SF16 (HDR -> f32)
            from orbit_tpu.assets.bc67 import decode_bc6h

            return decode_bc6h(blob[data_off:], h, w, dxgi == 96), False
        raise NotImplementedError(f"DDS DXGI format {dxgi}")
    _FOURCC = {
        b"DXT1": "bc1", b"DXT2": "bc2", b"DXT3": "bc2",
        b"DXT4": "bc3", b"DXT5": "bc3",
        b"BC4U": "bc4", b"ATI1": "bc4",
        b"BC5U": "bc5", b"ATI2": "bc5",
    }
    fc = struct.pack("<I", fourcc)
    if pf_flags & 0x4 and fc in _FOURCC:  # DDPF_FOURCC
        return decode_bcn(blob[data_off:], h, w, _FOURCC[fc]), None
    if pf_flags & 0x40:  # DDPF_RGB (uncompressed legacy)
        (pf_bits,) = struct.unpack_from("<I", blob, 88)
        rmask, gmask, bmask, amask = struct.unpack_from("<4I", blob, 92)
        if pf_bits == 32:
            raw = np.frombuffer(
                blob, np.uint32, count=h * w, offset=data_off
            ).reshape(h, w)
            out = np.zeros((h, w, 4), np.uint8)
            for c, m in enumerate([rmask, gmask, bmask, amask]):
                if m:
                    shift = int(m).bit_length() - 8
                    out[..., c] = (raw >> max(shift, 0)) & 0xFF
                elif c == 3:
                    out[..., 3] = 255
            return out, None
    raise NotImplementedError("unsupported legacy DDS pixel format")
