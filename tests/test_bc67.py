"""BC7 / BC6H decode: differential fuzz against Pillow's independent
BCn decoder + exact-mode hand-built blocks.

The reference consumes the full DXGI BCn matrix (gltf_loader.rs:95-105);
assets/bc67.py decodes the two 8-mode formats in vectorized numpy.
Pillow >= 9 carries its own C BCn decoder (BcnDecode.c), giving a truly
independent oracle for every mode, partition and bit-layout choice.
"""

import io
import struct

import numpy as np
import pytest

from orbit_tpu.assets.bc67 import (
    decode_bc6h_blocks,
    decode_bc7_blocks,
)
from orbit_tpu.assets.dds import decode_dds


def _dds_dx10(dxgi, h, w, payload: bytes) -> bytes:
    hdr = b"DDS " + struct.pack("<7I", 124, 0x1007, h, w, 0, 0, 1)
    hdr += b"\0" * 44
    hdr += struct.pack("<II", 32, 0x4) + b"DX10"
    hdr += struct.pack("<5I", 0, 0, 0, 0, 0)
    hdr += struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    hdr += struct.pack("<5I", dxgi, 3, 0, 1, 0)
    return hdr + payload


def _pillow_rgba(dxgi, h, w, payload):
    from PIL import Image

    im = Image.open(io.BytesIO(_dds_dx10(dxgi, h, w, payload)))
    return np.asarray(im.convert("RGBA"))


def _rand_bc7_blocks(rng, mode, n):
    blk = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    blk[:, 0] = np.uint8((blk[:, 0] << (mode + 1)) | (1 << mode))
    return blk


@pytest.mark.parametrize("mode", range(8))
def test_bc7_modes_match_pillow(mode):
    rng = np.random.default_rng(100 + mode)
    n = 256  # enough blocks to hit every partition/rotation/idx-sel
    blk = _rand_bc7_blocks(rng, mode, n)
    mine = decode_bc7_blocks(blk)  # [n, 16, 4]
    w = 4 * n
    ref = _pillow_rgba(98, 4, w, blk.tobytes())  # one row of blocks
    ref_blocks = (
        ref.reshape(4, n, 4, 4).transpose(1, 0, 2, 3).reshape(n, 16, 4)
    )
    np.testing.assert_array_equal(mine, ref_blocks)


def test_bc7_invalid_block_is_zero():
    blk = np.zeros((1, 16), np.uint8)  # byte0 == 0: no mode bit
    out = decode_bc7_blocks(blk)
    assert (out == 0).all()


# BC6H mode codes -> (is_two_region); covers all 14 legal modes
_BC6_CODES = [0, 1, 2, 6, 10, 14, 18, 22, 26, 30, 3, 7, 11, 15]


def _rand_bc6_blocks(rng, code, n):
    blk = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    if code < 2:
        blk[:, 0] = np.uint8((blk[:, 0] & 0xFC) | code)
    else:
        blk[:, 0] = np.uint8((blk[:, 0] & 0xE0) | code)
    return blk


@pytest.mark.parametrize("code", _BC6_CODES)
def test_bc6h_unsigned_modes_match_pillow(code):
    rng = np.random.default_rng(200 + code)
    n = 256
    blk = _rand_bc6_blocks(rng, code, n)
    mine = decode_bc6h_blocks(blk, signed=False)  # [n, 16, 3] f32
    # Pillow decodes BC6H to u8 RGB by clamp(x)*255 per channel:
    # compare in that quantized domain (+-1.5 for its float rounding)
    ref = _pillow_rgba(95, 4, 4 * n, blk.tobytes())[..., :3]
    ref_blocks = (
        ref.reshape(4, n, 4, 3).transpose(1, 0, 2, 3).reshape(n, 16, 3)
    ).astype(np.float32)
    mine_q = np.clip(mine, 0.0, 1.0) * 255.0
    err = np.abs(mine_q - ref_blocks)
    assert err.max() <= 1.5, (
        f"mode code {code}: max u8 err {err.max()}"
    )


def _make_bc6_nonwrapping_signed_blocks(code, n, rng):
    """Construct signed blocks whose transformed endpoints never wrap
    and stay non-negative. There the spec's re-sign-extension (which we
    implement, matching DirectXTex) and Pillow's skipped re-extension
    agree exactly, so the bit LAYOUT can still be differentially
    fuzzed against Pillow for every signed mode."""
    from orbit_tpu.assets.bc67 import _BC6_MODES, _D

    epb, delta, fields = _BC6_MODES[code]
    vals = np.zeros((n, 13), np.int64)
    for dest in range(12):
        c = dest % 3
        if delta is None:
            # untransformed: any non-negative signed value
            vals[:, dest] = rng.integers(0, 1 << (epb - 1), n)
        elif dest < 3:
            # base endpoint: keep sum with any small delta inside the
            # non-negative signed range
            db = max(delta[c] - 2, 1)
            vals[:, dest] = rng.integers(0, (1 << (epb - 1)) - (1 << db), n)
        else:
            # small positive delta (top bits clear)
            vals[:, dest] = rng.integers(0, 1 << max(delta[c] - 2, 1), n)
    vals[:, _D] = rng.integers(0, 32, n)

    bits = np.zeros((n, 128), np.uint8)
    nm = 2 if code < 2 else 5
    for k in range(nm):
        bits[:, k] = (code >> k) & 1
    off = nm
    for dest, dbit, cnt in fields:
        w = abs(cnt)
        seg = (vals[:, dest] >> dbit) & ((1 << w) - 1)
        for k in range(w):
            sk = (w - 1 - k) if cnt < 0 else k
            bits[:, off + k] = (seg >> sk) & 1
        off += w
    bits[:, off:] = rng.integers(0, 2, (n, 128 - off))
    return np.packbits(bits, axis=1, bitorder="little")


@pytest.mark.parametrize("code", _BC6_CODES)
def test_bc6h_signed_modes_match_pillow(code):
    rng = np.random.default_rng(300 + code)
    n = 256
    blk = _make_bc6_nonwrapping_signed_blocks(code, n, rng)
    mine = decode_bc6h_blocks(blk, signed=True)
    ref = _pillow_rgba(96, 4, 4 * n, blk.tobytes())[..., :3]
    ref_blocks = (
        ref.reshape(4, n, 4, 3).transpose(1, 0, 2, 3).reshape(n, 16, 3)
    ).astype(np.float32)
    mine_q = np.clip(mine, 0.0, 1.0) * 255.0
    err = np.abs(mine_q - ref_blocks)
    assert err.max() <= 1.5, (
        f"signed mode code {code}: max u8 err {err.max()}"
    )


def test_bc6h_solid_exact_half():
    """Mode 11 (10.10 untransformed), both endpoints equal: every texel
    decodes to finish_unquantize(unquantize(e)) exactly."""
    e = 0x155  # arbitrary 10-bit endpoint
    bits = np.zeros(128, np.uint8)
    for k in range(5):
        bits[k] = (0b00011 >> k) & 1
    for base in (5, 35):  # rw, rx (red channel of both endpoints)
        for k in range(10):
            bits[base + k] = (e >> k) & 1
    blk = np.packbits(bits, bitorder="little")[None]
    out = decode_bc6h_blocks(blk, signed=False)
    uq = ((e << 16) + 0x8000) >> 10
    half_bits = (uq * 31) >> 6
    expect = np.frombuffer(
        struct.pack("<H", half_bits), np.float16
    )[0]
    np.testing.assert_allclose(out[0, :, 0], np.float32(expect))
    assert (out[0, :, 1:] == 0).all()


def test_bc7_mode5_solid_color():
    """Mode 5, e0 == e1, all indices 0: texels are the expanded e0."""
    bits = np.zeros(128, np.uint8)
    bits[5] = 1  # mode 5 (100000 LSB-first)
    # rot = 0 (bits 6..7); endpoints R0=R1=0x55, G=0x2A, B=0x7F (7-bit)
    vals = [0x55, 0x55, 0x2A, 0x2A, 0x7F, 0x7F]
    off = 8
    for v in vals:
        for k in range(7):
            bits[off + k] = (v >> k) & 1
        off += 7
    # alpha A0 = A1 = 0xC3 (8-bit)
    for v in (0xC3, 0xC3):
        for k in range(8):
            bits[off + k] = (v >> k) & 1
        off += 8
    blk = np.packbits(bits, bitorder="little")[None]
    out = decode_bc7_blocks(blk)

    def expand7(v):
        x = v << 1  # 8-bit with low bit 0
        return x | (x >> 7)

    assert (out[0, :, 0] == expand7(0x55)).all()
    assert (out[0, :, 1] == expand7(0x2A)).all()
    assert (out[0, :, 2] == expand7(0x7F)).all()
    assert (out[0, :, 3] == 0xC3).all()


def test_dds_bc7_roundtrip_via_decode_dds():
    rng = np.random.default_rng(7)
    blk = _rand_bc7_blocks(rng, 6, 4)  # 16x4 image, mode 6
    img, srgb = decode_dds(_dds_dx10(99, 4, 16, blk.tobytes()))
    assert img.shape == (4, 16, 4) and img.dtype == np.uint8
    assert srgb is True
    ref = _pillow_rgba(98, 4, 16, blk.tobytes())
    np.testing.assert_array_equal(img, ref)


def test_dds_bc6h_returns_float_hdr():
    rng = np.random.default_rng(8)
    blk = _rand_bc6_blocks(rng, 3, 4)
    img, srgb = decode_dds(_dds_dx10(95, 4, 16, blk.tobytes()))
    assert img.shape == (4, 16, 3) and img.dtype == np.float32
    assert srgb is False
