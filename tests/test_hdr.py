"""Radiance .hdr (RGBE) decode: differential vs OpenCV's independent
encoder/decoder + envmap-file ingestion through ibl.build_environment
(reference: gltf_loader.rs:372-385 + main.rs --envmap-path)."""

import numpy as np
import pytest

from orbit_tpu.assets.hdr import decode_hdr, is_hdr, load_hdr

cv2 = pytest.importorskip("cv2")


def _roundtrip_image(rng, h, w, scale=10.0):
    return (rng.random((h, w, 3)) * scale).astype(np.float32)


def test_hdr_decode_matches_opencv_writer(tmp_path):
    rng = np.random.default_rng(0)
    img = _roundtrip_image(rng, 64, 128)
    p = str(tmp_path / "env.hdr")
    assert cv2.imwrite(p, img[..., ::-1])  # cv2 is BGR
    blob = open(p, "rb").read()
    assert is_hdr(blob)
    mine = decode_hdr(blob)
    assert mine.shape == (64, 128, 3) and mine.dtype == np.float32
    # RGBE is ~2^-8 relative precision; both decoders must agree exactly
    theirs = cv2.imread(p, cv2.IMREAD_UNCHANGED)[..., ::-1]
    np.testing.assert_allclose(mine, theirs, rtol=0, atol=0)
    # and match the source within RGBE quantization: one 8-bit mantissa
    # shared across a pixel's channels -> absolute error scales with the
    # pixel's MAX channel (small channels lose bits), ~1/256 relative
    tol = img.max(axis=-1, keepdims=True) * (2.5 / 256.0)
    assert (np.abs(mine - img) <= tol).all()


def test_hdr_decode_flat_scanlines():
    """Hand-built flat (non-RLE) file with known RGBE pixels."""
    h, w = 2, 4
    # pixel (1.0, 0.5, 0.25): mantissas 128,64,32 exponent 128 (2^0)
    rgbe = np.tile(
        np.array([128, 64, 32, 129], np.uint8), (h, w, 1)
    )
    blob = (
        b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
        + f"-Y {h} +X {w}\n".encode()
        + rgbe.tobytes()
    )
    img = decode_hdr(blob)
    np.testing.assert_allclose(img[..., 0], 1.0)
    np.testing.assert_allclose(img[..., 1], 0.5)
    np.testing.assert_allclose(img[..., 2], 0.25)


def test_hdr_wide_image_rle(tmp_path):
    rng = np.random.default_rng(1)
    # constant rows exercise long RLE runs; >255-px rows exercise the
    # run-splitting path of the writer
    img = np.repeat(
        (rng.random((8, 1, 3)) * 4).astype(np.float32), 300, axis=1
    )
    p = str(tmp_path / "runs.hdr")
    assert cv2.imwrite(p, img[..., ::-1])
    mine = load_hdr(p)
    theirs = cv2.imread(p, cv2.IMREAD_UNCHANGED)[..., ::-1]
    np.testing.assert_allclose(mine, theirs, rtol=0, atol=0)


def test_build_environment_from_hdr_path(tmp_path):
    from orbit_tpu.shade import ibl

    rng = np.random.default_rng(2)
    img = _roundtrip_image(rng, 32, 64, scale=3.0)
    p = str(tmp_path / "sky.hdr")
    assert cv2.imwrite(p, img[..., ::-1])
    env = ibl.build_environment(
        p, cube_res=16, irr_res=8, spec_mips=2, spec_samples=8,
        brdf_res=8, brdf_samples=8,
    )
    ref = ibl.build_environment(
        cv2.imread(p, cv2.IMREAD_UNCHANGED)[..., ::-1].copy(),
        cube_res=16, irr_res=8, spec_mips=2, spec_samples=8,
        brdf_res=8, brdf_samples=8,
    )
    np.testing.assert_allclose(
        np.asarray(env.sh_irradiance), np.asarray(ref.sh_irradiance)
    )
    np.testing.assert_allclose(
        np.asarray(env.spec_data), np.asarray(ref.spec_data)
    )


def test_build_environment_from_bc6h_dds_bytes():
    """A BC6H-compressed equirect feeds the env pipeline as float HDR."""
    import io
    import struct

    from orbit_tpu.shade import ibl

    rng = np.random.default_rng(3)
    n = (8 // 4) * (16 // 4)
    blk = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    blk[:, 0] = np.uint8((blk[:, 0] & 0xE0) | 0x03)  # mode 11 (10.10)
    hdr = b"DDS " + struct.pack("<7I", 124, 0x1007, 8, 16, 0, 0, 1)
    hdr += b"\0" * 44
    hdr += struct.pack("<II", 32, 0x4) + b"DX10"
    hdr += struct.pack("<5I", 0, 0, 0, 0, 0)
    hdr += struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    hdr += struct.pack("<5I", 95, 3, 0, 1, 0)
    env = ibl.build_environment(
        hdr + blk.tobytes(), cube_res=8, irr_res=4, spec_mips=1,
        spec_samples=4, brdf_res=4, brdf_samples=4,
    )
    assert np.isfinite(np.asarray(env.sh_irradiance)).all()
