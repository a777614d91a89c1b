"""QEM simplifier (C++ meshproc.qem_simplify): error bounds, border
locking, and seam preservation (reference: meshopt_simplify with border
lock, src/assets/mesh.rs:252-290)."""

import numpy as np
import pytest

from orbit_tpu.assets import procedural as proc
from orbit_tpu.assets.lod import build_lod_chain, simplify_qem
from orbit_tpu.native import qem_simplify_native


def _require_native():
    if qem_simplify_native(
        np.zeros((3, 3), np.float32), np.array([0, 1, 2], np.uint32), 1
    ) is None:
        pytest.skip("native meshproc unavailable")


def test_sphere_error_bound():
    _require_native()
    m = proc.uv_sphere(1.0, rings=32, sectors=64)
    n0 = len(m.indices) // 3
    remap, idx, _ = simplify_qem(m.positions, m.indices, n0 // 4)
    n1 = len(idx) // 3
    assert n1 <= n0 // 4 * 1.05
    assert (remap[remap] == remap).all()
    # Hausdorff-style proxy: every collapsed vertex lands on a surviving
    # vertex within a small fraction of the radius
    moved = np.flatnonzero(remap != np.arange(len(remap)))
    d = np.linalg.norm(
        m.positions[moved] - m.positions[remap[moved]], axis=-1
    )
    assert d.max() < 0.35  # ~20 deg arc at 25% triangle budget
    # simplified surface stays near the unit sphere
    used = np.unique(idx)
    r = np.linalg.norm(m.positions[used], axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)


def test_open_boundary_locked():
    """A flat open grid: its rim vertices must never be collapsed away."""
    _require_native()
    m = proc.plane(2.0, segments=12)
    remap, idx, _ = simplify_qem(
        m.positions, m.indices, len(m.indices) // 3 // 3
    )
    p = m.positions
    rim = (
        (np.abs(p[:, 0]) > 1.0 - 1e-6) | (np.abs(p[:, 2]) > 1.0 - 1e-6)
    )
    rim_ids = np.flatnonzero(rim)
    assert (remap[rim_ids] == rim_ids).all(), "rim vertex was collapsed"
    # interior actually simplified
    assert len(idx) < len(m.indices)


def test_material_seam_locked():
    """Two-material grid: vertices on the material boundary line are
    locked, so the seam cannot crack between LODs."""
    _require_native()
    m = proc.plane(2.0, segments=12)
    tris = m.indices.reshape(-1, 3)
    centers = m.positions[tris].mean(axis=1)
    tri_mat = (centers[:, 0] > 0).astype(np.int32)
    remap, idx, new_mat = simplify_qem(
        m.positions, m.indices, len(tris) // 3, tri_mat
    )
    # seam vertices: on x == 0 (excluding rim, which is locked anyway)
    seam = np.flatnonzero(np.abs(m.positions[:, 0]) < 1e-6)
    assert (remap[seam] == seam).all(), "material-seam vertex collapsed"
    assert new_mat is not None and len(new_mat) == len(idx) // 3
    # materials preserved per side
    c2 = m.positions[idx.reshape(-1, 3)].mean(axis=1)
    assert ((c2[:, 0] > 0) == (new_mat == 1)).all()


def test_lod_chain_monotone():
    _require_native()
    m = proc.uv_sphere(1.0, rings=24, sectors=48)
    lods = build_lod_chain(m.positions, m.indices, None, 6, step=0.6)
    counts = [len(i) // 3 for i, _ in lods]
    assert len(counts) >= 4
    assert all(b < a for a, b in zip(counts, counts[1:]))
