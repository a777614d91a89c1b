"""Native meshletizer differential test: the C++ path must produce the
same meshlets as the Python reference implementation."""

import numpy as np
import pytest

from orbit_tpu.assets import procedural as proc
from orbit_tpu.assets.mesh import spatial_sort_triangles
from orbit_tpu.assets.meshlet import build_meshlets
from orbit_tpu.native import get_lib


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
def test_native_matches_python():
    m = proc.uv_sphere(rings=20, sectors=40).finalize()
    order = spatial_sort_triangles(m.positions, m.indices)
    idx = m.indices.reshape(-1, 3)[order].reshape(-1)
    tm = (np.arange(len(idx) // 3) // 97 % 3).astype(np.int32)

    py = build_meshlets(m.positions, idx, tm, use_native=False)
    cc = build_meshlets(m.positions, idx, tm, use_native=True)
    assert len(py) == len(cc)
    for a, b in zip(py, cc):
        # partitioning must be identical
        np.testing.assert_array_equal(a.vertices, b.vertices)
        np.testing.assert_array_equal(a.triangles, b.triangles)
        assert a.material == b.material
        # bounds: FP accumulation differs between numpy and C++; both
        # must be valid (contain all vertices) and near-identical in size
        for sph in (a.sphere, b.sphere):
            d = np.linalg.norm(
                m.positions[b.vertices] - sph[:3], axis=-1
            )
            assert (d <= sph[3] + 1e-4).all()
        assert abs(a.sphere[3] - b.sphere[3]) < 0.02 * (a.sphere[3] + 1e-6)
        assert np.dot(a.cone[:3], b.cone[:3]) > 0.999
        assert abs(a.cone[3] - b.cone[3]) < 2e-2


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
def test_native_speedup():
    import time

    m = proc.uv_sphere(rings=64, sectors=128).finalize()
    order = spatial_sort_triangles(m.positions, m.indices)
    idx = m.indices.reshape(-1, 3)[order].reshape(-1)

    t0 = time.perf_counter()
    cc = build_meshlets(m.positions, idx, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    py = build_meshlets(m.positions, idx, use_native=False)
    t_py = time.perf_counter() - t0
    assert len(cc) == len(py)
    assert t_native < t_py, f"native {t_native:.3f}s vs python {t_py:.3f}s"
