"""Debug-line overlay and multi-chip sharding tests (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbit_tpu.passes.debug_lines import (
    aabb_segments,
    cross_segments,
    draw_lines,
    frustum_segments,
    sphere_segments,
)
from orbit_tpu.camera import make_perspective_view

pytestmark = pytest.mark.slow  # full-pipeline/multichip lane


def test_debug_lines_draw():
    W, H = 128, 96
    view = make_perspective_view(
        eye=(0.0, 1.0, 4.0), target=(0.0, 0.0, 0.0), aspect=W / H
    )
    segs = np.concatenate(
        [
            aabb_segments([-1, -1, -1], [1, 1, 1]),
            sphere_segments([0, 0, 0], 1.2, segments=12),
            cross_segments([0, 1.5, 0], 0.3),
        ]
    )
    colors = np.tile(np.array([[1.0, 0.2, 0.2]], np.float32), (len(segs), 1))
    img = jnp.zeros((H, W, 3))
    out = draw_lines(img, view.view_proj, jnp.asarray(segs), jnp.asarray(colors))
    out = np.asarray(out)
    assert (out.max(-1) > 0.5).sum() > 50  # lines visible
    # depth-tested variant fades hidden samples
    depth = jnp.full((H, W), 0.9)  # everything very close -> lines occluded
    out2 = np.asarray(
        draw_lines(
            img, view.view_proj, jnp.asarray(segs), jnp.asarray(colors),
            depth=depth, occluded_fade=0.1,
        )
    )
    assert out2.max() <= 0.11


def test_frustum_segments_shape():
    view = make_perspective_view(eye=(0, 0, 5), target=(0, 0, 0))
    # frustum_corners of an infinite projection: use a finite ortho instead
    from orbit_tpu.camera import make_ortho_view

    ov = make_ortho_view((0, 0, 5), (0, 0, 0), (0, 1, 0), 2.0, 2.0, 0.1, 10.0)
    segs = frustum_segments(np.asarray(ov.view_proj))
    assert segs.shape == (12, 2, 3)
    assert np.isfinite(segs).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_multichip_dryrun():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
