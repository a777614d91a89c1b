from orbit_tpu.parallel.multichip import (  # noqa: F401
    make_render_mesh,
    render_frame_sharded,
)
