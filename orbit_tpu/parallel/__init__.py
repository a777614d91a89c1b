from orbit_tpu.parallel.multichip import (  # noqa: F401
    frame_sharded,
    make_render_mesh,
    render_frame_sharded,
    stack_pytrees,
)
