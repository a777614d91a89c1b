from orbit_tpu.graph.render_graph import pass_scope, GraphProfiler  # noqa: F401
