"""Render passes: shadows, clustering, SSAO, bloom, post-process.

Each pass is a pure traced function over device arrays; the render graph
(orbit_tpu/graph/) names and times them for parity with the reference's
pass/graph debugger (context.rs:1548-1641).
"""
