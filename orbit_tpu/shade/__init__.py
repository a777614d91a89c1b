"""Deferred shading over the visibility buffer.

Replaces the reference's fragment shaders (forward.frag and friends) with
one vectorized pass per view: resolve per-pixel triangle attributes from
the visibility buffer (gathers + analytic barycentrics), sample materials
(flat-mip-atlas trilinear gathers), and evaluate PBR/IBL + lights.
"""
