"""orbit-tpu: a TPU-native real-time rendering framework in JAX/XLA/Pallas.

A brand-new implementation of the capabilities of Thefefe/orbit (a bindless
GPU-driven Vulkan renderer): glTF scene loading, meshlet geometry pipeline,
two-level GPU-driven culling (frustum / normal-cone / two-pass HiZ occlusion),
a tiled software rasterizer, clustered-forward PBR/IBL shading, cascaded
shadow maps, SSAO, bloom, MSAA-style resolve and HDR tonemapping — all
running on-device as one traced XLA program with zero host round-trips.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
  math/      pure math: transforms, frusta, sphere projection, packing
  assets/    offline asset pipeline: glTF, meshlets, LODs, texture arrays
  cull/      entity + meshlet culling, HiZ pyramid, visibility bitsets
  raster/    binning + tiled Pallas software rasterizer (visibility buffer)
  shade/     BRDF, IBL preprocessing, texture sampling, deferred PBR shade
  passes/    shadow cascades, light clustering, SSAO, bloom, post-process
  graph/     render-graph scheduler: named passes, timing, graph dump
  parallel/  multi-chip meshes: framebuffer-sharded rendering via shard_map
"""

__version__ = "0.1.0"
