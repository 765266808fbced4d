"""webgl_raytracer_tpu — a TPU-native molecular path-tracing framework.

A from-scratch rebuild of the capabilities of the reference WebGL2 molecular
path tracer (Syntopia/webgl_raytracer, see /root/reference and SURVEY.md):
PDB/SDF/MOL import, ball-and-stick / space-filling / stick / cartoon display
styles, SES surfaces and density volumes, and a progressive Monte-Carlo path
tracer over a unified sphere/cylinder/triangle SAH BVH with physically based
materials, analytic-sky + HDR environment lighting (CDF importance sampled),
camera-relative studio lights with MIS, thin-lens depth of field and ray
picking.

Architecture (TPU-first, not a port):
  models/    molecular data -> renderable primitives (parsers, cartoon, SES,
             density volumes) — host-side numpy, vectorized
  scene/     BVH build/flatten + scene compile to device SoA arrays, CPU
             oracle tracer, camera math
  ops/       device kernels: intersectors, BVH traversal, BRDF sampling,
             environment CDF sampling, tone mapping — jitted JAX / Pallas
  render/    the wavefront path-tracing integrator, progressive accumulation,
             render/frame API, config registry
  env/       HDR decode, Preetham/Perez analytic sky, CDF build, env cache
  parallel/  device-mesh sharding of frame tiles (shard_map + psum over ICI)
  utils/     logging, formatting
  app/       headless CLI (render / bench / pick)
"""

__version__ = "0.1.0"
