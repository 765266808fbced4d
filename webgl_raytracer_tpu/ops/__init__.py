"""Device kernels: the TPU-native equivalents of the reference GLSL layer.

Everything here is elementwise/jittable JAX (with Pallas variants for the
hottest paths), operating on flat ray batches of arbitrary shape.
"""

from .rng import pcg_hash, init_seed, rand, rand2
from .traversal import HitRecord, trace_any, trace_closest
from . import intersect, sampling, brdf, envmap, tonemap
