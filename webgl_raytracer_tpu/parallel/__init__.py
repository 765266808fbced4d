"""Multi-chip scaling: frame tiles sharded over a device mesh.

The scene is read-only during tracing, so there is no parameter-sync
problem: scene/env/volume arrays are replicated to every chip, the flat
pixel/ray batch is sharded over the mesh's 'tiles' axis, and each chip
traces its shard independently. Cross-chip communication happens only at
readout (image gather) or when samples-per-pixel are sharded (psum over
ICI). See SURVEY.md §2.13.
"""

from .mesh import (
    make_mesh,
    replicate_scene,
    shard_rays,
    render_tiles_sharded,
)
