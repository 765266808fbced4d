"""Scene-generation models: molecular parsing and geometry generators.

Mirrors the capability surface of the reference's L3 scene-generation layer
(/root/reference/src/molecular.js, cartoon.js, surface_webgl.js, volume.js).
"""

from .elements import (
    ELEMENT_COLORS,
    ELEMENT_RADII,
    COVALENT_RADII,
    BOND_RADIUS,
    BOND_COLOR,
    element_color,
    element_radius,
    covalent_radius,
)
from .molecular import (
    MolData,
    Geometry,
    parse_pdb,
    parse_sdf,
    parse_auto_detect,
    molecule_to_geometry,
    split_by_hetatm,
    fetch_pdb,
    get_builtin_molecule,
    BUILTIN_MOLECULE_NAMES,
)
