from .pipeline import (
    LoadedScene,
    load_molecule_scene,
    load_test_primitives,
    load_random_spheres,
    get_display_options,
    DISPLAY_STYLES,
)
