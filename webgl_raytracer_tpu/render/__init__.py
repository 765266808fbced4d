"""The progressive path-tracing renderer: config registry, integrator,
frame/accumulation management, lights, picking."""

from .config import RenderSettings, StaticFlags, Uniforms, MATERIAL_MODES
from .lights import camera_relative_light_dir
from .frame import Renderer
