from .marcher_xla import RenderOutput, march
from .ray_setup import FrameUniforms, RaySetup, make_rays, make_uniforms
from . import sampling

__all__ = [
    "RenderOutput",
    "march",
    "FrameUniforms",
    "RaySetup",
    "make_rays",
    "make_uniforms",
    "sampling",
]
