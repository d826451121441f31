from .mesh import (RAY_AXIS, make_mesh, march_sharded,
                   render_frame_sharded, replicate, shard_rays)

__all__ = ["RAY_AXIS", "make_mesh", "march_sharded",
           "render_frame_sharded", "replicate", "shard_rays"]
