from .mesh import (RAY_AXIS, VOL_AXIS, make_mesh, march_sharded,
                   march_volume_sharded, render_frame_sharded, replicate,
                   shard_rays, sweep_volume_sharded)

__all__ = ["RAY_AXIS", "VOL_AXIS", "make_mesh", "march_sharded",
           "march_volume_sharded", "render_frame_sharded", "replicate",
           "shard_rays", "sweep_volume_sharded"]
