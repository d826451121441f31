"""Multi-device tests on the virtual 8-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vkvolume_tpu.accel import isotropic_distance
from vkvolume_tpu.options import SkippingType
from vkvolume_tpu.parallel import make_mesh, march_sharded

from test_render import _march, _setup
from util import sphere_shell_volume


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_march_matches_single_device():
    vol = sphere_shell_volume(32)
    s = _setup(vol, size=24)
    single = _march(vol, s, SkippingType.DISTANCE)

    mesh = make_mesh(8)
    dist_maps = isotropic_distance(s["occ"])[None]
    sharded = march_sharded(
        mesh,
        jnp.asarray(vol), s["grad"], dist_maps, s["tf"], s["rays"],
        jnp.asarray(s["bs"]), s["pvm"],
        skipping_type=SkippingType.DISTANCE,
        early_ray_termination=True,
        count_samples=True,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.color), np.asarray(single.color), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.num_volume_samples),
        np.asarray(single.num_volume_samples),
    )


def test_sharded_output_is_sharded():
    vol = sphere_shell_volume(32)
    s = _setup(vol, size=16)
    mesh = make_mesh(8)
    dist_maps = isotropic_distance(s["occ"])[None]
    out = march_sharded(
        mesh,
        jnp.asarray(vol), s["grad"], dist_maps, s["tf"], s["rays"],
        jnp.asarray(s["bs"]), s["pvm"],
        skipping_type=SkippingType.DISTANCE,
    )
    # Output keeps the row sharding — one gather-free tile per device.
    shard_devs = {sh.device for sh in out.color.addressable_shards}
    assert len(shard_devs) == 8


def test_mesh_size_validation():
    vol = sphere_shell_volume(32)
    s = _setup(vol, size=12)  # 12 rows not divisible by 8
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        march_sharded(
            mesh,
            jnp.asarray(vol), s["grad"], s["occ"][None], s["tf"], s["rays"],
            jnp.asarray(s["bs"]), s["pvm"],
            skipping_type=SkippingType.BLOCK,
        )
