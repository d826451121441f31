"""Engine-level tests: renderer selection, TF-edit rebuild dirty-tracking,
multi-volume blending, benchmark-mode stats (the reference's interactive
update path, src/volume_render.cpp:392-445)."""

import numpy as np
import pytest

from vkvolume_tpu.camera import orbit_camera
from vkvolume_tpu.engine import (
    Engine,
    RenderOptions,
    SkippingType,
    VolumeOptions,
    from_array,
)
from vkvolume_tpu.options import Test as RT
from vkvolume_tpu.utils import math3d

from util import sphere_shell_volume


def _engine(renderer="marcher", skipping=SkippingType.DISTANCE, n=40,
            benchmark=False, **vol_kw):
    vol = sphere_shell_volume(n)
    opts = VolumeOptions(intensity_min=vol_kw.pop("imin", 0.1),
                         gradient_min=0.0, gradient_max=0.0, **vol_kw)
    eng = Engine(RenderOptions(skipping_type=skipping), renderer=renderer,
                 benchmark_mode=benchmark)
    v = from_array(vol, opts, block_size=4)
    v.set_scale((100.0 / n,) * 3)
    stats = eng.add_volume(v)
    return eng, v, stats


CAM = orbit_camera(radius=220.0, azimuth_deg=30, elevation_deg=20, aspect=1.0)


def test_marcher_and_sweep_agree():
    out_m = _engine("marcher")[0].render(CAM, 32, 32)
    out_s = _engine("sweep")[0].render(CAM, 32, 32)
    a = np.asarray(out_m.color)
    b = np.asarray(out_s.color)
    assert np.abs(a - b).max() < 0.06
    assert abs(a[..., 3].mean() - b[..., 3].mean()) < 2e-3


def test_pallas_renderer_falls_back_on_cpu_small():
    # Tiny volume violates the kernel constraints → engine silently uses the
    # XLA sweep; output must still be correct.
    eng, _, _ = _engine("pallas")
    out = eng.render(CAM, 32, 32)
    assert eng.last_renderer == "sweep"
    ref = _engine("sweep")[0].render(CAM, 32, 32)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=1e-6)


def test_tf_edit_rebuilds_maps():
    eng, vol, _ = _engine("marcher")
    maps_before = np.asarray(vol.dist_maps).copy()
    vol.options.intensity_min = 0.6          # much sparser TF
    eng.update_transfer_function(vol)
    maps_after = np.asarray(vol.dist_maps)
    assert (maps_after != maps_before).any()
    # sparser TF ⇒ fewer occupied cells ⇒ distances grow
    assert maps_after.astype(int).mean() > maps_before.astype(int).mean()


def test_skipping_type_change_rebuilds():
    eng, vol, _ = _engine("marcher", skipping=SkippingType.DISTANCE)
    assert vol.dist_maps.shape[0] == 1
    eng.set_skipping_type(SkippingType.ANISOTROPIC_DISTANCE)
    assert vol.dist_maps.shape[0] == 8


def test_benchmark_mode_stats():
    eng, vol, stats = _engine("marcher", benchmark=True)
    assert stats.occupied_voxel_percent is not None
    assert 0.0 < stats.occupied_voxel_percent < 100.0
    assert stats.map_update_ms is not None and stats.map_update_ms > 0
    assert eng.options.test == RT.NUM_TEXTURE_SAMPLES
    assert not eng.options.early_ray_termination
    assert eng.options.clip_distance == 1.0


def test_multi_volume_blend():
    n = 32
    vol = sphere_shell_volume(n)
    opts = VolumeOptions(intensity_min=0.1, gradient_min=0.0, gradient_max=0.0)
    eng = Engine(RenderOptions(skipping_type=SkippingType.DISTANCE),
                 renderer="marcher")
    v1 = from_array(vol, opts, block_size=4, name="a")
    v1.set_scale((100.0 / n,) * 3)
    v1.node_transform = math3d.translate((-30, 0, 0)) @ v1.node_transform
    v2 = from_array(vol, opts, block_size=4, name="b")
    v2.set_scale((100.0 / n,) * 3)
    v2.node_transform = math3d.translate((30, 0, 0)) @ v2.node_transform
    eng.add_volume(v1)
    eng.add_volume(v2)
    out = eng.render(CAM, 48, 48)
    single = Engine(RenderOptions(skipping_type=SkippingType.DISTANCE),
                    renderer="marcher")
    v3 = from_array(vol, opts, block_size=4)
    v3.set_scale((100.0 / n,) * 3)
    v3.node_transform = math3d.translate((-30, 0, 0)) @ v3.node_transform
    single.add_volume(v3)
    out_single = single.render(CAM, 48, 48)
    # two volumes cover at least as many pixels as one
    assert (np.asarray(out.color)[..., 3] > 0).sum() >= (
        np.asarray(out_single.color)[..., 3] > 0
    ).sum()


def test_render_image_composites_over_background():
    eng, _, _ = _engine("marcher")
    img = eng.render_image(CAM, 32, 32, background=(1.0, 0.0, 0.0))
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    # uncovered pixels show the red background
    assert (img[0, 0] == [255, 0, 0]).all()


def test_accel_cache_roundtrip(tmp_path):
    """Checkpoint/resume of acceleration structures (SURVEY.md §5)."""
    from vkvolume_tpu.engine import Engine, RenderOptions, from_array

    n = 24
    vol = sphere_shell_volume(n)
    opts = VolumeOptions(intensity_min=0.1, gradient_min=0.0, gradient_max=0.0)

    eng1 = Engine(RenderOptions(skipping_type=SkippingType.DISTANCE),
                  renderer="marcher", accel_cache_dir=str(tmp_path))
    v1 = from_array(vol, opts, block_size=4)
    eng1.add_volume(v1)
    maps1 = np.asarray(v1.dist_maps)
    grad1 = np.asarray(v1.gradient)

    eng2 = Engine(RenderOptions(skipping_type=SkippingType.DISTANCE),
                  renderer="marcher", accel_cache_dir=str(tmp_path))
    v2 = from_array(vol, opts, block_size=4)
    stats = eng2.add_volume(v2)
    # restored, not recomputed
    assert stats.map_update_ms is None
    np.testing.assert_array_equal(np.asarray(v2.dist_maps), maps1)
    np.testing.assert_array_equal(np.asarray(v2.gradient), grad1)

    # different TF → different key → rebuild happens
    opts3 = VolumeOptions(intensity_min=0.5, gradient_min=0.0, gradient_max=0.0)
    eng3 = Engine(RenderOptions(skipping_type=SkippingType.DISTANCE),
                  renderer="marcher", accel_cache_dir=str(tmp_path))
    v3 = from_array(vol, opts3, block_size=4)
    stats3 = eng3.add_volume(v3)
    assert stats3.map_update_ms is not None
