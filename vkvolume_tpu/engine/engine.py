"""Engine — the application orchestrator.

Functional replacement for ``VolumeRender`` (src/volume_render.cpp:99-445):
owns the volumes, their acceleration structures and the render options;
tracks which structures are stale after option edits (the reference's
TF-slider → ``update_transfer_function`` → occupancy + distance rebuild path,
src/volume_render.cpp:392-445 and draw_gui :447-547); and drives per-frame
rendering. Vulkan instance/device/swapchain/fence management collapses into
jit dispatch + ``block_until_ready``.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.distance import anisotropic_distance, isotropic_distance
from ..accel.gradient import gradient_map
from ..accel.occupancy import occupancy_map, occupied_voxel_count
from ..render.marcher_xla import RenderOutput, march
from ..render.ray_setup import make_rays, make_uniforms
from ..tf.transfer_function import bake_texture, tf_params
from ..options import RenderOptions, SkippingType, Test
from .volume import Volume


import functools


@jax.jit
def _octant_composite(maps, kz, ky, kx):
    """Per-cell octant-selected skip map for a pinhole camera.

    The reference selects the distance map per RAY by the ray's direction
    octant (volume_render.frag:209, binding of 8 maps at
    volume_render_subpass.cpp:273-284). For a pinhole camera the direction
    of the ray through any point c is c - cam, so the selected octant is a
    pure function of WHICH SIDE of the camera's three axis planes the
    sample lies on: idx = (z<kz) + 2*(y<ky) + 4*(x<kx) (the map convention
    idx = (dz<0) + 2*(dy<0) + 4*(dx<0), accel/distance.py:178). Stitching
    the 8 maps along those planes therefore reproduces the reference's
    per-ray selection EXACTLY — for every ray at once, with no kernel
    change — as 7 where-combines instead of a per-element gather.

    ``maps`` is the (8, mz, my, mx) u8 stack; ``kz/ky/kx`` the camera
    position in MAP-CELL coordinates per axis (voxel / block_size). A map
    cell whose voxel extent straddles a camera plane carries rays of both
    direction signs; that one-cell layer takes the elementwise min of the
    two sides (conservative, identical occupied set)."""
    def combine(a, b, n, k, axis):
        # a = map for coord < plane (d<0 bit set), b = for coord >= plane.
        shape = [1, 1, 1]
        shape[axis] = n
        c = jnp.arange(n).reshape(shape)
        kc = jnp.floor(k).astype(jnp.int32)
        out = jnp.where(c < kc, a, b)
        return jnp.where(c == kc, jnp.minimum(a, b), out)

    mz, my, mx = maps.shape[1:]
    # idx = 4*bx + 2*by + bz; combine z pairs, then y, then x.
    z = [combine(maps[i + 1], maps[i], mz, kz, 0) for i in (0, 2, 4, 6)]
    y = [combine(z[2 * j + 1], z[2 * j], my, ky, 1) for j in (0, 1)]
    return combine(y[1], y[0], mx, kx, 2)


@functools.partial(jax.jit, static_argnames=("map_shape_zyx", "st",
                                             "use_pallas", "on_the_fly",
                                             "fast"))
def _build_maps_fused(density, gradient, tf, ti, tg, *, map_shape_zyx, st,
                      use_pallas, on_the_fly, fast):
    """Occupancy + distance transform as ONE device program.

    The TF-edit update path dispatches this once per build: the reference's
    5-run benchmark protocol (volume_render.cpp:421-430) then costs one
    dispatch per run instead of one per kernel launch — the per-build
    dispatch latency over the tunneled transport (~1.5 ms each) dominated
    the committed small-map update times in round 2.

    ``fast`` selects the integer-threshold occupancy with TRACED (ti, tg)
    — the thresholds are host-derived (accel/occupancy._tf_thresholds with
    tf_host) because inside jit the TF leaves are tracers, and a TF slider
    edit must retrigger neither a threshold read-back nor a recompile.

    BLOCK uses the occupancy map directly; NONE keeps it for diagnostics
    (the reference also computes it, then skips the distance passes —
    src/compute_distance_map.cpp:96-99)."""
    from ..accel.occupancy import _occupancy_general, _occupancy_u8

    if fast:
        g = None if on_the_fly else gradient
        if tf.use_gradient and g is None:
            g = gradient_map(density, tf.grad_magnitude_modifier,
                             use_gradient=True)
        occ = _occupancy_u8(density, g if tf.use_gradient else None,
                            map_shape_zyx, ti, tg)
    else:
        occ = _occupancy_general(density, gradient, tf, map_shape_zyx,
                                 on_the_fly_gradient=on_the_fly)
    if st not in (SkippingType.DISTANCE, SkippingType.ANISOTROPIC_DISTANCE):
        return occ[None]
    if use_pallas:
        from ..accel.distance_pallas import (anisotropic_distance_pallas,
                                             isotropic_distance_pallas)

        return (isotropic_distance_pallas(occ)[None]
                if st == SkippingType.DISTANCE
                else anisotropic_distance_pallas(occ))
    return (isotropic_distance(occ)[None] if st == SkippingType.DISTANCE
            else anisotropic_distance(occ))


@dataclasses.dataclass
class UpdateStats:
    """Metrics contract of the reference log lines that benchmark.py scrapes
    (src/volume_render.cpp:418, 430).

    ``map_update_ms`` semantics depend on the engine mode: in benchmark
    mode it is the synced per-build device time (comparable to the
    reference's timed 5-build average); in interactive mode the builds
    stay QUEUED (the reference records dispatches with no CPU readback
    between a TF edit and the next draw, volume_render.cpp:392-445), so
    it reports async dispatch cost only — the per-edit latency shows up
    in the next frame's time, not here. Don't compare the interactive
    value against the reference's synced update times."""

    occupied_voxel_percent: float | None = None
    count_ms: float | None = None
    map_update_ms: float | None = None
    gradient_ms: float | None = None


# Max suspect lanes per repair-march device program (True = gradient TF,
# which marches ~4× slower): long single programs trip the relay's device
# watchdog and kill the TPU worker. Module-level so tests can shrink it.
_REPAIR_CHUNK = {True: 8192, False: 32768}


def _ladder_up(n: int, anchor: int, step: float = 1.25) -> int:
    """Smallest value ≥ n on the geometric ladder anchor·step^k (k ∈ ℤ).

    n_slabs is a jit static: the GUI's continuous sampling slider would
    otherwise compile a fresh Mosaic specialisation per drag position
    (~10 s each on the tunneled compile service). Rounding UP means the
    rendered quadrature is at least as dense as requested (quality ≥
    asked), and a slider sweep touches ≤ ~8 tiers instead of dozens."""
    import math as _m

    if n <= 2:
        return 2
    k = _m.ceil(round(_m.log(n / anchor) / _m.log(step), 9))
    return int(max(2, round(anchor * step ** k)))


class Engine:
    def __init__(self, options: RenderOptions | None = None,
                 benchmark_mode: bool = False, renderer: str = "marcher",
                 accel_cache_dir: str | None = None):
        """``renderer``: "marcher" = the reference-exact lock-step ray march
        (the parity oracle); "sweep" = the TPU-native plane-sweep compositor
        (render/sweep.py); "pallas" = the hand-scheduled Pallas sweep kernel
        (render/sweep_pallas.py), falling back to "sweep" for configurations
        the kernel does not cover (gradient TFs, texture TFs, tiny volumes,
        non-tile-aligned images)."""
        self.options = options or RenderOptions()
        self.benchmark_mode = benchmark_mode
        self.renderer = renderer
        if benchmark_mode:
            # Benchmark mode forces (src/volume_render.cpp:177-183).
            self.options.clip_distance = 1.0
            self.options.early_ray_termination = False
            self.options.test = Test.NUM_TEXTURE_SAMPLES
        self.volumes: list[Volume] = []
        self.accel_cache_dir = accel_cache_dir
        # Per-renderer frame counts: measures how often the fast path
        # actually runs vs the fallbacks (the plan can reject extreme views).
        self.renderer_counts = {"pallas": 0, "sweep": 0, "marcher": 0}
        self.last_renderer = None          # set by every rendered frame
        # (p_axis, sgn) -> frozen plan statics (bench.freeze_orbit_statics):
        # pins every pose in a camera orbit to ONE kernel specialisation.
        self.plan_force: dict = {}
        # Static combos the compile service refused (HTTP 500), with
        # refusal counts: the 500s are often transient, so a refused spec
        # is retried up to _SPEC_RETRIES times before it is written off
        # (retrying re-issues a multi-minute remote compile, so the cap
        # matters; a spec that compiled is served from the persistent
        # cache and never re-enters this path).
        self._failed_specs: dict = {}
        self._SPEC_RETRIES = 3
        # Interactive slab ladder (prewarm_interactive): quantise n_slabs
        # UP a geometric ladder so the GUI's continuous sampling slider
        # maps to a bounded set of jit specialisations.
        self._slab_ladder = False

    # ---- setup ----------------------------------------------------------

    def add_volume(self, volume: Volume) -> UpdateStats:
        """Load path of prepare(): gradient at load + first TF update
        (src/volume_render.cpp:186-242). With ``accel_cache_dir`` set,
        checkpointed maps are restored instead of recomputed (SURVEY.md §5
        checkpoint/resume)."""
        self.volumes.append(volume)
        stats = UpdateStats()
        if self.accel_cache_dir is not None:
            from . import accel_cache

            if accel_cache.load(self.accel_cache_dir, volume,
                                self.options.skipping_type):
                return stats
        if volume.options.use_precomputed_gradient:
            t0 = time.perf_counter()
            volume.gradient = gradient_map(
                volume.density, 1.0, use_gradient=volume.options.use_gradient
            )
            volume.gradient.block_until_ready()
            stats.gradient_ms = (time.perf_counter() - t0) * 1e3
        tf_stats = self.update_transfer_function(volume)
        stats.occupied_voxel_percent = tf_stats.occupied_voxel_percent
        stats.count_ms = tf_stats.count_ms
        stats.map_update_ms = tf_stats.map_update_ms
        if self.accel_cache_dir is not None:
            from . import accel_cache

            accel_cache.save(self.accel_cache_dir, volume,
                             self.options.skipping_type)
        return stats

    def _tf(self, volume: Volume):
        o = volume.options
        key = (o.intensity_min, o.intensity_max, o.gradient_min,
               o.gradient_max, o.sampling_factor, o.voxel_alpha_factor)
        cached = getattr(volume, "_tf_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        # Building TFParams costs ~7 scalar device_puts (~0.9 ms each over
        # the tunneled transport) — cache per volume, invalidated by value.
        tf = tf_params(
            intensity_min=o.intensity_min,
            intensity_max=o.intensity_max,
            gradient_min=o.gradient_min,
            gradient_max=o.gradient_max,
            sampling_factor=o.sampling_factor,
            voxel_alpha_factor=o.voxel_alpha_factor,
        )
        volume._tf_cache = (key, tf)
        return tf

    def _slab_oversample(self, volume: Volume, vol_t_shape, tf) -> float:
        """Slab count per principal-axis voxel plane (RenderOptions.
        slab_density). "ref" matches the reference's per-ray step density
        1/(dim_max·sf) (volume_render.frag:176-179): n_slabs ≈ dim_max·sf
        instead of Np·sf. "auto" pays that only for gradient TFs — the one
        content class where plane-aligned slabs measurably diverge (28 % of
        covered pixels >8/255 vs 0 %; intensity-only TFs measure ≤0.04 %
        either way, so they keep the plane-aligned fast path)."""
        sf = float(volume.options.sampling_factor)
        mode = self.options.slab_density
        mult = 1.0
        if mode == "auto":
            if tf.use_gradient:
                # Sharp-shell content needs ~2× the reference density for
                # the fixed-phase slab quadrature to converge (see
                # RenderOptions.grad_density_mult).
                mode = "ref"
                mult = float(self.options.grad_density_mult)
            else:
                mode = "axis"
        if mode == "ref":
            return sf * max(vol_t_shape) / vol_t_shape[0] * mult
        return sf

    def prewarm_interactive(self, camera, width: int, height: int, *,
                            spin_deg: float = 20.0, translate: float = 10.0,
                            sampling_tiers=(1.0, 1.5)) -> float:
        """Pre-compile the bounded set of structural-GUI-edit
        specialisations so slider drags stay interactive (the reference
        recompiles its shader variants in ms, src/volume_render.cpp:541-544;
        our Mosaic specialisations cost ~10 s each on the tunneled compile
        service, so they must be paid at setup, not mid-edit).

        Three legs:
        1. freeze the frame plan's jit statics to envelope tiers over a
           pose-perturbation set (volume spin ± ``spin_deg``, translation
           ± ``translate`` model units — the GUI's translate/spin edits
           re-use ONE kernel specialisation per (axis, sign) band instead
           of compiling a fresh one per pose);
        2. enable the interactive n_slabs ladder (the continuous sampling
           slider maps onto a bounded tier set, see _ladder_up);
        3. render one frame per ``sampling_tiers`` entry to compile those
           ladder tiers up front (served from the persistent compile cache
           on later sessions — utils.enable_compile_cache).

        Returns the prewarm wall time in seconds. Host-only analysis plus
        one render per tier; call after add_volume."""
        from ..bench.harness import freeze_statics
        from ..render.ray_setup import make_uniforms

        t0 = time.perf_counter()
        for volume in self.volumes:
            # set_spin/set_translation compose over internal state — save
            # and restore the raw transform verbatim.
            nt0 = np.asarray(volume.node_transform).copy()
            base0 = getattr(volume, "_spin_base", None)
            trans0 = volume.get_translation()
            uniforms_list = []
            try:
                for sp_deg in (-spin_deg, -spin_deg / 2, 0.0,
                               spin_deg / 2, spin_deg):
                    for tx in (-translate, 0.0, translate):
                        volume.set_spin(np.deg2rad(sp_deg))
                        volume.set_translation(
                            trans0 + np.asarray([tx, 0.0, 0.0]))
                        uniforms_list.append(make_uniforms(
                            camera, volume.node_transform,
                            volume.image_transform,
                            self.options.clip_distance,
                            np.asarray(volume.effective_block_size_xyz,
                                       np.float32)))
            finally:
                volume.node_transform = nt0
                volume._spin_base = base0
            freeze_statics(self, volume, uniforms_list, width, height)
        self._slab_ladder = True
        for volume in self.volumes:
            sf0 = volume.options.sampling_factor
            nt0 = np.asarray(volume.node_transform).copy()
            base0 = getattr(volume, "_spin_base", None)
            trans0 = volume.get_translation()
            try:
                # One render per DISTINCT ladder tier across the slider
                # range: the ladder bounds the tier count, but any tier a
                # slider value can reach must be compiled NOW, not at the
                # first drag that lands on it (verify round 5: sf=1.3
                # between prewarmed endpoints 1.0/1.5 still paid a 7 s
                # mid-edit compile).
                lo, hi = min(sampling_tiers), max(sampling_tiers)
                dsh = volume.density.shape
                # Tier prediction anchors on the p=2 transposition; other
                # axes shift the ladder slightly (worst case one extra or
                # one first-drag compile — the persistent cache amortises).
                anchor = dsh[0]
                seen = set()
                for sf in np.geomspace(lo, hi, 12):
                    volume.options.sampling_factor = float(sf)
                    tfq = self._tf(volume)
                    n = int(max(2, round(
                        anchor * self._slab_oversample(volume, dsh, tfq))))
                    tier = _ladder_up(n, anchor)
                    if tier in seen:
                        continue
                    seen.add(tier)
                    self.render(camera, width, height)
                # Envelope lattice poses: the frozen tiers are BANDED by
                # grid area, and only tiers a prewarm render actually hits
                # get compiled (verify round 5: a translate edit resolved a
                # tier the base pose never touched and paid a 12 s compile).
                # Render the FULL freeze lattice — a pose between lattice
                # points then resolves one of the already-compiled tiers
                # (plus the tier-rect headroom added by freeze_statics).
                volume.options.sampling_factor = sf0
                for sp_deg in (-spin_deg, -spin_deg / 2, 0.0,
                               spin_deg / 2, spin_deg):
                    for tx in (-translate, 0.0, translate):
                        volume.set_spin(np.deg2rad(sp_deg))
                        volume.set_translation(
                            trans0 + np.asarray([tx, 0.0, 0.0]))
                        self.render(camera, width, height)
            finally:
                volume.options.sampling_factor = sf0
                volume.node_transform = nt0
                volume._spin_base = base0
        return time.perf_counter() - t0

    def update_transfer_function(self, volume: Volume, timed_runs: int = 5) -> UpdateStats:
        """TF-edit recompute path (src/volume_render.cpp:392-445): bake the TF
        texture, optionally count occupied voxels (benchmark mode), rebuild the
        occupancy map and the distance map(s) for the active skipping type."""
        o = volume.options
        tf = self._tf(volume)
        stats = UpdateStats()

        volume.tf_texture = bake_texture(
            intensity_min=o.intensity_min,
            intensity_max=o.intensity_max,
            gradient_min=o.gradient_min,
            gradient_max=o.gradient_max,
        )

        gradient = volume.gradient if o.use_precomputed_gradient else None
        on_the_fly = not o.use_precomputed_gradient

        tf_host = (o.intensity_min, o.intensity_max,
                   o.gradient_min, o.gradient_max)

        if self.benchmark_mode:
            t0 = time.perf_counter()
            n_occ = int(
                occupied_voxel_count(
                    volume.density, gradient, tf,
                    on_the_fly_gradient=on_the_fly, tf_host=tf_host,
                )
            )
            stats.count_ms = (time.perf_counter() - t0) * 1e3
            n_vox = int(np.prod(volume.density.shape))
            stats.occupied_voxel_percent = 100.0 * n_occ / n_vox

        # The distance transform runs as VMEM-resident Pallas kernels on
        # accelerator backends (accel/distance_pallas.py — exact twins of
        # the XLA formulation, equality-tested); CPU keeps the XLA path
        # (interpret-mode Pallas would be pure overhead). The remote Mosaic
        # compile service is flaky — on a compile failure for a new map
        # shape, fall back to the XLA transform for this engine (same
        # results, ~2-3× slower update) instead of dying.
        import os

        state = {"pallas_dt": jax.devices()[0].platform != "cpu"
                 and not os.environ.get("VKV_NO_PALLAS_DT")}

        from ..accel.occupancy import _tf_thresholds

        thr = _tf_thresholds(tf, tf_host)
        ti, tg = thr if thr is not None else (0, 0)

        def build_maps():
            st = self.options.skipping_type
            if state["pallas_dt"]:
                try:
                    return _build_maps_fused(
                        volume.density, gradient, tf, ti, tg,
                        map_shape_zyx=volume.map_shape_zyx, st=st,
                        use_pallas=True, on_the_fly=on_the_fly,
                        fast=thr is not None)
                except Exception as e:  # pragma: no cover - infra flake
                    import sys

                    print("WARNING: Pallas DT unavailable "
                          f"({str(e)[:120]}); using the XLA transform",
                          file=sys.stderr)
                    state["pallas_dt"] = False
            return _build_maps_fused(
                volume.density, gradient, tf, ti, tg,
                map_shape_zyx=volume.map_shape_zyx, st=st,
                use_pallas=False, on_the_fly=on_the_fly,
                fast=thr is not None)

        def sync(maps):
            maps.block_until_ready()
            # Force a host round-trip: this transport reports readiness
            # before device completion, which would fake the timing.
            float(maps.ravel()[0])

        # Benchmark mode queues 4× the protocol's 5 builds: the reference
        # times updates with device timestamps (no host round trip), while
        # this transport must force one ~34 ms readback per timing window —
        # at 20 queued builds that artifact's per-build share drops to
        # ~1.7 ms (CLAUDE.md's amortisation rule; it dominates the
        # SMALL-map update floor, e.g. present b=4 whose whole device-side
        # build is ~9 ms). The device work per build is unchanged; the
        # mean is just a better estimator of the same quantity.
        runs = timed_runs * 4 if self.benchmark_mode else 1
        if self.benchmark_mode:
            # Warm the jit cache before timing (the reference's 5-run
            # average also amortises pipeline warmup,
            # volume_render.cpp:421-430). Interactive edits skip it — the
            # traced-threshold build recompiles for no TF edit, so the
            # cache is warm after the first edit and every edit pays ONE
            # build + one sync.
            sync(build_maps())
        t0 = time.perf_counter()
        for _ in range(runs):
            maps = build_maps()
        if self.benchmark_mode:
            # One forced sync after the loop: the queued builds execute
            # serially on-device, so wall/runs is the per-build time plus
            # ~1/runs of the ~34 ms transport round trip (timing it per
            # build would add the full round trip to every sample).
            sync(maps)
        # Interactive edits stay QUEUED: the reference's update path records
        # compute dispatches with no CPU readback between the TF edit and
        # the next draw (volume_render.cpp:392-445) — the next presented
        # frame consumes the new maps device-side and pays one sync for
        # rebuild + render together. map_update_ms then reports dispatch
        # cost only; the per-edit latency lives in the frame time.
        stats.map_update_ms = (time.perf_counter() - t0) * 1e3 / runs
        volume.dist_maps = maps
        volume._maps_version = getattr(volume, "_maps_version", 0) + 1
        return stats

    def set_skipping_type(self, st: SkippingType) -> None:
        """ESS mode change rebuilds the maps for every volume
        (src/volume_render.cpp:512-518)."""
        if st != self.options.skipping_type:
            self.options.skipping_type = st
            for v in self.volumes:
                self.update_transfer_function(v, timed_runs=1)

    # ---- per-frame ------------------------------------------------------

    def render_with_scene(self, camera, width: int, height: int, mesh,
                          light_dir=(-0.4, -0.8, -0.45)) -> RenderOutput:
        """Forward scene pass + volume pass, composited like the
        reference's render pipeline with ``render_sponza_scene`` on
        (src/volume_render.cpp:329-356): the mesh renders first
        (render/forward.py), its reverse-Z depth clips the volume rays
        (DEPTH_ATTACHMENT variant, volume_render.frag:122-165), and the
        volume's premultiplied front-to-back output composites OVER the
        scene color (src/volume_render_subpass.cpp:177-186)."""
        from ..render.forward import rasterize

        scene_rgb, scene_depth = rasterize(mesh, camera, height, width,
                                           light_dir=light_dir)
        prev = self.options.depth_attachment
        self.options.depth_attachment = True
        try:
            out = self.render(camera, width, height,
                              depth_image=scene_depth)
        finally:
            self.options.depth_attachment = prev
        vol_a = out.color[..., 3:4]
        rgb = out.color[..., :3] + (1.0 - vol_a) * scene_rgb
        covered = (scene_depth > 0.0)[..., None].astype(jnp.float32)
        alpha = vol_a + (1.0 - vol_a) * covered
        return dataclasses.replace(
            out,
            color=jnp.concatenate([rgb, alpha], -1),
            depth=jnp.maximum(out.depth, scene_depth),
        )

    def render(self, camera, width: int, height: int,
               depth_image=None) -> RenderOutput:
        """One frame: per volume, ray setup + march, blended front-to-back
        into the target in draw order (VolumeRenderSubpass::draw,
        src/volume_render_subpass.cpp:159-293)."""
        out = None
        for volume in self.volumes:
            result = self.render_volume(
                volume, camera, width, height, depth_image=depth_image
            )
            if out is None:
                out = result
            else:
                # Target blend state (src/volume_render_subpass.cpp:177-186):
                # src factor ONE, dst factor ONE_MINUS_SRC_ALPHA — each later
                # draw composites OVER the accumulated target:
                # new = src + (1 - src.a) * dst.
                c = result.color + (1.0 - result.color[..., 3:4]) * out.color
                # Reverse-Z depth (GREATER = nearer): keep the nearer hit.
                d = jnp.maximum(result.depth, out.depth)
                out = dataclasses.replace(
                    result, color=c, depth=d,
                    num_volume_samples=(result.num_volume_samples
                                        + out.num_volume_samples),
                    num_distance_samples=(result.num_distance_samples
                                          + out.num_distance_samples),
                    num_empty_samples=(result.num_empty_samples
                                       + out.num_empty_samples),
                )
        return out

    def render_volume(self, volume: Volume, camera, width: int, height: int,
                      depth_image=None) -> RenderOutput:
        if self.renderer in ("sweep", "pallas"):
            out = self._render_sweep(volume, camera, width, height,
                                     depth_image=depth_image)
            if out is not None:
                if (self.options.edge_repair
                        and self.options.test == Test.NONE):
                    out = self._edge_repair(out, volume, camera,
                                            width, height, depth_image)
                return out
            # Mixed principal-axis signs (camera inside the volume, wide
            # FOV): one global slab order cannot composite every ray
            # front-to-back — use the per-ray marcher for this frame.
            pass
        # Reached both by an explicit renderer="marcher" engine and by the
        # mixed-sign fallback above — count it here so last_renderer /
        # renderer_counts exist for EVERY rendered frame, not only the
        # sweep paths.
        self.last_renderer = "marcher"
        self.renderer_counts["marcher"] += 1
        uniforms = make_uniforms(
            camera,
            volume.node_transform,
            volume.image_transform,
            self.options.clip_distance,
            np.asarray(volume.effective_block_size_xyz, np.float32),
        )
        rays = make_rays(
            uniforms,
            height,
            width,
            depth_image=depth_image,
            use_depth=self.options.depth_attachment and depth_image is not None,
        )
        tf = self._tf(volume)
        pvm = jnp.asarray(
            (camera.proj.astype(np.float64)
             @ camera.view.astype(np.float64)
             @ volume.model_matrix).astype(np.float32)
        )

        def march_rows(band):
            return march(
                volume.density,
                volume.gradient,
                volume.dist_maps
                if self.options.skipping_type != SkippingType.NONE else None,
                tf,
                band,
                uniforms.block_size,
                pvm,
                skipping_type=self.options.skipping_type,
                early_ray_termination=self.options.early_ray_termination,
                precomputed_gradient=volume.options.use_precomputed_gradient,
                test=self.options.test,
                tf_texture=self._tf_texture(volume),
            )

        # Band large marches into row strips: every pixel is independent, so
        # the output is identical, but (a) each strip is a short device
        # program — a full-scale single-program march runs for minutes and
        # the relay's device watchdog kills the TPU worker — and (b) the
        # lock-step loop's trip count per strip is the strip's own worst
        # ray, not the frame's (less divergence waste). Gradient-modulated
        # TFs march ~2× slower (second trilinear per sample), so they band
        # finer to stay under the device-program watchdog at full scale.
        n_px = height * width
        if n_px >= 512 * 512:
            if self._tf(volume).use_gradient:
                n_bands = min(32, max(2, n_px // (128 * 1024)))
            else:
                n_bands = min(8, max(2, n_px // (256 * 1024)))
            rows = [height * b // n_bands for b in range(n_bands + 1)]
            parts = [
                march_rows(jax.tree.map(lambda x: x[rows[b]:rows[b + 1]],
                                        rays))
                for b in range(n_bands)
            ]
            return RenderOutput(
                color=jnp.concatenate([p.color for p in parts], axis=0),
                depth=jnp.concatenate([p.depth for p in parts], axis=0),
                num_volume_samples=jnp.concatenate(
                    [p.num_volume_samples for p in parts], axis=0),
                num_distance_samples=jnp.concatenate(
                    [p.num_distance_samples for p in parts], axis=0),
                num_empty_samples=jnp.concatenate(
                    [p.num_empty_samples for p in parts], axis=0),
                iterations=parts[0].iterations,
            )
        return march_rows(rays)

    def _edge_repair(self, out: RenderOutput, volume: Volume, camera,
                     width: int, height: int, depth_image) -> RenderOutput:
        """Exact-marcher repair of resampling-suspect pixels (quality mode).

        The w-grid sweep + warp resample the grid image at pixel centres;
        at silhouette/depth discontinuities a ~1 %-class of pixels can land
        on the wrong side of the edge (docs/parity_r2.json: 1.2 % of pixels
        >8/255 on the beetle). This pass finds pixels whose 3×3 alpha/depth
        neighbourhood is discontinuous (dilated once), re-marches ONLY
        those rays with the reference-exact per-ray marcher
        (render/marcher_xla.py — the parity oracle), and splices them in.
        Pixel budget is static (~3 % of the frame, 1024-aligned for stable
        jit shapes); overflow beyond the budget keeps the sweep pixels.
        """
        f = jnp.float32
        a = out.color[..., 3]
        dep = out.depth

        def rng3(x):
            mx = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
            mn = jax.lax.reduce_window(
                x, jnp.inf, jax.lax.min, (3, 3), (1, 1), "SAME")
            return mx - mn

        # Alpha/depth discontinuities (silhouettes) PLUS color edges at
        # flat alpha: interior intensity edges shift the TF color under
        # the warp's bilinear mixing with no alpha signature at all — the
        # alpha/depth detector alone missed 12 % of >8/255 pixels (all
        # ≤0.06, scale-0.5 study vs the oracle), while adding a 0.08
        # color-range term caught every one. Costs suspects (~11 % of the
        # frame on the beetle vs ~3 %): parity runs raise repair_budget
        # accordingly and report the measured per-frame cost.
        c3 = out.color[..., :3]
        cmx = jax.lax.reduce_window(
            c3, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1), "SAME")
        cmn = jax.lax.reduce_window(
            c3, jnp.inf, jax.lax.min, (3, 3, 1), (1, 1, 1), "SAME")
        mask = ((rng3(a) > 0.04) | (rng3(dep) > 0.01)
                | ((cmx - cmn).max(-1) > 0.08))
        mask = jax.lax.reduce_window(
            mask.astype(f), -jnp.inf, jax.lax.max, (3, 3), (1, 1),
            "SAME") > 0.5
        n_px = height * width
        n_found = mask.sum()
        if self.options.repair_budget <= 0:
            # Probe mode: count suspects only (callers bucket the march
            # budget by the count — the oracle march costs ∝ the STATIC
            # budget K whether or not the lanes are live).
            self.last_repair_px = (n_found, 0)
            return out
        K = int(min(n_px, -(-max(
            2048, int(n_px * self.options.repair_budget)) // 1024) * 1024))
        idx = jnp.nonzero(mask.ravel(), size=K, fill_value=0)[0]
        live = jnp.arange(K) < n_found
        # Device value, NOT synced here (a host int() would stall the
        # frame pipeline ~34 ms on the relay); artifact scripts int() it.
        self.last_repair_px = (n_found, K)

        uniforms = make_uniforms(
            camera, volume.node_transform, volume.image_transform,
            self.options.clip_distance,
            np.asarray(volume.effective_block_size_xyz, np.float32))
        use_depth = (self.options.depth_attachment
                     and depth_image is not None)
        rays = make_rays(uniforms, height, width, depth_image=depth_image,
                         use_depth=use_depth)
        sub = jax.tree.map(
            lambda x: (x.reshape((n_px,) + x.shape[2:])[idx][None]
                       if getattr(x, "ndim", 0) >= 2
                       and x.shape[:2] == (height, width) else x),
            rays)
        tf = self._tf(volume)
        pvm = jnp.asarray(
            (camera.proj.astype(np.float64)
             @ camera.view.astype(np.float64)
             @ volume.model_matrix).astype(np.float32))
        # The oracle march skips with whatever map exists: even skipmode
        # NONE builds the occupancy map (reference parity,
        # src/compute_distance_map.cpp:96-99), and BLOCK-mode skipping
        # over it (step to the next block boundary while the cell is
        # EMPTY) is exact — without it the static suspect budget
        # brute-forces every ray (measured 12.3 s/frame at a 1/8 budget
        # on present skipmode 0). Skipped cells are strictly unoccupied
        # under the same TF thresholds, so repaired pixels stay
        # oracle-exact.
        st_rep = self.options.skipping_type
        if st_rep == SkippingType.NONE and volume.dist_maps is not None:
            st_rep = SkippingType.BLOCK

        def march_lanes(lanes):
            return march(
                volume.density, volume.gradient,
                volume.dist_maps if st_rep != SkippingType.NONE else None,
                tf, lanes, uniforms.block_size, pvm,
                skipping_type=st_rep,
                early_ray_termination=self.options.early_ray_termination,
                precomputed_gradient=volume.options.use_precomputed_gradient,
                test=self.options.test,
                tf_texture=self._tf_texture(volume),
            )

        # Band the suspect march into short device programs: suspects are
        # all edge rays (deep marches, little skipping — present's 130k-lane
        # single program measured ~6 s, and gradient TFs march ~4× slower),
        # and a long single program trips the relay's device watchdog,
        # which KILLS the TPU worker (the round-5 parity run died twice at
        # present-grad's repair frame exactly this way). Same banding
        # rationale as render_volume's full-frame oracle strips.
        chunk = _REPAIR_CHUNK[bool(tf.use_gradient)]
        if K > chunk:
            parts = [
                march_lanes(jax.tree.map(
                    lambda x: (x[:, c:c + chunk]
                               if getattr(x, "ndim", 0) >= 2
                               and x.shape[:2] == (1, K) else x), sub))
                for c in range(0, K, chunk)
            ]
            rep = RenderOutput(
                color=jnp.concatenate([p.color for p in parts], axis=1),
                depth=jnp.concatenate([p.depth for p in parts], axis=1),
                num_volume_samples=jnp.concatenate(
                    [p.num_volume_samples for p in parts], axis=1),
                num_distance_samples=jnp.concatenate(
                    [p.num_distance_samples for p in parts], axis=1),
                num_empty_samples=jnp.concatenate(
                    [p.num_empty_samples for p in parts], axis=1),
                iterations=parts[0].iterations,
            )
        else:
            rep = march_lanes(sub)

        # Dead (padding) lanes scatter to an out-of-bounds index and are
        # dropped — a live suspect at pixel 0 must not race with padding
        # writes (nonzero pads with fill_value=0).
        idx_w = jnp.where(live, idx, n_px)

        def splice(old, new):
            flat = old.reshape((n_px,) + old.shape[2:])
            return flat.at[idx_w].set(new[0], mode="drop").reshape(old.shape)

        return dataclasses.replace(
            out, color=splice(out.color, rep.color),
            depth=splice(out.depth, rep.depth))

    def _tf_texture(self, volume: Volume):
        """Baked TF texture when the TRANSFER_FUNCTION_TEXTURE variant is
        active (RenderOptions.texture_tf), else None (closed-form TF)."""
        if not self.options.texture_tf:
            return None
        return jnp.asarray(volume.tf_texture)

    def _render_sweep(self, volume: Volume, camera, width: int, height: int,
                      depth_image=None) -> RenderOutput | None:
        """Sweep/Pallas frame, or None when the frame needs the marcher
        (mixed principal-axis direction signs, or no coverage analysis).

        All per-frame decisions (principal axis, mixed-sign detection, the
        w-grid plan) are host-side analytic functions of the camera
        (render/plan.py) — the steady-state frame loop issues no synced
        device→host transfers."""
        from ..render import plan as plan_mod
        from ..render import sweep as sweep_mod

        # Arbitrary image sizes on the Pallas path: render a tile-aligned
        # padded viewport whose top-left window has pixel-identical rays
        # (camera.pad_viewport remixes clip x/y with w) and crop. CPU runs
        # keep the plain path — there the width gate routes to the XLA sweep.
        if (self.renderer == "pallas"
                and jax.devices()[0].platform != "cpu"
                and (height % 8 or width % 128)):
            from ..camera import pad_viewport

            hp = -(-height // 8) * 8
            wp = -(-width // 128) * 128
            cam_p = pad_viewport(camera, width, height, wp, hp)
            depth_p = depth_image
            if depth_image is not None:
                depth_p = jnp.pad(
                    depth_image,
                    ((0, hp - height), (0, wp - width)),
                )  # pad 0 = reverse-Z far plane: never clips
            out = self._render_sweep(volume, cam_p, wp, hp,
                                     depth_image=depth_p)
            if out is None:
                return None
            crop = lambda a: (a[:height, :width]
                              if getattr(a, "ndim", 0) >= 2
                              and a.shape[:2] == (hp, wp) else a)
            return jax.tree.map(crop, out)

        cache = getattr(volume, "_sweep_cache", None)
        if cache is None:
            cache = volume._sweep_cache = {}

        # Per-camera-pose cache: a static camera renders with zero per-frame
        # host analysis and zero ray-setup dispatches; an orbiting camera
        # pays only host-side analytic math (render/plan.py).
        use_depth = self.options.depth_attachment and depth_image is not None
        cam_key = (camera.view.tobytes(), camera.proj.tobytes(),
                   float(self.options.clip_distance), height, width,
                   # The cached uniforms/pvm also depend on the volume
                   # transform (spin mode / translation edits).
                   np.asarray(volume.model_matrix).tobytes())
        # Depth-clipped frames are never pose-cached: the depth buffer's
        # contents change per frame (and id() can be recycled), so cached
        # rays would clip against stale depths.
        pose = None if use_depth else cache.get(("pose", cam_key))
        if pose is None:
            uniforms = make_uniforms(
                camera,
                volume.node_transform,
                volume.image_transform,
                self.options.clip_distance,
                np.asarray(volume.effective_block_size_xyz, np.float32),
            )
            # Cost-based principal-axis selection (sweep_pallas.
            # select_view_plan): plans every single-signed axis and keeps
            # the cheapest — near the axis handover the largest-|mean|
            # axis costs 5-30× the runner-up.
            from ..render import sweep_pallas as _sp

            dsh = volume.density.shape

            def shape_for(q):
                return {2: dsh, 1: (dsh[1], dsh[0], dsh[2]),
                        0: (dsh[2], dsh[0], dsh[1])}[q]

            view = plan_sel = forced_plan = None
            if self.plan_force and not use_depth:
                # Frozen-envelope fast path (free camera over a known
                # span): the full unforced search costs 25-60 ms of
                # serial host time per pose and its plan would only ever
                # be a fallback — plan against the frozen tiers directly.
                view, forced_plan = _sp.select_view_plan_forced(
                    uniforms, height, width, shape_for, self.plan_force)
            if forced_plan is None and (
                    view is None or not view.get("mixed")):
                view, plan_sel = _sp.select_view_plan(
                    uniforms, height, width, shape_for)
            # Ray setup is built lazily: the Pallas frame builds it inside
            # its own jit (a fresh pose costs only the host plan), and only
            # the fallback renderers / depth-attachment frames need it as a
            # standalone array.
            rays = None
            if use_depth and view is not None and not view["mixed"]:
                rays = make_rays(uniforms, height, width,
                                 depth_image=depth_image, use_depth=use_depth)
            pose = dict(uniforms=uniforms, view=view, rays=rays,
                        plan_unforced=plan_sel)
            if forced_plan is not None:
                # The fast path already committed to a frozen tier; the
                # per-pose tier loop below is skipped entirely.
                pose["plan"] = forced_plan
            if not use_depth:
                # Bound the pose cache (an orbiting camera would grow it
                # indefinitely; dropping it only costs host-side re-analysis).
                keys = [k for k in cache if isinstance(k, tuple)
                        and k[0] == "pose"]
                if len(keys) > 64:
                    for k in keys:
                        del cache[k]
                cache[("pose", cam_key)] = pose
        uniforms, view, rays = pose["uniforms"], pose["view"], pose["rays"]
        if self.options.test in (Test.RAY_ENTRY, Test.RAY_EXIT):
            # No march: the entry/exit POSITION images
            # (volume_render.frag:168-173) come straight from the ray
            # setup — one elementwise device program, no maps, no banding
            # (render/sweep.py:134-139 and marcher_xla.py:103-112 agree
            # on the semantics).
            if rays is None:
                rays = pose["rays"] = make_rays(
                    uniforms, height, width,
                    depth_image=depth_image, use_depth=use_depth)
            pt = (rays.entry if self.options.test == Test.RAY_ENTRY
                  else rays.exit)
            color = jnp.concatenate(
                [pt, jnp.ones((height, width, 1), jnp.float32)], -1)
            color = jnp.where(rays.valid[..., None], color, 0.0)
            zi = jnp.zeros((height, width), jnp.int32)
            self.last_renderer = "sweep"
            self.renderer_counts["sweep"] += 1
            return RenderOutput(color, rays.depth_init, zi, zi, zi,
                                jnp.int32(0))
        if view is None or view["mixed"]:
            return None  # caller falls back to the per-ray marcher
        p = view["p_axis"]
        if p not in cache:
            vol_t = sweep_mod.transpose_for_axis(volume.density, p)
            grad_t = (
                sweep_mod.transpose_for_axis(volume.gradient, p)
                if volume.gradient is not None else None
            )
            cache[p] = (vol_t, grad_t)
        vol_t, grad_t = cache[p]
        # Any map with 0 ⇔ occupied works for slab skipping (distance maps
        # are 0 exactly at occupied cells, occupancy is OCCUPIED=0). For
        # distance maps the Pallas kernel additionally leaps by the map
        # value (dist_leap). The 8 anisotropic octant maps are stitched
        # per CELL by _octant_composite: for a pinhole camera every ray
        # through a cell shares the octant sign pattern sign(cell_center -
        # cam), so selecting that octant's value per cell reproduces the
        # reference's per-ray map selection exactly (volume_render.frag:209)
        # — not a conservative min.
        occ_t = None
        dist_leap = self.options.skipping_type in (
            SkippingType.DISTANCE, SkippingType.ANISOTROPIC_DISTANCE)
        if volume.dist_maps is not None:
            maps = volume.dist_maps
            # Keyed on a monotonic rebuild counter, not id() (array ids can
            # be recycled after GC, silently serving stale maps).
            ver = getattr(volume, "_maps_version", 0)
            if maps.shape[0] == 8:
                # Anisotropic: per-cell octant stitch (_octant_composite) —
                # the exact twin of the reference's per-ray map selection.
                # The stitch depends on the camera position only through
                # which map cell holds it, so the cache key quantises to
                # that cell (static poses and slow pans hit the cache).
                bs = np.asarray(volume.effective_block_size_xyz, np.float64)
                dz, hy, wx = volume.density.shape
                cam = np.asarray(uniforms.cam_pos_tex, np.float64)
                ks = (cam[2] * dz / bs[2], cam[1] * hy / bs[1],
                      cam[0] * wx / bs[0])
                sel = tuple(int(np.floor(k)) for k in ks)
            else:
                ks = None
                sel = tuple(range(maps.shape[0]))
            occ_key = ("occ", p, ver, sel)
            occ_t = cache.get(occ_key)
            if occ_t is None:
                # Evict combines of superseded map builds: each is a full
                # transposed u8 volume on device, and a long interactive
                # session (one rebuild per TF edit) would otherwise leak
                # device memory per edit. Octant stitches additionally
                # rotate per camera cell — bound them like the pose cache.
                stale = [k for k in cache
                         if isinstance(k, tuple) and k[0] == "occ"
                         and k[2] != ver]
                live = [k for k in cache
                        if isinstance(k, tuple) and k[0] == "occ"
                        and k[2] == ver]
                for k in stale + (live if len(live) > 16 else []):
                    del cache[k]
                if ks is not None:
                    src = _octant_composite(
                        maps, *(jnp.float32(k) for k in ks))
                else:
                    src = maps[sel[0]]
                    for i in sel[1:]:
                        src = jnp.minimum(src, maps[i])
                occ_t = sweep_mod.transpose_for_axis(src, p)
                cache[occ_key] = occ_t
        tf = self._tf(volume)
        # Host proj·view·model (float64 product, f32 result) once per pose;
        # the device copy is built only where a path needs it.
        pvm_h = pose.get("pvm_h")
        if pvm_h is None:
            pvm_h = pose["pvm_h"] = (
                camera.proj.astype(np.float64)
                @ camera.view.astype(np.float64)
                @ volume.model_matrix).astype(np.float32)
        if self.renderer == "pallas":
            from ..render import sweep_pallas as sp
            from ..options import Test as _T

            pallas_ok = (
                (not tf.use_gradient or grad_t is not None)
                and self.options.test in (_T.NONE, _T.NUM_TEXTURE_SAMPLES)
                and height % 8 == 0 and width % 128 == 0
                and vol_t.shape[2] >= 2 and vol_t.shape[1] >= 2
                # Depth-attachment frames: the w-grid sweep computes its
                # slab intervals from the camera geometry alone — it honors
                # the depth ENTRY test only via the pixel mask, not the
                # per-pixel EXIT clamp (volume_render.frag:152-164), so
                # scene geometry intersecting the volume would be occluded
                # wrongly. The banded XLA sweep and the marcher march the
                # depth-clamped ray intervals exactly.
                and not use_depth
            )
            if pallas_ok:
                # Host-analytic frame plan (render/plan.py): no device
                # reductions; cached per camera pose.
                plan = pose.get("plan")
                if "plan" not in pose:
                    forces = self.plan_force.get(
                        (p, 1.0 if view["sgn"] >= 0 else -1.0)) or []
                    if isinstance(forces, dict):
                        forces = [forces]
                    plan = None
                    # Envelope tiers (bench.freeze_orbit_statics), tried
                    # smallest grid first. Prefer the first tier that gives
                    # this pose a Pallas warp: an earlier tier whose warp
                    # re-check failed would route the frame through the
                    # XLA-gather warp (~100 ms) even when a larger tier's
                    # rects fit — keep such a plan only as the last resort.
                    plan_xla = None
                    for force in forces:
                        cand = sp.plan_from_stats(view, uniforms, p,
                                                  vol_t.shape, height, width,
                                                  force=force)
                        if cand is None:
                            continue
                        if not cand.get("warp_xla"):
                            plan = cand
                            break
                        if plan_xla is None:
                            plan_xla = cand
                    if plan is None:
                        plan = plan_xla
                    if plan is None:
                        plan = pose.get("plan_unforced")
                    pose["plan"] = plan
                if plan is not None:
                    import jax.numpy as _jnp

                    occ_arr = (
                        occ_t
                        if self.options.skipping_type != SkippingType.NONE
                        and occ_t is not None
                        else _jnp.zeros((1, 1, 1), _jnp.uint8)
                    )
                    n_slabs = int(max(2, round(
                        vol_t.shape[0]
                        * self._slab_oversample(volume, vol_t.shape, tf)
                    )))
                    if self._slab_ladder:
                        n_slabs = _ladder_up(n_slabs, vol_t.shape[0])
                    # The texture-TF variant exists only in the brick
                    # kernel; when that kernel is infeasible for this view
                    # the XLA sweep renders the frame.
                    if self.options.texture_tf and (
                            plan.get("R_brick") is None
                            or n_slabs < vol_t.shape[0]):
                        plan = None
                    elif (plan.get("rect_w", 256) > 256
                          and n_slabs < vol_t.shape[0]):
                        # Wide-rect plans exist only in the brick kernel,
                        # and the brick kernel needs >=1 slab per voxel
                        # plane; sampling_factor < 1 (a GUI slider value)
                        # violates that, and _frame_body would refuse at
                        # trace time. Narrow to a 256-rect re-plan up
                        # front instead of burning compile retries on a
                        # guaranteed refusal.
                        cand = pose.get("plan_narrow")
                        if cand is None:
                            cand = sp.plan_from_stats(
                                view, uniforms, p, vol_t.shape,
                                height, width, max_rect=256)
                            pose["plan_narrow"] = (cand if cand is not None
                                                   else False)
                        plan = cand or None

                def _spec_key(pl):
                    return (pl["Hi"], pl["Wi"], pl["R_sweep"],
                            pl["R_warp"], pl.get("tile_h"),
                            pl.get("R_brick"), pl.get("span_blks"),
                            pl.get("rect_w", 256),
                            pl["RECT_A"], pl["RECT_B"],
                            pl.get("warp_variant"), p, pl["sgn_p"],
                            height, width, self.options.test,
                            self.options.early_ray_termination,
                            # These are jit-static too: omitting them
                            # would let one variant's compile failures
                            # write off a DIFFERENT Mosaic specialisation
                            # (e.g. texture-TF 500s poisoning the
                            # closed-form kernel for the same pose).
                            self.options.texture_tf, n_slabs, dist_leap,
                            grad_t is not None)

                spec_key = None
                if plan is not None:
                    spec_key = _spec_key(plan)
                    if self._failed_specs.get(spec_key, 0) >= \
                            self._SPEC_RETRIES:
                        # Compile-failure fallback chain (the remote
                        # Mosaic compile service 500s intermittently on
                        # fresh classes): a refused wide-rect spec narrows
                        # to a 256-rect re-plan of the same view, then to
                        # the round-2 per-slab kernel (structurally
                        # independent of the brick kernel) — both still
                        # ~4-10× the XLA-sweep last resort. texture_tf
                        # exists only in the brick kernel, so that mode
                        # skips the per-slab rung. Each rung is cached on
                        # the pose (False = planning itself failed) and
                        # has its own compile-retry budget.
                        rungs = []
                        if plan.get("rect_w", 256) > 256:
                            rungs.append(("plan_narrow",
                                          dict(max_rect=256)))
                        if not self.options.texture_tf:
                            rungs.append(("plan_noblk",
                                          dict(no_brick=True)))
                        plan = None
                        for slot, kw in rungs:
                            cand = pose.get(slot)
                            if cand is None:
                                cand = sp.plan_from_stats(
                                    view, uniforms, p, vol_t.shape,
                                    height, width, **kw)
                                pose[slot] = (cand if cand is not None
                                              else False)
                            if not cand:
                                continue
                            if self.options.texture_tf and \
                                    cand.get("R_brick") is None:
                                # The texture-TF variant exists only in
                                # the brick kernel; a per-slab re-plan is
                                # a guaranteed trace-time refusal.
                                continue
                            spec_key = _spec_key(cand)
                            if self._failed_specs.get(spec_key, 0) < \
                                    self._SPEC_RETRIES:
                                plan = cand
                                break
                if plan is not None:
                    # ONE per-pose device transfer: every per-pose float
                    # (uniform leaves, pvm, grid params, homography coeffs)
                    # rides a single packed array (sweep_pallas.
                    # pack_frame_scalars), cached per pose — a static
                    # camera re-sends nothing, a fresh pose pays one
                    # dispatch instead of ~14.
                    gp = (plan["wu0"], plan["dwu"], plan.get("cu", 0.0),
                          plan["wv0"], plan["dwv"], plan.get("cv", 0.0))
                    hc = plan.get("hcoef")
                    # Keyed by the PLAN's scalars, not just the pose: the
                    # fallback chain can switch plans on a cached pose and
                    # the old plan's grid params would silently warp the
                    # new kernel's whole grid.
                    pk_key = (gp, None if hc is None
                              else tuple(np.asarray(hc).tolist()))
                    cached = pose.get("packed_dev")
                    if cached is not None and cached[0] == pk_key:
                        packed = cached[1]
                    else:
                        packed = _jnp.asarray(sp.pack_frame_scalars(
                            uniforms, pvm_h, list(gp), hc))
                        pose["packed_dev"] = (pk_key, packed)
                    try:
                        out = sp._frame_jit(
                            vol_t, occ_arr, tf, rays, packed, None, None,
                            grad_t if tf.use_gradient else None, None,
                            height=height, width=width,
                            p_axis=p, Hi=plan["Hi"], Wi=plan["Wi"],
                            R_sweep=plan["R_sweep"], R_warp=plan["R_warp"],
                            ert=self.options.early_ray_termination,
                            test=self.options.test, n_slabs=n_slabs,
                            sgn_p=plan["sgn_p"],
                            dist_leap=dist_leap and self.options.skipping_type
                            != SkippingType.NONE and occ_t is not None,
                            RECT_A=plan["RECT_A"], RECT_B=plan["RECT_B"],
                            tile_h=plan.get("tile_h", 8),
                            R_brick=plan.get("R_brick"),
                            span_blks=plan.get("span_blks", 2),
                            rect_w=plan.get("rect_w", 256),
                            texture_tf=self.options.texture_tf,
                            warp_variant=plan.get("warp_variant", "A"),
                            # Resolved HERE (not at trace time inside the
                            # kernel wrapper) so the A/B env var is part
                            # of the jit key — flipping it mid-process
                            # retraces instead of silently reusing the
                            # other precision's compiled frame.
                            tent_prec=os.environ.get(
                                "VKV_TENT_PRECISION", "highest"),
                        )
                        self.last_renderer = "pallas"
                        self.renderer_counts["pallas"] += 1
                        if plan.get("warp_xla"):
                            # The sweep ran on the Pallas kernel but the
                            # grid→pixel warp used the XLA gather (deep
                            # handover poses whose per-tile spans exceed
                            # both factorisation orders' rects) — report
                            # it so orbit artifacts can't overstate the
                            # all-Pallas fraction.
                            self.renderer_counts["pallas_xla_warp"] = (
                                self.renderer_counts.get(
                                    "pallas_xla_warp", 0) + 1)
                        return out
                    except Exception as e:  # pragma: no cover - infra flake
                        # The remote Mosaic compile service occasionally
                        # fails on a fresh (Hi, Wi, RECT) specialisation;
                        # the XLA sweep renders the frame (slowly) instead
                        # of dying. Cached specialisations are unaffected;
                        # the failed combo is memoised so later frames
                        # don't re-issue the multi-minute remote compile.
                        import sys

                        if spec_key is not None:
                            self._failed_specs[spec_key] = (
                                self._failed_specs.get(spec_key, 0) + 1)
                        print("WARNING: Pallas frame unavailable "
                              f"({str(e)[:120]}); using the XLA sweep",
                              file=sys.stderr)
        self.last_renderer = "sweep"
        self.renderer_counts["sweep"] += 1

        if rays is None:
            rays = pose["rays"] = make_rays(
                uniforms, height, width,
                depth_image=depth_image, use_depth=use_depth)

        pvm = pose.get("pvm")
        if pvm is None:
            pvm = pose["pvm"] = jnp.asarray(pvm_h)

        def sweep_rows(band):
            return sweep_mod.sweep(
                vol_t, grad_t, occ_t, tf, band, uniforms, pvm,
                p_axis=p,
                skipping=self.options.skipping_type != SkippingType.NONE,
                early_ray_termination=self.options.early_ray_termination,
                test=self.options.test,
                oversample=self._slab_oversample(volume, vol_t.shape, tf),
                tf_texture=self._tf_texture(volume),
            )

        # Band large fallback sweeps into row strips (pixel-independent —
        # identical output; a full-scale single-program sweep runs minutes
        # and the relay's device watchdog kills the TPU worker).
        n_px = height * width
        if n_px >= 512 * 512:
            n_bands = min(8, max(2, n_px // (256 * 1024)))
            rows_ix = [height * b // n_bands for b in range(n_bands + 1)]
            parts = [
                sweep_rows(jax.tree.map(
                    lambda x: x[rows_ix[b]:rows_ix[b + 1]], rays))
                for b in range(n_bands)
            ]
            return RenderOutput(
                color=jnp.concatenate([q.color for q in parts], axis=0),
                depth=jnp.concatenate([q.depth for q in parts], axis=0),
                num_volume_samples=jnp.concatenate(
                    [q.num_volume_samples for q in parts], axis=0),
                num_distance_samples=jnp.concatenate(
                    [q.num_distance_samples for q in parts], axis=0),
                num_empty_samples=jnp.concatenate(
                    [q.num_empty_samples for q in parts], axis=0),
                iterations=parts[0].iterations,
            )
        return sweep_rows(rays)

    def render_image(self, camera, width: int, height: int,
                     background=(0.0, 0.0, 0.0),
                     scene_mesh=None) -> np.ndarray:
        """Render and composite over a background, returning uint8 HxWx3.
        ``scene_mesh`` routes through the forward scene pass
        (render_with_scene — the reference's render_sponza_scene path)."""
        if scene_mesh is not None:
            out = self.render_with_scene(camera, width, height, scene_mesh)
        else:
            out = self.render(camera, width, height)
        rgba = np.asarray(out.color)
        bg = np.asarray(background, np.float32)
        rgb = rgba[..., :3] + (1.0 - rgba[..., 3:4]) * bg
        return np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)
