#!/usr/bin/env python3
"""Scripted interactive session — headless proof of the reference's GUI loop.

The reference is an interactive renderer: dragging a TF slider triggers
``update_transfer_function`` (occupancy + distance-map rebuild) and the next
frame renders with the new maps (src/volume_render.cpp:447-547 draw_gui →
:392-445 update path). This script drives the same loop headlessly at full
scale: load the beetle, render, sweep the intensity-min slider over N
positions, and record the per-edit latency (map rebuild + re-render, synced
to the host) as a committed JSON artifact.

Env: SESS_DATASET (beetle), SESS_SCALE (1.0), SESS_W/H (1920/1080),
SESS_EDITS (12), SESS_SKIPMODE (2), SESS_OUT (docs/interactive_r3.json).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    dataset = os.environ.get("SESS_DATASET", "beetle")
    scale = float(os.environ.get("SESS_SCALE", "1.0"))
    width = int(os.environ.get("SESS_W", "1920"))
    height = int(os.environ.get("SESS_H", "1080"))
    n_edits = int(os.environ.get("SESS_EDITS", "12"))
    skipmode = int(os.environ.get("SESS_SKIPMODE", "2"))
    out_path = os.environ.get("SESS_OUT", "docs/interactive_r3.json")

    import faulthandler
    faulthandler.dump_traceback_later(900, repeat=True, file=sys.stderr)

    from vkvolume_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine

    t0 = time.perf_counter()
    # Interactive configuration: shaded image, ERT on (not benchmark mode).
    eng, stats, _vol, _ = make_engine(
        dataset, skipmode, 4, scale=scale, benchmark_mode=False,
        renderer="pallas")
    vol = eng.volumes[0]
    load_s = time.perf_counter() - t0
    cam = benchmark_camera(aspect=width / height)

    def render_synced():
        out = eng.render(cam, width, height)
        out.color.block_until_ready()
        float(out.color.ravel()[0])
        return out

    # Warm-up: first frame compiles the pipeline.
    t0 = time.perf_counter()
    render_synced()
    warm_s = time.perf_counter() - t0
    print(f"loaded in {load_s:.1f}s, first frame {warm_s:.1f}s",
          file=sys.stderr, flush=True)

    # Structural-edit prewarm (Engine.prewarm_interactive): freezes the
    # plan statics over the GUI's pose-edit envelope and compiles the
    # sampling-ladder tiers up front — the honest interactive protocol is
    # "setup pays the compiles once, edits stay interactive" (the viewer
    # does exactly this at startup). SESS_PREWARM=0 measures cold.
    prewarm_s = None
    if os.environ.get("SESS_PREWARM", "1") != "0":
        t0 = time.perf_counter()
        prewarm_s = eng.prewarm_interactive(cam, width, height)
        print(f"prewarm {prewarm_s:.1f}s", file=sys.stderr, flush=True)

    imin0 = vol.options.intensity_min
    edits = []
    for i in range(n_edits):
        # Slider drag: intensity window sweeps up then back down.
        frac = i / max(n_edits - 1, 1)
        tri = 2 * frac if frac <= 0.5 else 2 * (1 - frac)
        imin = imin0 + tri * 0.25
        t0 = time.perf_counter()
        vol.options.intensity_min = imin
        upd = eng.update_transfer_function(vol)
        t_update = time.perf_counter() - t0
        t1 = time.perf_counter()
        render_synced()
        t_render = time.perf_counter() - t1
        edits.append(dict(
            imin=round(imin, 4),
            update_ms=round(t_update * 1e3, 2),
            render_ms=round(t_render * 1e3, 2),
            total_ms=round((t_update + t_render) * 1e3, 2),
            renderer=eng.last_renderer,
        ))
        print(f"edit {i}: imin={imin:.3f} update {t_update*1e3:.1f} ms "
              f"render {t_render*1e3:.1f} ms ({eng.last_renderer})",
              file=sys.stderr, flush=True)

    # Pipelined cadence: the synced numbers above charge every edit a full
    # host↔device round trip (~34 ms on this transport); a real GUI loop
    # pipelines edits against the device queue (the reference never reads
    # back between an edit and the next draw, volume_render.cpp:392-445).
    # Apply the same slider sweep back-to-back, sync once, report per-edit.
    t0 = time.perf_counter()
    n_pipe = max(4, n_edits // 2)
    for i in range(n_pipe):
        frac = i / max(n_pipe - 1, 1)
        tri = 2 * frac if frac <= 0.5 else 2 * (1 - frac)
        vol.options.intensity_min = imin0 + tri * 0.25
        eng.update_transfer_function(vol)
        out = eng.render(cam, width, height)
    out.color.block_until_ready()
    float(np.asarray(out.color.ravel()[0]))
    pipelined_ms = (time.perf_counter() - t0) * 1e3 / n_pipe
    vol.options.intensity_min = imin0
    eng.update_transfer_function(vol)
    print(f"pipelined TF-edit cadence: {pipelined_ms:.1f} ms/edit "
          f"({n_pipe} edits, one sync)", file=sys.stderr, flush=True)

    totals = [e["total_ms"] for e in edits]
    result = dict(
        dataset=dataset, scale=scale, width=width, height=height,
        skipmode=skipmode, n_edits=n_edits,
        total_ms_median=sorted(totals)[len(totals) // 2],
        total_ms_max=max(totals),
        prewarm_s=None if prewarm_s is None else round(prewarm_s, 2),
        pipelined_ms_per_edit=round(pipelined_ms, 2),
        renderer_counts=eng.renderer_counts,
        edits=edits,
        protocol=("per edit: set intensity_min -> update_transfer_function "
                  "(occupancy + distance rebuild, engine dirty-tracking) -> "
                  "render -> forced host sync; mirrors "
                  "src/volume_render.cpp:447-547 -> :392-445"),
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)

    # The other GUI edit classes (sampling/translation/spin/ESS-method —
    # volume_render.cpp:447-547), appended AFTER the core artifact is on
    # disk: a mid-extras relay failure still leaves the TF sweep complete.
    # Fresh poses (translation/spin) may pay a new plan or even a Mosaic
    # specialisation — that cost is the honest interactivity number.
    if os.environ.get("SESS_EXTRAS", "1") != "0":
        from vkvolume_tpu.options import SkippingType

        def timed_edit(name, apply_fn, rebuild=False):
            # update_ms covers the edit application INCLUDING any map
            # rebuild it triggers itself (set_skipping_type rebuilds
            # internally; rebuild=True adds the TF path explicitly).
            t0 = time.perf_counter()
            apply_fn()
            if rebuild:
                eng.update_transfer_function(vol)
            upd_ms = (time.perf_counter() - t0) * 1e3
            t1 = time.perf_counter()
            render_synced()
            rnd_ms = (time.perf_counter() - t1) * 1e3
            e = dict(edit=name, update_ms=round(upd_ms, 2),
                     render_ms=round(rnd_ms, 2),
                     total_ms=round(upd_ms + rnd_ms, 2),
                     renderer=eng.last_renderer)
            print(f"extra {name}: update {upd_ms:.1f} ms render "
                  f"{rnd_ms:.1f} ms ({eng.last_renderer})",
                  file=sys.stderr, flush=True)
            extras.append(e)
            result["extra_edits"] = extras
            with open(out_path, "w") as fh:
                json.dump(result, fh, indent=1)

        extras = []
        samp0 = vol.options.sampling_factor
        timed_edit("sampling=1.5", lambda: setattr(
            vol.options, "sampling_factor", 1.5), rebuild=True)
        timed_edit(f"sampling={samp0}", lambda: setattr(
            vol.options, "sampling_factor", samp0), rebuild=True)
        t0_xyz = vol.get_translation()
        timed_edit("translate+8x", lambda: vol.set_translation(
            t0_xyz + np.asarray([8.0, 0.0, 0.0])))
        timed_edit("translate-back", lambda: vol.set_translation(t0_xyz))
        timed_edit("spin15", lambda: vol.set_spin(np.deg2rad(15.0)))
        timed_edit("spin0", lambda: vol.set_spin(0.0))
        st0 = eng.options.skipping_type
        timed_edit("skipmode=3", lambda: eng.set_skipping_type(
            SkippingType.ANISOTROPIC_DISTANCE))
        timed_edit(f"skipmode={int(st0)}",
                   lambda: eng.set_skipping_type(st0))

    print(json.dumps({k: result[k] for k in
                      ("total_ms_median", "total_ms_max",
                       "renderer_counts")}))


if __name__ == "__main__":
    main()
