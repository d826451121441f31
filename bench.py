#!/usr/bin/env python3
"""Headline benchmark: ms/frame at 1920×1080, beetle-class volume,
distance-map ESS (the BASELINE.json north-star metric).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ms/frame", "vs_baseline": N, ...}

Baseline derivation (BASELINE.md): the reference's stag-beetle TF-a
distance-ESS result is 623.8 fps at 1200×1200 (benchmark_results_2.csv:14)
on unrecorded GPU hardware. Scaled to 1920×1080 pixels that is
623.8 / (1920*1080 / 1200**2) = 433.2 fps ≡ 2.308 ms/frame.
``vs_baseline`` = baseline_ms / our_ms (>1 = faster than the reference).

The CT datasets are not redistributable; the volume is a deterministic
synthetic stand-in with the same extents and calibrated to the same
occupancy (3.97 %) — the quantity that drives ESS work (see
vkvolume_tpu/bench/datasets.py).

Environment overrides: BENCH_FRAMES, BENCH_SCALE (volume scale factor),
BENCH_WIDTH/BENCH_HEIGHT, BENCH_DATASET, BENCH_SKIPMODE.
"""

import json
import os
import sys
import time


def _watchdog(timeout_s: float):
    """The relay/device occasionally wedges mid-run (ops never complete;
    only killing the client frees it). If the bench hasn't finished within
    ``timeout_s``, re-exec this process (fresh client, device unwedges);
    give up with a nonzero exit after two retries."""
    import threading

    done = threading.Event()

    def guard():
        if done.wait(timeout_s):
            return
        n = int(os.environ.get("BENCH_RETRY", "0"))
        if n < 2:
            os.environ["BENCH_RETRY"] = str(n + 1)
            sys.stderr.write(
                f"bench watchdog: no result in {timeout_s:.0f}s; "
                f"re-exec (attempt {n + 1}/2)\n")
            sys.stderr.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        sys.stderr.write("bench watchdog: giving up\n")
        os._exit(3)

    threading.Thread(target=guard, daemon=True).start()
    return done


def main():
    done = _watchdog(float(os.environ.get("BENCH_WATCHDOG_S", "1200")))
    frames = int(os.environ.get("BENCH_FRAMES", "10"))
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    dataset = os.environ.get("BENCH_DATASET", "beetle")
    skipmode = int(os.environ.get("BENCH_SKIPMODE", "2"))
    renderer = os.environ.get("BENCH_RENDERER", "pallas")
    orbit = float(os.environ.get("BENCH_ORBIT", "0"))      # deg/frame
    breakdown = os.environ.get("BENCH_BREAKDOWN", "1") != "0"

    import jax

    from vkvolume_tpu.utils import enable_compile_cache
    enable_compile_cache()

    print(f"devices: {jax.devices()}", file=sys.stderr)

    from vkvolume_tpu.bench.harness import run_config
    from vkvolume_tpu.options import Test

    t0 = time.time()
    r = run_config(
        dataset, skipmode, 4,
        width=width, height=height, frames=frames, scale=scale,
        # Headline number = the real shaded render with ERT on (the
        # user-facing configuration), not the sample-count test image.
        test=Test.NONE, ert=True, renderer=renderer, orbit_deg=orbit,
        keep_engine=breakdown and renderer == "pallas",
    )
    wall = time.time() - t0

    stages = None
    if r.engine is not None:
        # Reuse the timed engine (same config, volume and jit cache — no
        # second device setup).
        from vkvolume_tpu.bench.harness import benchmark_camera, stage_breakdown

        stages = stage_breakdown(
            r.engine, benchmark_camera(aspect=width / height), width, height)

    ref_fps_1200 = 623.8                      # benchmark_results_2.csv:14
    baseline_ms = 1000.0 / (ref_fps_1200 / ((width * height) / 1200.0 ** 2))
    reps = list(r.rep_ms)
    spread = (max(reps) - min(reps)) / r.frame_ms if reps else 0.0
    result = {
        "metric": f"ms/frame {width}x{height} {dataset} skipmode={skipmode} renderer={renderer} (synthetic, occupancy+structure-matched)",
        "value": round(r.frame_ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(baseline_ms / r.frame_ms, 4),
        "fps": round(r.framerate, 2),
        "map_update_ms": round(r.update, 3),
        "occupancy_pct": round(r.occupancy, 3),
        "frames": frames,
        "scale": scale,
        "wall_s": round(wall, 1),
        "rep_ms": reps,
        "rep_spread": round(spread, 3),
        "renderer_used": r.renderer_used,
        "renderer_counts": r.renderer_counts,
        "orbit_deg_per_frame": orbit,
        "stages": stages,
    }
    done.set()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
