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

Robustness (round 4): the axon relay/device intermittently WEDGES —
queued ops never complete and only killing the client process frees the
device (CLAUDE.md).  The bench therefore runs as a SUPERVISOR (this
process, no jax import) + WORKER (subprocess doing the device work).
The worker writes progressive results to a state file after every phase
(synth, engine build, first frame, every repetition); the supervisor
kills and respawns the worker when a phase stalls, degrades the protocol
on each respawn (fewer frames/reps), and emits the best available
result before any plausible driver timeout.  A wedge now costs one
respawn (~1-2 min warm via the persistent compile cache), not the whole
score.

Environment overrides: BENCH_FRAMES, BENCH_SCALE (volume scale factor),
BENCH_WIDTH/BENCH_HEIGHT, BENCH_DATASET, BENCH_SKIPMODE, BENCH_RENDERER,
BENCH_DEADLINE_S (emit best partial by this wall-clock), BENCH_FIT.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
STATE = os.path.join(REPO, ".cache", "bench_state.json")

# Per-phase stall budgets (seconds without the worker advancing to the
# next phase before the supervisor kills + respawns it).  Cold remote
# Mosaic compiles take minutes; the committed precompiled cache makes
# the engine/first-frame phases seconds when it hits.
PHASE_BUDGET = {
    "boot": 240.0,          # jax import + platform init
    "synth": 1800.0,        # synthesize the full-scale volume (pure numpy,
                            # 10-20 min cold at full scale; cached after)
    "synth_done": 600.0,    # engine build: maps (occupancy+DT compiles)
    "engine_ready": 600.0,  # first frame: sweep+warp kernel compiles
    "first_frame": 240.0,
    "partial": 300.0,       # each repetition (10 frames + sync)
    "rep": 300.0,
    "final_core": 300.0,    # stage breakdown is a bounded nice-to-have
}


def log(msg):
    sys.stderr.write(f"bench[{time.strftime('%H:%M:%S')}]: {msg}\n")
    sys.stderr.flush()


def write_state(data):
    data = dict(data)
    data["ts"] = time.time()
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(STATE))
    with os.fdopen(fd, "w") as fh:
        json.dump(data, fh)
    os.replace(tmp, STATE)


def read_state():
    try:
        with open(STATE) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def seed_compile_cache():
    """Populate .cache/jax from the committed precompiled cache so a
    fresh container (every round boundary wipes .cache) skips the
    multi-minute remote Mosaic compiles of the frame kernels."""
    import shutil

    dst = os.path.join(REPO, ".cache", "jax")
    src = os.path.join(REPO, "precompiled", "jax_cache")
    if not os.path.isdir(src):
        log("no precompiled/jax_cache in repo — cold-container compiles "
            "will run at full cost")
        return
    os.makedirs(dst, exist_ok=True)
    n = 0
    for name in os.listdir(src):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if not os.path.isfile(s):  # skip stray subdirectories
            continue
        if not os.path.exists(d):
            shutil.copy2(s, d)
            n += 1
    if n:
        log(f"seeded compile cache with {n} precompiled entries")


# ----------------------------------------------------------------- worker

def worker_main():
    attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
    # 20 frames queued per forced sync: the tunnel's ~34 ms host round
    # trip amortises to ~1.7 ms/frame (CLAUDE.md timing note); frames are
    # nearly free at steady state (~20-50 ms each), so degraded attempts
    # cut REPS (each rep ends in a sync), never frames-per-sync — round
    # 4's first 2x2 run inflated the score by ~17 ms/frame this way.
    frames = int(os.environ.get("BENCH_FRAMES", "20"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    if attempt == 1:
        reps = min(reps, 3)
    elif attempt >= 2:
        frames, reps = min(frames, 10), min(reps, 2)
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    width = int(os.environ.get("BENCH_WIDTH", "1920"))
    height = int(os.environ.get("BENCH_HEIGHT", "1080"))
    dataset = os.environ.get("BENCH_DATASET", "beetle")
    # Headline default is AnisotropicDistance (skipmode 3): it is the
    # reference's own best mode (benchmark_results_3.csv:14, 672.3 fps vs
    # 623.8 for Distance) and ours — 17.34 ms vs 18.19 ms for skipmode 2 on
    # device (docs/aniso_r5.json vs docs/bench_static_r5.json). vs_baseline
    # stays mode-matched either way, so the flip is a like-for-like win.
    skipmode = int(os.environ.get("BENCH_SKIPMODE", "3"))
    renderer = os.environ.get("BENCH_RENDERER", "pallas")
    breakdown = os.environ.get("BENCH_BREAKDOWN", "1") != "0" and attempt == 0

    t_start = time.time()
    write_state({"phase": "boot", "attempt": attempt})

    import numpy as np

    import jax  # noqa: F401  (platform init)

    from vkvolume_tpu.utils import enable_compile_cache
    enable_compile_cache()
    log(f"worker attempt={attempt} frames={frames} reps={reps} "
        f"devices={jax.devices()}")

    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine
    from vkvolume_tpu.options import Test

    ds = DATASETS[dataset]
    write_state({"phase": "synth", "attempt": attempt})
    vol_u8 = synthesize(ds, seed=0, scale=scale)
    write_state({"phase": "synth_done", "attempt": attempt,
                 "synth_s": round(time.time() - t_start, 1)})
    log(f"synth done in {time.time() - t_start:.0f}s")

    eng, stats, _, _ = make_engine(
        dataset, skipmode, 4, scale=scale, volume_u8=vol_u8,
        renderer=renderer, test=Test.NONE, ert=True)
    write_state({"phase": "engine_ready", "attempt": attempt,
                 "map_update_ms": stats.map_update_ms,
                 "occupancy_pct": stats.occupied_voxel_percent})
    log(f"engine ready at {time.time() - t_start:.0f}s "
        f"(update {stats.map_update_ms:.1f} ms)")

    cam = benchmark_camera(aspect=width / height)
    fit = os.environ.get("VKV_BENCH_FIT", "aspect")
    # Mode-matched reference fps (stag beetle TF-a, 1200x1200, BASELINE.md):
    # vs_baseline always compares like-for-like skipping modes —
    # benchmark_results_{0..3}.csv:14 (None/Block/Distance/AnisoDist).
    ref_fps_1200 = {0: 75.3, 1: 340.3, 2: 623.8, 3: 672.3}[skipmode]
    baseline_ms = 1000.0 / (ref_fps_1200 / ((width * height) / 1200.0 ** 2))
    # Measured stretch/aspect frame-cost ratio at this pose (same-session
    # A/B: docs/fit_ab_r4.json 21.469 ms stretch vs docs/bench_static_r4.json
    # 18.016 ms aspect). ``value`` stays the aspect-fit headline (the repo's
    # north-star display protocol, BASELINE.json); ``vs_baseline`` is always
    # computed against the reference's own stretch protocol — the aspect
    # measurement is converted with this factor so the ratio is
    # protocol-matched regardless of VKV_BENCH_FIT (PERF.md fit note).
    stretch_cost_factor = 21.469 / 18.016

    def result(frame_ms, rep_ms, partial, extra=None):
        stretch_ms = (frame_ms if fit == "stretch"
                      else frame_ms * stretch_cost_factor)
        r = {
            "metric": (f"ms/frame {width}x{height} {dataset} "
                       f"skipmode={skipmode} renderer={renderer} "
                       f"fit={fit} (synthetic, occupancy+structure-matched)"),
            "value": round(frame_ms, 3),
            "unit": "ms/frame",
            # Reference frame time pixel-scaled from its 1200x1200 stretch
            # protocol, divided by our stretch-equivalent frame time.
            "vs_baseline": round(baseline_ms / stretch_ms, 4),
            "frame_ms_stretch_equiv": round(stretch_ms, 3),
            "fit": fit,
            "fps": round(1000.0 / frame_ms, 2),
            "map_update_ms": round(stats.map_update_ms or 0.0, 3),
            "occupancy_pct": round(stats.occupied_voxel_percent or 0.0, 3),
            "frames": frames,
            "scale": scale,
            "wall_s": round(time.time() - t_start, 1),
            "rep_ms": [round(r, 3) for r in rep_ms],
            "rep_spread": round((max(rep_ms) - min(rep_ms)) / frame_ms, 3)
            if rep_ms else 0.0,
            "renderer_used": getattr(eng, "last_renderer", ""),
            "renderer_counts": dict(getattr(eng, "renderer_counts", {}) or {}),
            "partial": partial,
            "attempt": attempt,
            "protocol": f"{reps}x{frames}",
            "stages": None,
        }
        if extra:
            r.update(extra)
        return r

    def sync(out):
        out.color.block_until_ready()
        float(out.color.ravel()[0])

    # Warm-up frame (compiles the frame kernels on a cold cache).
    out = eng.render(cam, width, height)
    sync(out)
    write_state({"phase": "first_frame", "attempt": attempt,
                 "first_frame_s": round(time.time() - t_start, 1)})
    log(f"first frame at {time.time() - t_start:.0f}s")

    # Quick partial: 5 timed frames — worth emitting the moment we have
    # ANY steady-state number (a later wedge must not zero the score).
    t0 = time.perf_counter()
    for _ in range(5):
        out = eng.render(cam, width, height)
    sync(out)
    quick_ms = (time.perf_counter() - t0) / 5 * 1e3
    write_state({"phase": "partial", "attempt": attempt,
                 "result": result(quick_ms, [quick_ms], True)})
    log(f"quick partial: {quick_ms:.1f} ms/frame")

    rep_ms = []
    for rep in range(reps):
        t0 = time.perf_counter()
        for _ in range(frames):
            out = eng.render(cam, width, height)
        sync(out)
        rep_ms.append((time.perf_counter() - t0) / frames * 1e3)
        med = float(np.median(rep_ms))
        write_state({"phase": "rep", "rep": rep, "attempt": attempt,
                     "result": result(med, rep_ms, rep + 1 < reps)})
        log(f"rep {rep + 1}/{reps}: {rep_ms[-1]:.1f} ms (median {med:.1f})")

    med = float(np.median(rep_ms))
    final = result(med, rep_ms, False)
    write_state({"phase": "final_core", "attempt": attempt, "result": final})

    if breakdown:
        try:
            from vkvolume_tpu.bench.harness import stage_breakdown
            final["stages"] = stage_breakdown(eng, cam, width, height)
        except Exception as e:  # breakdown must never lose the result
            log(f"stage breakdown failed: {e!r}")
    write_state({"phase": "final", "attempt": attempt, "result": final})
    log(f"worker done in {time.time() - t_start:.0f}s")


# ------------------------------------------------------------- supervisor

def spawn_worker(attempt):
    env = dict(os.environ, BENCH_ATTEMPT=str(attempt))
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        env=env, cwd=REPO, stdout=sys.stderr, stderr=sys.stderr,
        start_new_session=True)


def kill_worker(proc):
    """SIGKILL the whole worker process group: a wedged axon client only
    frees the device when the process dies (CLAUDE.md)."""
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        proc.kill()
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        pass


def supervise():
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
    max_attempts = int(os.environ.get("BENCH_MAX_ATTEMPTS", "5"))
    t_start = time.time()
    os.makedirs(os.path.dirname(STATE), exist_ok=True)
    try:
        os.remove(STATE)
    except OSError:
        pass
    seed_compile_cache()

    best = None              # best (most complete) result dict so far
    attempt = 0
    proc = spawn_worker(attempt)
    log(f"supervisor: worker pid {proc.pid}, deadline {deadline_s:.0f}s")
    phase, phase_t = "boot", time.time()

    def emit(r, rc=0):
        r = dict(r)
        r["total_wall_s"] = round(time.time() - t_start, 1)
        print(json.dumps(r))
        sys.stdout.flush()
        sys.exit(rc)

    while True:
        time.sleep(2)
        st = read_state()
        if st:
            key = st["phase"] if st["phase"] != "rep" \
                else f"rep{st.get('rep')}"
            if key != phase:
                phase, phase_t = key, time.time()
            if "result" in st:
                best = st["result"]
            if st["phase"] == "final":
                # The worker can wedge at teardown (the axon failure mode
                # this supervisor exists to survive) — the result is
                # already complete in `best`, so kill and emit regardless.
                try:
                    proc.wait(timeout=120)
                except subprocess.TimeoutExpired:
                    log("worker wedged at teardown — killing")
                    kill_worker(proc)
                log("final result ready")
                emit(best)
        if proc.poll() is not None and (not st or st["phase"] != "final"):
            # Worker died (crash or OOM-kill).  final_core counts as done
            # if only the breakdown crashed.
            if best is not None and not best.get("partial"):
                emit(best)
            log(f"worker exited rc={proc.returncode} in phase {phase}")
            attempt += 1
            if attempt >= max_attempts:
                if best is not None:
                    emit(best)
                log("giving up: no measurement")
                sys.exit(3)
            proc = spawn_worker(attempt)
            phase, phase_t = "boot", time.time()
            continue
        budget = PHASE_BUDGET.get(phase.rstrip("0123456789"),
                                  PHASE_BUDGET["rep"])
        if time.time() - phase_t > budget:
            log(f"phase '{phase}' stalled >{budget:.0f}s — "
                "killing worker (wedged device frees on client death)")
            kill_worker(proc)
            attempt += 1
            if attempt >= max_attempts:
                if best is not None:
                    emit(best)
                log("giving up: no measurement after max attempts")
                sys.exit(3)
            proc = spawn_worker(attempt)
            phase, phase_t = "boot", time.time()
        if time.time() - t_start > deadline_s and best is not None:
            # Emit the best partial before any plausible driver timeout;
            # with no measurement yet there is nothing to protect — keep
            # running (the driver's own timeout is the only loss mode).
            log("deadline reached — emitting best available result")
            kill_worker(proc)
            emit(best)


def main():
    if "--worker" in sys.argv:
        worker_main()
    else:
        supervise()


if __name__ == "__main__":
    main()
