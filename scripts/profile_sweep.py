#!/usr/bin/env python3
"""Sweep-kernel profiler: stage timings + work statistics for the headline
config (beetle, distance ESS, 1920x1080) driving the round-3 optimisation.

Reports:
  * plan statics (Hi, Wi, R_sweep, n_slabs, warp rects)
  * sampled-slabs-per-pixel distribution (nsamp from the count_samples
    output) -> the kernel's work model
  * timings: full frame, sweep stage (return_chans), warp stage
  * optional kernel variants via env PROF_VARIANTS

Env: PROF_SCALE (default 1.0), PROF_DATASET (beetle), PROF_SKIPMODE (2),
PROF_W/PROF_H (1920/1080), PROF_INNER (queued executions per sync, 10).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    scale = float(os.environ.get("PROF_SCALE", "1.0"))
    dataset = os.environ.get("PROF_DATASET", "beetle")
    skipmode = int(os.environ.get("PROF_SKIPMODE", "2"))
    width = int(os.environ.get("PROF_W", "1920"))
    height = int(os.environ.get("PROF_H", "1080"))
    inner = int(os.environ.get("PROF_INNER", "10"))
    reps = int(os.environ.get("PROF_REPS", "3"))

    import faulthandler
    faulthandler.dump_traceback_later(900, repeat=True, file=sys.stderr)

    # Relay-wedge watchdog (see bench.py): re-exec once on stall.
    import threading

    done = threading.Event()
    timeout_s = float(os.environ.get("PROF_WATCHDOG_S", "2400"))

    def guard():
        if done.wait(timeout_s):
            return
        n = int(os.environ.get("PROF_RETRY", "0"))
        if n < 1:
            os.environ["PROF_RETRY"] = str(n + 1)
            sys.stderr.write("profile watchdog: re-exec\n")
            sys.stderr.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        sys.stderr.write("profile watchdog: giving up\n")
        os._exit(3)

    threading.Thread(target=guard, daemon=True).start()

    import jax
    import numpy as np

    from vkvolume_tpu.utils import enable_compile_cache
    enable_compile_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine
    from vkvolume_tpu.render import sweep_pallas as sp

    t0 = time.perf_counter()
    eng, stats, _vol, _ = make_engine(dataset, skipmode, 4, scale=scale)
    print(f"engine ready in {time.perf_counter() - t0:.1f}s "
          f"(occ {stats.occupied_voxel_percent:.2f}%, "
          f"update {stats.map_update_ms:.1f} ms)", file=sys.stderr, flush=True)

    cam = benchmark_camera(aspect=width / height)

    # Capture the production _frame_jit invocation.
    captured = {}
    orig = sp._frame_jit

    def capture(*a, **k):
        captured["a"], captured["k"] = a, k
        return orig(*a, **k)

    sp._frame_jit = capture
    try:
        out = eng.render(cam, width, height)
        out.color.block_until_ready()
        float(out.color.ravel()[0])
    finally:
        sp._frame_jit = orig
    if "a" not in captured:
        print(json.dumps({"error": "pallas path not taken",
                          "renderer": eng.last_renderer}))
        return
    a, k = captured["a"], captured["k"]
    plan_info = {kk: k[kk] for kk in
                 ("Hi", "Wi", "R_sweep", "R_warp", "n_slabs", "RECT_A",
                  "RECT_B", "p_axis")}
    vol_t = a[0]
    print(f"plan: {plan_info}  vol_t {vol_t.shape}", file=sys.stderr,
          flush=True)

    # ---- work statistics: sampled slabs per grid pixel ----
    from vkvolume_tpu.options import Test
    k_ns = dict(k)
    k_ns["test"] = Test.NUM_TEXTURE_SAMPLES
    chans, _it = orig(*a, **k_ns, return_chans=True)
    nsamp = np.asarray(chans[3])
    ns_stats = {
        "grid_px": int(nsamp.size),
        "mean": float(nsamp.mean()),
        "p50": float(np.percentile(nsamp, 50)),
        "p90": float(np.percentile(nsamp, 90)),
        "p99": float(np.percentile(nsamp, 99)),
        "max": float(nsamp.max()),
        "total_slab_samples_M": float(nsamp.sum() / 1e6),
    }
    # Per-tile sampled-slab counts: a tile samples a slab if ANY of its
    # pixels does; approximate from tile-max (lower bound on union).
    Hi, Wi = nsamp.shape
    tmax = nsamp.reshape(Hi // 8, 8, Wi // 128, 128).max(axis=(1, 3))
    ns_stats["tiles"] = int(tmax.size)
    ns_stats["tile_max_mean"] = float(tmax.mean())
    ns_stats["tile_slab_samples_K"] = float(tmax.sum() / 1e3)
    print(f"nsamp: {ns_stats}", file=sys.stderr, flush=True)

    def timed(fn, label):
        out = fn()
        jax.block_until_ready(out)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                out = fn()
            jax.block_until_ready(out)
            float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            ts.append((time.perf_counter() - t0) * 1e3 / inner)
        v = float(np.median(ts))
        print(f"{label}: {v:.2f} ms  (reps {[round(t, 2) for t in ts]})",
              file=sys.stderr, flush=True)
        return v

    res = {"plan": {kk: (v if not hasattr(v, "item") else v.item())
                    for kk, v in plan_info.items()},
           "nsamp": ns_stats, "scale": scale}
    res["frame_ms"] = timed(lambda: orig(*a, **k), "full frame")
    res["sweep_ms"] = timed(lambda: orig(*a, **k, return_chans=True),
                            "sweep stage")

    chans, iters = orig(*a, **k, return_chans=True)
    rays, uniforms, gp = a[3], a[4], a[6]
    hcoef = a[8] if len(a) > 8 else None
    from vkvolume_tpu.render.ray_setup import FrameUniforms as _FU

    if not isinstance(uniforms, _FU):
        # Packed per-pose scalars (engine fast path): unpack on the host
        # (same dance as bench.harness.stage_breakdown).
        uniforms, _pvm, gp, hcoef = sp.unpack_frame_scalars(
            np.asarray(uniforms))
    if rays is None:
        from vkvolume_tpu.render.ray_setup import make_rays

        rays = make_rays(uniforms, height, width)
    tf = a[2]
    res["warp_ms"] = timed(lambda: sp._pixel_stage_jit(
        chans, rays, gp, hcoef, tf, iters,
        p_axis=k["p_axis"], Hi=k["Hi"], R_warp=k["R_warp"], test=k["test"],
        RECT_A=k["RECT_A"], RECT_B=k["RECT_B"], interpret=False,
        dim_max=max(vol_t.shape), H_total=None,
        warp_variant=k.get("warp_variant", "A")), "warp stage")

    # Kernel-variant A/B on the SAME captured frame (tent-dot precision;
    # a wider rect, which is always safe to widen) plus a re-planned
    # 256-rect engine — calibrates the plan cost model's rect factor and
    # picks the production tent precision.
    if os.environ.get("PROF_VARIANTS", "0") == "1":
        if k.get("RECT_A") is not None:
            res["warp_pipe_ms"] = timed(lambda: sp._pixel_stage_jit(
                chans, rays, gp, hcoef, tf, iters,
                p_axis=k["p_axis"], Hi=k["Hi"], R_warp=k["R_warp"],
                test=k["test"], RECT_A=k["RECT_A"], RECT_B=k["RECT_B"],
                interpret=False, dim_max=max(vol_t.shape), H_total=None,
                warp_variant=k.get("warp_variant", "A"),
                warp_pipe=True), "warp stage (pipelined)")
        for prec in ("high", "split3", "default"):
            # Mosaic rejects dot precision HIGH on this toolchain
            # (docs/smoke_r4.json brick_rect512_tent_high); record the
            # failure instead of killing the whole profile run.
            try:
                res[f"sweep_tent_{prec}_ms"] = timed(
                    lambda p=prec: orig(*a, **k, return_chans=True,
                                        tent_prec=p),
                    f"sweep tent={prec}")
            except NotImplementedError as e:
                res[f"sweep_tent_{prec}_ms"] = f"unsupported: {e}"
        rw = k.get("rect_w", 256)
        if rw < 512 and k.get("R_brick") is not None \
                and k["R_brick"] <= 64:
            k5 = dict(k)
            k5["rect_w"] = 512
            res["sweep_rect512_ms"] = timed(
                lambda: orig(*a, **k5, return_chans=True), "sweep rect512")
        if rw > 256:
            prev_max_rect = os.environ.get("VKV_MAX_RECT")
            os.environ["VKV_MAX_RECT"] = "256"
            try:
                eng2, *_ = make_engine(dataset, skipmode, 4, scale=scale)
                cap2 = {}

                def capture2(*aa, **kk):
                    cap2["a"], cap2["k"] = aa, kk
                    return orig(*aa, **kk)

                sp._frame_jit = capture2
                try:
                    out2 = eng2.render(cam, width, height)
                    float(out2.color.ravel()[0])
                finally:
                    sp._frame_jit = orig
                if "a" in cap2:
                    a2, k2 = cap2["a"], cap2["k"]
                    res["plan_rect256"] = {
                        kk: k2[kk] for kk in ("Hi", "Wi", "rect_w",
                                              "tile_h", "R_brick")}
                    print(f"rect256 plan: {res['plan_rect256']}",
                          file=sys.stderr, flush=True)
                    res["sweep_rect256_plan_ms"] = timed(
                        lambda: orig(*a2, **k2, return_chans=True),
                        "sweep rect256-plan")
                    res["frame_rect256_plan_ms"] = timed(
                        lambda: orig(*a2, **k2), "frame rect256-plan")
            finally:
                if prev_max_rect is None:
                    del os.environ["VKV_MAX_RECT"]
                else:
                    os.environ["VKV_MAX_RECT"] = prev_max_rect

    # Sweep with ESS disabled (occupancy "occupied everywhere") to measure
    # the no-skip slab cost the leaps save.
    if os.environ.get("PROF_NOSKIP", "0") == "1":
        import jax.numpy as jnp
        a_ns = list(a)
        a_ns[1] = jnp.zeros((1, 1, 1), jnp.uint8)
        k2 = dict(k)
        k2["dist_leap"] = False
        res["sweep_noskip_ms"] = timed(
            lambda: orig(*a_ns, **k2, return_chans=True), "sweep no-skip")

    done.set()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
