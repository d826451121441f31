#!/usr/bin/env python3
"""TPU-mode parity artifact: the Mosaic-compiled production path vs the
reference-exact marcher on the real device, full scale.

For each config, renders one frame with the Pallas pipeline (the engine's
default path, including the padded-viewport plan) and one with the
lock-step marcher oracle, and records pixel-diff statistics to
docs/parity_r3.json — the committed evidence that the compiled kernels
match the oracle outside interpret mode (VERDICT round-1 weak #4).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vkvolume_tpu.utils import enable_compile_cache


def render(renderer, dataset, skipmode, width, height, scale, vol_u8,
           edge_repair=False):
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine

    eng, _, _, _ = make_engine(dataset, skipmode, 4, scale=scale,
                               volume_u8=vol_u8, renderer=renderer,
                               benchmark_mode=False)
    eng.options.edge_repair = edge_repair
    cam = benchmark_camera(aspect=width / height)
    if edge_repair:
        # The oracle march costs ∝ the STATIC budget K whether or not the
        # lanes are live — probe the suspect count first (budget 0 renders
        # the frame + detector only) and bucket the budget to the smallest
        # power-of-two fraction that covers it (few K classes → few
        # multi-minute remote marcher compiles, reused across configs).
        eng.options.repair_budget = 0.0
        eng.render(cam, width, height)
        n_probe = int(np.asarray(eng.last_repair_px[0]))
        n_px = width * height
        # 1.25 headroom: the probe frame's suspect count ran ~10 % under
        # the repair frame's on the beetle (docs/parity_r4.json beetle
        # edge_repair: n_found 71,151 vs budget 65,536 — a starved budget
        # leaves exactly the over-budget tail unrepaired).
        for frac in (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0):
            if 1.25 * n_probe <= max(2048, int(n_px * frac)):
                break
        eng.options.repair_budget = frac
    out = eng.render(cam, width, height)
    color = np.asarray(out.color)
    used = getattr(eng, "last_renderer", renderer)
    # Warm per-frame cost (the cost/benefit column): the first render paid
    # compiles + map builds; queue a few same-pose frames and sync once.
    frame_ms = None
    if renderer == "pallas":
        # Repair frames cost seconds each (oracle march over suspects,
        # banded); 3 reps bound the timing noise without burning minutes.
        n = 3 if edge_repair else 10
        t0 = time.time()
        for _ in range(n):
            out = eng.render(cam, width, height)
        out.color.block_until_ready()
        float(np.asarray(out.color.ravel()[0]))
        frame_ms = (time.time() - t0) * 1e3 / n
    if edge_repair:
        # (0, 0) when the frame never hit the sweep path (marcher frames
        # are already oracle-exact and need no repair).
        n_found, budget = getattr(eng, "last_repair_px", (0, 0))
        return color, used, (int(n_found), int(budget)), frame_ms
    return color, used, frame_ms


def main():
    enable_compile_cache()
    from vkvolume_tpu.bench.datasets import DATASETS, synthesize

    width = int(os.environ.get("PARITY_W", "1920"))
    height = int(os.environ.get("PARITY_H", "1080"))
    scale = float(os.environ.get("PARITY_SCALE", "1.0"))
    # Config syntax dataset:skipmode[:scale]. All renders run FULL SCALE:
    # the gradient marcher oracle is banded into 32 short row-strip
    # programs (engine.render_volume) so no single device program exceeds
    # the relay's watchdog. The oracle image is identical across skipmodes
    # (ESS skipping is exact), so it renders once per dataset and is
    # reused for all four.
    default_cfgs = ",".join(
        f"{ds}:{sm}"
        for ds in ("present", "present-grad", "beetle", "beetle-grad",
                   "snake", "snake-grad")
        for sm in (0, 1, 2, 3)
    )
    configs = os.environ.get("PARITY_CONFIGS", default_cfgs).split(",")

    out_path = os.environ.get("PARITY_OUT", "docs/parity_r3.json")
    results = {}
    if os.path.exists(out_path):
        # Incremental: the relay crashes mid-run; keep completed configs.
        with open(out_path) as fh:
            results = json.load(fh)
    def save():
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)

    want_repair = os.environ.get("PARITY_REPAIR", "1") != "0"
    oracle_cache = {}
    for cfg in configs:
        # A row is complete when its repair column exists (or repair is
        # off): the default column is committed to disk BEFORE the repair
        # render, so a relay crash mid-repair only re-runs the repair.
        if cfg in results and (not want_repair
                               or "edge_repair" in results[cfg]):
            print(f"{cfg}: already done", flush=True)
            continue
        parts = cfg.split(":")
        dataset, skipmode = parts[0], int(parts[1])
        cfg_scale = float(parts[2]) if len(parts) > 2 else scale
        t0 = time.time()
        have_default = cfg in results

        # The production image is skipmode-invariant (ESS only decides
        # what to SKIP, never the sampled values; the identical default
        # stats across skipmodes prove it row-by-row). Reuse a sibling
        # skipmode's repair column instead of re-marching the same
        # suspects — the ~700 s/row grad-TF repair march otherwise
        # dominates the whole artifact chain 4x over.
        def try_reuse():
            tail = f":{parts[2]}" if len(parts) > 2 else ""
            for sib_sm in (0, 1, 2, 3):
                sib = f"{dataset}:{sib_sm}{tail}"
                if sib == cfg or "edge_repair" not in results.get(sib, {}):
                    continue
                same = all(
                    results[cfg].get(k) == results[sib].get(k)
                    for k in ("max_abs_diff", "mean_abs_diff",
                              "pct_pixels_gt_8_of_255", "covered_px"))
                if same:
                    results[cfg]["edge_repair"] = dict(
                        results[sib]["edge_repair"], reused_from=sib)
                    print(f"{cfg}: repair column reused from {sib} "
                          "(identical default stats)", flush=True)
                    save()
                    return True
            return False

        if have_default and want_repair and try_reuse():
            continue

        vol = synthesize(DATASETS[dataset], scale=cfg_scale)
        okey = (dataset, cfg_scale)
        if not have_default:
            got, used, base_ms = render("pallas", dataset, skipmode, width,
                                        height, cfg_scale, vol)
        if okey not in oracle_cache:
            oracle_cache[okey] = render("marcher", dataset, 2, width,
                                        height, cfg_scale, vol)[0]
        ref = oracle_cache[okey]
        if have_default:
            print(f"{cfg}: default column already done", flush=True)
        diff = None if have_default else np.abs(got - ref)
        a_ref = ref[..., 3]

        def _stats(d):
            return dict(
                max_abs_diff=round(float(d.max()), 5),
                mean_abs_diff=round(float(d.mean()), 7),
                pct_pixels_gt_8_of_255=round(
                    100.0 * float((d.max(-1) > 8.0 / 255.0).mean()), 5),
            )

        if not have_default:
            results[cfg] = dict(
                renderer_used=used,
                image=f"{width}x{height}",
                scale=cfg_scale,
                **_stats(diff),
                alpha_mean_ref=round(float(a_ref.mean()), 5),
                alpha_mean_got=round(float(got[..., 3].mean()), 5),
                covered_px=int((a_ref > 0).sum()),
                frame_ms=None if base_ms is None else round(base_ms, 2),
                wall_s=round(time.time() - t0, 1),
            )
            save()   # commit the default column before the repair render
            if os.environ.get("PARITY_SAVE_NPZ"):
                np.savez(f"/tmp/parity_{cfg.replace(':', '_')}.npz",
                         got=got, ref=ref)
        # Quality mode: the same frame with edge_repair (suspect pixels
        # re-marched by the oracle) — the u8-tolerance parity column.
        # A freshly-computed default column may now match a sibling
        # skipmode exactly (deterministic kernels) — reuse before paying
        # the repair march.
        if want_repair and try_reuse():
            continue
        if want_repair:
            t1 = time.time()
            got_r, _, (n_rep, budget), rep_ms = render(
                "pallas", dataset, skipmode, width, height, cfg_scale,
                vol, edge_repair=True)
            results[cfg]["edge_repair"] = dict(
                **_stats(np.abs(got_r - ref)),
                repaired_px=n_rep, budget_px=budget,
                frame_ms=None if rep_ms is None else round(rep_ms, 2),
                wall_s=round(time.time() - t1, 1),
            )
        print(f"{cfg}: {results[cfg]}", flush=True)
        save()

    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
