"""Independent scalar (pure numpy, per-ray loop) re-implementation of the
reference fragment shader ``volume_render.frag:117-336`` — the oracle the
vectorised marcher is tested against (SURVEY.md §4: sample-count parity vs a
scalar re-implementation of the frag-shader state machine).

Deliberately written as a direct loop translation, structured differently
from the lock-step marcher so bugs don't correlate.
"""

from __future__ import annotations

import math

import numpy as np

OCCUPIED, EMPTY = 0, 255


def trilinear(vol_u8: np.ndarray, pos_xyz) -> float:
    d, h, w = vol_u8.shape
    dims = np.array([w, h, d], np.float32)
    p = np.asarray(pos_xyz, np.float32) * dims - 0.5
    i0 = np.floor(p).astype(int)
    fr = p - i0
    i1 = i0 + 1
    i0 = np.clip(i0, 0, [w - 1, h - 1, d - 1])
    i1 = np.clip(i1, 0, [w - 1, h - 1, d - 1])
    c = 0.0
    for dz, wz in ((0, 1 - fr[2]), (1, fr[2])):
        for dy, wy in ((0, 1 - fr[1]), (1, fr[1])):
            for dx, wx in ((0, 1 - fr[0]), (1, fr[0])):
                zz = i1[2] if dz else i0[2]
                yy = i1[1] if dy else i0[1]
                xx = i1[0] if dx else i0[0]
                c += wz * wy * wx * float(vol_u8[zz, yy, xx])
    return c / 255.0


def gradient_on_the_fly(vol_u8, pos_xyz, modifier=1.0):
    d, h, w = vol_u8.shape
    dim_inv = np.array([1.0 / w, 1.0 / h, 1.0 / d], np.float32)
    taps = np.array([[1, -1, -1], [-1, -1, 1], [-1, 1, -1], [1, 1, 1]], np.float32)
    acc = np.zeros(3, np.float32)
    for k in taps:
        acc += k * trilinear(vol_u8, np.asarray(pos_xyz) + dim_inv * k)
    g = float(np.linalg.norm(acc * 0.25)) * modifier
    return min(max(g, 0.0), 1.0)


def march_ray(
    *,
    volume,
    gradient_map=None,
    dist_maps=None,            # (N, mz, my, mx); N=1 iso/block, 8 aniso
    entry,
    ray_dir,
    ray_distance,
    block_size,                # (3,) effective block size
    skipping="distance",       # none|block|distance|aniso
    ert=True,
    tf,                        # dict: imin, irange_inv, gmin, grange_inv,
    #        use_gradient, sampling_factor, voxel_alpha_factor, grad_mod
    precomputed_gradient=True,
):
    f32 = np.float32
    d, h, w = volume.shape
    dims = np.array([w, h, d], f32)
    dim_max = max(w, h, d)
    sf = f32(tf["sampling_factor"])
    entry = np.asarray(entry, f32)
    ray_dir = np.asarray(ray_dir, f32)
    ray_distance = f32(ray_distance)

    n_steps = int(np.ceil(f32(dim_max) * ray_distance * sf))
    counters = dict(n_vol=0, n_dist=0, n_empty=0)
    out = np.zeros(4, f32)
    i_first_hit = n_steps
    if n_steps <= 0:
        return out, counters, i_first_hit
    with np.errstate(divide="ignore", invalid="ignore"):
        step = (ray_dir * ray_distance / (f32(n_steps) - f32(1.0))).astype(f32)
    eet = entry + step
    if np.any(eet <= 0.0) or np.any(eet >= 1.0):
        return out, counters, i_first_hit

    skip = skipping != "none"
    if skip:
        n_maps = dist_maps.shape[0]
        mz, my, mx = dist_maps.shape[1:]
        map_dims_1 = np.array([mx - 1, my - 1, mz - 1])
        vol_to_map = (dims / np.asarray(block_size, f32)).astype(f32)
        sdt = (step * dims / np.asarray(block_size, f32)).astype(f32)
        with np.errstate(divide="ignore"):
            sdt_inv = (f32(1.0) / sdt).astype(f32)
        map_idx = 0
        if skipping == "aniso":
            map_idx = (
                (1 if ray_dir[2] < 0 else 0)
                + (2 if ray_dir[1] < 0 else 0)
                + (4 if ray_dir[0] < 0 else 0)
            )
        i_min = 0
        u_last = np.zeros(3, int)

    def get_color(pos):
        intensity = trilinear(volume, pos)
        if tf["use_gradient"]:
            if precomputed_gradient:
                g = trilinear(gradient_map, pos)
            else:
                g = gradient_on_the_fly(volume, pos, tf["grad_mod"])
        else:
            g = 1.0
        ai = min(max((intensity - tf["imin"]) * tf["irange_inv"], 0.0), 1.0)
        if tf["use_gradient"]:
            ag = min(max((g - tf["gmin"]) * tf["grange_inv"], 0.0), 1.0)
        else:
            ag = 1.0
        a = ai * ag
        return np.array([a, a, a, a], np.float32)

    voxel_occupied = True
    i = 0
    while i < n_steps:
        pos = (entry + f32(i) * step).astype(f32)
        if skip:
            u = (vol_to_map * pos).astype(f32)
            u_i = np.clip(u.astype(np.int32), 0, map_dims_1)
        if skip and (not voxel_occupied) and np.any(u_i != u_last):
            counters["n_dist"] += 1
            dist = int(dist_maps[map_idx, u_i[2], u_i[1], u_i[0]])
            r = np.clip(u_i.astype(f32) - u, f32(-1.0), f32(0.0)).astype(f32)
            if dist > 0:
                if skipping == "block":
                    dxyz = ((np.where(sdt_inv >= 0, 1.0, 0.0).astype(f32) + r)
                            * sdt_inv).astype(f32)
                else:
                    dxyz = ((np.where(-sdt_inv >= 0, 1.0, 0.0).astype(f32)
                             + np.sign(sdt_inv) * f32(dist) + r)
                            * sdt_inv).astype(f32)
                dxyz = np.where(np.isnan(dxyz), np.inf, dxyz)
                i_delta = max(1, int(np.ceil(min(f32(1e30), dxyz.min()))))
                i += i_delta
            else:
                voxel_occupied = True
                u_last = u_i.copy()
                i = max(i - int(math.ceil(sf)), i_min)
        else:
            counters["n_vol"] += 1
            color = get_color(pos)
            voxel_occupied = color[3] > 0.0
            if voxel_occupied:
                if skip:
                    u_last = u_i.copy()
                a = min(
                    max(
                        tf["voxel_alpha_factor"]
                        * (1.0 - (1.0 - color[3]) ** (1.0 / sf)),
                        0.0,
                    ),
                    1.0,
                )
                src = np.array([color[0] * a, color[1] * a, color[2] * a, a])
                out = out + (1.0 - out[3]) * src
                if a > 0.0:
                    i_first_hit = i
                if out[3] > 0.99 and ert:
                    out[3] = 1.0
                    break
            else:
                counters["n_empty"] += 1
            i += 1
            if skip:
                i_min = i
    return out, counters, i_first_hit
