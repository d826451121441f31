"""Chebyshev distance transform — Pallas TPU kernels (the fast path).

Same exact semantics as ``distance.axis_scan`` + ``distance.relax`` (the
3-pass GPU transform of shaders/distance_map.comp:44-109 /
distance_map_anisotropic.comp:31-92, host schedule
src/compute_distance_map.cpp:142-290), restructured for the TPU memory
hierarchy:

* **Kernel A** (``_scan_relax_kernel``): grid over z-slabs; each instance
  holds a (TZ, Yp, Xp) brick in VMEM, computes the x-line scan *in-VMEM*
  (prefix/suffix min via log₂ lane-roll doubling — the closed form of the
  forward+backward scan, distance.py:47-72) and then the y zig-zag
  relaxation as a shift loop with a **per-brick early exit**
  (``n < max(brick)`` — the same bound the reference's per-line ``n < D``
  exit uses, so results are identical). One HBM read + write for two of the
  three passes, vs. one read/write *per shift distance* in the XLA
  formulation.
* **Kernel B** (``_relax_kernel``): the z relaxation, run on a (Y, Z, X)
  transpose so lines lie on sublanes (traced-shift ``pltpu.roll`` along
  sublanes is well supported; axis-0 rolls are not).
* Both kernels can emit the +1/−1 directional variants **in one pass**
  (shared input brick), which collapses the anisotropic 14-dispatch
  schedule (compute_distance_map.cpp:229-252) to 2×A + 4×B launches.

Exactness: padded cells hold 255 (EMPTY); a padded candidate contributes
``min(occ_pad + d, 255 + d)`` ≥ 256 in the scan and ``max(n, 255) = 255`` in
the relaxation — neither can beat the in-range n=0 candidate (≤ 255), so
padding never changes a logical cell (same argument as distance.py:82-85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 8          # shift distances per while-loop iteration
# Brick budget: bigger bricks amortise loop overhead, but the remote Mosaic
# compile helper fails (HTTP 500) on kernels whose live vector state gets
# large — scan+relax bricks ≲1 MB/array compile reliably where ~2 MB/array
# started failing mid-session; smaller bricks also sharpen the per-brick
# early exit.
_VMEM_BUDGET = 2 * 1024 * 1024


def _suffix_min(v, L, Lp, axis):
    """m[x] = min_{x <= x' < Lp} v[x'] via log-step doubling rolls."""
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    big = jnp.int32(1 << 20)
    s = 1
    while s < Lp:
        cand = pltpu.roll(v, Lp - s, axis)          # cand[x] = v[x + s]
        v = jnp.minimum(v, jnp.where(idx < Lp - s, cand, big))
        s *= 2
    return v


def _prefix_min(v, L, Lp, axis):
    """m[x] = min_{0 <= x' <= x} v[x']."""
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    big = jnp.int32(1 << 20)
    s = 1
    while s < Lp:
        cand = pltpu.roll(v, s, axis)               # cand[x] = v[x - s]
        v = jnp.minimum(v, jnp.where(idx >= s, cand, big))
        s *= 2
    return v


def _x_scan_vmem(occ, Xp, scan_dir):
    """In-VMEM x-line distance scan (closed form of distance.py:47-72):
    g[x] = min_{x'} (occ[x'] + |x - x'|), one-sided when scan_dir = ±1."""
    ix = jax.lax.broadcasted_iota(jnp.int32, occ.shape, occ.ndim - 1)
    g = None
    if scan_dir >= 0:
        fwd = _suffix_min(occ + ix, Xp, Xp, occ.ndim - 1) - ix
        g = fwd
    if scan_dir <= 0:
        bwd = _prefix_min(occ - ix, Xp, Xp, occ.ndim - 1) + ix
        g = bwd if g is None else jnp.minimum(g, bwd)
    return g


def _relax_vmem(D, Lp, axis, directions):
    """Zig-zag relaxation A[y] = min_n max(n, D[y ± n]) over a VMEM brick,
    early-exiting once n >= max(A) (no candidate max(n, ·) >= n can improve).
    ``directions``: tuple of +1 / -1 senses to produce (shared D pass).

    The shifted candidates are carried **incrementally**: U/V hold D rolled
    by the current n and advance by a roll of 1 per iteration — every roll
    has a *static* shift, which Mosaic lowers to fixed vreg moves (a traced
    shift per n measured ~10× slower)."""
    iy = jax.lax.broadcasted_iota(jnp.int32, D.shape, axis)
    n255 = jnp.int32(255)
    two_sided = directions == (0,)
    n_dirs = 1 if two_sided else len(directions)
    need_up = two_sided or (+1 in directions)
    need_dn = two_sided or (-1 in directions)

    def cond(state):
        n = state[0]
        bound = jnp.max(state[3])
        for A in state[4:]:
            bound = jnp.maximum(bound, jnp.max(A))
        return jnp.logical_and(n < Lp, n < bound)

    def body(state):
        n, U, V = state[0], state[1], state[2]
        As = list(state[3:])
        for j in range(_CHUNK):
            nj = n + j
            nj_ok = nj < Lp
            up = dn = None
            if need_up:
                U = pltpu.roll(U, Lp - 1, axis)      # U[y] = D[y + nj]
                up = jnp.where(iy < Lp - nj, U, n255)
            if need_dn:
                V = pltpu.roll(V, 1, axis)           # V[y] = D[y - nj]
                dn = jnp.where(iy >= nj, V, n255)
            if two_sided:
                cands = [jnp.minimum(up, dn)]
            else:
                cands = [up if d == +1 else dn for d in directions]
            As = [jnp.where(nj_ok, jnp.minimum(A, jnp.maximum(nj, c)), A)
                  for A, c in zip(As, cands)]
        return (n + _CHUNK, U, V, *As)

    state = (jnp.int32(1), D, D, *([D] * n_dirs))
    state = jax.lax.while_loop(cond, body, state)
    return list(state[3:])


def _scan_relax_kernel(occ_ref, *out_refs, Yp, Xp, scan_dir, relax_dirs,
                       cap=255):
    occ = occ_ref[...].astype(jnp.int32)
    g = _x_scan_vmem(occ, Xp, scan_dir)
    g = jnp.minimum(g, jnp.int32(cap))
    As = _relax_vmem(g, Yp, occ.ndim - 2, relax_dirs)
    for ref, A in zip(out_refs, As):
        ref[...] = A.astype(jnp.uint8)


def _scan_relax_multi_kernel(occ_ref, *out_refs, Yp, Xp, scan_dirs,
                             relax_dirs, cap=255):
    """All (scan_dir × relax_dir) variants in one pass over the occupancy
    brick (one HBM read instead of one per scan direction); outputs ordered
    scan-major. ``cap`` clips the scan stage, which bounds the relaxation
    loops (one-sided maps hit 255 at axis boundaries, so an uncapped
    max-bound never early-exits — distance.ANISO_CAP)."""
    occ = occ_ref[...].astype(jnp.int32)
    i = 0
    for sd in scan_dirs:
        g = jnp.minimum(_x_scan_vmem(occ, Xp, sd), jnp.int32(cap))
        for A in _relax_vmem(g, Yp, occ.ndim - 2, relax_dirs):
            out_refs[i][...] = A.astype(jnp.uint8)
            i += 1


def _relax_multi_kernel(*refs, Lp, axis, relax_dirs, n_in):
    """relax_dirs variants of ``n_in`` independent inputs in one launch
    (outputs ordered input-major)."""
    in_refs = refs[:n_in]
    out_refs = refs[n_in:]
    i = 0
    for ref in in_refs:
        D = ref[...].astype(jnp.int32)
        for A in _relax_vmem(D, Lp, axis, relax_dirs):
            out_refs[i][...] = A.astype(jnp.uint8)
            i += 1


def _relax_kernel(d_ref, *out_refs, Lp, relax_dirs, axis=None):
    D = d_ref[...].astype(jnp.int32)
    ax = D.ndim - 2 if axis is None else axis
    As = _relax_vmem(D, Lp, ax, relax_dirs)
    for ref, A in zip(out_refs, As):
        ref[...] = A.astype(jnp.uint8)


def _pad_to(a, shape):
    return jnp.pad(a, [(0, p - s) for s, p in zip(a.shape, shape)],
                   constant_values=jnp.uint8(255))


def _brick_rows(Yp, Xp, n_bufs):
    """Leading-dim brick size for the scan+relax kernel (any value >= 1 —
    the (8, 128) divisibility constraint applies to the last two dims)."""
    per_row = Yp * Xp * 4 * (n_bufs + 2)  # D, A(s), roll temporaries
    return max(1, min(8, _VMEM_BUDGET // per_row))


def scan_and_relax(occ_u8: jax.Array, scan_dir: int, relax_dirs: tuple,
                   interpret: bool = False):
    """x-line scan + y relaxation in one Pallas pass.

    Returns one (Z, Y, X) uint8 array per entry of ``relax_dirs``
    (``(0,)`` = two-sided isotropic, else any subset of (+1, -1))."""
    Z, Y, X = occ_u8.shape
    Yp = -(-Y // 8) * 8
    Xp = -(-X // 128) * 128
    tz = _brick_rows(Yp, Xp, len(relax_dirs))
    Zp = -(-Z // tz) * tz
    occ_p = _pad_to(occ_u8, (Zp, Yp, Xp))
    n_out = len(relax_dirs)
    kern = functools.partial(_scan_relax_kernel, Yp=Yp, Xp=Xp,
                             scan_dir=scan_dir, relax_dirs=tuple(relax_dirs))
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((Zp, Yp, Xp), jnp.uint8)] * n_out,
        grid=(Zp // tz,),
        in_specs=[pl.BlockSpec((tz, Yp, Xp), lambda b: (b, 0, 0))],
        out_specs=[pl.BlockSpec((tz, Yp, Xp), lambda b: (b, 0, 0))] * n_out,
        interpret=interpret,
    )(occ_p)
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    return [o[:Z, :Y, :X] for o in outs]


def scan_and_relax_multi(occ_u8: jax.Array, scan_dirs: tuple,
                         relax_dirs: tuple, interpret: bool = False,
                         cap: int = 255):
    """One launch producing all (scan_dir × relax_dir) y-stage variants
    (scan-major order) — one occupancy read for the whole anisotropic
    schedule's first stage."""
    Z, Y, X = occ_u8.shape
    Yp = -(-Y // 8) * 8
    Xp = -(-X // 128) * 128
    n_out = len(scan_dirs) * len(relax_dirs)
    # Budget for ALL outputs + per-scan live state (the helper's compile
    # reliability is the binding constraint — see _VMEM_BUDGET).
    tz = _brick_rows(Yp, Xp, n_out)
    Zp = -(-Z // tz) * tz
    occ_p = _pad_to(occ_u8, (Zp, Yp, Xp))
    kern = functools.partial(_scan_relax_multi_kernel, Yp=Yp, Xp=Xp,
                             scan_dirs=tuple(scan_dirs),
                             relax_dirs=tuple(relax_dirs), cap=cap)
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((Zp, Yp, Xp), jnp.uint8)] * n_out,
        grid=(Zp // tz,),
        in_specs=[pl.BlockSpec((tz, Yp, Xp), lambda b: (b, 0, 0))],
        out_specs=[pl.BlockSpec((tz, Yp, Xp), lambda b: (b, 0, 0))] * n_out,
        interpret=interpret,
    )(occ_p)
    return [o[:Z, :Y, :X] for o in outs]


def relax_z_direct_multi(ds_u8: list, relax_dirs: tuple,
                         interpret: bool = False):
    """One launch z-relaxing several inputs (outputs input-major).

    Bricks are (Zp, 8, BX): the y tile is pinned at 8 (the sublane
    divisibility requirement) and the lane dim is blocked so the brick
    stays within the compile-reliable budget."""
    Z, Y, X = ds_u8[0].shape
    Zp = -(-Z // 8) * 8
    Xp = -(-X // 128) * 128
    bx = max(1, min(Xp // 128, _VMEM_BUDGET // (Zp * 8 * 4 * 128 *
                                                (len(relax_dirs) + 2))))
    BX = bx * 128
    Xpad = -(-Xp // BX) * BX
    Ypad = -(-Y // 8) * 8
    ins = [_pad_to(d, (Zp, Ypad, Xpad)) for d in ds_u8]
    n_in = len(ins)
    n_out = n_in * len(relax_dirs)
    kern = functools.partial(_relax_multi_kernel, Lp=Zp, axis=0,
                             relax_dirs=tuple(relax_dirs), n_in=n_in)
    spec = pl.BlockSpec((Zp, 8, BX), lambda by, bxi: (0, by, bxi))
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((Zp, Ypad, Xpad), jnp.uint8)] * n_out,
        grid=(Ypad // 8, Xpad // BX),
        in_specs=[spec] * n_in,
        out_specs=[spec] * n_out,
        interpret=interpret,
    )(*ins)
    return [o[:Z, :Y, :X] for o in outs]


def relax_z_direct(d_u8: jax.Array, relax_dirs: tuple,
                   interpret: bool = False):
    """z relaxation with lines on the *leading* axis (no transposes):
    incremental rolls along axis 0 (whole-vreg moves — cheap and static)."""
    return relax_z_direct_multi([d_u8], relax_dirs, interpret=interpret)


def relax_z(d_u8: jax.Array, relax_dirs: tuple, interpret: bool = False):
    """z relaxation via a (Y, Z, X) transpose so lines lie on sublanes."""
    Z, Y, X = d_u8.shape
    t = d_u8.transpose(1, 0, 2)                      # (Y, Z, X)
    Zp = -(-Z // 8) * 8
    Xp = -(-X // 128) * 128
    ty = _brick_rows(Zp, Xp, len(relax_dirs))
    Ypad = -(-Y // ty) * ty
    t = _pad_to(t, (Ypad, Zp, Xp))
    n_out = len(relax_dirs)
    kern = functools.partial(_relax_kernel, Lp=Zp,
                             relax_dirs=tuple(relax_dirs))
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((Ypad, Zp, Xp), jnp.uint8)] * n_out,
        grid=(Ypad // ty,),
        in_specs=[pl.BlockSpec((ty, Zp, Xp), lambda b: (b, 0, 0))],
        out_specs=[pl.BlockSpec((ty, Zp, Xp), lambda b: (b, 0, 0))] * n_out,
        interpret=interpret,
    )(t)
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    return [o[:Y, :Z, :X].transpose(1, 0, 2) for o in outs]


@functools.partial(jax.jit, static_argnames=("interpret",))
def isotropic_distance_pallas(occ_u8: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """Isotropic Chebyshev distance map — exact twin of
    ``distance.isotropic_distance`` (x-scan, y-relax, z-relax)."""
    g = scan_and_relax(occ_u8, scan_dir=0, relax_dirs=(0,),
                       interpret=interpret)[0]
    return relax_z_direct(g, relax_dirs=(0,), interpret=interpret)[0]


@functools.partial(jax.jit, static_argnames=("interpret", "cap"))
def anisotropic_distance_pallas(occ_u8: jax.Array,
                                interpret: bool = False,
                                cap: int = None) -> jax.Array:
    """All 8 octant maps, (8, Z, Y, X) uint8 — exact twin of
    ``distance.anisotropic_distance`` with the 14-pass shared schedule
    collapsed to 2 scan+y-relax launches and 4 dual-output z launches.
    ``cap`` (default distance.ANISO_CAP) bounds every relaxation loop —
    without it the one-sided maps' boundary 255s defeat the max-bounded
    early exit and every launch pays the full axis length."""
    from .distance import ANISO_CAP

    if cap is None:
        cap = ANISO_CAP
    maps = [None] * 8
    xys = scan_and_relax_multi(occ_u8, scan_dirs=(+1, -1),
                               relax_dirs=(+1, -1), interpret=interpret,
                               cap=cap)
    zs = relax_z_direct_multi(xys, relax_dirs=(+1, -1), interpret=interpret)
    i = 0
    for sx in (+1, -1):
        for sy in (+1, -1):
            for sz in (+1, -1):
                idx = ((sx < 0) << 2) | ((sy < 0) << 1) | (sz < 0)
                maps[idx] = zs[i]
                i += 1
    return jnp.stack(maps)


# Back-compat exact drop-in used by round-1 tests/benches.
@functools.partial(jax.jit, static_argnames=("axis", "direction", "interpret"))
def relax_pallas(D: jax.Array, axis: int, direction: int = 0,
                 interpret: bool = False) -> jax.Array:
    """Exact drop-in for ``distance.relax`` (uint8 in/out) on axes 0/1."""
    dirs = (0,) if direction == 0 else (direction,)
    if axis == 1:
        Z, Y, X = D.shape
        Yp = -(-Y // 8) * 8
        Xp = -(-X // 128) * 128
        tz = _brick_rows(Yp, Xp, len(dirs))
        Zp = -(-Z // tz) * tz
        Dp = _pad_to(D.astype(jnp.uint8), (Zp, Yp, Xp))
        kern = functools.partial(_relax_kernel, Lp=Yp, relax_dirs=dirs)
        out = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((Zp, Yp, Xp), jnp.uint8)],
            grid=(Zp // tz,),
            in_specs=[pl.BlockSpec((tz, Yp, Xp), lambda b: (b, 0, 0))],
            out_specs=[pl.BlockSpec((tz, Yp, Xp), lambda b: (b, 0, 0))],
            interpret=interpret,
        )(Dp)[0]
        return out[:Z, :Y, :X]
    return relax_z(D.astype(jnp.uint8), dirs, interpret=interpret)[0]
