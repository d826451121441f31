"""Chebyshev distance-transform relaxation — Pallas TPU kernel.

Same exact semantics as ``distance.relax`` (the zig-zag passes of
shaders/distance_map.comp:72-107 / distance_map_anisotropic.comp:55-91), but
with the early exit at **block granularity** instead of the whole map: each
kernel instance owns a (L, 128) block of lines in VMEM and iterates the
shift distance n only while ``n < max(block)`` — the same adaptive cost
profile as the reference's per-line ``n < D`` exits (total work ~ sum of
per-block maxima rather than global-max × cells).

Lines are laid out with the relax axis on sublanes and 128 independent
lines on lanes; shifted candidates are produced with ``pltpu.roll`` plus an
edge mask (roll wraps; wrapped rows are masked to the neutral 255).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distance import axis_scan


def _relax_kernel(d_ref, out_ref, *, L, direction):
    D = d_ref[0].astype(jnp.int32)          # (L, 128)
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 0)

    def cond(state):
        n, A = state
        return jnp.logical_and(n < L, n < jnp.max(A))

    def body(state):
        n, A = state
        if direction >= 0:
            # roll is circular: a backward shift of n == forward by L - n
            # (negative traced shifts are rejected by the compiler).
            up = pltpu.roll(D, L - n, 0)    # up[y] = D[y + n] (wraps)
            up = jnp.where(rows < L - n, up, 255)
            A = jnp.minimum(A, jnp.maximum(n, up))
        if direction <= 0:
            dn = pltpu.roll(D, n, 0)        # dn[y] = D[y - n] (wraps)
            dn = jnp.where(rows >= n, dn, 255)
            A = jnp.minimum(A, jnp.maximum(n, dn))
        return n + 1, A

    _, A = jax.lax.while_loop(cond, body, (jnp.int32(1), D))
    out_ref[0] = A.astype(jnp.uint8)


def _to_blocks(D: jax.Array, axis: int):
    """(Z, Y, X) → (n_blocks, Lp, 128) with the relax axis on sublanes.

    The line length is padded to a sublane multiple with the neutral 255
    (a padded candidate is max(n, 255) and never wins)."""
    Z, Y, X = D.shape
    Xp = -(-X // 128) * 128
    L = Y if axis == 1 else Z
    Lp = -(-L // 8) * 8
    pad = [(0, 0), (0, 0), (0, Xp - X)]
    pad[axis] = (0, Lp - L)
    Dp = jnp.pad(D, pad, constant_values=255)
    xb = Xp // 128
    if axis == 1:       # relax along Y
        t = Dp.reshape(Z, Lp, xb, 128).transpose(0, 2, 1, 3)
        return t.reshape(Z * xb, Lp, 128), (Z, Y, X, xb)
    else:               # relax along Z
        t = Dp.reshape(Lp, Y, xb, 128).transpose(1, 2, 0, 3)
        return t.reshape(Y * xb, Lp, 128), (Z, Y, X, xb)


def _from_blocks(B: jax.Array, axis: int, dims):
    Z, Y, X, xb = dims
    Lp = B.shape[1]
    if axis == 1:
        t = B.reshape(Z, xb, Lp, 128).transpose(0, 2, 1, 3)
        return t.reshape(Z, Lp, xb * 128)[:, :Y, :X]
    t = B.reshape(Y, xb, Lp, 128).transpose(2, 0, 1, 3)
    return t.reshape(Lp, Y, xb * 128)[:Z, :, :X]


@functools.partial(jax.jit, static_argnames=("axis", "direction", "interpret"))
def relax_pallas(D: jax.Array, axis: int, direction: int = 0,
                 interpret: bool = False) -> jax.Array:
    """Exact drop-in for distance.relax (uint8 in/out) on axes 0/1."""
    blocks, dims = _to_blocks(D.astype(jnp.uint8), axis)
    nb, L, _ = blocks.shape
    kern = functools.partial(_relax_kernel, L=L, direction=direction)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(blocks.shape, jnp.uint8),
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, L, 128), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, L, 128), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(blocks)
    return _from_blocks(out, axis, dims)


@functools.partial(jax.jit, static_argnames=("interpret",))
def isotropic_distance_pallas(occ_u8: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """Isotropic Chebyshev distance map (x-scan + Pallas y/z relaxations)."""
    g = axis_scan(occ_u8, axis=2, direction=0).astype(jnp.uint8)
    g = relax_pallas(g, axis=1, direction=0, interpret=interpret)
    g = relax_pallas(g, axis=0, direction=0, interpret=interpret)
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def anisotropic_distance_pallas(occ_u8: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """8 octant maps with the shared 14-pass schedule, Pallas relaxations."""
    x_scans = {}
    xy = {}
    maps = []
    for idx in range(8):
        sx = -1 if (idx & 4) else +1
        sy = -1 if (idx & 2) else +1
        sz = -1 if (idx & 1) else +1
        if sx not in x_scans:
            x_scans[sx] = axis_scan(occ_u8, axis=2, direction=sx).astype(
                jnp.uint8
            )
        if (sx, sy) not in xy:
            xy[(sx, sy)] = relax_pallas(x_scans[sx], axis=1, direction=sy,
                                        interpret=interpret)
        maps.append(relax_pallas(xy[(sx, sy)], axis=0, direction=sz,
                                 interpret=interpret))
    return jnp.stack(maps)
