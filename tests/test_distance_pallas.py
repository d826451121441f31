"""Pallas DT relaxation (interpret mode) vs the exact XLA transform."""

import jax.numpy as jnp
import numpy as np
import pytest

from vkvolume_tpu.accel.distance import anisotropic_distance, isotropic_distance
from vkvolume_tpu.accel.distance_pallas import (
    anisotropic_distance_pallas,
    isotropic_distance_pallas,
)


@pytest.mark.parametrize("shape,p", [((10, 20, 30), 0.07), ((13, 7, 140), 0.03),
                                     ((124, 20, 16), 0.07)])
def test_isotropic_pallas_exact(rng, shape, p):
    occ = np.where(rng.random(shape) < p, 0, 255).astype(np.uint8)
    a = np.asarray(isotropic_distance(jnp.asarray(occ)))
    b = np.asarray(isotropic_distance_pallas(jnp.asarray(occ), interpret=True))
    np.testing.assert_array_equal(a, b)


def test_anisotropic_pallas_exact(rng):
    occ = np.where(rng.random((9, 11, 13)) < 0.1, 0, 255).astype(np.uint8)
    a = np.asarray(anisotropic_distance(jnp.asarray(occ)))
    b = np.asarray(
        anisotropic_distance_pallas(jnp.asarray(occ), interpret=True)
    )
    np.testing.assert_array_equal(a, b)


def test_anisotropic_cap_semantics(rng):
    """distance.ANISO_CAP: one-sided octant maps hit 255 at axis-facing
    boundaries, defeating max-bounded early exits (snake aniso update was
    3.3× iso on device vs the reference's 1.7×,
    src/compute_distance_map.cpp per-cell exit). The cap must be EXACTLY
    elementwise min(uncapped, cap) — leaps stay conservative, the occupied
    set is untouched, and both implementations agree under it."""
    occ = np.where(rng.random((24, 32, 40)) < 0.004, 0, 255).astype(np.uint8)
    full = np.asarray(anisotropic_distance(jnp.asarray(occ), cap=255))
    capped = np.asarray(anisotropic_distance(jnp.asarray(occ), cap=15))
    assert (full > 15).any()            # the cap actually binds here
    np.testing.assert_array_equal(capped, np.minimum(full, 15))
    pal = np.asarray(anisotropic_distance_pallas(jnp.asarray(occ), cap=15,
                                                 interpret=True))
    np.testing.assert_array_equal(pal, capped)
