"""Transfer function: closed-form 2D (intensity × gradient) grayscale TF and
the baked 256×256 RGBA8 texture path.

Mirrors the reference's two TF paths (shaders/transfer_function.glsl:35-46):
the default build uses the closed-form equation (the
``TRANSFER_FUNCTION_TEXTURE`` macro is not defined); the texture path bakes a
256×256 alpha texture on the CPU (src/volume_component.cpp:242-278) and
samples it with a *nearest* sampler.

``TFParams`` is the pytree twin of ``TransferFunctionUniform``
(src/transfer_function.h:20-32): scalar fields are traced arrays so TF slider
edits do NOT retrigger jit compilation; ``use_gradient`` is static aux data
because it changes the kernel structure (whether gradient sampling happens at
all), exactly like the reference's specialisation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TFParams:
    sampling_factor: jax.Array
    voxel_alpha_factor: jax.Array
    grad_magnitude_modifier: jax.Array
    intensity_min: jax.Array
    intensity_range_inv: jax.Array
    gradient_min: jax.Array
    gradient_range_inv: jax.Array
    # Static: selects the kernel variant (reference: use_gradient uniform,
    # src/volume_component.cpp:232).
    use_gradient: bool = dataclasses.field(metadata=dict(static=True), default=True)


def tf_params(
    *,
    intensity_min: float = 0.0,
    intensity_max: float = 1.0,
    gradient_min: float = 0.0,
    gradient_max: float = 1.0,
    sampling_factor: float = 1.0,
    voxel_alpha_factor: float = 1.0,
    grad_magnitude_modifier: float = 1.0,
) -> TFParams:
    """Build TFParams from slider options (``Volume::get_transfer_function_uniform``,
    reference: src/volume_component.cpp:226-240)."""
    use_gradient = gradient_max != gradient_min
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    g_range = gradient_max - gradient_min
    return TFParams(
        sampling_factor=f32(sampling_factor),
        voxel_alpha_factor=f32(voxel_alpha_factor),
        grad_magnitude_modifier=f32(grad_magnitude_modifier),
        intensity_min=f32(intensity_min),
        intensity_range_inv=f32(1.0 / (intensity_max - intensity_min)),
        gradient_min=f32(gradient_min),
        # Reference computes 1/(gmax-gmin) even when equal (inf); the kernels
        # never use it in that case because use_gradient gates gradient=1.0
        # and alpha_g is forced to 1. Avoid the inf to keep jit NaN-safe.
        gradient_range_inv=f32(1.0 / g_range if g_range != 0.0 else 1.0),
        use_gradient=use_gradient,
    )


def get_alpha(tf: TFParams, intensity, gradient):
    """Closed-form alpha (shaders/transfer_function.glsl:40-43).

    ``color = vec4(alpha_i * alpha_g)`` — all four channels equal, so we
    compute the scalar alpha; callers broadcast to rgb as needed.
    """
    alpha_i = jnp.clip(
        (intensity - tf.intensity_min) * tf.intensity_range_inv, 0.0, 1.0
    )
    if tf.use_gradient:
        alpha_g = jnp.clip(
            (gradient - tf.gradient_min) * tf.gradient_range_inv, 0.0, 1.0
        )
    else:
        alpha_g = 1.0
    return alpha_i * alpha_g


def get_color(tf: TFParams, intensity, gradient):
    """vec4 color = vec4(alpha) — closed-form path."""
    a = get_alpha(tf, intensity, gradient)
    return jnp.stack(jnp.broadcast_arrays(a, a, a, a), axis=-1)


def bake_texture(
    *,
    intensity_min: float,
    intensity_max: float,
    gradient_min: float,
    gradient_max: float,
) -> np.ndarray:
    """CPU bake of the 256×256 RGBA8 TF texture
    (``Volume::update_transfer_function_texture``,
    reference: src/volume_component.cpp:246-261).

    Layout: tex[g, i] (gradient row-major, matching the reference's
    ``idx = g*256 + i`` fill order); all 4 channels hold the same alpha.
    """
    i = np.arange(256, dtype=np.float32)
    g = np.arange(256, dtype=np.float32)
    i_inv = np.float32(1.0 / (intensity_max - intensity_min))
    use_gradient = gradient_max != gradient_min
    alpha_i = np.clip((i / 255.0 - intensity_min) * i_inv, 0.0, 1.0)
    if use_gradient:
        g_inv = np.float32(1.0 / (gradient_max - gradient_min))
        alpha_g = np.clip((g / 255.0 - gradient_min) * g_inv, 0.0, 1.0)
    else:
        alpha_g = np.ones(256, dtype=np.float32)
    # static_cast<uint8_t> truncates (src/volume_component.cpp:259).
    alpha = np.clip(alpha_g[:, None] * alpha_i[None, :] * 255.0, 0.0, 255.0).astype(
        np.uint8
    )
    return np.repeat(alpha[..., None], 4, axis=-1)


def sample_texture(tex: jax.Array, intensity, gradient):
    """Texture-path TF lookup (shaders/transfer_function.glsl:36-38).

    ``texture(transfer_function, vec2(intensity, gradient))`` with a NEAREST
    sampler and CLAMP_TO_EDGE: texel = clamp(floor(u * 256), 0, 255).
    Returns float rgba in [0, 1].
    """
    size = tex.shape[0]
    ii = jnp.clip(jnp.floor(intensity * size).astype(jnp.int32), 0, size - 1)
    gi = jnp.clip(jnp.floor(gradient * size).astype(jnp.int32), 0, size - 1)
    return tex[gi, ii].astype(jnp.float32) / 255.0
