"""Image filtering kernels: separable gaussian convolution on device.

Replaces scipy.ndimage / dask-image gaussian smoothing
(/root/reference/src/squidpy/im/_process.py:104-109) with XLA convolutions:
a separable 1-D gaussian applied along y then x rides the TPU's conv units
and fuses with surrounding elementwise work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_blur", "rgb2gray"]


def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("ksize",))
def _sep_conv2d(img: jax.Array, kernel: jax.Array, ksize: int) -> jax.Array:
    # img: (y, x, c); reflect-pad then two depthwise 1-D convolutions
    r = ksize // 2
    c = img.shape[-1]
    # scipy's gaussian_filter 'reflect' mode duplicates the edge sample —
    # that's numpy/jnp 'symmetric', not 'reflect'
    x = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="symmetric")
    x = jnp.moveaxis(x, -1, 0)[None]  # NCHW
    ky = kernel.reshape(1, 1, ksize, 1)
    kx = kernel.reshape(1, 1, 1, ksize)
    ky = jnp.broadcast_to(ky, (c, 1, ksize, 1))
    kx = jnp.broadcast_to(kx, (c, 1, 1, ksize))
    dn = jax.lax.conv_dimension_numbers(x.shape, ky.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    return jnp.moveaxis(x[0], 0, -1)


def gaussian_blur(img: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Gaussian smoothing of a ``(y, x[, c])`` image (reflect boundary)."""
    arr = np.asarray(img, dtype=np.float32)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    if sigma <= 0:
        return img
    k = _gaussian_kernel(sigma, truncate)
    out = np.asarray(_sep_conv2d(jnp.asarray(arr), jnp.asarray(k), len(k)))
    return out[:, :, 0] if squeeze else out


def rgb2gray(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 luminance conversion (skimage ``rgb2gray`` weights)."""
    # f32 throughout: slide-sized host math in f64 forfeits SIMD and doubles
    # peak memory on this 1-core host (CLAUDE.md host-math rule); the
    # luminance weights lose nothing meaningful at f32
    src = np.asarray(img)
    arr = src.astype(np.float32, copy=False)
    owned = arr is not src  # astype copied, so in-place ops cannot leak out
    # ndim guard matters: per-z slices arrive with a singleton channel axis
    # squeezed, so a 2D (y, x) array must not have its x-extent read as a
    # channel count (and a width-3 2D array must not silently "convert")
    if arr.ndim < 3 or arr.shape[-1] != 3:
        raise ValueError(
            f"Expected an RGB image with 3 channels in the last axis, found shape `{arr.shape}`."
        )
    if arr.max() > 1.0:
        if owned:
            arr /= np.float32(255.0)
        else:
            arr = arr / np.float32(255.0)
    return arr @ np.array([0.2125, 0.7154, 0.0721], dtype=np.float32)
