"""Batched per-cell feature kernels: Zernike moments, radial intensity
distribution, granularity spectra, channel correlation.

TPU-native equivalents of the cp_measure/CellProfiler feature families the
reference consumes through ``cp_measure.featurizer.featurize``
(/root/reference/src/squidpy/experimental/im/_calculate_image_features.py:19,362-537):
``MeasureObjectSizeShape`` Zernikes, ``MeasureObjectIntensityDistribution``
(FracAtD / MeanFrac / RadialCV + radial Zernikes), ``MeasureGranularity``,
and ``MeasureColocalization`` Pearson. Instead of a per-object Python loop,
every family here is one batched device pass over padded ``(n_cells, S, S)``
bbox crops (or one tile-level pass for granularity), with all-cells
reductions fused by XLA.

Conventions (documented where they differ from CellProfiler):

* The unit disk for Zernike/radial features is centered at the mask centroid
  with radius = the maximum centroid-to-mask-pixel distance (CellProfiler
  uses the minimum enclosing circle; centers differ only for asymmetric
  cells).
* Granularity uses morphological OPENING (erosion then matched dilation)
  instead of opening-by-reconstruction — reconstruction's data-dependent
  iteration count does not map to fixed-shape device code; the spectrum
  semantics (intensity removed per scale) are preserved and locked by
  fixture tests. It is computed tile-wide with per-label means, like
  CellProfiler's per-image spectrum restricted to each object.
"""

from __future__ import annotations

from functools import partial
from math import factorial, pi

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "zernike_table",
    "zernike_batch",
    "radial_distribution_batch",
    "granularity_batch",
    "granularity_per_label",
    "pearson_correlation_batch",
    "costes_coloc_batch",
    "manders_batch",
    "rwc_batch",
]


def zernike_table(n_max: int = 9) -> list[tuple[int, int, tuple[tuple[int, float], ...]]]:
    """(n, m, radial-polynomial terms) for all 0 <= m <= n <= n_max with
    n - m even. Terms are ``(power, coefficient)`` of R_nm(rho)."""
    out = []
    for n in range(n_max + 1):
        for m in range(n % 2, n + 1, 2):
            terms = []
            for k in range((n - m) // 2 + 1):
                c = (-1) ** k * factorial(n - k) / (
                    factorial(k) * factorial((n + m) // 2 - k) * factorial((n - m) // 2 - k)
                )
                terms.append((n - 2 * k, float(c)))
            out.append((n, m, tuple(terms)))
    return out


def _disk_coords(mask: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-cell normalized polar coordinates over padded (N, S, W) masks.

    Returns ``rho`` (distance / max mask distance), ``theta``, the float
    mask, and ``rmax2`` (squared disk radius in pixels). The disk is centered
    at the mask centroid.
    """
    m = mask.astype(jnp.float32)
    S, W = mask.shape[1], mask.shape[2]
    yy = jnp.arange(S, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    area = jnp.maximum(m.sum((1, 2)), 1.0)
    cy = (m * yy).sum((1, 2)) / area
    cx = (m * xx).sum((1, 2)) / area
    dy = yy - cy[:, None, None]
    dx = xx - cx[:, None, None]
    r2 = dy * dy + dx * dx
    rmax2 = jnp.maximum(jnp.max(jnp.where(mask, r2, 0.0), axis=(1, 2)), 1e-12)
    rho = jnp.sqrt(r2) / jnp.sqrt(rmax2)[:, None, None]
    theta = jnp.arctan2(dy, dx)
    return rho, theta, m, rmax2


@partial(jax.jit, static_argnames=("n_max", "weighted"))
def _zernike_kernel(mask: jax.Array, weight: jax.Array, n_max: int, weighted: bool):
    rho, theta, m, rmax2 = _disk_coords(mask)
    if weighted:
        # intensity distribution: f sums to 1 over the cell
        f = jnp.where(mask, weight, 0.0)
        f = f / jnp.maximum(f.sum((1, 2)), 1e-12)[:, None, None]
    else:
        # binary shape with pixel area element 1/rmax^2, so the normalized
        # disk has area pi and a full disk gives |Z_00| = 1
        f = m / rmax2[:, None, None]
    fin = jnp.where(mask & (rho <= 1.0), f, 0.0)
    mags, phases = [], []
    for n, mm, terms in zernike_table(n_max):
        R = jnp.zeros_like(rho)
        for p, c in terms:
            R = R + c * rho**p
        re = (fin * R * jnp.cos(mm * theta)).sum((1, 2))
        im = -(fin * R * jnp.sin(mm * theta)).sum((1, 2))
        scale = (n + 1) / pi
        mags.append(scale * jnp.sqrt(re * re + im * im))
        phases.append(jnp.arctan2(im, re))
    return jnp.stack(mags, axis=1), jnp.stack(phases, axis=1)


def zernike_batch(
    masks: np.ndarray,
    intensity: np.ndarray | None = None,
    n_max: int = 9,
) -> tuple[np.ndarray, np.ndarray]:
    """Zernike moment magnitudes (and phases) for a batch of cells.

    ``masks``: (n, S, W) bool padded bbox masks. With ``intensity=None`` the
    binary-shape moments are returned (CellProfiler ``AreaShape_Zernike``,
    30 features for n_max=9; a full disk yields |Z_00|=1, others ~0). With a
    per-cell intensity crop, the moments of the normalized intensity
    distribution are returned (``RadialDistribution_Zernike{Magnitude,Phase}``).
    """
    from squidpy_tpu.utils import to_host

    masks_j = jnp.asarray(np.ascontiguousarray(masks, dtype=bool))
    if intensity is None:
        w = masks_j.astype(jnp.float32)
        mags, phases = _zernike_kernel(masks_j, w, n_max, False)
    else:
        w = jnp.asarray(np.ascontiguousarray(intensity, dtype=np.float32))
        mags, phases = _zernike_kernel(masks_j, w, n_max, True)
    return to_host(mags), to_host(phases)


@partial(jax.jit, static_argnames=("bins", "wedges"))
def _radial_kernel(mask: jax.Array, intensity: jax.Array, bins: int, wedges: int):
    rho, theta, m, _ = _disk_coords(mask)
    f = jnp.where(mask, intensity, 0.0)
    total_i = jnp.maximum(f.sum((1, 2)), 1e-12)
    total_n = jnp.maximum(m.sum((1, 2)), 1.0)
    ring = jnp.clip((rho * bins).astype(jnp.int32), 0, bins - 1)
    wedge = jnp.clip(((theta + pi) / (2 * pi) * wedges).astype(jnp.int32), 0, wedges - 1)

    frac_at_d, mean_frac, radial_cv = [], [], []
    for b in range(bins):
        in_ring = mask & (ring == b)
        i_b = jnp.where(in_ring, f, 0.0).sum((1, 2))
        n_b = in_ring.astype(jnp.float32).sum((1, 2))
        frac_at_d.append(i_b / total_i)
        # mean intensity in ring relative to the cell's overall mean
        mean_frac.append((i_b / jnp.maximum(n_b, 1.0)) / (total_i / total_n))
        # CV of per-wedge mean intensities within the ring (empty wedges
        # excluded from the statistics)
        w_means, w_valid = [], []
        for wdg in range(wedges):
            sel = in_ring & (wedge == wdg)
            iw = jnp.where(sel, f, 0.0).sum((1, 2))
            nw = sel.astype(jnp.float32).sum((1, 2))
            w_means.append(iw / jnp.maximum(nw, 1.0))
            w_valid.append((nw > 0).astype(jnp.float32))
        wm = jnp.stack(w_means, axis=1)  # (N, wedges)
        wv = jnp.stack(w_valid, axis=1)
        k = jnp.maximum(wv.sum(1), 1.0)
        mu = (wm * wv).sum(1) / k
        var = (((wm - mu[:, None]) ** 2) * wv).sum(1) / k
        radial_cv.append(jnp.sqrt(var) / jnp.maximum(mu, 1e-12))
    return (
        jnp.stack(frac_at_d, axis=1),
        jnp.stack(mean_frac, axis=1),
        jnp.stack(radial_cv, axis=1),
    )


def radial_distribution_batch(
    masks: np.ndarray, intensity: np.ndarray, bins: int = 4, wedges: int = 8
) -> dict[str, np.ndarray]:
    """FracAtD / MeanFrac / RadialCV over ``bins`` concentric rings.

    Rings are equal fractions of the normalized centroid distance (see module
    docstring); RadialCV is the coefficient of variation of per-wedge mean
    intensities across ``wedges`` angular sectors within each ring
    (CellProfiler ``MeasureObjectIntensityDistribution`` semantics).
    Returns arrays of shape (n, bins).
    """
    from squidpy_tpu.utils import to_host

    masks_j = jnp.asarray(np.ascontiguousarray(masks, dtype=bool))
    int_j = jnp.asarray(np.ascontiguousarray(intensity, dtype=np.float32))
    fr, mf, cv = _radial_kernel(masks_j, int_j, bins, wedges)
    return {"frac_at_d": to_host(fr), "mean_frac": to_host(mf), "radial_cv": to_host(cv)}


def _erode(x: jax.Array) -> jax.Array:
    return -jax.lax.reduce_window(-x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")


def _dilate(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")


@partial(jax.jit, static_argnames=("num_labels", "length"))
def _granularity_kernel(image: jax.Array, labels: jax.Array, num_labels: int, length: int) -> jax.Array:
    flat_labels = labels.ravel().astype(jnp.int32)
    ones = jnp.ones_like(flat_labels, dtype=jnp.float32)
    counts = jnp.maximum(jax.ops.segment_sum(ones, flat_labels, num_segments=num_labels), 1.0)

    def label_mean(img: jax.Array) -> jax.Array:
        return jax.ops.segment_sum(img.ravel(), flat_labels, num_segments=num_labels) / counts

    start_mean = label_mean(image)
    safe_start = jnp.maximum(start_mean, 1e-12)
    prev_mean = start_mean
    ero = image
    spectrum = []
    for i in range(1, length + 1):
        ero = _erode(ero)
        opened = ero
        for _ in range(i):
            opened = _dilate(opened)
        opened = jnp.minimum(opened, image)  # opening never exceeds the input
        cur_mean = label_mean(opened)
        spectrum.append((prev_mean - cur_mean) * 100.0 / safe_start)
        prev_mean = cur_mean
    return jnp.stack(spectrum, axis=1)  # (num_labels, length)


@partial(jax.jit, static_argnames=("length",))
def _granularity_crops_kernel(crops: jax.Array, masks: jax.Array, length: int) -> jax.Array:
    def erode(x: jax.Array) -> jax.Array:
        return -jax.lax.reduce_window(-x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")

    def dilate(x: jax.Array) -> jax.Array:
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")

    img = jnp.where(masks, crops, 0.0)
    n = jnp.maximum(masks.astype(jnp.float32).sum((1, 2)), 1.0)
    start_mean = img.sum((1, 2)) / n
    safe_start = jnp.maximum(start_mean, 1e-12)
    prev_mean = start_mean
    ero = img
    spectrum = []
    for i in range(1, length + 1):
        ero = erode(ero)
        opened = ero
        for _ in range(i):
            opened = dilate(opened)
        opened = jnp.minimum(opened, img)
        cur_mean = jnp.where(masks, opened, 0.0).sum((1, 2)) / n
        spectrum.append((prev_mean - cur_mean) * 100.0 / safe_start)
        prev_mean = cur_mean
    return jnp.stack(spectrum, axis=1)


def granularity_batch(crops: np.ndarray, masks: np.ndarray, length: int = 16) -> np.ndarray:
    """Granularity spectrum per cell over padded bbox crops, the image masked
    to each object (cp_measure's per-object semantics): percent of the
    object's mean intensity removed by openings of scale 1..length.

    Tile-size invariant by construction — each cell sees only its own crop.
    Returns (n, length).
    """
    from squidpy_tpu.utils import to_host

    return to_host(
        _granularity_crops_kernel(
            jnp.asarray(np.ascontiguousarray(crops, dtype=np.float32)),
            jnp.asarray(np.ascontiguousarray(masks, dtype=bool)),
            length,
        )
    )


def granularity_per_label(
    image: np.ndarray, labels: np.ndarray, num_labels: int, length: int = 16
) -> np.ndarray:
    """Granularity spectrum per label: percent of each object's mean intensity
    removed by openings of increasing scale (1..length), computed tile-wide
    in one device pass with per-label segment means.

    CellProfiler MeasureGranularity semantics with opening in place of
    opening-by-reconstruction (see module docstring); single-pixel structures
    vanish at scale 1, structures of half-width s vanish at scale ~s.
    Returns (num_labels, length); row 0 is background.
    """
    from squidpy_tpu.utils import to_host

    img = jnp.asarray(np.ascontiguousarray(image, dtype=np.float32))
    lab = jnp.asarray(np.ascontiguousarray(labels, dtype=np.int32))
    return to_host(_granularity_kernel(img, lab, num_labels, length))


@jax.jit
def _pearson_kernel(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    n = jnp.maximum(m.sum((1, 2)), 1.0)
    am = jnp.where(mask, a, 0.0)
    bm = jnp.where(mask, b, 0.0)
    mu_a = am.sum((1, 2)) / n
    mu_b = bm.sum((1, 2)) / n
    da = jnp.where(mask, a - mu_a[:, None, None], 0.0)
    db = jnp.where(mask, b - mu_b[:, None, None], 0.0)
    cov = (da * db).sum((1, 2))
    va = (da * da).sum((1, 2))
    vb = (db * db).sum((1, 2))
    return cov / jnp.maximum(jnp.sqrt(va * vb), 1e-12)


def pearson_correlation_batch(masks: np.ndarray, chan_a: np.ndarray, chan_b: np.ndarray) -> np.ndarray:
    """Per-cell Pearson correlation between two channels over the cell mask
    (CellProfiler ``MeasureColocalization`` ``Correlation_Correlation``)."""
    from squidpy_tpu.utils import to_host

    return to_host(
        _pearson_kernel(
            jnp.asarray(np.ascontiguousarray(masks, dtype=bool)),
            jnp.asarray(np.ascontiguousarray(chan_a, dtype=np.float32)),
            jnp.asarray(np.ascontiguousarray(chan_b, dtype=np.float32)),
        )
    )


def _masked(mask: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.where(mask, x, 0.0)


def _pearson_above(mask: jax.Array, a: jax.Array, b: jax.Array, thr: jax.Array) -> jax.Array:
    """Pearson over the per-cell sub-population where BOTH channels fall at
    or below ``thr`` fraction of their per-cell max (the Costes bisection
    objective)."""
    ta = thr * jnp.max(_masked(mask, a), axis=(1, 2))
    tb = thr * jnp.max(_masked(mask, b), axis=(1, 2))
    sel = mask & (a <= ta[:, None, None]) & (b <= tb[:, None, None])
    n = jnp.maximum(sel.astype(jnp.float32).sum((1, 2)), 1.0)
    mu_a = _masked(sel, a).sum((1, 2)) / n
    mu_b = _masked(sel, b).sum((1, 2)) / n
    da = jnp.where(sel, a - mu_a[:, None, None], 0.0)
    db = jnp.where(sel, b - mu_b[:, None, None], 0.0)
    cov = (da * db).sum((1, 2))
    denom = jnp.sqrt((da * da).sum((1, 2)) * (db * db).sum((1, 2)))
    return jnp.where(denom > 1e-12, cov / jnp.maximum(denom, 1e-12), 0.0)


@partial(jax.jit, static_argnames=("n_steps",))
def _costes_kernel(mask: jax.Array, a: jax.Array, b: jax.Array, n_steps: int = 16):
    """Costes automatic thresholding + Manders coefficients above it.

    Per cell, bisect the threshold fraction ``t`` (applied to both channels'
    per-cell maxima) to the smallest ``t`` whose below-threshold population
    has Pearson <= 0 (Costes & al. 2004), vectorized over the batch with a
    fixed bisection depth. Returns ``(C1, C2, t)``: the fractions of each
    channel's intensity in pixels where BOTH channels exceed their Costes
    threshold.
    """
    lo = jnp.zeros(mask.shape[0], jnp.float32)
    hi = jnp.ones(mask.shape[0], jnp.float32)
    for _ in range(n_steps):
        mid = 0.5 * (lo + hi)
        r_below = _pearson_above(mask, a, b, mid)
        # below-threshold population still correlated -> threshold too high
        hi = jnp.where(r_below > 0.0, mid, hi)
        lo = jnp.where(r_below > 0.0, lo, mid)
    t = 0.5 * (lo + hi)
    ta = t * jnp.max(_masked(mask, a), axis=(1, 2))
    tb = t * jnp.max(_masked(mask, b), axis=(1, 2))
    above = mask & (a > ta[:, None, None]) & (b > tb[:, None, None])
    tot_a = jnp.maximum(_masked(mask, a).sum((1, 2)), 1e-12)
    tot_b = jnp.maximum(_masked(mask, b).sum((1, 2)), 1e-12)
    c1 = _masked(above, a).sum((1, 2)) / tot_a
    c2 = _masked(above, b).sum((1, 2)) / tot_b
    return c1, c2, t


def costes_coloc_batch(
    masks: np.ndarray, chan_a: np.ndarray, chan_b: np.ndarray
) -> dict[str, np.ndarray]:
    """Costes automatic-threshold colocalization: per-cell threshold fraction
    and the Manders-style ``C1``/``C2`` coefficients above it."""
    from squidpy_tpu.utils import to_host

    c1, c2, t = _costes_kernel(
        jnp.asarray(np.ascontiguousarray(masks, dtype=bool)),
        jnp.asarray(np.ascontiguousarray(chan_a, dtype=np.float32)),
        jnp.asarray(np.ascontiguousarray(chan_b, dtype=np.float32)),
    )
    return {"costes_c1": to_host(c1), "costes_c2": to_host(c2), "costes_threshold": to_host(t)}


@jax.jit
def _manders_kernel(mask: jax.Array, a: jax.Array, b: jax.Array, frac: float = 0.15):
    """Manders overlap coefficients M1/M2 with fixed-fraction thresholds:
    M1 = fraction of channel-a intensity in pixels where b exceeds ``frac``
    of its per-cell max (and vice versa)."""
    ta = frac * jnp.max(_masked(mask, a), axis=(1, 2))
    tb = frac * jnp.max(_masked(mask, b), axis=(1, 2))
    tot_a = jnp.maximum(_masked(mask, a).sum((1, 2)), 1e-12)
    tot_b = jnp.maximum(_masked(mask, b).sum((1, 2)), 1e-12)
    m1 = _masked(mask & (b > tb[:, None, None]), a).sum((1, 2)) / tot_a
    m2 = _masked(mask & (a > ta[:, None, None]), b).sum((1, 2)) / tot_b
    return m1, m2


def manders_batch(
    masks: np.ndarray, chan_a: np.ndarray, chan_b: np.ndarray, frac: float = 0.15
) -> dict[str, np.ndarray]:
    """Manders M1/M2 with fixed-fraction thresholds (documented convention;
    CellProfiler uses the Costes thresholds — see :func:`costes_coloc_batch`
    for that variant)."""
    from squidpy_tpu.utils import to_host

    m1, m2 = _manders_kernel(
        jnp.asarray(np.ascontiguousarray(masks, dtype=bool)),
        jnp.asarray(np.ascontiguousarray(chan_a, dtype=np.float32)),
        jnp.asarray(np.ascontiguousarray(chan_b, dtype=np.float32)),
        frac,
    )
    return {"manders_m1": to_host(m1), "manders_m2": to_host(m2)}


@jax.jit
def _rwc_kernel(mask: jax.Array, a: jax.Array, b: jax.Array):
    """Rank-weighted colocalization (Singan et al. 2011): intensity ranks per
    cell, weight ``(Rmax - |Ra - Rb|) / Rmax``, coefficients are the
    weight-scaled intensity fractions over the whole cell mask."""
    n_cells, h, w = mask.shape
    neg = jnp.where(mask, 0.0, -jnp.inf)
    af = (a + neg).reshape(n_cells, h * w)
    bf = (b + neg).reshape(n_cells, h * w)
    # dense ranks via double argsort (masked-out pixels sink to the bottom)
    ra = jnp.argsort(jnp.argsort(af, axis=1), axis=1).astype(jnp.float32)
    rb = jnp.argsort(jnp.argsort(bf, axis=1), axis=1).astype(jnp.float32)
    m = mask.reshape(n_cells, h * w)
    rmax = jnp.maximum(m.astype(jnp.float32).sum(1), 1.0)
    weight = jnp.where(m, (rmax[:, None] - jnp.abs(ra - rb)) / rmax[:, None], 0.0)
    weight = jnp.clip(weight, 0.0, 1.0)
    tot_a = jnp.maximum(jnp.where(m, a.reshape(n_cells, -1), 0.0).sum(1), 1e-12)
    tot_b = jnp.maximum(jnp.where(m, b.reshape(n_cells, -1), 0.0).sum(1), 1e-12)
    rwc1 = (jnp.where(m, a.reshape(n_cells, -1), 0.0) * weight).sum(1) / tot_a
    rwc2 = (jnp.where(m, b.reshape(n_cells, -1), 0.0) * weight).sum(1) / tot_b
    return rwc1, rwc2


def rwc_batch(masks: np.ndarray, chan_a: np.ndarray, chan_b: np.ndarray) -> dict[str, np.ndarray]:
    """Rank-weighted colocalization coefficients RWC1/RWC2 per cell."""
    from squidpy_tpu.utils import to_host

    r1, r2 = _rwc_kernel(
        jnp.asarray(np.ascontiguousarray(masks, dtype=bool)),
        jnp.asarray(np.ascontiguousarray(chan_a, dtype=np.float32)),
        jnp.asarray(np.ascontiguousarray(chan_b, dtype=np.float32)),
    )
    return {"rwc1": to_host(r1), "rwc2": to_host(r2)}
