"""Stain normalization and decomposition (Macenko / Vahadane / Reinhard).

Functional counterpart of /root/reference/src/squidpy/experimental/im/_stain/*
(fit on optical density: Macenko SVD angular extremes :143-162, Vahadane
sparse NMF :164-181, Reinhard LAB statistics transfer; per-pixel unmixing is
a tiny matmul). Here the per-pixel transforms (OD conversion, concentration
unmixing, LAB transfer, reconstruction) run on device as jnp element-wise +
matmul kernels; the stain-matrix fits stay host-side (SVD/NMF on the sampled
tissue pixels).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Literal

import jax.numpy as jnp
import numpy as np

from squidpy_tpu.utils import NDArrayA

__all__ = [
    "MacenkoParams",
    "ReinhardParams",
    "StainFittingError",
    "StainReference",
    "VahadaneParams",
    "estimate_white_point",
    "default_white_point",
    "validate_rgb_range",
    "white_point_from_background",
    "apply_stain_normalization",
    "fit_stain_reference",
    "normalize_stains",
    "decompose_stains",
    "reinhard_normalize",
]

# Ruifrok & Johnston canonical H&E absorbance vectors (published constants)
RUIFROK_H = np.array([0.650, 0.704, 0.286])
RUIFROK_E = np.array([0.072, 0.990, 0.105])
# canonical-reference mapping form consumed by ``fit_stain_reference``
# (reference contract: experimental/im/_stain/_validation.py RUIFROK_HE)
RUIFROK_HE: dict[str, np.ndarray] = {"hematoxylin": RUIFROK_H, "eosin": RUIFROK_E}
DEFAULT_LUMINOSITY_THRESHOLD = 0.8
_DECOMPOSITION_METHODS = ("macenko", "vahadane")
_VALID_METHODS = ("macenko", "vahadane", "reinhard")


class StainFittingError(RuntimeError):
    """A stain fit failed its sanity checks: empty tissue mask, degenerate
    NMF, or fitted H/E vectors outside the canonical deviation gate
    (reference: experimental/im/_stain/_validation.py:15)."""

    def __init__(self, message: str, image_key: str | None = None) -> None:
        if image_key is not None:
            message = f"{message} (image_key={image_key!r})"
        super().__init__(message)


@dataclass(frozen=True)
class MacenkoParams:
    """Tuning knobs for the Macenko stain-matrix fit.

    ``alpha``: angular percentile (degrees) picking the two stain directions
    from the OD angle distribution. ``beta``: mean-absorbance cutoff selecting
    tissue pixels (reference: experimental/im/_stain/_decomposition.py:40-56).
    """

    alpha: float = 1.0
    beta: float = 0.15

    def __post_init__(self) -> None:
        if not 0.0 < self.alpha < 50.0:
            raise ValueError(f"`alpha` must be in (0, 50), got {self.alpha}.")
        if self.beta < 0.0:
            raise ValueError(f"`beta` must be >= 0, got {self.beta}.")


@dataclass(frozen=True)
class VahadaneParams:
    """Tuning knobs for the Vahadane (sparse dictionary-learning) fit
    (reference: experimental/im/_stain/_decomposition.py:59-80)."""

    beta: float = 0.15
    lambda1: float = 0.01
    n_iter: int = 400
    random_state: int = 0

    def __post_init__(self) -> None:
        if self.beta < 0.0:
            raise ValueError(f"`beta` must be >= 0, got {self.beta}.")
        if self.lambda1 < 0.0:
            raise ValueError(f"`lambda1` must be >= 0, got {self.lambda1}.")
        if self.n_iter < 1:
            raise ValueError(f"`n_iter` must be >= 1, got {self.n_iter}.")


@dataclass(frozen=True)
class ReinhardParams:
    """Tuning knobs for Reinhard normalization: the luminosity cutoff for the
    tissue mask, and whether to mask at all (``mask_background=False`` fits
    the channel statistics over every pixel — vanilla Reinhard; reference:
    experimental/im/_stain/_reinhard.py:34-53)."""

    luminosity_threshold: float = DEFAULT_LUMINOSITY_THRESHOLD
    mask_background: bool = True

    def __post_init__(self) -> None:
        if not 0.0 < self.luminosity_threshold <= 1.0:
            raise ValueError(
                f"`luminosity_threshold` must be in (0, 1], got {self.luminosity_threshold}."
            )


def _unit_columns(m: NDArrayA) -> NDArrayA:
    return m / np.maximum(np.linalg.norm(m, axis=0, keepdims=True), 1e-12)


@dataclass(frozen=True, eq=False)
class StainReference:
    """Fitted stain model.

    Decomposition methods carry the (3, 3) stain matrix (H, E, residual),
    white point, and robust per-stain maximum concentrations; Reinhard
    carries the Ruderman-LAB channel means/stds instead (reference field
    contract: experimental/im/_stain/_reference.py:31-65).
    """

    method: str
    stain_matrix: NDArrayA | None = None
    mu: NDArrayA | None = None
    sigma: NDArrayA | None = None
    white_point: NDArrayA | None = None
    max_concentrations: NDArrayA | None = None

    def __eq__(self, other: object) -> bool:
        # dataclass-generated __eq__ would compare ndarrays elementwise and
        # raise on truthiness; compare method + fields array-safely instead
        if not isinstance(other, StainReference):
            return NotImplemented

        def _same(a: Any, b: Any) -> bool:
            if a is None or b is None:
                return a is None and b is None
            return bool(np.array_equal(np.asarray(a), np.asarray(b)))

        return self.method == other.method and all(
            _same(getattr(self, f), getattr(other, f))
            for f in ("stain_matrix", "mu", "sigma", "white_point", "max_concentrations")
        )

    # defining __eq__ in the class body sets __hash__ to None; keep identity
    # hashing so references stay usable as dict keys (reference: _reference.py:82-85)
    __hash__ = object.__hash__

    def __post_init__(self) -> None:
        """Method/field consistency gate (reference: _reference.py:87-125):
        decomposition methods require a finite (3, 3) stain matrix, a
        strictly positive (3,) white point and optional positive (2,) max
        concentrations, and forbid mu/sigma; Reinhard requires (3,)
        mu/sigma and forbids the absorbance fields."""

        def _coerce(name: str, shape: tuple[int, ...], positive: bool = False) -> None:
            out = np.asarray(getattr(self, name), dtype=np.float64)
            if out.shape != shape:
                raise ValueError(f"{name} must have shape {shape}; got {out.shape}.")
            if not np.all(np.isfinite(out)):
                raise ValueError(f"{name} contains non-finite values.")
            if positive and np.any(out <= 0):
                raise ValueError(f"{name} must be strictly positive.")
            object.__setattr__(self, name, out)

        if self.method not in _VALID_METHODS:
            raise ValueError(
                f"Unknown method {self.method!r}; expected one of {sorted(_VALID_METHODS)}."
            )
        if self.method in _DECOMPOSITION_METHODS:
            if self.stain_matrix is None:
                raise ValueError(f"method={self.method!r} requires stain_matrix.")
            if self.mu is not None or self.sigma is not None:
                raise ValueError(
                    f"method={self.method!r} forbids mu/sigma; pass them only for Reinhard."
                )
            if self.white_point is None:
                raise ValueError(f"method={self.method!r} requires white_point.")
            _coerce("stain_matrix", (3, 3))
            _coerce("white_point", (3,), positive=True)
            if self.max_concentrations is not None:
                _coerce("max_concentrations", (2,), positive=True)
        else:
            if self.mu is None or self.sigma is None:
                raise ValueError("method='reinhard' requires both mu and sigma.")
            if self.stain_matrix is not None:
                raise ValueError("method='reinhard' forbids stain_matrix.")
            if self.white_point is not None:
                raise ValueError(
                    "method='reinhard' forbids white_point; Reinhard's color "
                    "transfer is in Ruderman LAB and does not use a white point."
                )
            if self.max_concentrations is not None:
                raise ValueError("method='reinhard' forbids max_concentrations.")
            _coerce("mu", (3,))
            _coerce("sigma", (3,), positive=True)


def _rgb_scale_factor(arr: np.ndarray) -> float:
    """Multiplier taking ``arr``'s unit convention to the internal 0-255
    scale every absorbance kernel in this module assumes.

    Integer images scale by their dtype's full range (uint8 -> 1, uint16 ->
    255/65535); float images with max <= 1.5 are taken as [0, 1] convention
    (x255), larger floats as already 0-255.
    """
    if np.issubdtype(arr.dtype, np.integer):
        return 255.0 / float(np.iinfo(arr.dtype).max)
    data_max = float(arr.max()) if arr.size else 0.0
    return 255.0 if data_max <= 1.5 else 1.0


def _as_float_rgb(image: Any) -> np.ndarray:
    """Canonicalize any supported RGB representation to 0-255-scale float32.

    float32 throughout: ample for uint8 pixel data, and this host's float64
    log10/power fall back to scalar libm (~400x slower than f32 SIMD).
    """
    arr = np.asarray(image)
    arr = arr.squeeze()
    if arr.ndim != 3 or arr.shape[-1] != 3:
        raise ValueError(f"Expected an RGB image of shape (y, x, 3), found `{arr.shape}`.")
    factor = _rgb_scale_factor(arr)
    out = arr.astype(np.float32)
    if factor != 1.0:
        out *= np.float32(factor)
    return out


def _ingest_rgb(image: Any, white_point: NDArrayA | None) -> tuple[np.ndarray, np.ndarray | None]:
    """Canonicalize an image AND a user-supplied white point (given in the
    image's own units) to the internal 0-255 scale together, so the two can
    never disagree on convention."""
    arr = np.asarray(image).squeeze()
    if arr.ndim != 3 or arr.shape[-1] != 3:
        raise ValueError(f"Expected an RGB image of shape (y, x, 3), found `{arr.shape}`.")
    factor = _rgb_scale_factor(arr)
    rgb = arr.astype(np.float32)
    if factor != 1.0:
        rgb *= np.float32(factor)
    wp = None if white_point is None else np.asarray(white_point, dtype=float) * factor
    return rgb, wp


def default_white_point(rgb: Any) -> np.ndarray:
    """Full-white ``I_0`` in the image's own unit convention: the dtype max
    for integer images (255 / 65535), 1.0 for [0, 1] floats, 255 for
    0-255-scale floats (reference semantics,
    experimental/im/_stain/_white_point.py:22-28, extended to be value-aware
    for floats so it always agrees with the kernels' canonicalization)."""
    arr = np.asarray(rgb)
    if np.issubdtype(arr.dtype, np.integer):
        return np.full(3, float(np.iinfo(arr.dtype).max), dtype=np.float64)
    data_max = float(arr.max()) if arr.size else 0.0
    return np.full(3, 255.0 if data_max > 1.5 else 1.0, dtype=np.float64)


def validate_rgb_range(rgb: Any) -> None:
    """Raise when values clearly don't match any supported convention: 8-bit
    data in a wider integer container, or floats whose maximum sits between
    the [0, 1] and 0-255 conventions (neither scale is plausible). Pass an
    explicit ``white_point`` to bypass (reference: _white_point.py:31-50)."""
    arr = np.asarray(rgb)
    data_max = float(arr.max()) if arr.size else 0.0
    if np.issubdtype(arr.dtype, np.integer):
        if np.iinfo(arr.dtype).max >= 256 and data_max <= 255:
            raise ValueError(
                f"{arr.dtype} image but the maximum value is {data_max:.0f} (<= 255) — this looks "
                f"like 8-bit data stored in a {arr.dtype} container. Convert to uint8, or pass "
                "`white_point`."
            )
    elif arr.dtype.kind == "f" and 1.5 < data_max < 3.0:
        raise ValueError(
            f"float image with maximum {data_max:.2f} — neither [0, 1] nor 0-255 scale. "
            "Rescale to one of those conventions or pass `white_point`."
        )


def white_point_from_background(rgb: Any, background_mask: np.ndarray) -> np.ndarray:
    """Per-channel MEDIAN intensity over true background pixels → ``(3,)``.

    Anchors ``I_0`` to the actual unstained intensity instead of a whole-image
    percentile (reference: _white_point.py:54-60 / HistomicsTK
    ``background_intensity`` semantics). ``background_mask`` is ``(y, x)``
    True over non-tissue pixels.
    """
    factor = _rgb_scale_factor(np.asarray(rgb))
    rgb = _as_float_rgb(rgb)
    mask = np.asarray(background_mask, dtype=bool)
    if mask.shape != rgb.shape[:2]:
        raise ValueError(
            f"background_mask shape {mask.shape} does not match image {rgb.shape[:2]}."
        )
    if not mask.any():
        raise ValueError("background_mask selects no pixels; cannot anchor a white point.")
    # returned in the IMAGE'S OWN units — the convention every white_point=
    # parameter expects (they re-canonicalize on ingest), so an estimated
    # white point round-trips without double-scaling
    return (np.median(rgb[mask], axis=0) / factor).astype(np.float64)


def estimate_white_point(
    image: Any,
    image_key: str | None = None,
    *,
    tissue_mask_key: str | None = None,
    scale: str = "auto",
    percentile: float = 95.0,
) -> np.ndarray:
    """Per-channel white-point ``I_0`` estimate.

    Array form: mean over the brightest ``percentile`` of pixels. SpatialData
    form (``estimate_white_point(sdata, image_key)``): the per-channel median
    over non-tissue pixels — the complement of the ``detect_tissue`` mask
    (reference semantics: experimental/im/_stain/_normalize.py:175-209;
    a tissue mask is required there).

    The estimate is returned in the image's OWN unit convention (like
    :func:`default_white_point`), so it can be passed straight back as a
    ``white_point=`` argument."""
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    if is_sdata(image):
        sdata = image
        da = resolve_element(sdata, image_key, tree="images", scale=scale, what="image")
        validate_rgb_range(da)
        arr = np.asarray(da).squeeze()
        tissue = _resolve_tissue_mask_bool(sdata, image_key, tissue_mask_key, arr.shape[:2])
        return white_point_from_background(arr, ~tissue)
    if image_key is not None:
        raise TypeError(
            f"`image_key`={image_key!r} was given, but the input is a plain array, "
            "not a SpatialData-like object. Pass the array alone (percentile is "
            "keyword-only)."
        )
    arr = np.asarray(image)
    factor = _rgb_scale_factor(arr)
    rgb = _as_float_rgb(arr)
    return _estimate_white_point_flat(rgb.reshape(-1, 3), percentile) / factor


def _estimate_white_point_flat(flat: np.ndarray, percentile: float = 95.0) -> np.ndarray:
    lum = flat.mean(axis=-1)
    thr = np.percentile(lum, percentile)
    bright = flat[lum >= thr]
    if not len(bright):
        return np.full(3, 255.0)
    return np.clip(bright.mean(axis=0), 1.0, 255.0)


def _rgb_to_od(rgb: jnp.ndarray, white_point: jnp.ndarray) -> jnp.ndarray:
    return -jnp.log10(jnp.maximum(rgb, 1.0) / white_point)


def _od_to_rgb(od: jnp.ndarray, white_point: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(white_point * jnp.power(10.0, -od), 0, 255)


def _tissue_od(rgb: np.ndarray, white_point: np.ndarray, beta: float = 0.15) -> np.ndarray:
    od = np.asarray(_rgb_to_od(jnp.asarray(rgb), jnp.asarray(white_point))).reshape(-1, 3)
    keep = np.all(np.isfinite(od), axis=1) & (np.linalg.norm(od, axis=1) > beta)
    od = od[keep]
    if not len(od):
        raise StainFittingError("no tissue pixels for stain fitting; the OD mask is empty.")
    return od


def _macenko_stain_matrix(od: np.ndarray, alpha: float = 1.0) -> np.ndarray:
    """Macenko's angular-extremes method on the top-2 OD singular plane."""
    _, _, vh = np.linalg.svd(od - od.mean(axis=0) * 0.0, full_matrices=False)
    plane = vh[:2].T  # (3, 2)
    signs = np.sign(od.mean(axis=0) @ plane)
    signs[signs == 0] = 1.0
    plane = plane * signs
    proj = od @ plane
    phi = np.arctan2(proj[:, 1], proj[:, 0])
    lo, hi = np.percentile(phi, [alpha, 100.0 - alpha])
    v1 = plane @ np.array([np.cos(lo), np.sin(lo)])
    v2 = plane @ np.array([np.cos(hi), np.sin(hi)])
    return _unit_columns(np.stack([v1, v2], axis=1))


def _vahadane_stain_matrix(od: np.ndarray, lambda1: float = 0.01, n_iter: int = 400, random_state: int = 0) -> np.ndarray:
    """Vahadane's sparse-NMF stain estimation; retries unregularized if the
    L1 penalty collapses a component."""
    from sklearn.decomposition import NMF

    for alpha in (lambda1, 0.0):
        nmf = NMF(
            n_components=2,
            init="nndsvda",
            random_state=random_state,
            alpha_W=alpha,
            l1_ratio=1.0,
            max_iter=n_iter,
        )
        nmf.fit(np.clip(od, 0.0, None))
        stains = nmf.components_.T
        if not np.any(np.linalg.norm(stains, axis=0) < 1e-8):
            return _unit_columns(stains)
    raise ValueError("Vahadane NMF produced a zero-norm stain vector.")


def _angle_between_deg(u: np.ndarray, v: np.ndarray) -> float:
    """Unsigned (sign-agnostic) angle between two vectors, in degrees."""
    denom = max(float(np.linalg.norm(u) * np.linalg.norm(v)), 1e-12)
    cos = abs(float(np.dot(u, v))) / denom
    return float(np.degrees(np.arccos(np.clip(cos, 0.0, 1.0))))


def _canonical_he_cols(canonical: Any) -> tuple[np.ndarray, np.ndarray]:
    ref = RUIFROK_HE if canonical is None else dict(canonical)
    h = np.asarray(ref["hematoxylin"], dtype=np.float64)
    e = np.asarray(ref["eosin"], dtype=np.float64)
    return h / np.linalg.norm(h), e / np.linalg.norm(e)


def _canonicalize(
    raw: np.ndarray,
    canonical: Any = None,
    *,
    max_angle_deg: float | None = None,
    image_key: str | None = None,
) -> np.ndarray:
    """Order columns as (H, E) by cosine against the canonical vectors, flip
    signs so absorbance points along them, gate the deviation angle, and
    append the unit complement as the residual third column (reference
    semantics: experimental/im/_stain/_validation.py reorder/validate/
    complement)."""
    h_ref, e_ref = _canonical_he_cols(canonical)
    cols = _unit_columns(np.asarray(raw, dtype=np.float64))
    h_idx = int(np.argmax(np.abs(cols.T @ h_ref)))
    ordered = np.stack([cols[:, h_idx], cols[:, 1 - h_idx]], axis=1)
    for j, ref_v in enumerate((h_ref, e_ref)):
        if ordered[:, j] @ ref_v < 0:
            ordered[:, j] = -ordered[:, j]
    if max_angle_deg is not None:
        for name, j, ref_v in (("hematoxylin", 0, h_ref), ("eosin", 1, e_ref)):
            ang = _angle_between_deg(ordered[:, j], ref_v)
            if ang > max_angle_deg:
                raise StainFittingError(
                    f"fitted {name} vector deviates {ang:.1f} deg from its canonical "
                    f"reference (max_angle_deg={max_angle_deg}); the image may not be "
                    "H&E, or the tissue mask may be poor.",
                    image_key=image_key,
                )
    third = np.cross(ordered[:, 0], ordered[:, 1])
    nrm = float(np.linalg.norm(third))
    if nrm < 1e-8:
        raise StainFittingError(
            "H and E stain vectors are colinear; cannot form a complement column.",
            image_key=image_key,
        )
    return np.column_stack([ordered, third / nrm])


# ---------------------------------------------------------------------------
# SpatialData-form resolution (reference call surface:
# experimental/im/_stain/_normalize.py:64-175)
# ---------------------------------------------------------------------------


def _nearest_resize_mask(mask: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    ty, tx = int(target_hw[0]), int(target_hw[1])
    yy = np.minimum(np.arange(ty) * mask.shape[0] // ty, mask.shape[0] - 1)
    xx = np.minimum(np.arange(tx) * mask.shape[1] // tx, mask.shape[1] - 1)
    return mask[np.ix_(yy, xx)]


def _resolve_tissue_mask_bool(
    sdata: Any,
    image_key: str | None,
    tissue_mask_key: str | None,
    target_hw: tuple[int, int],
) -> np.ndarray:
    """Materialised ``(y, x)`` boolean tissue mask aligned to ``target_hw``.

    The mask is mandatory for the sdata-form stain fits (reference:
    _normalize.py:79-110): missing masks raise a :class:`KeyError` asking
    the caller to run ``detect_tissue`` first.
    """
    from squidpy_tpu.experimental._sdata import resolve_scale

    labels = getattr(sdata, "labels", None) or {}
    key = tissue_mask_key if tissue_mask_key is not None else (
        f"{image_key}_tissue" if image_key is not None else None
    )
    if key is None or key not in labels:
        raise KeyError(
            f"No tissue mask `{key}` in sdata.labels — run `detect_tissue` first "
            "(a tissue mask is required for stain fitting), or pass `tissue_mask_key`."
        )
    mask = np.asarray(resolve_scale(labels[key], "full")).squeeze() > 0
    if mask.shape != tuple(target_hw):
        mask = _nearest_resize_mask(mask, target_hw)
    return mask


def _store_image(sdata: Any, key: str, arr: np.ndarray) -> None:
    if key in sdata.images:
        raise ValueError(f"image key `{key}` already exists in sdata.images.")
    sdata.images[key] = arr


def fit_stain_reference(
    image: Any,
    image_key: str | None = None,
    method: Literal["macenko", "vahadane", "reinhard"] = "macenko",
    white_point: NDArrayA | None = None,
    alpha: float = 1.0,
    beta: float = 0.15,
    max_pixels: int | None = 200_000,
    seed: int = 0,
    method_params: Any = None,
    *,
    scale: str = "auto",
    tissue_mask: np.ndarray | None = None,
    tissue_mask_key: str | None = None,
    max_angle_deg: float | None = None,
    canonical_reference: Any = None,
    sdata: Any = None,
    **kwargs: Any,
) -> StainReference:
    """Fit a stain reference on an image (or a SpatialData image element).

    ``max_pixels`` subsamples the tissue OD pixels before the SVD/NMF fit —
    stain vectors and percentile statistics converge with a few 10⁵ pixels,
    so fitting on every pixel of a full slide only burns time (the apply
    step still runs on every pixel). ``None`` disables subsampling.

    ``method_params`` takes a :class:`MacenkoParams` / :class:`VahadaneParams`
    / :class:`ReinhardParams` instance (or a mapping of field names) and
    overrides the per-method knobs.

    SpatialData form — ``fit_stain_reference(sdata, image_key, method=...)``
    (reference: experimental/im/_stain/_normalize.py:212-294) — fits on the
    coarsest scale with a **mandatory** tissue mask
    (``tissue_mask_key``, default ``f"{image_key}_tissue"``); array callers
    may pass an explicit ``tissue_mask``. ``method='reinhard'`` fits
    Ruderman-LAB channel statistics instead of a stain matrix. The fitted
    H/E vectors are gated against ``canonical_reference`` (Ruifrok by
    default): deviations beyond ``max_angle_deg`` raise
    :class:`StainFittingError` (45° by default in the SpatialData form,
    matching the reference's validation; the array form leaves the gate off
    unless ``max_angle_deg`` is passed).
    """
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    if sdata is None and is_sdata(image):
        sdata = image
    if sdata is None and image_key in _VALID_METHODS:
        # array-form convenience: fit_stain_reference(img, "vahadane") — the
        # old positional order was (image, method, white_point), so whatever
        # landed in `method` shifts along to white_point instead of being
        # silently dropped
        if not isinstance(method, str):
            if white_point is not None:
                raise TypeError(
                    "Ambiguous positional arguments: pass white_point by keyword."
                )
            method, white_point = image_key, method
            image_key = None
        else:
            method, image_key = image_key, None
    if sdata is not None:
        if max_angle_deg is None:
            # the deviation gate is the reference sdata pipeline's default
            # (_validation.py); the array form keeps it opt-in so arbitrary
            # arrays (non-H&E fixtures, unit tests) fit without a gate
            max_angle_deg = 45.0
        da = resolve_element(sdata, image_key, tree="images", scale=scale, what="image")
        validate_rgb_range(da)
        image = np.asarray(da).squeeze()
        if tissue_mask is None:
            tissue_mask = _resolve_tissue_mask_bool(
                sdata, image_key, tissue_mask_key, image.shape[:2]
            )
        if white_point is None and method in _DECOMPOSITION_METHODS:
            # reference default: fixed full white in the image's own units
            white_point = default_white_point(image)
    if method not in _VALID_METHODS:
        raise ValueError(f"Unknown stain method `{method}`. Valid: {list(_VALID_METHODS)}.")

    mask_arr = None if tissue_mask is None else np.asarray(tissue_mask, dtype=bool)
    if mask_arr is not None and not mask_arr.any():
        raise StainFittingError(
            "no tissue pixels for stain fitting; the mask is empty.", image_key=image_key
        )

    if method == "reinhard":
        return _fit_reinhard_reference(image, mask_arr, method_params, image_key=image_key)

    if method_params is not None:
        from squidpy_tpu.experimental._params import resolve_params

        if method == "macenko":
            mp = resolve_params(method_params, MacenkoParams, "method_params")
            alpha, beta = mp.alpha, mp.beta
        else:  # vahadane
            vp = resolve_params(method_params, VahadaneParams, "method_params")
            beta = vp.beta
            # merge under any explicitly passed kwargs (those win)
            kwargs = {"lambda1": vp.lambda1, "n_iter": vp.n_iter, "random_state": vp.random_state, **kwargs}
    rgb, white_point = _ingest_rgb(image, white_point)
    if mask_arr is not None and mask_arr.shape != rgb.shape[:2]:
        raise ValueError(
            f"tissue_mask shape {mask_arr.shape} does not match image {rgb.shape[:2]}."
        )
    pixels = rgb.reshape(-1, 3) if mask_arr is None else rgb[mask_arr]
    n_px = len(pixels)
    if max_pixels is not None and n_px > 4 * max_pixels:
        # sample-first fit: the stain vectors and percentile statistics
        # converge with a few 10^5 pixels, and sampling BEFORE the OD
        # transform keeps the whole fit in host numpy on the sample instead
        # of shipping the full image through the host<->device tunnel
        # (reference fits on all pixels: _decomposition.py:143-181)
        rng_s = np.random.default_rng(seed)
        sel = rng_s.choice(n_px, size=4 * max_pixels, replace=False)
        sample = pixels[sel]
        if white_point is not None:
            wp = np.asarray(white_point, dtype=float)
        else:
            wp = _estimate_white_point_flat(sample)
        od = -np.log10(np.maximum(sample, 1.0) / wp)
        od = od[np.all(np.isfinite(od), axis=1) & (np.linalg.norm(od, axis=1) > beta)]
        if len(od) > max_pixels:
            od = od[rng_s.choice(len(od), size=max_pixels, replace=False)]
        if len(od) < min(10_000, max_pixels // 4):  # sparse tissue: fit on everything
            od = _tissue_od(pixels, wp, beta)
    else:
        wp = np.asarray(white_point, dtype=float) if white_point is not None else _estimate_white_point_flat(pixels)
        od = _tissue_od(pixels, wp, beta)
        if max_pixels is not None and len(od) > max_pixels:
            od = od[np.random.default_rng(seed).choice(len(od), size=max_pixels, replace=False)]
    if method == "macenko":
        raw = _macenko_stain_matrix(od, alpha)
    else:
        raw = _vahadane_stain_matrix(od, **kwargs)
    matrix = _canonicalize(
        raw, canonical_reference, max_angle_deg=max_angle_deg, image_key=image_key
    )
    conc = od @ np.linalg.pinv(matrix).T
    maxc = np.maximum(np.percentile(conc[:, :2], 99.0, axis=0), 1e-6)
    return StainReference(method=method, stain_matrix=matrix, white_point=wp, max_concentrations=maxc)


def _fit_reinhard_reference(
    image: Any,
    mask_arr: np.ndarray | None,
    method_params: Any,
    *,
    image_key: str | None = None,
) -> StainReference:
    """Ruderman-LAB channel statistics over tissue pixels → StainReference
    (reference: experimental/im/_stain/_reinhard.py fit)."""
    rp = ReinhardParams()
    if method_params is not None:
        from squidpy_tpu.experimental._params import resolve_params

        rp = resolve_params(method_params, ReinhardParams, "method_params")
    rgb = _as_float_rgb(image)
    lab = _rgb_to_lab_host(rgb) if _apply_on_host(rgb) else np.asarray(_rgb_to_lab(jnp.asarray(rgb)))
    if mask_arr is not None:
        m = mask_arr
    elif rp.mask_background:
        m = rgb.mean(axis=-1) / 255.0 < rp.luminosity_threshold
        if not m.any():
            m = np.ones(rgb.shape[:2], dtype=bool)
    else:
        m = np.ones(rgb.shape[:2], dtype=bool)
    sel = lab[m]
    mu = sel.mean(axis=0).astype(np.float64)
    sigma = sel.std(axis=0).astype(np.float64)
    sigma[sigma == 0] = 1.0
    return StainReference(method="reinhard", mu=mu, sigma=sigma)




# Below this pixel count the host<->device transfer dominates the elementwise
# stain math on this environment's tunnel, and vectorized numpy is faster.
_DEVICE_APPLY_MIN_PIXELS = 16_000_000


def _apply_on_host(rgb: np.ndarray) -> bool:
    return rgb.shape[0] * rgb.shape[1] < _DEVICE_APPLY_MIN_PIXELS


def _decompose_array(rgb: np.ndarray, reference: StainReference) -> np.ndarray:
    """(y, x, 3) per-pixel concentrations (H, E, residual) for a 0-255-scale
    float image — one matmul over all pixels."""
    pinv_t = np.linalg.pinv(reference.stain_matrix).T
    if _apply_on_host(rgb):
        od = -np.log10(np.maximum(rgb, 1.0) / reference.white_point.astype(np.float32))
        return (od.reshape(-1, 3) @ pinv_t.astype(np.float32)).reshape(rgb.shape)
    od = _rgb_to_od(jnp.asarray(rgb), jnp.asarray(reference.white_point))
    conc = jnp.dot(od.reshape(-1, 3), jnp.asarray(pinv_t), preferred_element_type=od.dtype)
    return np.asarray(conc).reshape(rgb.shape)


def decompose_stains(
    image: Any,
    image_key: Any = None,
    reference_or_method: Any = None,
    *,
    reference: StainReference | None = None,
    method: Literal["macenko", "vahadane"] | None = None,
    scale: str = "auto",
    method_params: Any = None,
    white_point: NDArrayA | None = None,
    image_key_added: str | None = None,
    inplace: bool = True,
    output_dtype: Any = None,
    tissue_mask_key: str | None = None,
    include_residual: bool = True,
    sdata: Any = None,
    **kwargs: Any,
) -> np.ndarray | dict[str, np.ndarray] | None:
    """Per-pixel stain concentrations.

    Array form returns ``(y, x, 3)`` = (hematoxylin, eosin, residual) — the
    unmixing is one device matmul over all pixels.

    SpatialData form — ``decompose_stains(sdata, image_key,
    reference_or_method)`` (reference:
    experimental/im/_stain/_normalize.py:397-498) — projects with a fitted
    reference (or fits one first when a method name is given), and either
    writes each stain as its own single-channel image
    ``sdata.images[f"{prefix}_{stain}"]`` (``inplace=True``, atomic: all
    target keys validated free before any write) or returns a
    ``{name: (y, x) array}`` dict. ``output_dtype`` defaults to ``float16``
    there; ``include_residual=False`` drops the diagnostic residual map.
    """
    from squidpy_tpu.experimental._sdata import is_sdata

    if sdata is None and is_sdata(image):
        sdata = image
    # array-form compatibility: the second positional slot historically held
    # the reference (or, with a method string and no sdata, the method)
    if image_key is not None and not isinstance(image_key, str):
        if reference is None and isinstance(image_key, StainReference):
            reference = image_key
        image_key = None
    elif sdata is None and image_key in _DECOMPOSITION_METHODS:
        method, image_key = image_key, None
    if reference_or_method is not None:
        if isinstance(reference_or_method, StainReference):
            reference = reference_or_method
        else:
            method = reference_or_method
    if sdata is not None:
        from squidpy_tpu.experimental._sdata import resolve_element

        if reference is not None:
            if reference.method not in _DECOMPOSITION_METHODS or reference.stain_matrix is None:
                raise ValueError(
                    "decompose_stains requires a macenko/vahadane reference with a stain matrix."
                )
            method = reference.method
        elif method is None:
            method = "macenko"
        if method not in _DECOMPOSITION_METHODS:
            raise ValueError(
                f"method must be one of {list(_DECOMPOSITION_METHODS)}; got {method!r}."
            )
        da = resolve_element(
            sdata, image_key, tree="images",
            scale=("full" if scale == "auto" else scale), what="image",
        )
        if reference is None:
            reference = fit_stain_reference(
                sdata,
                image_key=image_key,
                method=method,
                scale="auto",
                method_params=method_params,
                white_point=white_point,
                tissue_mask_key=tissue_mask_key,
            )
        conc = _decompose_array(_as_float_rgb(da), reference)
        conc = conc.astype(np.float16 if output_dtype is None else np.dtype(output_dtype))
        names = ["hematoxylin", "eosin"] + (["residual"] if include_residual else [])
        if not inplace:
            return {name: conc[..., i] for i, name in enumerate(names)}
        # single-image sdatas may resolve with image_key=None — fall back to
        # the same "image" prefix detect_tissue uses rather than "None_*"
        prefix = image_key_added if image_key_added is not None else (image_key or "image")
        target_keys = [f"{prefix}_{name}" for name in names]
        # atomic write: validate every key free before writing any
        clashes = [k for k in target_keys if k in sdata.images]
        if clashes:
            raise ValueError(f"decompose_stains would overwrite existing image(s): {clashes}.")
        for i, k in enumerate(target_keys):
            sdata.images[k] = conc[..., i]
        return None

    rgb = _as_float_rgb(image)
    if reference is None:
        reference = fit_stain_reference(
            rgb,
            method=("macenko" if method is None else method),
            method_params=method_params,
            white_point=white_point,
            **kwargs,
        )
    out = _decompose_array(rgb, reference)
    return out if output_dtype is None else out.astype(np.dtype(output_dtype))


def _cast_to_image_dtype(arr255: np.ndarray, src_factor: float, dtype: Any) -> np.ndarray:
    """Take a 0-255-scale float result back to the source's unit convention
    and cast: integer dtypes round + clip to their range, floats just scale
    (reference's cast-at-the-write-boundary:
    experimental/im/_stain/_conversion.py cast_to_image_dtype)."""
    dtype = np.dtype(dtype)
    out = arr255 / np.float32(src_factor) if src_factor != 1.0 else arr255
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return np.clip(np.rint(out), info.min, info.max).astype(dtype)
    return out.astype(dtype)


def normalize_stains(
    image: Any,
    image_key: Any = None,
    reference: StainReference | None = None,
    method: Literal["macenko", "vahadane"] = "macenko",
    out_dtype: Any = np.uint8,
    *,
    scale: str = "auto",
    method_params: Any = None,
    image_key_added: str | None = None,
    inplace: bool = True,
    output_dtype: Any = None,
    tissue_mask_key: str | None = None,
    preserve_background: bool = True,
    sdata: Any = None,
    **kwargs: Any,
) -> np.ndarray | None:
    """Normalize an image's stains to a fitted reference.

    Deconvolve with the source's own fitted matrix, rescale concentrations to
    the reference maxima, reconvolve with the reference matrix — the standard
    Macenko normalization pipeline, with the pixel passes on device.

    SpatialData form — ``normalize_stains(sdata, image_key, reference)``
    (reference: experimental/im/_stain/_normalize.py:295-396) — fits the
    source statistics over the (mandatory) tissue mask, dispatches on
    ``reference.method`` (Reinhard references transfer LAB statistics),
    keeps background pixels byte-identical when ``preserve_background=True``,
    and either writes ``sdata.images[image_key_added]`` (default
    ``f"{image_key}_normalized"``; raises if taken) or returns the array
    (``inplace=False``). ``output_dtype=None`` keeps the source dtype.
    """
    from squidpy_tpu.experimental._sdata import is_sdata

    if sdata is None and is_sdata(image):
        sdata = image
    # array-form compatibility: the second positional slot historically held
    # the reference (and the third the method string)
    if image_key is not None and not isinstance(image_key, str):
        if isinstance(image_key, StainReference):
            if isinstance(reference, str) and reference in ("macenko", "vahadane"):
                # old (image, reference, method) positional form
                method, reference = reference, image_key
            elif reference is None:
                reference = image_key
        image_key = None
    if sdata is not None:
        from squidpy_tpu.experimental._sdata import resolve_element

        if not isinstance(reference, StainReference):
            raise TypeError(
                "normalize_stains requires a fitted StainReference "
                "(third argument in the SpatialData form)."
            )
        da = resolve_element(
            sdata, image_key, tree="images",
            scale=("full" if scale == "auto" else scale), what="image",
        )
        src_arr = np.asarray(da).squeeze()
        validate_rgb_range(src_arr)
        tissue = _resolve_tissue_mask_bool(sdata, image_key, tissue_mask_key, src_arr.shape[:2])
        tgt_dtype = np.dtype(src_arr.dtype if output_dtype is None else output_dtype)
        src_factor = _rgb_scale_factor(src_arr)
        rgb255 = _as_float_rgb(src_arr)
        if reference.method == "reinhard":
            out255 = _reinhard_apply_masked(rgb255, reference, tissue, method_params)
        else:
            out255 = _normalize_core(
                rgb255, reference, method=reference.method,
                method_params=method_params, tissue_mask=tissue,
            )
        normalized = _cast_to_image_dtype(out255, src_factor, tgt_dtype)
        if preserve_background:
            # non-tissue pixels pass through from the source unchanged — the
            # global colour map would otherwise tint background/white pixels
            source_cast = (
                src_arr if src_arr.dtype == tgt_dtype
                else _cast_to_image_dtype(rgb255, src_factor, tgt_dtype)
            )
            normalized = np.where(tissue[..., None], normalized, source_cast)
        if not inplace:
            return normalized
        key = image_key_added if image_key_added is not None else f"{image_key or 'image'}_normalized"
        _store_image(sdata, key, normalized)
        return None

    if not isinstance(reference, StainReference):
        raise TypeError("normalize_stains requires a fitted StainReference.")
    # a user-supplied white_point describes the SOURCE image in its own
    # units: canonicalize it together with the image (passing it through
    # **kwargs into the inner fit would both collide with the reference's
    # white point and skip the unit conversion)
    rgb, source_wp = _ingest_rgb(image, kwargs.pop("white_point", None))
    if reference.method == "reinhard":
        out255 = _reinhard_apply_masked(rgb, reference, None, method_params)
        return np.clip(out255, 0, 255).astype(out_dtype)
    out255 = _normalize_core(
        rgb, reference, method=method, method_params=method_params,
        source_white_point=source_wp, **kwargs,
    )
    return out255.astype(out_dtype)


def _normalize_core(
    rgb: np.ndarray,
    reference: StainReference,
    *,
    method: str = "macenko",
    method_params: Any = None,
    tissue_mask: np.ndarray | None = None,
    source_white_point: np.ndarray | None = None,
    **kwargs: Any,
) -> np.ndarray:
    """0-255-scale normalized float image for a 0-255-scale float source.

    ``source_white_point`` (already canonicalized to the 0-255 scale)
    overrides the reference's white point for the SOURCE fit."""
    wp = reference.white_point if source_white_point is None else np.asarray(source_white_point, dtype=float)
    src = fit_stain_reference(
        rgb, method=method, white_point=wp,
        method_params=method_params, tissue_mask=tissue_mask, **kwargs,
    )
    scale = np.ones(3)
    scale[:2] = reference.max_concentrations / src.max_concentrations
    # fold deconvolve -> rescale -> reconvolve into ONE 3x3 pixel matrix
    combined = np.linalg.pinv(src.stain_matrix).T * scale[None, :] @ reference.stain_matrix.T
    # forward OD in the SOURCE's white point, reconstruction in the
    # reference's (identical when no source override was given)
    if _apply_on_host(rgb):
        wp_src32 = np.asarray(wp, dtype=np.float32)
        wp_ref32 = reference.white_point.astype(np.float32)
        od = -np.log10(np.maximum(rgb, 1.0) / wp_src32)
        od_out = (od.reshape(-1, 3) @ combined.astype(np.float32)).reshape(od.shape)
        return np.clip(wp_ref32 * np.exp(od_out * np.float32(-np.log(10.0))), 0, 255)
    od = _rgb_to_od(jnp.asarray(rgb), jnp.asarray(wp))
    od_out = jnp.dot(od.reshape(-1, 3), jnp.asarray(combined)).reshape(od.shape)
    rgb_out = _od_to_rgb(od_out, jnp.asarray(reference.white_point))
    return np.asarray(rgb_out)


def _reinhard_apply_masked(
    rgb255: np.ndarray,
    reference: StainReference,
    tissue_mask: np.ndarray | None,
    method_params: Any,
) -> np.ndarray:
    """Reinhard LAB transfer toward a fitted reference's mu/sigma, with the
    SOURCE statistics reduced over the tissue mask (or a luminosity mask when
    none is given). Returns a 0-255-scale float image."""
    rp = ReinhardParams()
    if method_params is not None:
        from squidpy_tpu.experimental._params import resolve_params

        rp = resolve_params(method_params, ReinhardParams, "method_params")
    if reference.mu is None or reference.sigma is None:
        raise ValueError("Reinhard normalization requires a reference with mu/sigma statistics.")
    # np.array (not asarray): the device result is read-only and the transfer
    # below runs in place
    lab = _rgb_to_lab_host(rgb255) if _apply_on_host(rgb255) else np.array(_rgb_to_lab(jnp.asarray(rgb255)))
    if tissue_mask is not None and tissue_mask.any():
        m = np.asarray(tissue_mask, dtype=bool)
    elif rp.mask_background:
        m = rgb255.mean(axis=-1) / 255.0 < rp.luminosity_threshold
        if not m.any():
            m = np.ones(rgb255.shape[:2], dtype=bool)
    else:
        m = np.ones(rgb255.shape[:2], dtype=bool)
    sel = lab[m]
    src_mean = sel.mean(axis=0).astype(np.float32)
    src_std = sel.std(axis=0)
    src_std[src_std == 0] = 1.0
    lab -= src_mean
    lab *= np.asarray(reference.sigma, dtype=np.float32) / src_std.astype(np.float32)
    lab += np.asarray(reference.mu, dtype=np.float32)
    return _lab_to_rgb_host(lab)


# ---------------------------------------------------------------------------
# Reinhard (LAB statistics transfer)
# ---------------------------------------------------------------------------

_RGB2LMS = np.array(
    [[0.3811, 0.5783, 0.0402], [0.1967, 0.7244, 0.0782], [0.0241, 0.1288, 0.8444]]
)
_LMS2LAB_A = np.array(
    [[1 / np.sqrt(3), 0, 0], [0, 1 / np.sqrt(6), 0], [0, 0, 1 / np.sqrt(2)]]
)
_LMS2LAB_B = np.array([[1, 1, 1], [1, 1, -2], [1, -1, 0]])


def _rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    lms = jnp.dot(rgb.reshape(-1, 3) / 255.0, jnp.asarray(_RGB2LMS.T))
    log_lms = jnp.log10(jnp.maximum(lms, 1e-8))
    lab = jnp.dot(log_lms, jnp.asarray((_LMS2LAB_A @ _LMS2LAB_B).T))
    return lab.reshape(rgb.shape)


# f32 C-contiguous constants for the host LAB paths: a float64 operand
# silently promotes the whole 27M-element matmul to f64 (~200x slower on this
# host), and F-contiguous 3x3 operands cost another ~10x
_RGB2LMS_T32 = np.ascontiguousarray(_RGB2LMS.T, dtype=np.float32)
_LMS2LAB_T32 = np.ascontiguousarray((_LMS2LAB_A @ _LMS2LAB_B).T, dtype=np.float32)
_LAB2LMS_T32 = np.ascontiguousarray(np.linalg.inv(_LMS2LAB_A @ _LMS2LAB_B).T, dtype=np.float32)
_LMS2RGB_T32 = np.ascontiguousarray(np.linalg.inv(_RGB2LMS).T, dtype=np.float32)
_LN10_32 = np.float32(np.log(10.0))


def _rgb_to_lab_host(rgb: np.ndarray) -> np.ndarray:
    """f32 host counterpart of :func:`_rgb_to_lab` (fast SIMD transcendentals)."""
    lms = rgb.reshape(-1, 3).astype(np.float32) / np.float32(255.0) @ _RGB2LMS_T32
    log_lms = np.log10(np.maximum(lms, np.float32(1e-8)))
    return (log_lms @ _LMS2LAB_T32).reshape(rgb.shape)


def _lab_to_rgb_host(lab: np.ndarray) -> np.ndarray:
    buf = lab.reshape(-1, 3).astype(np.float32) @ _LAB2LMS_T32
    # in-place from here: each fresh 300MB allocation costs seconds of page
    # faults on this host. Clamp the log domain too — extreme normalized LAB
    # values otherwise produce f32 subnormals out of exp (slow path), and
    # below 10^-12 the intensity rounds to 0 anyway.
    np.clip(buf, np.float32(-12.0), np.float32(12.0), out=buf)
    buf *= _LN10_32
    np.exp(buf, out=buf)
    rgb = buf @ _LMS2RGB_T32
    rgb *= np.float32(255.0)
    np.clip(rgb, 0, 255, out=rgb)
    return rgb.reshape(lab.shape)


def _lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    inv = np.linalg.inv(_LMS2LAB_A @ _LMS2LAB_B)
    log_lms = jnp.dot(lab.reshape(-1, 3), jnp.asarray(inv.T))
    lms = jnp.power(10.0, log_lms)
    rgb = jnp.dot(lms, jnp.asarray(np.linalg.inv(_RGB2LMS).T)) * 255.0
    return jnp.clip(rgb, 0, 255).reshape(lab.shape)


def reinhard_normalize(
    image: Any,
    reference_image: Any | None = None,
    target_means: NDArrayA | None = None,
    target_stds: NDArrayA | None = None,
    luminosity_threshold: float = DEFAULT_LUMINOSITY_THRESHOLD,
    out_dtype: Any = np.uint8,
    method_params: Any = None,
) -> np.ndarray:
    """Reinhard colour normalization: match per-channel LAB mean/std to a
    reference image (or explicit target statistics), computed over tissue
    pixels (luminosity below the threshold). ``method_params`` takes a
    :class:`ReinhardParams` (or mapping) overriding the threshold/masking."""
    mask_background = True
    if method_params is not None:
        from squidpy_tpu.experimental._params import resolve_params

        rp = resolve_params(method_params, ReinhardParams, "method_params")
        luminosity_threshold, mask_background = rp.luminosity_threshold, rp.mask_background
    rgb = _as_float_rgb(image)
    on_host = _apply_on_host(rgb)
    lab_np = _rgb_to_lab_host(rgb) if on_host else np.asarray(_rgb_to_lab(jnp.asarray(rgb)))
    lum = np.asarray(rgb.mean(axis=-1) / 255.0)
    mask = (lum < luminosity_threshold) if mask_background else np.ones(lum.shape, dtype=bool)
    if not mask.any():
        mask = np.ones_like(mask)

    src_mean = lab_np[mask].mean(axis=0)
    src_std = lab_np[mask].std(axis=0)
    src_std[src_std == 0] = 1.0

    if reference_image is not None:
        ref_rgb = _as_float_rgb(reference_image)
        ref_lab = _rgb_to_lab_host(ref_rgb) if _apply_on_host(ref_rgb) else np.asarray(_rgb_to_lab(jnp.asarray(ref_rgb)))
        ref_lum = ref_rgb.mean(axis=-1) / 255.0
        ref_mask = (ref_lum < luminosity_threshold) if mask_background else np.ones(ref_lum.shape, dtype=bool)
        if not ref_mask.any():
            ref_mask = np.ones_like(ref_mask)
        target_means = ref_lab[ref_mask].mean(axis=0)
        target_stds = ref_lab[ref_mask].std(axis=0)
    if target_means is None or target_stds is None:
        raise ValueError("Provide either `reference_image` or both `target_means` and `target_stds`.")

    if on_host:
        lab_np -= src_mean.astype(np.float32)
        lab_np *= (np.asarray(target_stds, dtype=np.float32) / src_std.astype(np.float32))
        lab_np += np.asarray(target_means, dtype=np.float32)
        return _lab_to_rgb_host(lab_np).astype(out_dtype)
    out = (jnp.asarray(lab_np) - jnp.asarray(src_mean)) / jnp.asarray(src_std) * jnp.asarray(
        target_stds
    ) + jnp.asarray(target_means)
    rgb_out = _lab_to_rgb(out)
    return np.asarray(rgb_out).astype(out_dtype)


def apply_stain_normalization(
    image: Any,
    reference: "StainReference | Any" = None,
    method: Literal["macenko", "vahadane", "reinhard"] = "macenko",
    **kwargs: Any,
) -> np.ndarray:
    """One-call stain normalization: fit a reference if needed, then apply.

    ``reference`` may be a fitted :class:`StainReference`, a reference IMAGE
    to fit on, or ``None`` (self-normalization: fit and apply on ``image`` —
    useful to standardize within one slide). ``method='reinhard'`` routes to
    :func:`reinhard_normalize` with the reference image's LAB statistics.

    The reference names this export without defining it
    (/root/reference/src/squidpy/experimental/im/__init__.py:34 is a dangling
    re-export); this build provides the working convenience wrapper.
    """
    if method == "reinhard":
        if isinstance(reference, StainReference):
            if reference.method != "reinhard" or reference.mu is None:
                raise TypeError(
                    "`method='reinhard'` takes a reference IMAGE or a reinhard StainReference."
                )
            return reinhard_normalize(
                image, target_means=reference.mu, target_stds=reference.sigma, **kwargs
            )
        return reinhard_normalize(image, reference_image=reference if reference is not None else image, **kwargs)
    if reference is None:
        ref = fit_stain_reference(image, method=method, **kwargs)
    elif isinstance(reference, StainReference):
        ref = reference
    else:
        ref = fit_stain_reference(reference, method=method, **kwargs)
    return normalize_stains(image, ref, method=method, **kwargs)
