"""O(n²) pair statistics at the 1M-cell north-star scale (VERDICT r3 task 1).

Measures, on the real chip with forced host readbacks:
- co_occurrence counts, 50 bins (49 thresholds), 1M cells, default interval
  (thres_max = half the cloud diameter — the WORST case for spatial pruning);
- the same with a realistic short-range interval (50 bins to ~5% of extent);
- Ripley L observed pair counts at 1M points + the 100-simulation envelope.

Run: python examples/scale_pairs_1m.py [n_cells]
"""

from __future__ import annotations

import sys
import time

import numpy as np

try:
    import squidpy_tpu  # noqa: F401  (platform init)
except ModuleNotFoundError:  # running the script in place, package not installed
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu  # noqa: F401


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(0)
    # clustered tissue-like point cloud on a 10mm x 10mm slide (units: um)
    centers = rng.uniform(0, 10_000, size=(300, 2))
    which = rng.integers(0, 300, size=n)
    coords = (centers[which] + rng.normal(0, 150, size=(n, 2))).astype(np.float32)
    labels = rng.integers(0, 16, size=n).astype(np.int32)

    from squidpy_tpu.gr._ppatterns import _find_min_max
    from squidpy_tpu.ops.cooccur import co_occurrence_counts
    from squidpy_tpu.ops.pairbins import morton_argsort, plan_binned_pairs

    tmin, tmax = _find_min_max(coords)
    interval = np.linspace(tmin, tmax, 50, dtype=np.float32)
    thresholds = (interval[1:].astype(np.float64) ** 2).astype(np.float32)

    perm = morton_argsort(coords)
    t0 = time.perf_counter()
    plan = plan_binned_pairs(coords[perm], labels[perm], thresholds, 16, tile=1024)
    t_plan = time.perf_counter() - t0
    print(
        f"[plan default-interval] tile={plan.tile} blocks_pairs={plan.n_pairs_total} "
        f"device_items={plan.n_items} plan_time={t_plan:.2f}s "
        f"(items/pair ratio {plan.n_items / plan.n_pairs_total:.2f})"
    )

    # warm + timed (different labels so nothing is served from a result cache)
    for rep in range(3):
        labels_r = rng.integers(0, 16, size=n).astype(np.int32)
        t0 = time.perf_counter()
        counts = co_occurrence_counts(coords, labels_r, thresholds, 16)
        total = float(counts[..., -1].sum())  # host value == forced readback
        dt = time.perf_counter() - t0
        print(f"[co_occurrence 1M x 49thr default-interval] rep{rep}: {dt:.2f}s (pairs@max={total:.3e})")

    # realistic short-range interval: 50 bins to 500 um (5% of the slide)
    interval_s = np.linspace(0, 500.0, 50, dtype=np.float32)
    thr_s = (interval_s[1:].astype(np.float64) ** 2).astype(np.float32)
    plan_s = plan_binned_pairs(coords[perm], labels[perm], thr_s, 16, tile=1024)
    print(f"[plan short-interval] device_items={plan_s.n_items} of {plan_s.n_pairs_total} block pairs")
    for rep in range(3):
        labels_r = rng.integers(0, 16, size=n).astype(np.int32)
        t0 = time.perf_counter()
        counts = co_occurrence_counts(coords, labels_r, thr_s, 16)
        total = float(counts[..., -1].sum())
        dt = time.perf_counter() - t0
        print(f"[co_occurrence 1M x 49thr short-interval] rep{rep}: {dt:.2f}s (pairs@max={total:.3e})")

    # Ripley L at 1M points: observed pair counts + 100-sim envelope
    from scipy.spatial import ConvexHull

    from squidpy_tpu.ops.ripley import pair_counts_cumulative, ppp_sample

    hull = ConvexHull(coords.astype(np.float64))
    area = hull.volume
    max_dist = (area / 2) ** 0.5
    support = np.linspace(0, max_dist, 50)
    for rep in range(2):
        jitter = rng.normal(0, 1e-3, size=coords.shape).astype(np.float32)
        t0 = time.perf_counter()
        pairs = pair_counts_cumulative(coords + jitter, support)
        dt = time.perf_counter() - t0
        print(f"[ripley-L observed pairs 1M x 50 steps] rep{rep}: {dt:.2f}s (pairs@max={pairs[-1]:.3e})")

    # round-5 envelope: ALL 100 simulations in one batched device dispatch
    # (was a serial per-simulation loop, 4.2-5.2 s)
    from squidpy_tpu.ops.ripley import batched_pair_counts

    sims_rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    clouds = np.stack([ppp_sample(hull, 1, 1000, rng=sims_rng) for _ in range(100)])
    t_draw = time.perf_counter() - t0
    batched_pair_counts(clouds, support)  # compile
    for rep in range(2):
        clouds_r = np.stack([ppp_sample(hull, 1, 1000, rng=sims_rng) for _ in range(100)])
        t0 = time.perf_counter()
        batched_pair_counts(clouds_r, support)
        print(f"[ripley-L 100-sim envelope, batched] rep{rep}: "
              f"{time.perf_counter() - t0:.2f}s (+{t_draw:.2f}s host PPP draws)")


if __name__ == "__main__":
    main()
