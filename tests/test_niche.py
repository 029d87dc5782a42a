"""calculate_niche tests: all flavors on synthetic data with known spatial
domain structure (two well-separated blobs with distinct expression)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq


@pytest.fixture()
def domain_adata() -> sq.AnnData:
    """Two spatial domains with distinct expression and cell-type mixes."""
    rng = np.random.default_rng(0)
    n_per = 150
    coords = np.vstack([
        rng.normal(0, 2, size=(n_per, 2)),
        rng.normal(20, 2, size=(n_per, 2)),
    ])
    X = np.vstack([
        rng.normal(0, 1, size=(n_per, 12)),
        rng.normal(4, 1, size=(n_per, 12)),
    ])
    types = np.concatenate([
        rng.choice(["A", "B"], n_per, p=[0.9, 0.1]),
        rng.choice(["A", "B"], n_per, p=[0.1, 0.9]),
    ])
    adata = sq.AnnData(X=X)
    adata.obsm["spatial"] = coords
    adata.obs["cell_type"] = pd.Categorical(types)
    sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
    return adata


def _domain_agreement(labels: np.ndarray, n_per: int = 150) -> float:
    """Fraction of the dominant label per true domain (label-permutation proof)."""
    top1 = pd.Series(labels[:n_per]).value_counts(normalize=True).iloc[0]
    top2 = pd.Series(labels[n_per:]).value_counts(normalize=True).iloc[0]
    return (top1 + top2) / 2


def _domain_purity(labels: np.ndarray, n_per: int = 150, min_size: int = 10) -> float:
    """Weighted purity: fraction of each niche living in a single true domain.
    Clustering may legitimately split a domain into several pure sub-niches."""
    truth = np.array(["d1"] * n_per + ["d2"] * n_per)
    df = pd.DataFrame({"lab": labels, "truth": truth})
    sizes = df["lab"].value_counts()
    total, pure = 0, 0.0
    for lab, size in sizes.items():
        if size < min_size:
            continue
        frac = df.loc[df["lab"] == lab, "truth"].value_counts(normalize=True).iloc[0]
        pure += frac * size
        total += size
    return pure / max(total, 1)


class TestNeighborhoodFlavor:
    def test_recovers_domains(self, domain_adata):
        sq.gr.calculate_niche(
            domain_adata, flavor="neighborhood", groups="cell_type",
            n_neighbors=10, resolutions=0.5,
        )
        key = "nhood_niche_res=0.5"
        assert key in domain_adata.obs
        # profile clustering may split each domain into pure sub-niches
        assert _domain_purity(domain_adata.obs[key].to_numpy()) > 0.9

    def test_min_niche_size(self, domain_adata):
        sq.gr.calculate_niche(
            domain_adata, flavor="neighborhood", groups="cell_type",
            n_neighbors=10, resolutions=1.0, min_niche_size=10_000,
        )
        assert (domain_adata.obs["nhood_niche_res=1.0"] == "not_a_niche").all()

    def test_n_hop(self, domain_adata):
        sq.gr.calculate_niche(
            domain_adata, flavor="neighborhood", groups="cell_type",
            n_neighbors=10, resolutions=0.5, distance=2, n_hop_weights=[1.0, 0.5],
        )
        assert "nhood_niche_res=0.5" in domain_adata.obs

    def test_missing_groups_raises(self, domain_adata):
        with pytest.raises(ValueError, match="groups"):
            sq.gr.calculate_niche(domain_adata, flavor="neighborhood", n_neighbors=5, resolutions=0.5)


class TestUtagFlavor:
    def test_recovers_domains(self, domain_adata):
        sq.gr.calculate_niche(domain_adata, flavor="utag", n_neighbors=10, resolutions=0.5)
        key = "utag_niche_res=0.5"
        assert key in domain_adata.obs
        assert _domain_agreement(domain_adata.obs[key].to_numpy()) > 0.9

    def test_multiple_resolutions(self, domain_adata):
        sq.gr.calculate_niche(domain_adata, flavor="utag", n_neighbors=10, resolutions=[0.3, 0.8])
        assert "utag_niche_res=0.3" in domain_adata.obs
        assert "utag_niche_res=0.8" in domain_adata.obs


class TestCellcharterFlavor:
    @pytest.mark.parametrize("aggregation", ["mean", "variance"])
    def test_recovers_domains(self, domain_adata, aggregation):
        # GMM with random init can land in a poor local optimum for a given
        # seed (same sklearn behavior as the reference) — accept if any of a
        # few seeds recovers the two domains
        best = 0.0
        for seed in (0, 1, 2):
            sq.gr.calculate_niche(
                domain_adata, flavor="cellcharter", n_components=2,
                aggregation=aggregation, random_state=seed,
            )
            labels = domain_adata.obs["cellcharter_niche"].to_numpy().astype(str)
            best = max(best, _domain_purity(labels))
            if best > 0.9:
                break
        assert best > 0.9

    def test_use_rep(self, domain_adata):
        domain_adata.obsm["X_custom"] = np.asarray(domain_adata.X, dtype=float)[:, :4]
        sq.gr.calculate_niche(
            domain_adata, flavor="cellcharter", n_components=2, use_rep="X_custom", random_state=0,
        )
        assert "cellcharter_niche" in domain_adata.obs

    def test_use_rep_too_small(self, domain_adata):
        domain_adata.obsm["X_small"] = np.asarray(domain_adata.X, dtype=float)[:, :1]
        with pytest.raises(ValueError, match="components"):
            sq.gr.calculate_niche(
                domain_adata, flavor="cellcharter", n_components=5, use_rep="X_small",
            )

    def test_bad_aggregation(self, domain_adata):
        with pytest.raises(ValueError, match="aggregation"):
            sq.gr.calculate_niche(
                domain_adata, flavor="cellcharter", n_components=2, aggregation="median",
            )


class TestNicheCommon:
    def test_invalid_flavor(self, domain_adata):
        with pytest.raises(ValueError, match="flavor"):
            sq.gr.calculate_niche(domain_adata, flavor="banana")

    def test_rerun_same_resolution_overwrites(self, domain_adata):
        """Second call with the same resolution must overwrite, not crash
        (regression: DataFrame.pop was called with a default it rejects)."""
        for _ in range(2):
            sq.gr.calculate_niche(
                domain_adata, flavor="neighborhood", groups="cell_type",
                n_neighbors=10, resolutions=1.0,
            )
        assert "nhood_niche_res=1.0" in domain_adata.obs

    def test_inplace_false_returns_copy(self, domain_adata):
        out = sq.gr.calculate_niche(
            domain_adata, flavor="utag", n_neighbors=10, resolutions=0.5, inplace=False,
        )
        assert "utag_niche_res=0.5" in out.obs
        assert "utag_niche_res=0.5" not in domain_adata.obs

    def test_library_key_prefixes(self, domain_adata):
        domain_adata.obs["lib"] = pd.Categorical(["s1"] * 150 + ["s2"] * 150)
        sq.gr.calculate_niche(
            domain_adata, flavor="utag", n_neighbors=10, resolutions=0.5, library_key="lib",
        )
        labels = domain_adata.obs["utag_niche_res=0.5"]
        assert labels.str.startswith("lib=").all()

    def test_spatialleiden_gated(self, domain_adata):
        domain_adata.obsp["connectivities"] = domain_adata.obsp["spatial_connectivities"]
        with pytest.raises(ImportError, match="spatialleiden"):
            sq.gr.calculate_niche(domain_adata, flavor="spatialleiden", resolutions=0.5)

    def test_fide_score(self, domain_adata):
        sq.gr.calculate_niche(domain_adata, flavor="utag", n_neighbors=10, resolutions=0.5)
        from squidpy_tpu.gr._niche import _fide_score

        score = _fide_score(domain_adata, "utag_niche_res=0.5", average=True)
        assert 0.5 < score <= 1.0  # spatially continuous niches

    def test_jsd(self, domain_adata):
        domain_adata.obs["lib"] = pd.Categorical(["s1"] * 150 + ["s2"] * 150)
        sq.gr.calculate_niche(domain_adata, flavor="utag", n_neighbors=10, resolutions=0.5)
        from squidpy_tpu.gr._niche import _jensen_shannon_divergence

        jsd = _jensen_shannon_divergence(domain_adata, "utag_niche_res=0.5", "lib")
        assert np.isfinite(jsd)


class TestNicheInternals:
    """Unit tests of the graph helpers behind all flavors
    (reference: gr/_niche.py:399-540, 767-800)."""

    def test_setdiag_zero_eliminates(self):
        from scipy import sparse as sps

        from squidpy_tpu.gr._niche import _setdiag

        a = sps.eye(4, format="csr") + sps.csr_matrix(
            ([1.0], ([0], [1])), shape=(4, 4)
        )
        out = _setdiag(a, 0)
        assert out.diagonal().sum() == 0
        assert out.nnz == 1  # only the (0,1) entry survives

    def test_setdiag_one(self):
        from scipy import sparse as sps

        from squidpy_tpu.gr._niche import _setdiag

        a = sps.csr_matrix((4, 4))
        out = _setdiag(a, 1)
        np.testing.assert_array_equal(out.diagonal(), np.ones(4))

    def test_hop_reaches_two_step_neighbors_only(self):
        from scipy import sparse as sps

        from squidpy_tpu.gr._niche import _hop, _setdiag

        # path graph 0-1-2-3
        rows = [0, 1, 1, 2, 2, 3]
        cols = [1, 0, 2, 1, 3, 2]
        adj = sps.csr_matrix((np.ones(6), (rows, cols)), shape=(4, 4))
        visited = _setdiag(adj.copy(), 1)
        hop2, visited2 = _hop(adj, adj, visited)
        # node 0's fresh 2-hop neighborhood is exactly {2}
        assert set(hop2[0].nonzero()[1]) == {2}
        # visited accumulates: 0 now knows {0, 1, 2}
        assert set(visited2[0].nonzero()[1]) == {0, 1, 2}

    def test_normalize_rows_sum_to_one(self):
        from scipy import sparse as sps

        from squidpy_tpu.gr._niche import _normalize

        rng = np.random.default_rng(0)
        a = sps.random(10, 10, density=0.4, random_state=0, format="csr")
        out = _normalize(a)
        sums = np.asarray(out.sum(axis=1)).ravel()
        nonzero = np.asarray(a.sum(axis=1)).ravel() > 0
        np.testing.assert_allclose(sums[nonzero], 1.0, atol=1e-12)
        assert (sums[~nonzero] == 0).all()

    def test_neighborhood_profile_rows(self, domain_adata):
        from squidpy_tpu.gr._niche import _neighborhood_profile

        adj = domain_adata.obsp["spatial_connectivities"]
        prof = _neighborhood_profile(domain_adata, "cell_type", adj, abs_nhood=False)
        assert prof.shape == (domain_adata.n_obs, 2)
        np.testing.assert_allclose(prof.sum(axis=1), 1.0, atol=1e-9)
        # absolute counts: rows sum to the node degree (k=6)
        prof_abs = _neighborhood_profile(domain_adata, "cell_type", adj, abs_nhood=True)
        np.testing.assert_allclose(prof_abs.sum(axis=1), 6.0, atol=1e-9)


class TestNicheMetrics:
    def test_fide_perfect_when_niches_are_domains(self, domain_adata):
        from squidpy_tpu.gr._niche import _fide_score

        domain_adata.obs["perfect"] = pd.Categorical(["d1"] * 150 + ["d2"] * 150)
        score = _fide_score(domain_adata, "perfect", average=True)
        assert score > 0.95  # blobs are far apart: almost no cross edges

    def test_fide_low_for_random_labels(self, domain_adata):
        from squidpy_tpu.gr._niche import _fide_score

        rng = np.random.default_rng(0)
        domain_adata.obs["rand"] = pd.Categorical(rng.choice(["x", "y"], 300))
        perfect = _fide_score(
            domain_adata.assign_obs("perfect", pd.Categorical(["d1"] * 150 + ["d2"] * 150))
            if hasattr(domain_adata, "assign_obs") else domain_adata, "rand", average=True
        )
        assert perfect < 0.7

    def test_jsd_zero_for_identical_slides(self, domain_adata):
        from squidpy_tpu.gr._niche import _jensen_shannon_divergence

        domain_adata.obs["niche"] = pd.Categorical(["a", "b"] * 150)
        domain_adata.obs["lib"] = pd.Categorical(["s1"] * 150 + ["s2"] * 150)
        # both slides see the identical 50/50 label distribution
        assert _jensen_shannon_divergence(domain_adata, "niche", "lib") == pytest.approx(0.0, abs=1e-12)

    def test_jsd_positive_for_disjoint_slides(self, domain_adata):
        from squidpy_tpu.gr._niche import _jensen_shannon_divergence

        domain_adata.obs["niche"] = pd.Categorical(["a"] * 150 + ["b"] * 150)
        domain_adata.obs["lib"] = pd.Categorical(["s1"] * 150 + ["s2"] * 150)
        assert _jensen_shannon_divergence(domain_adata, "niche", "lib") > 0.8

    def test_single_library_jsd_zero(self, domain_adata):
        from squidpy_tpu.gr._niche import _jensen_shannon_divergence

        domain_adata.obs["niche"] = pd.Categorical(["a", "b"] * 150)
        domain_adata.obs["lib"] = pd.Categorical(["only"] * 300)
        assert _jensen_shannon_divergence(domain_adata, "niche", "lib") == 0.0


class TestNicheValidation:
    def test_distance_ignored_for_utag(self, domain_adata):
        # utag always aggregates 1-hop; passing distance is accepted/ignored
        sq.gr.calculate_niche(
            domain_adata, flavor="utag", n_neighbors=6, resolutions=0.5
        )
        assert any(c.startswith("utag_niche") for c in domain_adata.obs.columns)

    def test_cellcharter_requires_aggregation_default(self, domain_adata):
        sq.gr.calculate_niche(
            domain_adata, flavor="cellcharter", n_neighbors=6, n_components=2
        )
        assert "cellcharter_niche" in domain_adata.obs.columns

    def test_resolutions_list(self, domain_adata):
        sq.gr.calculate_niche(
            domain_adata, flavor="neighborhood", groups="cell_type",
            n_neighbors=6, resolutions=[0.3, 0.7],
        )
        cols = [c for c in domain_adata.obs.columns if c.startswith("nhood_niche_res")]
        assert len(cols) == 2
