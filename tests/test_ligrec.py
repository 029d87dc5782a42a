"""ligrec tests, modeled on the reference's tests/graph/test_ligrec.py,
including the golden-pickle parity on the RNG-independent outputs (means and
the NaN mask of pvalues), and naive-numpy parity for the permutation kernel
with externally supplied shuffles."""

from __future__ import annotations

import pickle
from itertools import product

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq
from squidpy_tpu._core.anndata import Raw
from squidpy_tpu.gr._ligrec import PermutationTest

_CK = "leiden"


@pytest.fixture()
def adata_raw(adata_ref):
    adata = adata_ref.copy()
    adata.raw = Raw(adata)
    return adata


@pytest.fixture()
def interactions(adata_raw):
    return tuple(product(adata_raw.raw.var_names[:5], adata_raw.raw.var_names[:5]))


@pytest.fixture(scope="session")
def ligrec_no_numba():
    with open("/root/reference/tests/_data/ligrec_no_numba.pickle", "rb") as fin:
        means, pvalues, metadata = pickle.load(fin)
    return {"means": means, "pvalues": pvalues, "metadata": metadata}


class TestValidation:
    def test_invalid_type(self):
        with pytest.raises(TypeError):
            PermutationTest(object())

    def test_missing_raw(self, adata_ref):
        adata = adata_ref.copy()
        adata.raw = None
        with pytest.raises(AttributeError, match="raw"):
            PermutationTest(adata, use_raw=True)

    def test_empty_interactions(self, adata_raw):
        with pytest.raises(ValueError, match="No interactions"):
            PermutationTest(adata_raw).prepare([])

    def test_missing_source_column(self, adata_raw):
        with pytest.raises(KeyError, match="source"):
            PermutationTest(adata_raw).prepare(pd.DataFrame({"a": [1]}))

    def test_too_few_clusters(self, adata_raw, interactions):
        adata_raw.obs["single"] = pd.Categorical(["x"] * adata_raw.n_obs)
        with pytest.raises(ValueError, match="at least"):
            sq.gr.ligrec(adata_raw, "single", interactions=interactions, copy=True, n_perms=2)

    def test_interactions_sequence_forms(self, adata_raw):
        genes = list(adata_raw.raw.var_names[:3])
        pt = PermutationTest(adata_raw).prepare(genes)  # product of all
        assert len(pt.interactions) == 9
        pt2 = PermutationTest(adata_raw).prepare([(genes[0], genes[1])])
        assert len(pt2.interactions) == 1


class TestLigrec:
    def test_result_structure(self, adata_raw, interactions):
        res = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=5, seed=0, copy=True)
        assert set(res.keys()) == {"means", "pvalues", "metadata"}
        assert res["means"].shape == (25, 25)
        assert res["pvalues"].shape == (25, 25)
        assert isinstance(res["means"].index, pd.MultiIndex)
        assert res["means"].columns.names == ["cluster_1", "cluster_2"]

    def test_golden_means_and_nan_mask(self, adata_raw, interactions, ligrec_no_numba):
        """means and the NaN pattern are RNG-independent -> must match the
        reference's committed no-numba golden pickle exactly."""
        res = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=5, seed=42, copy=True)
        np.testing.assert_array_equal(res["means"].index, ligrec_no_numba["means"].index)
        np.testing.assert_array_equal(res["means"].columns, ligrec_no_numba["means"].columns)
        got_means = np.asarray(res["means"].astype(float))
        want_means = np.asarray(ligrec_no_numba["means"].astype(float))
        np.testing.assert_allclose(got_means, want_means, rtol=1e-10, atol=1e-12)
        got_p = np.asarray(res["pvalues"].astype(float))
        want_p = np.asarray(ligrec_no_numba["pvalues"].astype(float))
        np.testing.assert_array_equal(np.isnan(got_p), np.isnan(want_p))

    def test_kernel_matches_naive_with_same_shuffles(self, adata_raw, interactions):
        """Feed identical shuffles to the device kernel and a naive numpy
        implementation of the reference's numba template."""
        import jax.numpy as jnp

        from squidpy_tpu.ops.ligrec import ligrec_perm_counts

        pt = PermutationTest(adata_raw).prepare(interactions)
        data = pt._filtered_data.copy()
        labels = adata_raw.obs[_CK].cat.codes.to_numpy().astype(np.int32)
        n_cls = len(adata_raw.obs[_CK].cat.categories)
        X = data.to_numpy(dtype=np.float64)
        gene_pos = {g: i for i, g in enumerate(data.columns)}
        inter = np.array(
            [[gene_pos[s], gene_pos[t]] for s, t in zip(pt.interactions["source"], pt.interactions["target"])],
            dtype=np.int32,
        )
        pairs = np.array(list(product(range(n_cls), repeat=2)), dtype=np.int32)

        onehot = np.eye(n_cls)[labels]
        counts = onehot.sum(0)
        mean = (X.T @ onehot) / counts
        m1 = mean[inter[:, 0][:, None], pairs[:, 0][None, :]]
        m2 = mean[inter[:, 1][:, None], pairs[:, 1][None, :]]

        rng = np.random.default_rng(0)
        shuffles = np.stack([rng.permutation(labels) for _ in range(7)])

        got = np.asarray(
            ligrec_perm_counts(
                jnp.asarray(X), jnp.asarray(shuffles), jnp.asarray(counts),
                jnp.asarray(inter[:, 0]), jnp.asarray(inter[:, 1]),
                jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1]),
                jnp.asarray(m1 + m2), n_cls,
            )
        )
        want = np.zeros_like(m1)
        for s in shuffles:
            oh = np.eye(n_cls)[s]
            groups = (oh.T @ X) / counts[:, None]
            g1 = groups[pairs[:, 0][None, :], inter[:, 0][:, None]]
            g2 = groups[pairs[:, 1][None, :], inter[:, 1][:, None]]
            want += ((g1 + g2) > (m1 + m2)).astype(float)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_complex_policy_min(self, adata_raw):
        g = list(adata_raw.raw.var_names)
        pt = PermutationTest(adata_raw).prepare(
            pd.DataFrame({"source": [f"{g[0]}_{g[1]}"], "target": [g[2]]}), complex_policy="min"
        )
        # min policy resolves the complex to the member with lower mean expression
        chosen = pt.interactions["source"].iloc[0]
        assert chosen in {g[0].upper(), g[1].upper()}

    def test_complex_policy_all(self, adata_raw):
        g = list(adata_raw.raw.var_names)
        pt = PermutationTest(adata_raw).prepare(
            pd.DataFrame({"source": [f"{g[0]}_{g[1]}"], "target": [g[2]]}), complex_policy="all"
        )
        assert len(pt.interactions) == 2

    def test_fdr_correction(self, adata_raw, interactions):
        res = sq.gr.ligrec(
            adata_raw, _CK, interactions=interactions, n_perms=5, seed=0,
            corr_method="fdr_bh", corr_axis="clusters", copy=True,
        )
        p = np.asarray(res["pvalues"].astype(float))
        assert np.nanmax(p) <= 1.0 + 1e-12

    def test_writes_uns(self, adata_raw, interactions):
        sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=5, seed=0)
        assert f"{_CK}_ligrec" in adata_raw.uns

    def test_key_added(self, adata_raw, interactions):
        sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=5, seed=0, key_added="custom")
        assert "custom" in adata_raw.uns

    def test_seed_reproducibility(self, adata_raw, interactions):
        r1 = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=25, seed=1, copy=True)
        r2 = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=25, seed=1, copy=True)
        np.testing.assert_array_equal(
            np.asarray(r1["pvalues"].astype(float)), np.asarray(r2["pvalues"].astype(float))
        )

    def test_omnipath_gated(self, adata_raw):
        with pytest.raises(ImportError, match="omnipath"):
            sq.gr.ligrec(adata_raw, _CK, interactions=None, copy=True)


class TestClustersSubset:
    """Reference tests/graph/test_ligrec.py:92-98 (invalid clusters) and the
    clusters-subset restriction semantics of PermutationTestABC.test."""

    def test_invalid_clusters(self, adata_raw, interactions):
        with pytest.raises(ValueError, match="Invalid cluster"):
            sq.gr.ligrec(adata_raw, _CK, interactions=interactions, clusters=["foo"],
                         n_perms=3, copy=True, seed=0)

    def test_invalid_clusters_mix(self, adata_raw, interactions):
        # reference raises on the str-where-pair-expected element
        # (tests/graph/test_ligrec.py:96-98)
        with pytest.raises(ValueError, match="Expected a pair"):
            sq.gr.ligrec(adata_raw, _CK, interactions=interactions,
                         clusters=["foo", ("bar", "baz")], n_perms=3, copy=True, seed=0)

    def test_clusters_subset_str(self, adata_raw, interactions):
        cats = list(adata_raw.obs[_CK].cat.categories)[:2]
        res = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, clusters=cats,
                           n_perms=3, copy=True, seed=0)
        # all 4 ordered pairs of the 2 requested clusters, nothing else
        got = set(res["means"].columns)
        assert got == set(product(cats, cats))

    def test_clusters_subset_pairs(self, adata_raw, interactions):
        cats = list(adata_raw.obs[_CK].cat.categories)
        pairs = [(cats[0], cats[1]), (cats[2], cats[0])]
        res = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, clusters=pairs,
                           n_perms=3, copy=True, seed=0)
        assert set(res["means"].columns) == set(pairs)

    def test_subset_means_match_full(self, adata_raw, interactions):
        """Means for a cluster pair are the same whether or not other
        clusters were requested (cluster means don't depend on the subset)."""
        cats = list(adata_raw.obs[_CK].cat.categories)
        full = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=2,
                            copy=True, seed=0)
        sub = sq.gr.ligrec(adata_raw, _CK, interactions=interactions,
                           clusters=[(cats[0], cats[1])], n_perms=2, copy=True, seed=0)
        col = (cats[0], cats[1])
        np.testing.assert_allclose(
            sub["means"][col].to_numpy(dtype=float),
            full["means"][col].to_numpy(dtype=float),
            equal_nan=True,
        )


class TestKernelChunking:
    """The scan kernel pads the permutation axis with zero-weight rows; edge
    perm counts must not leak padding into the exceedance counts."""

    @pytest.mark.parametrize("n_perms", [1, 3, 5, 17])
    def test_edge_perm_counts_match_naive(self, n_perms):
        import jax.numpy as jnp

        from squidpy_tpu.ops.ligrec import ligrec_perm_counts

        rng = np.random.default_rng(0)
        n, g, C, I, J = 150, 20, 4, 8, 6
        x = jnp.asarray(rng.gamma(2.0, 1.0, (n, g)).astype(np.float64))
        labels = rng.integers(0, C, n).astype(np.int32)
        shuffled = np.stack([np.random.default_rng(i).permutation(labels) for i in range(n_perms)])
        counts = np.bincount(labels, minlength=C).astype(np.float64)
        rec = rng.integers(0, g, I).astype(np.int32)
        lig = rng.integers(0, g, I).astype(np.int32)
        c1 = rng.integers(0, C, J).astype(np.int32)
        c2 = rng.integers(0, C, J).astype(np.int32)
        m_sum = rng.random((I, J)) * 1.5

        got = np.asarray(ligrec_perm_counts(
            x, jnp.asarray(shuffled), jnp.asarray(counts), jnp.asarray(rec), jnp.asarray(lig),
            jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(m_sum), C, chunk_size=2,
        ))
        # naive numpy accumulation
        want = np.zeros((I, J))
        xs = np.asarray(x)
        for p in range(n_perms):
            onehot = np.zeros((n, C)); onehot[np.arange(n), shuffled[p]] = 1
            groups = (onehot.T @ xs) / np.where(counts == 0, 1, counts)[:, None]
            want += (groups[c1[None, :], rec[:, None]] + groups[c2[None, :], lig[:, None]]) > m_sum
        np.testing.assert_array_equal(got, want)


class TestReferenceBehaviors:
    """Behavior cases ported from the reference suite
    (/root/reference/tests/graph/test_ligrec.py:52-250): fdr method/axis
    combinations, interaction input forms, capitalization, result anatomy."""

    @pytest.mark.parametrize("corr_method", [None, "fdr_bh", "bonferroni"])
    @pytest.mark.parametrize("corr_axis", ["interactions", "clusters"])
    def test_pvals_in_correct_range(self, adata_raw, interactions, corr_method, corr_axis):
        res = sq.gr.ligrec(
            adata_raw, _CK, interactions=interactions, n_perms=5, seed=0,
            corr_method=corr_method, corr_axis=corr_axis, copy=True,
        )
        p = np.asarray(res["pvalues"].astype(float))
        finite = p[np.isfinite(p)]
        assert finite.min() >= 0.0 - 1e-12
        assert finite.max() <= 1.0 + 1e-12

    def test_invalid_corr_axis(self, adata_raw, interactions):
        with pytest.raises(ValueError):
            sq.gr.ligrec(
                adata_raw, _CK, interactions=interactions, n_perms=5, seed=0,
                corr_method="fdr_bh", corr_axis="foobar", copy=True,
            )

    def test_too_few_permutations(self, adata_raw, interactions):
        with pytest.raises(ValueError):
            sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=0, seed=0, copy=True)

    def test_interactions_dict_form(self, adata_raw):
        g = list(adata_raw.raw.var_names[:4])
        res = sq.gr.ligrec(
            adata_raw, _CK,
            interactions={"source": [g[0], g[1]], "target": [g[2], g[3]]},
            n_perms=5, seed=0, copy=True,
        )
        assert len(res["means"]) == 2

    def test_all_genes_capitalized(self, adata_raw, interactions):
        """Interactions given in lowercase must still match (reference
        uppercases both sides before filtering)."""
        lower = tuple((s.lower(), t.lower()) for s, t in interactions)
        res = sq.gr.ligrec(adata_raw, _CK, interactions=lower, n_perms=5, seed=0, copy=True)
        upper = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=5, seed=0, copy=True)
        pd.testing.assert_frame_equal(res["means"], upper["means"])

    def test_result_correct_index(self, adata_raw, interactions):
        res = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=5, seed=0, copy=True)
        for frame in (res["means"], res["pvalues"]):
            assert frame.index.names == ["source", "target"]
            assert frame.columns.nlevels == 2  # (cluster_1, cluster_2) pairs
        pd.testing.assert_index_equal(res["means"].index, res["pvalues"].index)
        pd.testing.assert_index_equal(res["means"].columns, res["pvalues"].columns)

    def test_return_no_write(self, adata_raw, interactions):
        _ = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=5, seed=0, copy=True)
        assert f"{_CK}_ligrec" not in adata_raw.uns

    def test_seed_changes_pvalues_not_means(self, adata_raw, interactions):
        r1 = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=30, seed=0, copy=True)
        r2 = sq.gr.ligrec(adata_raw, _CK, interactions=interactions, n_perms=30, seed=1, copy=True)
        pd.testing.assert_frame_equal(r1["means"], r2["means"])
        p1 = np.asarray(r1["pvalues"].astype(float))
        p2 = np.asarray(r2["pvalues"].astype(float))
        assert not np.allclose(np.nan_to_num(p1), np.nan_to_num(p2))


class TestLigrecReferenceBehaviors:
    """Remaining reference behaviors: duplicate interactions, None filtering,
    gene-symbol mapping, and the literal NaN-mask case
    (/root/reference/tests/graph/test_ligrec.py:409-566)."""

    def test_non_uniqueness(self, adata_raw, interactions):
        expected = {(r.upper(), l.upper()) for r, l in interactions}
        dup = tuple(interactions) + tuple(interactions[:3])
        res = sq.gr.ligrec(adata_raw, _CK, interactions=dup, n_perms=1, copy=True, seed=42)
        assert len(res["pvalues"]) == len(expected)
        assert set(res["pvalues"].index.to_list()) == expected

    def test_none_source_target_filtered(self, adata_raw):
        pt = PermutationTest(adata_raw).prepare(
            {"source": [None, adata_raw.raw.var_names[0]],
             "target": [None, adata_raw.raw.var_names[1]]}
        )
        assert isinstance(pt.interactions, pd.DataFrame)
        assert len(pt.interactions) == 1

    def test_gene_symbols(self, adata_raw):
        gene_ids = [f"ENSG{i:05d}" for i in range(adata_raw.n_vars)]
        adata_raw.var["gene_ids"] = gene_ids
        adata_raw.raw.var["gene_ids"] = gene_ids[: adata_raw.raw.n_vars] \
            if hasattr(adata_raw.raw, "var") else None
        inter = tuple(product(gene_ids[:4], gene_ids[:4]))
        res = sq.gr.ligrec(
            adata_raw, _CK, interactions=inter, n_perms=5, use_raw=False,
            copy=True, gene_symbols="gene_ids", seed=0,
        )
        np.testing.assert_array_equal(res["means"].index, pd.MultiIndex.from_tuples(inter))
        np.testing.assert_array_equal(res["pvalues"].index, pd.MultiIndex.from_tuples(inter))

    def test_nan_counts_literal(self):
        """2 clusters x 3 gene pairs with threshold 0.8: only GENE2->GENE3 in
        A->B passes both expression masks; every other combination is NaN."""
        X = np.array(
            [
                [1.0, 0.1, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.1, 0.0, 1.0],
                [0.0, 0.0, 1.0],
                [0.0, 0.0, 1.0],
            ]
        )
        adata = sq.AnnData(
            X=X,
            obs=pd.DataFrame({"cluster": pd.Categorical(["A"] * 3 + ["B"] * 3)},
                             index=[f"cell{i}" for i in range(1, 7)]),
            var=pd.DataFrame(index=["Gene1", "Gene2", "Gene3"]),
        )
        inter = pd.DataFrame({"source": ["Gene1", "Gene2", "Gene3"],
                              "target": ["Gene2", "Gene3", "Gene1"]})
        res = sq.gr.ligrec(adata, cluster_key="cluster", interactions=inter,
                           threshold=0.8, use_raw=False, copy=True, seed=0)
        pv = res["pvalues"].values
        assert int(np.isnan(pv).sum()) == 11
        want = np.full((3, 4), np.nan)
        want[1, 1] = 0.0
        np.testing.assert_array_equal(pv, want)


class TestExpressionShipping:
    """Round-3 transfer compression: the expression matrix crosses the
    host-device boundary in its narrowest lossless container."""

    def _adata(self, X):
        import pandas as pd

        import squidpy_tpu as sq_

        n = X.shape[0]
        return sq_.AnnData(
            X=X,
            obs=pd.DataFrame(
                {"cl": pd.Categorical(np.random.default_rng(1).choice(list("abc"), n))},
                index=[f"c{i}" for i in range(n)],
            ),
            var=pd.DataFrame(index=[f"G{i}" for i in range(X.shape[1])]),
        )

    def _interactions(self, genes=20, k=8):
        import pandas as pd

        rng = np.random.default_rng(2)
        names = [f"G{i}" for i in range(genes)]
        return pd.DataFrame({"source": rng.choice(names, k), "target": rng.choice(names, k)})

    def test_integral_counts_bitwise_reproducible(self):
        import squidpy_tpu as sq_

        rng = np.random.default_rng(0)
        X = rng.poisson(1.0, (300, 20)).astype(float)  # u8-compressible
        a = sq_.gr.ligrec(self._adata(X), cluster_key="cl", interactions=self._interactions(),
                          n_perms=50, seed=3, copy=True, use_raw=False)
        b = sq_.gr.ligrec(self._adata(X), cluster_key="cl", interactions=self._interactions(),
                          n_perms=50, seed=3, copy=True, use_raw=False)
        np.testing.assert_array_equal(
            a["pvalues"].to_numpy(float), b["pvalues"].to_numpy(float)
        )

    def test_fractional_data_takes_float_path(self):
        import squidpy_tpu as sq_

        rng = np.random.default_rng(0)
        X = rng.gamma(2.0, 1.0, (300, 20))  # non-integral: no compression
        res = sq_.gr.ligrec(self._adata(X), cluster_key="cl", interactions=self._interactions(),
                            n_perms=50, seed=3, copy=True, use_raw=False)
        pv = res["pvalues"].to_numpy(float)
        assert np.isfinite(pv).any()
        assert ((pv >= 0) | np.isnan(pv)).all() and ((pv <= 1) | np.isnan(pv)).all()

    def test_negative_values_no_compression_crash(self):
        import squidpy_tpu as sq_

        rng = np.random.default_rng(0)
        X = rng.normal(0.0, 1.0, (200, 20))  # negatives: must skip u8 cast
        res = sq_.gr.ligrec(self._adata(X), cluster_key="cl", interactions=self._interactions(),
                            n_perms=20, seed=0, copy=True, use_raw=False)
        assert res["means"].shape[0] > 0

    def test_u16_range_counts(self):
        import squidpy_tpu as sq_

        rng = np.random.default_rng(0)
        X = rng.integers(0, 5000, (200, 20)).astype(float)  # u16-compressible
        res = sq_.gr.ligrec(self._adata(X), cluster_key="cl", interactions=self._interactions(),
                            n_perms=20, seed=0, copy=True, use_raw=False)
        assert np.isfinite(res["means"].to_numpy(float)).any()

    def test_dtype_policy_small_x64_is_exact_f64(self):
        from squidpy_tpu.gr._ligrec import PermutationTest

        rng = np.random.default_rng(0)
        X = rng.poisson(1.0, (100, 10)).astype(np.float64)
        pt = PermutationTest(self._adata(X), use_raw=False)
        assert pt._data.to_numpy().dtype == np.float64  # small + x64 -> exact path

    def test_dtype_policy_decided_on_filtered_matrix(self):
        """Construction preserves the input float dtype; the f64-vs-f32
        decision happens in `_analysis` on the interaction-FILTERED matrix
        (a dataset's unused genes must not demote a small run to f32)."""
        from squidpy_tpu.gr._ligrec import PermutationTestABC

        rng = np.random.default_rng(0)
        X = rng.poisson(1.0, (5000, 1000)).astype(np.float64)  # > 4e6 raw
        pt = PermutationTestABC.__new__(PermutationTestABC)
        PermutationTestABC.__init__(pt, self._adata(X), use_raw=False)
        assert pt._data.to_numpy().dtype == np.float64  # original kept
        # integer inputs are made float for the pipeline
        Xi = rng.poisson(1.0, (100, 10)).astype(np.int32)
        pt2 = PermutationTestABC.__new__(PermutationTestABC)
        PermutationTestABC.__init__(pt2, self._adata(Xi), use_raw=False)
        assert pt2._data.to_numpy().dtype == np.float32
