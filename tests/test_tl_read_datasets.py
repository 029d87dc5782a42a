"""tl / read / datasets tests, modeled on the reference's tests/tools and
tests/read suites (using the reference's committed 10x h5 fixture)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq


class TestSlidingWindow:
    @pytest.fixture()
    def grid_adata(self) -> sq.AnnData:
        xx, yy = np.meshgrid(np.arange(20), np.arange(20))
        coords = np.c_[xx.ravel(), yy.ravel()].astype(float)
        adata = sq.AnnData(X=np.zeros((400, 1)))
        adata.obsm["spatial"] = coords
        return adata

    def test_non_overlapping(self, grid_adata):
        sq.tl.sliding_window(grid_adata, window_size=10)
        col = grid_adata.obs["sliding_window_assignment"]
        assert isinstance(col.dtype, pd.CategoricalDtype)
        assert col.notna().all()
        # 2x2 windows of 10x10 on a 0..19 grid -> 4 windows
        assert col.nunique() == 4

    def test_overlapping_boolean_columns(self, grid_adata):
        df = sq.tl.sliding_window(grid_adata, window_size=10, overlap=5, copy=True)
        win_cols = [c for c in df.columns if c.startswith("sliding_window_assignment_")]
        assert len(win_cols) > 4
        assert all(df[c].dtype == bool for c in win_cols)
        # every obs belongs to at least one window
        assert df[win_cols].any(axis=1).all()

    def test_library_key(self, grid_adata):
        grid_adata.obs["lib"] = pd.Categorical(["a"] * 200 + ["b"] * 200)
        df = sq.tl.sliding_window(grid_adata, window_size=10, library_key="lib", copy=True)
        labels = df["sliding_window_assignment"].astype(str)
        assert labels.str.startswith(("a_", "b_")).all()

    def test_invalid_overlap(self, grid_adata):
        with pytest.raises(ValueError, match="non-negative"):
            sq.tl.sliding_window(grid_adata, window_size=10, overlap=-1)

    def test_window_size_inferred(self, grid_adata):
        sq.tl.sliding_window(grid_adata)
        assert "sliding_window_assignment" in grid_adata.obs


class TestVarByDistance:
    @pytest.fixture()
    def anchor_adata(self) -> sq.AnnData:
        rng = np.random.default_rng(0)
        n = 100
        adata = sq.AnnData(X=rng.normal(size=(n, 5)))
        adata.obsm["spatial"] = rng.uniform(0, 100, (n, 2))
        labels = ["anchor"] * 10 + ["other"] * (n - 10)
        adata.obs["ct"] = pd.Categorical(labels)
        return adata

    def test_basic(self, anchor_adata):
        sq.tl.var_by_distance(anchor_adata, groups="anchor", cluster_key="ct")
        df = anchor_adata.obsm["design_matrix"]
        assert "anchor" in df.columns and "anchor_raw" in df.columns
        # anchor cells have raw distance 0 and NaN normalized distance
        anchors = anchor_adata.obs["ct"] == "anchor"
        assert (df.loc[np.asarray(anchors), "anchor_raw"] == 0).all()
        assert df.loc[np.asarray(anchors), "anchor"].isna().all()
        valid = df["anchor"].dropna()
        assert valid.min() == 0.0 and valid.max() == 1.0

    def test_raw_distance_correct(self, anchor_adata):
        df = sq.tl.var_by_distance(anchor_adata, groups="anchor", cluster_key="ct", copy=True)
        coords = anchor_adata.obsm["spatial"]
        anchors = coords[:10]
        j = 50  # a non-anchor cell
        want = np.min(np.linalg.norm(anchors - coords[j], axis=1))
        np.testing.assert_allclose(df["anchor_raw"].iloc[j], want, rtol=1e-6)

    def test_custom_coordinate_anchor(self, anchor_adata):
        df = sq.tl.var_by_distance(anchor_adata, groups=np.array([50.0, 50.0]), copy=True)
        assert "custom_anchor" in df.columns

    def test_covariates(self, anchor_adata):
        anchor_adata.obs["cov"] = np.arange(100)
        df = sq.tl.var_by_distance(
            anchor_adata, groups="anchor", cluster_key="ct", covariates="cov", copy=True
        )
        assert "cov" in df.columns

    def test_library_key(self, anchor_adata):
        anchor_adata.obs["lib"] = pd.Categorical(["s1"] * 50 + ["s2"] * 50)
        anchor_adata.obs["ct"] = pd.Categorical(["anchor"] * 5 + ["other"] * 45 + ["anchor"] * 5 + ["other"] * 45)
        df = sq.tl.var_by_distance(
            anchor_adata, groups="anchor", cluster_key="ct", library_key="lib", copy=True
        )
        for lib in ("s1", "s2"):
            sub = df[np.asarray(anchor_adata.obs["lib"] == lib)]["anchor"].dropna()
            assert sub.max() == 1.0


class TestRead10x:
    def test_read_10x_h5(self):
        adata = sq.read.read_10x_h5("/root/reference/tests/_data/filtered_feature_bc_matrix.h5")
        assert adata.shape == (100, 100)
        assert "gene_ids" in adata.var.columns
        from scipy import sparse as sp

        assert sp.issparse(adata.X)
        assert adata.X.nnz == 656

    def test_visium_reader(self, tmp_path):
        # assemble a minimal SpaceRanger directory from committed fixtures
        import json
        import shutil

        import h5py
        from PIL import Image

        root = tmp_path / "visium"
        (root / "spatial").mkdir(parents=True)
        shutil.copy("/root/reference/tests/_data/filtered_feature_bc_matrix.h5", root)
        with h5py.File(root / "filtered_feature_bc_matrix.h5", "r") as f:
            barcodes = [b.decode() for b in f["matrix"]["barcodes"][...]]
        rng = np.random.default_rng(0)
        for res in ("hires", "lowres"):
            Image.fromarray(rng.integers(0, 255, (50, 50, 3), dtype=np.uint8).astype(np.uint8)).save(
                root / "spatial" / f"tissue_{res}_image.png"
            )
        (root / "spatial" / "scalefactors_json.json").write_text(
            json.dumps({"spot_diameter_fullres": 80.0, "tissue_hires_scalef": 0.1, "tissue_lowres_scalef": 0.05})
        )
        rows = [
            f"{bc},1,{i // 10},{i % 10},{(i % 10) * 100},{(i // 10) * 100}"
            for i, bc in enumerate(barcodes)
        ]
        (root / "spatial" / "tissue_positions_list.csv").write_text("\n".join(rows))

        adata = sq.read.visium(root)
        assert adata.shape == (100, 100)
        assert adata.obsm["spatial"].shape == (100, 2)
        lid = list(adata.uns["spatial"])[0]
        assert "hires" in adata.uns["spatial"][lid]["images"]
        assert adata.uns["spatial"][lid]["scalefactors"]["spot_diameter_fullres"] == 80.0
        assert "in_tissue" in adata.obs


class TestDatasets:
    def test_registry_parses(self):
        reg = sq.datasets.get_registry() if hasattr(sq.datasets, "get_registry") else None
        from squidpy_tpu.datasets._registry import get_registry

        reg = get_registry()
        assert "imc" in reg.datasets
        assert reg.get("imc").shape == (4668, 34)
        assert reg.get("visium_hne_image").type == "image"
        assert len(reg.names("visium_10x")) >= 5

    def test_loaders_exist(self):
        for name in ["imc", "seqfish", "mibitof", "visium_hne_adata", "four_i", "merfish", "slideseqv2"]:
            assert callable(getattr(sq.datasets, name))

    def test_unknown_dataset_raises(self):
        with pytest.raises(ValueError, match="Unknown dataset"):
            sq.datasets.download("not_a_dataset")

    def test_download_offline_message(self, tmp_path):
        with pytest.raises(ExceptionGroup, match="download|Failed"):
            sq.datasets.download("imc", path=tmp_path)


def test_downloader_mirror_failover(tmp_path):
    """All mirrors tried in order; total failure raises ExceptionGroup with
    one nested error per attempted URL."""
    from squidpy_tpu.datasets._registry import (
        DatasetDownloader,
        DatasetEntry,
        DatasetRegistry,
        FileEntry,
    )

    reg = DatasetRegistry(s3_base_url="http://127.0.0.1:1/none/")
    fe = FileEntry(name="x.h5ad", s3_key="x.h5ad", fallback_urls=("http://127.0.0.1:1/mirror/x.h5ad",))
    assert fe.get_urls(reg.s3_base_url) == [
        "http://127.0.0.1:1/none/x.h5ad",
        "http://127.0.0.1:1/mirror/x.h5ad",
    ]
    reg.datasets["fake"] = DatasetEntry(name="fake", type="anndata", files=[fe])
    with pytest.raises(ExceptionGroup) as exc:
        DatasetDownloader(reg).download("fake", path=tmp_path)
    assert len(exc.value.exceptions) == 2


def test_profile_context_produces_trace(tmp_path, dummy_adata):
    import glob

    import squidpy_tpu as sq

    with sq.utils.profile(str(tmp_path)):
        with sq.utils.annotate("phase"):
            sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=4)
    assert glob.glob(str(tmp_path) + "/**/*.xplane.pb", recursive=True)


class TestWindowCornersGroundTruth:
    """Literal expected corners from reference
    tests/tools/test_sliding_window.py:113-185."""

    @pytest.mark.parametrize(
        "overlap,drop,shape,first,last",
        [
            (20, False, (9, 4), [0, 100, 0, 100], [160, 200, 160, 200]),
            (0, False, (4, 4), [0, 100, 0, 100], [100, 200, 100, 200]),
            (20, True, (4, 4), [0, 100, 0, 100], [80, 180, 80, 180]),
        ],
    )
    def test_corners(self, overlap, drop, shape, first, last):
        from squidpy_tpu.tl._sliding_window import _calculate_window_corners

        w = _calculate_window_corners(
            min_x=0, max_x=200, min_y=0, max_y=200,
            window_size=100, overlap=overlap, drop_partial_windows=drop,
        )
        assert w.shape == shape
        assert w.iloc[0].values.tolist() == first
        assert w.iloc[-1].values.tolist() == last


class TestVizgenReader:
    def test_vizgen(self, tmp_path):
        """Synthetic MERSCOPE directory: counts csv (with Blank- probes),
        metadata with micron centroids, micron->pixel transform."""
        rng = np.random.default_rng(0)
        genes = ["GeneA", "GeneB", "Blank-1", "GeneC"]
        cells = [f"{i}" for i in range(6)]
        counts = pd.DataFrame(rng.integers(0, 9, (6, 4)), index=cells, columns=genes)
        counts.index.name = "cell"
        counts.to_csv(tmp_path / "cell_by_gene.csv")
        meta = pd.DataFrame(
            {"center_x": rng.random(6) * 100, "center_y": rng.random(6) * 100,
             "volume": rng.random(6)},
            index=cells,
        )
        meta.index.name = "EntityID"
        meta.to_csv(tmp_path / "cell_metadata.csv")
        (tmp_path / "images").mkdir()
        np.savetxt(tmp_path / "images" / "micron_to_mosaic_pixel_transform.csv",
                   np.eye(3), delimiter=" ")

        adata = sq.read.vizgen(
            tmp_path, counts_file="cell_by_gene.csv", meta_file="cell_metadata.csv",
            transformation_file="micron_to_mosaic_pixel_transform.csv",
        )
        assert adata.shape == (6, 3)  # Blank- probe moved to obsm
        assert "Blank-1" in adata.obsm["blank_genes"].columns
        assert adata.obsm["spatial"].shape == (6, 2)
        assert "volume" in adata.obs.columns
        lib = list(adata.uns["spatial"])[0]
        tm = adata.uns["spatial"][lib]["scalefactors"]["transformation_matrix"]
        assert tm.shape == (3, 3)
        from scipy import sparse as sp

        assert sp.issparse(adata.X)


class TestNanostringReader:
    def test_nanostring(self, tmp_path):
        """Synthetic CosMx directory: per-FOV counts/metadata, composite and
        label images, FOV positions."""
        from PIL import Image

        rng = np.random.default_rng(0)
        n = 8
        fovs = [1] * 4 + [2] * 4
        counts = pd.DataFrame(rng.integers(0, 5, (n, 3)), columns=["G1", "G2", "G3"])
        counts.insert(0, "fov", fovs)
        counts.insert(0, "cell_ID", list(range(1, 5)) * 2)
        counts.to_csv(tmp_path / "exprMat_file.csv", index=False)
        meta = pd.DataFrame({
            "cell_ID": list(range(1, 5)) * 2,
            "fov": fovs,
            "CenterX_local_px": rng.integers(0, 50, n),
            "CenterY_local_px": rng.integers(0, 50, n),
            "CenterX_global_px": rng.integers(0, 500, n),
            "CenterY_global_px": rng.integers(0, 500, n),
            "Area": rng.random(n),
        })
        meta.to_csv(tmp_path / "metadata_file.csv", index=False)
        for sub in ["CellComposite", "CellLabels"]:
            (tmp_path / sub).mkdir()
            for f in (1, 2):
                Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8).astype(np.uint8)).save(
                    tmp_path / sub / f"Img_F{f:03d}.jpg"
                )
        pd.DataFrame({"fov": [1, 2], "x_global_px": [0, 500], "y_global_px": [0, 0]}).to_csv(
            tmp_path / "fov_positions.csv", index=False
        )

        adata = sq.read.nanostring(
            tmp_path, counts_file="exprMat_file.csv", meta_file="metadata_file.csv",
            fov_file="fov_positions.csv",
        )
        assert adata.shape == (8, 3)
        assert set(adata.obs["fov"].cat.categories) == {"1", "2"}
        assert adata.obsm["spatial"].shape == (8, 2)
        assert adata.obsm["spatial_fov"].shape == (8, 2)
        for fov in ("1", "2"):
            assert "hires" in adata.uns["spatial"][fov]["images"]
            assert "segmentation" in adata.uns["spatial"][fov]["images"]
            assert "x_global_px" in adata.uns["spatial"][fov]["metadata"]
        # obs index is cellID_fov
        assert adata.obs_names[0].endswith("_1")


class TestDatasetRegistryProtocol:
    """Registry object-model behaviors (reference:
    /root/reference/tests/datasets/test_registry.py)."""

    @staticmethod
    def _registry():
        from squidpy_tpu.datasets import get_registry

        return get_registry()

    def test_contains_and_getitem(self):
        reg = self._registry()
        assert "imc" in reg
        assert "bogus" not in reg
        assert reg["imc"].name == "imc"
        with pytest.raises(KeyError, match="Unknown dataset"):
            reg["bogus"]

    def test_iter_and_len(self):
        reg = self._registry()
        entries = list(reg)
        assert len(entries) == len(reg) > 10
        assert all(hasattr(e, "files") for e in entries)

    def test_property_lists_partition_by_type(self):
        reg = self._registry()
        assert set(reg.anndata_names) == set(reg.names("anndata"))
        assert "imc" in reg.anndata_names
        assert len(reg.image_names) == 3
        assert len(reg.visium_names) == 5
        assert len(reg.spatialdata_names) == 2
        typed = (
            set(reg.anndata_names) | set(reg.image_names)
            | set(reg.visium_names) | set(reg.spatialdata_names)
        )
        assert typed == set(reg.all_names)

    def test_entry_fields(self):
        reg = self._registry()
        e = reg["imc"]
        assert e.type == "anndata"
        assert len(e.files) == 1
        f = e.files[0]
        assert f.name.endswith(".h5ad")
        assert f.sha256 is None or len(f.sha256) == 64

    def test_image_entries_have_library_id(self):
        reg = self._registry()
        for name in reg.image_names:
            assert reg[name].library_id is not None

    def test_get_urls_order(self):
        from squidpy_tpu.datasets._registry import FileEntry

        f = FileEntry(name="a.h5ad", s3_key="data/a.h5ad",
                      fallback_urls=("https://mirror1/a", "https://mirror2/a"))
        urls = f.get_urls("https://s3.base/")
        assert urls == ["https://s3.base/data/a.h5ad", "https://mirror1/a", "https://mirror2/a"]
        assert f.get_urls("") == ["https://mirror1/a", "https://mirror2/a"]

    def test_visium_entries_have_matrix_and_positions(self):
        reg = self._registry()
        for name in reg.visium_names:
            fnames = {f.name for f in reg[name].files}
            assert "filtered_feature_bc_matrix.h5" in fnames


class TestDatasetDownloaderBehavior:
    def test_default_cache_dir_env_override(self, tmp_path, monkeypatch):
        from squidpy_tpu.datasets._registry import _default_cache_dir

        monkeypatch.setenv("SQUIDPY_TPU_DATA", str(tmp_path / "cache"))
        assert _default_cache_dir() == tmp_path / "cache"

    def test_singletons(self):
        from squidpy_tpu.datasets import get_downloader, get_registry

        assert get_registry() is get_registry()
        assert get_downloader() is get_downloader()

    def test_cached_file_reused_without_network(self, tmp_path):
        import hashlib

        from squidpy_tpu.datasets._registry import (
            DatasetDownloader, DatasetEntry, DatasetRegistry, FileEntry,
        )

        payload = b"not a real h5ad"
        sha = hashlib.sha256(payload).hexdigest()
        reg = DatasetRegistry(s3_base_url="https://unreachable.invalid")
        reg.datasets["fake"] = DatasetEntry(
            name="fake", type="anndata",
            files=[FileEntry(name="fake.h5ad", s3_key="fake.h5ad", sha256=sha)],
        )
        d = DatasetDownloader(reg)
        target = tmp_path / "fake" / "fake.h5ad"
        target.parent.mkdir(parents=True)
        target.write_bytes(payload)
        # checksum matches -> served from cache, no network touched
        got = d._fetch_file(reg.datasets["fake"], reg.datasets["fake"].files[0], tmp_path)
        assert got == target

    def test_corrupted_cache_redownloads_and_fails_offline(self, tmp_path):
        from squidpy_tpu.datasets._registry import (
            DatasetDownloader, DatasetEntry, DatasetRegistry, FileEntry,
        )

        reg = DatasetRegistry(s3_base_url="")
        reg.datasets["fake"] = DatasetEntry(
            name="fake", type="anndata",
            files=[FileEntry(name="fake.h5ad", s3_key="", sha256="0" * 64)],
        )
        d = DatasetDownloader(reg)
        target = tmp_path / "fake" / "fake.h5ad"
        target.parent.mkdir(parents=True)
        target.write_bytes(b"corrupt")
        with pytest.raises(ExceptionGroup, match="Place the file manually"):
            d._fetch_file(reg.datasets["fake"], reg.datasets["fake"].files[0], tmp_path)
        assert not target.exists()  # corrupted cache was evicted
