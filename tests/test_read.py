"""Readers (10x h5/mtx, Visium, Vizgen, Nanostring) — reference tests/read suite."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq


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



class TestVisiumVariants:
    """SpaceRanger layout variants (format spec: v1 headerless
    tissue_positions_list.csv vs v2/v3 headered tissue_positions.csv)."""

    @staticmethod
    def _space_ranger_dir(tmp_path, *, headered: bool, list_name: bool = False):
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
            Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8).astype(np.uint8)).save(
                root / "spatial" / f"tissue_{res}_image.png"
            )
        (root / "spatial" / "scalefactors_json.json").write_text(
            json.dumps({"spot_diameter_fullres": 60.0, "tissue_hires_scalef": 0.2, "tissue_lowres_scalef": 0.1})
        )
        rows = [
            f"{bc},1,{i // 10},{i % 10},{i * 2},{i * 3}" for i, bc in enumerate(barcodes)
        ]
        fname = "tissue_positions_list.csv" if list_name else "tissue_positions.csv"
        header = "barcode,in_tissue,array_row,array_col,pxl_row_in_fullres,pxl_col_in_fullres\n"
        (root / "spatial" / fname).write_text((header if headered else "") + "\n".join(rows))
        return root, barcodes

    def test_v2_headered_positions(self, tmp_path):
        root, barcodes = self._space_ranger_dir(tmp_path, headered=True)
        adata = sq.read.visium(root)
        assert adata.shape[0] == len(barcodes)
        # obsm spatial is (x, y) = (pxl_col, pxl_row): row i -> (3i, 2i)
        i = list(adata.obs_names).index(barcodes[7])
        np.testing.assert_array_equal(adata.obsm["spatial"][i], [21, 14])
        assert {"in_tissue", "array_row", "array_col"} <= set(adata.obs.columns)

    def test_v1_headerless_positions(self, tmp_path):
        root, barcodes = self._space_ranger_dir(tmp_path, headered=False, list_name=True)
        adata = sq.read.visium(root)
        i = list(adata.obs_names).index(barcodes[3])
        np.testing.assert_array_equal(adata.obsm["spatial"][i], [9, 6])

    def test_header_sniffed_not_filename(self, tmp_path):
        # a headered table under the v1 filename still parses (some public
        # datasets rename one vintage's file to the other's)
        root, barcodes = self._space_ranger_dir(tmp_path, headered=True, list_name=True)
        adata = sq.read.visium(root)
        assert adata.shape[0] == len(barcodes)
        assert np.isfinite(adata.obsm["spatial"]).all()

    def test_load_images_false_skips_spatial_dir(self, tmp_path):
        import shutil

        root = tmp_path / "visium"
        root.mkdir()
        shutil.copy("/root/reference/tests/_data/filtered_feature_bc_matrix.h5", root)
        # no spatial/ directory at all: must not be touched
        adata = sq.read.visium(root, load_images=False)
        assert adata.shape[0] == 100
        lid = list(adata.uns["spatial"])[0]
        assert "images" not in adata.uns["spatial"][lid]

    def test_source_image_path_recorded(self, tmp_path):
        root, _ = self._space_ranger_dir(tmp_path, headered=True)
        src = root / "spatial" / "tissue_hires_image.png"
        adata = sq.read.visium(root, source_image_path=src)
        lid = list(adata.uns["spatial"])[0]
        assert adata.uns["spatial"][lid]["metadata"]["source_image_path"] == str(src.absolute())

    def test_missing_positions_raises(self, tmp_path):
        import shutil

        root = tmp_path / "visium"
        (root / "spatial").mkdir(parents=True)
        shutil.copy("/root/reference/tests/_data/filtered_feature_bc_matrix.h5", root)
        from PIL import Image

        for res in ("hires", "lowres"):
            Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(root / "spatial" / f"tissue_{res}_image.png")
        (root / "spatial" / "scalefactors_json.json").write_text("{}")
        with pytest.raises(FileNotFoundError, match="tissue positions"):
            sq.read.visium(root)


class TestRead10xMtx:
    def test_mtx_gz_roundtrip(self, tmp_path):
        import gzip

        from scipy import io as sio
        from scipy import sparse as sp

        rng = np.random.default_rng(0)
        X = sp.random(30, 8, density=0.3, format="coo", random_state=0)
        with gzip.open(tmp_path / "matrix.mtx.gz", "wb") as fh:
            sio.mmwrite(fh, X)  # genes x cells on disk
        with gzip.open(tmp_path / "barcodes.tsv.gz", "wt") as fh:
            fh.write("".join(f"BC{i}\n" for i in range(8)))
        with gzip.open(tmp_path / "features.tsv.gz", "wt") as fh:
            fh.write("".join(f"ENSG{i}\tGene{i}\tGene Expression\n" for i in range(30)))

        adata = sq.read.read_10x_mtx(tmp_path)
        assert adata.shape == (8, 30)
        assert list(adata.var["gene_ids"])[:2] == ["ENSG0", "ENSG1"]
        np.testing.assert_allclose(np.asarray(adata.X.todense()), X.toarray().T)

    def test_mtx_plain_and_genes_tsv(self, tmp_path):
        from scipy import io as sio
        from scipy import sparse as sp

        X = sp.random(10, 4, density=0.5, format="coo", random_state=1)
        sio.mmwrite(str(tmp_path / "matrix.mtx"), X)
        (tmp_path / "barcodes.tsv").write_text("".join(f"B{i}\n" for i in range(4)))
        (tmp_path / "genes.tsv").write_text("".join(f"E{i}\tG{i}\n" for i in range(10)))
        adata = sq.read.read_10x_mtx(tmp_path)
        assert adata.shape == (4, 10)

    def test_missing_matrix_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            sq.read.read_10x_mtx(tmp_path)


class TestVizgenVariants:
    @staticmethod
    def _merscope_dir(tmp_path, n=5, with_blanks=True):
        rng = np.random.default_rng(0)
        genes = ["GA", "GB"] + (["Blank-9"] if with_blanks else []) + ["GC"]
        cells = [str(i) for i in range(n)]
        counts = pd.DataFrame(rng.integers(0, 9, (n, len(genes))), index=cells, columns=genes)
        counts.index.name = "cell"
        counts.to_csv(tmp_path / "cell_by_gene.csv")
        meta = pd.DataFrame(
            {"center_x": np.arange(n, dtype=float), "center_y": np.arange(n, dtype=float) * 10,
             "volume": rng.random(n)},
            index=cells,
        )
        meta.index.name = "EntityID"
        meta.to_csv(tmp_path / "cell_metadata.csv")
        return tmp_path

    def test_without_transformation(self, tmp_path):
        root = self._merscope_dir(tmp_path)
        adata = sq.read.vizgen(root, counts_file="cell_by_gene.csv", meta_file="cell_metadata.csv")
        lib = list(adata.uns["spatial"])[0]
        assert "scalefactors" not in adata.uns["spatial"][lib]
        # centroids are micron columns, aligned by cell id
        np.testing.assert_array_equal(adata.obsm["spatial"][:, 1], np.arange(5) * 10)

    def test_no_blank_probes(self, tmp_path):
        root = self._merscope_dir(tmp_path, with_blanks=False)
        adata = sq.read.vizgen(root, counts_file="cell_by_gene.csv", meta_file="cell_metadata.csv")
        assert adata.obsm["blank_genes"].shape[1] == 0
        assert adata.shape[1] == 3

    def test_metadata_columns_in_obs(self, tmp_path):
        root = self._merscope_dir(tmp_path)
        adata = sq.read.vizgen(root, counts_file="cell_by_gene.csv", meta_file="cell_metadata.csv")
        assert "volume" in adata.obs.columns
        assert "center_x" not in adata.obs.columns  # lifted to obsm


class TestNanostringVariants:
    @staticmethod
    def _cosmx_dir(tmp_path, fovs=(1, 1, 2, 2), with_images=True):
        rng = np.random.default_rng(0)
        n = len(fovs)
        counts = pd.DataFrame(rng.integers(0, 5, (n, 2)), columns=["G1", "G2"])
        counts.insert(0, "fov", fovs)
        counts.insert(0, "cell_ID", list(range(1, n + 1)))
        counts.to_csv(tmp_path / "exprMat_file.csv", index=False)
        meta = pd.DataFrame({
            "cell_ID": list(range(1, n + 1)),
            "fov": fovs,
            "CenterX_local_px": rng.integers(0, 50, n),
            "CenterY_local_px": rng.integers(0, 50, n),
            "CenterX_global_px": rng.integers(0, 500, n),
            "CenterY_global_px": rng.integers(0, 500, n),
        })
        meta.to_csv(tmp_path / "metadata_file.csv", index=False)
        if with_images:
            from PIL import Image

            for sub in ("CellComposite", "CellLabels"):
                (tmp_path / sub).mkdir()
                for f in set(fovs):
                    Image.fromarray(rng.integers(0, 255, (10, 10, 3), dtype=np.uint8).astype(np.uint8)).save(
                        tmp_path / sub / f"Img_F{f:03d}.jpg"
                    )
        return tmp_path

    def test_no_fov_file_no_metadata(self, tmp_path):
        root = self._cosmx_dir(tmp_path)
        adata = sq.read.nanostring(root, counts_file="exprMat_file.csv", meta_file="metadata_file.csv")
        for fov in adata.obs["fov"].cat.categories:
            assert "metadata" not in adata.uns["spatial"][fov]

    def test_unknown_fov_image_skipped(self, tmp_path):
        from PIL import Image

        root = self._cosmx_dir(tmp_path)
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(root / "CellComposite" / "Img_F099.jpg")
        adata = sq.read.nanostring(root, counts_file="exprMat_file.csv", meta_file="metadata_file.csv")
        assert "99" not in adata.uns["spatial"]

    def test_counts_meta_intersection(self, tmp_path):
        root = self._cosmx_dir(tmp_path)
        # add a counts row with no metadata: must be dropped
        extra = pd.read_csv(root / "exprMat_file.csv")
        extra.loc[len(extra)] = [99, 7, 1, 1]
        extra.to_csv(root / "exprMat_file.csv", index=False)
        adata = sq.read.nanostring(root, counts_file="exprMat_file.csv", meta_file="metadata_file.csv")
        assert adata.n_obs == 4
        assert "99_7" not in adata.obs_names

    def test_cell_id_column_int64(self, tmp_path):
        root = self._cosmx_dir(tmp_path, with_images=False)
        adata = sq.read.nanostring(root, counts_file="exprMat_file.csv", meta_file="metadata_file.csv")
        assert adata.obs["cell_ID"].dtype == np.int64
        assert adata.obs_names[0] == "1_1"
