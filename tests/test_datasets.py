"""Dataset registry + downloader — reference tests/datasets suite."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq


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
        assert len(reg.visium_names) == 35  # full 10x sample catalogue, matching the reference YAML
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

class TestRegistryProtocolExtras:
    @staticmethod
    def _registry():
        from squidpy_tpu.datasets import get_registry

        return get_registry()

    def test_contains_accepts_entries(self):
        reg = self._registry()
        entry = reg["imc"]
        assert entry in reg  # consistent with __iter__ yielding entries
        from squidpy_tpu.datasets._registry import DatasetEntry

        foreign = DatasetEntry(name="imc", type="anndata", files=[])
        assert foreign not in reg  # same name, different object

    def test_names_unknown_type_empty(self):
        assert self._registry().names("bogus_type") == []

    def test_get_returns_none_for_unknown(self):
        assert self._registry().get("not_a_dataset") is None

    def test_known_shapes_match_survey(self):
        """Dataset scales recorded in SURVEY/BASELINE are the registry's."""
        reg = self._registry()
        assert reg["imc"].shape == (4668, 34)
        assert reg["seqfish"].shape == (19416, 351)
        assert reg["four_i"].shape == (270876, 43)

    def test_loader_docstrings_mention_dataset(self):
        import squidpy_tpu as sq_

        for name in ("imc", "seqfish", "mibitof"):
            fn = getattr(sq_.datasets, name)
            assert fn.__doc__ and "Shape" in fn.__doc__


class TestDownloaderEdgeCases:
    def test_multi_file_entry_all_fetched_or_group_raises(self, tmp_path):
        from squidpy_tpu.datasets._registry import (
            DatasetDownloader, DatasetEntry, DatasetRegistry, FileEntry,
        )

        reg = DatasetRegistry(s3_base_url="http://127.0.0.1:1/x/")
        reg.datasets["multi"] = DatasetEntry(
            name="multi", type="visium_10x",
            files=[
                FileEntry(name="filtered_feature_bc_matrix.h5", s3_key="a.h5"),
                FileEntry(name="spatial.tar.gz", s3_key="b.tar.gz"),
            ],
        )
        with pytest.raises(ExceptionGroup):
            DatasetDownloader(reg).download("multi", path=tmp_path)

    def test_visium_10x_lazy_fetch_and_image_prefix(self, tmp_path, monkeypatch):
        """With include_hires_tiff=False only matrix+spatial are fetched; with
        True the image is resolved by the ``image.`` prefix (tif OR jpg) and a
        missing image warns instead of recording a bogus path
        (ADVICE r3: Visium_FFPE_Human_Normal_Prostate ships image.jpg,
        Visium_FFPE_Mouse_Brain ships no image)."""
        from squidpy_tpu.datasets import _registry as regmod
        from squidpy_tpu.datasets._registry import (
            DatasetDownloader, DatasetEntry, DatasetRegistry, FileEntry,
        )

        reg = DatasetRegistry(s3_base_url="http://127.0.0.1:1/x/")
        reg.datasets["jpg_sample"] = DatasetEntry(
            name="jpg_sample", type="visium_10x",
            files=[
                FileEntry(name="filtered_feature_bc_matrix.h5", s3_key="m.h5"),
                FileEntry(name="spatial.tar.gz", s3_key="s.tar.gz"),
                FileEntry(name="image.jpg", s3_key="i.jpg"),
            ],
        )
        reg.datasets["no_image"] = DatasetEntry(
            name="no_image", type="visium_10x",
            files=[
                FileEntry(name="filtered_feature_bc_matrix.h5", s3_key="m.h5"),
                FileEntry(name="spatial.tar.gz", s3_key="s.tar.gz"),
            ],
        )
        fetched: list[str] = []

        def fake_fetch(self, entry, file, base_dir):
            fetched.append(file.name)
            target = base_dir / entry.name / file.name
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_bytes(b"")
            return target

        read_calls: list[dict] = []

        def fake_read_visium(sample_dir, **kw):
            read_calls.append(kw)
            return "adata"

        monkeypatch.setattr(DatasetDownloader, "_fetch_file", fake_fetch)
        import squidpy_tpu.read as sqread

        monkeypatch.setattr(sqread, "visium", fake_read_visium)
        d = DatasetDownloader(reg)
        # pre-extracted spatial/ dirs: extraction of the placeholder tar is skipped
        for name in ("jpg_sample", "no_image"):
            (tmp_path / name / "spatial").mkdir(parents=True)

        assert d.download("jpg_sample", path=tmp_path) == "adata"
        assert fetched == ["filtered_feature_bc_matrix.h5", "spatial.tar.gz"]
        assert read_calls[-1]["source_image_path"] is None

        fetched.clear()
        assert d.download("jpg_sample", path=tmp_path, include_hires_tiff=True) == "adata"
        assert "image.jpg" in fetched
        assert str(read_calls[-1]["source_image_path"]).endswith("image.jpg")

        fetched.clear()
        assert d.download("no_image", path=tmp_path, include_hires_tiff=True) == "adata"
        assert fetched == ["filtered_feature_bc_matrix.h5", "spatial.tar.gz"]
        assert read_calls[-1]["source_image_path"] is None

    def test_visium_10x_entry_without_matrix_raises_valueerror(self, tmp_path):
        from squidpy_tpu.datasets._registry import (
            DatasetDownloader, DatasetEntry, DatasetRegistry, FileEntry,
        )

        reg = DatasetRegistry(s3_base_url="http://127.0.0.1:1/x/")
        reg.datasets["nomatrix"] = DatasetEntry(
            name="nomatrix", type="visium_10x",
            files=[FileEntry(name="b.png", s3_key="b.png")],
        )
        with pytest.raises(ValueError, match="filtered_feature_bc_matrix"):
            DatasetDownloader(reg).download("nomatrix", path=tmp_path)

    def test_sha_mismatch_evicts_and_raises(self, tmp_path):
        import hashlib

        from squidpy_tpu.datasets._registry import (
            DatasetDownloader, DatasetEntry, DatasetRegistry, FileEntry,
        )

        good = hashlib.sha256(b"right").hexdigest()
        reg = DatasetRegistry(s3_base_url="")
        reg.datasets["f"] = DatasetEntry(
            name="f", type="anndata",
            files=[FileEntry(name="f.h5ad", s3_key="", sha256=good)],
        )
        d = DatasetDownloader(reg)
        target = tmp_path / "f" / "f.h5ad"
        target.parent.mkdir(parents=True)
        target.write_bytes(b"wrong bytes")
        with pytest.raises(ExceptionGroup):
            d._fetch_file(reg.datasets["f"], reg.datasets["f"].files[0], tmp_path)
        assert not target.exists()

    def test_no_sha_cached_file_trusted(self, tmp_path):
        from squidpy_tpu.datasets._registry import (
            DatasetDownloader, DatasetEntry, DatasetRegistry, FileEntry,
        )

        reg = DatasetRegistry(s3_base_url="http://127.0.0.1:1/")
        reg.datasets["f"] = DatasetEntry(
            name="f", type="anndata", files=[FileEntry(name="f.h5ad", s3_key="f.h5ad")],
        )
        d = DatasetDownloader(reg)
        target = tmp_path / "f" / "f.h5ad"
        target.parent.mkdir(parents=True)
        target.write_bytes(b"anything")
        got = d._fetch_file(reg.datasets["f"], reg.datasets["f"].files[0], tmp_path)
        assert got == target


class TestTypedAliases:
    """Reference's dataset-name type aliases (datasets/__init__.py:31-59),
    derived here from the registry so they never drift from the YAML."""

    def test_aliases_exported_and_partition(self):
        from typing import get_args

        import squidpy_tpu as sq_

        ann = set(get_args(sq_.datasets.AnnDataDatasets))
        img = set(get_args(sq_.datasets.ImageDatasets))
        vis = set(get_args(sq_.datasets.VisiumDatasets))
        sd = set(get_args(sq_.datasets.SpatialDataDatasets))
        reg = sq_.datasets.get_registry()
        assert ann == set(reg.names("anndata"))
        assert img == set(reg.names("image"))
        assert vis == set(reg.names("visium_10x"))
        assert sd == set(reg.names("spatialdata"))
        assert not (ann & img) and not (ann & sd)

    def test_every_alias_name_has_a_loader_or_visium(self):
        from typing import get_args

        import squidpy_tpu as sq_

        for name in get_args(sq_.datasets.AnnDataDatasets):
            assert callable(getattr(sq_.datasets, name))
        # visium_10x samples load through the shared `visium(sample_id)` entry
        assert callable(sq_.datasets.visium)


class TestReferenceRegistryApi:
    """Reference grouping surface (datasets/_registry.py:65-189): typed
    dataset properties, iter_by_type, and FileEntry lookup helpers."""

    def test_typed_dataset_properties(self):
        import squidpy_tpu as sq_

        reg = sq_.datasets.get_registry()
        assert reg.anndata_datasets == reg.names("anndata")
        assert reg.image_datasets == reg.names("image")
        assert reg.spatialdata_datasets == reg.names("spatialdata")
        assert reg.visium_10x_datasets == reg.names("visium_10x")
        assert reg.visium_datasets == reg.visium_10x_datasets
        assert set(reg.all_names) == (
            set(reg.anndata_datasets) | set(reg.image_datasets)
            | set(reg.spatialdata_datasets) | set(reg.visium_10x_datasets)
        )

    def test_iter_by_type(self):
        import squidpy_tpu as sq_

        reg = sq_.datasets.get_registry()
        entries = list(reg.iter_by_type("anndata"))
        assert [e.name for e in entries] == reg.anndata_datasets
        assert all(e.type == "anndata" for e in entries)
        assert list(reg.iter_by_type("nope")) == []

    def test_file_lookup_helpers(self):
        import squidpy_tpu as sq_

        reg = sq_.datasets.get_registry()
        entry = next(e for e in reg if e.files)
        f = entry.files[0]
        assert entry.get_file(f.name) is f
        assert entry.get_file_by_suffix(f.name[-6:]) is not None
        assert entry.get_file_by_name_prefix(f.name[:3]) is not None
        assert entry.get_file("definitely-not-a-file") is None
        assert entry.get_file_by_suffix(".xyzq") is None
        assert entry.get_file_by_name_prefix("zzz~") is None


class TestVisiumSampleCatalogue:
    """The full 10x sample catalogue + visium() entry-point contract
    (reference: datasets/_datasets.py:101-137, datasets.yaml visium_10x)."""

    def test_catalogue_contains_all_10x_families(self):
        from squidpy_tpu.datasets import get_registry

        vd = set(get_registry().visium_datasets)
        assert len(vd) == 35
        # One representative per naming family.
        for name in (
            "V1_Adult_Mouse_Brain",
            "V1_Human_Heart",
            "Visium_FFPE_Mouse_Brain",
            "Visium_FFPE_Human_Prostate_IF",
            "Parent_Visium_Human_Cerebellum",
            "Targeted_Visium_Human_SpinalCord_Neuroscience",
        ):
            assert name in vd
        # Every sample ships the matrix + spatial archive; most also ship a
        # source image (two upstream entries genuinely lack/vary it).
        reg = get_registry()
        for name in vd:
            files = {f.name for f in reg.get(name).files}
            assert {"filtered_feature_bc_matrix.h5", "spatial.tar.gz"} <= files
            extra = files - {"filtered_feature_bc_matrix.h5", "spatial.tar.gz"}
            assert extra <= {"image.tif", "image.jpg"}

    def test_visium_rejects_unknown_sample(self):
        import pytest

        import squidpy_tpu as sq

        with pytest.raises(ValueError, match="Unknown Visium sample"):
            sq.datasets.visium("NotASample")

    def test_visium_signature_matches_reference(self):
        import inspect

        import squidpy_tpu as sq

        params = inspect.signature(sq.datasets.visium).parameters
        assert "base_dir" in params and params["base_dir"].kind is inspect.Parameter.KEYWORD_ONLY
        assert "include_hires_tiff" in params

    def test_downloader_exposes_registry(self):
        import squidpy_tpu as sq

        dl = sq.datasets.get_downloader()
        assert "Visium_FFPE_Mouse_Kidney" in dl.registry


class TestSpatialDataFallbackReader:
    """spatialdata-typed downloads fall back to the in-repo SpatialData reader
    when the external `spatialdata` package is absent (registry.download)."""

    def test_zip_roundtrips_through_builtin_reader(self, tmp_path):
        import hashlib
        import zipfile

        import numpy as np

        from squidpy_tpu._core.spatialdata import SpatialData
        from squidpy_tpu.datasets._registry import (
            DatasetDownloader, DatasetEntry, DatasetRegistry, FileEntry,
        )

        # Write a store with our own writer, zip it like the hosted datasets.
        sdata = SpatialData()
        sdata.images["img"] = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        store = tmp_path / "build" / "toy_sdata"
        store.parent.mkdir(parents=True)
        sdata.write(store)
        zpath = tmp_path / "toy_sdata.zip"
        with zipfile.ZipFile(zpath, "w") as zf:
            for f in sorted(store.rglob("*")):
                if f.is_file():
                    zf.write(f, f.relative_to(store.parent))

        payload = zpath.read_bytes()
        reg = DatasetRegistry(s3_base_url="https://unreachable.invalid")
        reg.datasets["toy_sdata"] = DatasetEntry(
            name="toy_sdata", type="spatialdata",
            files=[FileEntry(name="toy_sdata.zip", s3_key="toy_sdata.zip",
                             sha256=hashlib.sha256(payload).hexdigest())],
        )
        cache = tmp_path / "cache"
        (cache / "toy_sdata").mkdir(parents=True)
        (cache / "toy_sdata" / "toy_sdata.zip").write_bytes(payload)

        out = DatasetDownloader(reg).download("toy_sdata", cache)
        np.testing.assert_array_equal(np.asarray(out.images["img"]),
                                      np.asarray(sdata.images["img"]))
