"""Data layer tests: prepare (tiling + CSV), manifests (fold filters), loader."""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from msfwsi_tpu.data import datasets as D
from msfwsi_tpu.data import loader as L
from msfwsi_tpu.data import prepare as PR


@pytest.fixture(scope="module")
def bcss_raw(tmp_path_factory):
    """Synthetic raw BCSS layout: images/ + masks/ with 21-code labels."""
    root = tmp_path_factory.mktemp("bcss_raw")
    os.makedirs(root / "images")
    os.makedirs(root / "masks")
    rng = np.random.default_rng(0)
    names = ["TCGA-OL-1", "TCGA-E2-2", "TCGA-XX-3"]
    for i, name in enumerate(names):
        h, w = 300 + 37 * i, 280 + 11 * i
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        mask = rng.integers(0, 22, size=(h, w)).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{name}.png")
        Image.fromarray(mask).save(root / "masks" / f"{name}.png")
    return str(root), names


@pytest.fixture(scope="module")
def prepared(bcss_raw, tmp_path_factory):
    root, names = bcss_raw
    out = str(tmp_path_factory.mktemp("bcss_prep"))
    df = PR.prepare_bcss(root, out, tile_size=128, shift=64, workers=0)
    return out, df, names


class TestPrepare:
    def test_csv_schema(self, prepared):
        out, df, _ = prepared
        assert list(df.columns) == PR.CSV_COLUMNS
        on_disk = pd.read_csv(os.path.join(out, "data.csv"))
        assert len(on_disk) == len(df)

    def test_shift_variants_present(self, prepared):
        _, df, _ = prepared
        fnames = df["filename"].unique().tolist()
        assert any("_shiftW_64" in f for f in fnames)
        assert any("_shiftH_64" in f for f in fnames)
        assert any("_shiftHW_64" in f for f in fnames)

    def test_tiles_written_and_labels_remapped(self, prepared):
        out, df, _ = prepared
        row = df.iloc[0]
        img = np.array(Image.open(os.path.join(out, row["filename_img"])))
        mask = np.array(Image.open(os.path.join(out, row["filename_mask"])))
        assert img.shape == (128, 128, 3)
        assert mask.max() <= 5  # 21 codes collapsed to 5 classes
        # Unmasked pixels zeroed in the image.
        assert (img[mask == 0] == 0).all()

    def test_no_empty_tiles(self, prepared):
        _, df, _ = prepared
        assert (df["num_masked_pixels"] > 0).all()

    def test_stats_consistent(self, prepared):
        out, df, _ = prepared
        row = df.iloc[3]
        mask = np.array(Image.open(os.path.join(out, row["filename_mask"])))
        num, ratio, ratios = PR.tile_stats(mask)
        assert num == row["num_masked_pixels"]
        assert ratio == pytest.approx(row["ratio_masked_area"])
        assert ratios[0] == pytest.approx(row["ratio_masked_1_area"])


class TestManifests:
    def test_bcss_fold_split(self, prepared):
        out, df, _ = prepared
        # Fold 0 val codes include "OL" and "E2"; "XX" is train-only.
        train = D.bcss_pretrain_files(out, fold=0, threshold=0.0)
        assert all("TCGA-OL" not in f and "TCGA-E2" not in f for f in train)
        assert any("TCGA-XX" in f for f in train)

        val = D.bcss_seg_val_slides(out, fold=0, threshold=0.0)
        val_names = {g.filename for g in val}
        assert all(("-OL-" in n) or ("-E2-" in n) for n in val_names)
        # shift variants excluded from val (bcss.py:136)
        assert not any("shift" in n for n in val_names)

    def test_threshold_filter(self, prepared):
        out, df, _ = prepared
        thr = float(df["ratio_masked_area"].median())
        files = D.bcss_pretrain_files(out, fold=0, threshold=thr)
        kept = df[df["filename_img"].isin(files)]
        assert (kept["ratio_masked_area"] >= thr).all()

    def test_frac_subsample_deterministic(self, prepared):
        out, _, _ = prepared
        a = D.bcss_pretrain_files(out, fold=0, threshold=0.0, frac=0.5)
        b = D.bcss_pretrain_files(out, fold=0, threshold=0.0, frac=0.5)
        assert a == b  # random_state=1 parity (bcss.py:74)
        full = D.bcss_pretrain_files(out, fold=0, threshold=0.0, frac=1.0)
        assert len(a) == round(0.5 * len(full))

    def test_paip_fold_minus_one(self, tmp_path):
        df = pd.DataFrame(
            {
                "filename_img": [f"f{i}/img.png" for i in range(4)],
                "filename_mask": [f"f{i}/mask.png" for i in range(4)],
                "filename": ["01_01_0100", "01_01_0101", "01_01_0999", "01_01_0998"],
                "num_masked_pixels": [10] * 4,
                "ratio_masked_area": [0.9] * 4,
            }
        )
        df.to_csv(tmp_path / "train_data.csv", index=False)
        all_files = D.paip_pretrain_files(str(tmp_path), fold=-1, threshold=0.1)
        assert len(all_files) == 4
        fold0 = D.paip_pretrain_files(str(tmp_path), fold=0, threshold=0.1)
        assert len(fold0) == 2  # 0100/0101 are fold-0 val slides

    def test_seg_slide_groups_splits(self, prepared):
        """val split == the val-slides contract exactly; train is the
        complement (shift variants included — they are training tiles,
        bcss.py:67-71) and the two are disjoint."""
        out, df, _ = prepared
        val = D.seg_slide_groups(out, "bcss", fold=0, split="val", threshold=0.0)
        ref = D.bcss_seg_val_slides(out, fold=0, threshold=0.0)
        assert [(g.filename, g.samples) for g in val] == [
            (g.filename, g.samples) for g in ref
        ]
        train = D.seg_slide_groups(out, "bcss", fold=0, split="train", threshold=0.0)
        train_names = {g.filename for g in train}
        assert any("shift" in n for n in train_names)
        assert {g.filename for g in val}.isdisjoint(train_names)
        assert all("TCGA-XX" in n for n in train_names)
        with pytest.raises(ValueError, match="split"):
            D.seg_slide_groups(out, "bcss", split="test")

    def test_camelyon_manifest_resample(self, tmp_path):
        import json

        os.makedirs(tmp_path / "imagesTr" / "slide_a")
        os.makedirs(tmp_path / "imagesTr" / "slide_b")
        for s in ("slide_a", "slide_b"):
            for i in range(6):
                Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
                    tmp_path / "imagesTr" / s / f"{i}.png"
                )
        meta = {"train_ids": ["slide_a", "slide_b"], "val_ids": [], "test_ids": [], "file_ending": ".png"}
        (tmp_path / "dataset.json").write_text(json.dumps(meta))

        m = D.Camelyon16Manifest(str(tmp_path), n_sample=3, seed=42)
        e0 = m.resample(0)
        assert len(e0) == 6  # 3 per slide
        assert e0 == m.resample(0)  # deterministic per epoch (multi-host safe)
        assert e0 != m.resample(1)  # varies across epochs
        per_slide = {}
        for f in e0:
            per_slide.setdefault(f.split("/")[1], []).append(f)
        assert all(len(v) == 3 for v in per_slide.values())

    def test_synthetic_c16_layout_feeds_manifest(self, tmp_path):
        """make_synthetic_slides --layout c16 emits exactly the corpus
        Camelyon16Manifest consumes (camelyon.py:56-83 contract): train
        ids resolve under imagesTr, mode='all' additionally picks up
        imagesTs, every listed tile decodes."""
        import argparse
        import importlib.util
        import json
        import sys

        tools = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
        if tools not in sys.path:
            sys.path.insert(0, tools)
        spec = importlib.util.spec_from_file_location(
            "mss", os.path.join(tools, "make_synthetic_slides.py")
        )
        mss = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mss)

        out = tmp_path / "c16"
        mss.main_c16(argparse.Namespace(
            out=str(out), slides=2, seed=0, tiles_per_slide=3, tile_size=32
        ))
        meta = json.loads((out / "dataset.json").read_text())
        assert set(meta) == {"train_ids", "val_ids", "test_ids", "file_ending"}
        assert len(meta["train_ids"]) == 2
        assert meta["val_ids"] and meta["test_ids"]

        m = D.Camelyon16Manifest(str(out), n_sample=2, seed=0)
        files = m.resample(0)
        assert len(files) == 4  # 2 per train slide; val/test ids excluded
        for f in files:
            img = np.asarray(Image.open(out / f))
            assert img.shape == (32, 32, 3)

        m_all = D.Camelyon16Manifest(str(out), n_sample=3, mode="all", seed=0)
        # imagesTr train+val slides plus the imagesTs test slide
        assert len(m_all.resample(0)) == 3 * 4


class TestLoader:
    def test_batches_and_shapes(self, prepared):
        out, df, _ = prepared
        files = df["filename_img"].tolist()[:10]
        loader = L.TileBatchLoader(out, files, batch_size=4, seed=0)
        batches = list(loader.epoch(0))
        assert len(batches) == 2  # drop_last: 10 // 4
        assert batches[0].shape == (4, 128, 128, 3)
        assert str(batches[0].dtype) == "uint8"

    def test_len_counts_per_process_batches(self, monkeypatch):
        """__len__ must match what epoch() yields under multi-host:
        _shard_files gives each process ceil(n/P) files (regression: the
        global-length derivation overreported by P, mis-deriving
        start_epoch on a step-arithmetic resume)."""
        import jax

        files = [f"f{i}.png" for i in range(100)]
        loader = L.TileBatchLoader("<mem>", files, batch_size=10, load_fn=lambda r: None)
        assert len(loader) == 10
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        assert len(loader) == 5  # 50 per-process files -> 5 batches

    def test_pad_last_requires_keep_last(self):
        with pytest.raises(ValueError, match="drop_last"):
            L.TileBatchLoader(
                "<mem>", ["a", "b"], batch_size=2, load_fn=lambda r: None,
                pad_last=True,  # default drop_last=True: nothing to pad
            )

    def test_pad_last_wraps_to_full_batches(self, prepared):
        """pad_last: the trailing partial batch is wrap-padded to the full
        static shape; last_batch_valid() reports the real sample count."""
        out, df, _ = prepared
        files = df["filename_img"].tolist()[:10]
        loader = L.TileBatchLoader(
            out, files, batch_size=4, seed=0, drop_last=False, pad_last=True
        )
        batches = list(loader.epoch(0))
        assert len(batches) == 3 == len(loader)  # ceil(10/4)
        assert all(b.shape[0] == 4 for b in batches)
        assert loader.last_batch_valid() == 2
        # padded suffix of the last batch duplicates the epoch's first files
        np.testing.assert_array_equal(
            np.asarray(batches[2][2:]), np.asarray(batches[0][:2])
        )

    def test_pad_last_valid_masks(self, prepared):
        """valid_mask(i): all-True except the final batch, whose mask marks
        exactly the real prefix (single-host: pad == global suffix). The
        multi-host per-segment alignment is covered live in
        test_multihost.py."""
        out, df, _ = prepared
        files = df["filename_img"].tolist()[:10]
        loader = L.TileBatchLoader(
            out, files, batch_size=4, seed=0, drop_last=False, pad_last=True
        )
        np.testing.assert_array_equal(
            np.asarray(loader.valid_mask(0)), [True] * 4
        )
        np.testing.assert_array_equal(
            np.asarray(loader.valid_mask(len(loader) - 1)),
            [True, True, False, False],
        )
        np.testing.assert_array_equal(
            np.asarray(loader.last_batch_valid_mask()),
            [True, True, False, False],
        )

    def test_valid_mask_requires_pad_last(self, prepared):
        out, df, _ = prepared
        loader = L.TileBatchLoader(
            out, df["filename_img"].tolist()[:10], batch_size=4, seed=0,
            drop_last=False,
        )
        with pytest.raises(ValueError, match="pad_last"):
            loader.last_batch_valid_mask()

    def test_pad_last_tiny_dataset_wraps_repeatedly(self, prepared):
        out, df, _ = prepared
        files = df["filename_img"].tolist()[:3]
        loader = L.TileBatchLoader(
            out, files, batch_size=8, seed=0, drop_last=False, pad_last=True
        )
        (batch,) = list(loader.epoch(0))
        assert batch.shape[0] == 8
        assert loader.last_batch_valid() == 3

    def test_epoch_reshuffles(self, prepared):
        out, df, _ = prepared
        files = df["filename_img"].tolist()[:8]
        loader = L.TileBatchLoader(out, files, batch_size=8, seed=0)
        b0 = np.asarray(next(iter(loader.epoch(0))))
        b1 = np.asarray(next(iter(loader.epoch(1))))
        assert not np.array_equal(b0, b1)

    def test_pair_loading(self, prepared):
        out, df, _ = prepared
        recs = list(zip(df["filename_img"], df["filename_mask"]))[:4]

        def load_pair(rec):
            return (
                L.load_image(os.path.join(out, rec[0])),
                L.load_image(os.path.join(out, rec[1])),
            )

        loader = L.TileBatchLoader(out, recs, batch_size=2, load_fn=load_pair, seed=0)
        imgs, masks = next(iter(loader.epoch(0)))
        assert imgs.shape == (2, 128, 128, 3)
        assert masks.shape == (2, 128, 128)

    def test_slide_arrays(self, prepared):
        out, _, _ = prepared
        groups = D.bcss_seg_val_slides(out, fold=0, threshold=0.0)
        imgs, masks = L.load_slide_arrays(out, groups[0])
        assert imgs.ndim == 4 and masks.ndim == 3
        assert imgs.shape[0] == len(groups[0].samples)

    def test_native_fast_path_matches_pil(self, prepared):
        """The C++ tileio batch decoder must be byte-identical to PIL and
        engage automatically for path records."""
        from msfwsi_tpu import native

        if not native.available():
            pytest.skip("native tileio unavailable")
        out, df, _ = prepared
        files = df["filename_img"].tolist()[:6]
        fast = L.TileBatchLoader(out, files, batch_size=3, shuffle=False, seed=0)
        slow = L.TileBatchLoader(out, files, batch_size=3, shuffle=False, seed=0, use_native=False)
        assert fast._use_native
        for a, b in zip(fast.epoch(0), slow.epoch(0)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_native_pair_records(self, prepared):
        from msfwsi_tpu import native

        if not native.available():
            pytest.skip("native tileio unavailable")
        out, df, _ = prepared
        recs = list(zip(df["filename_img"], df["filename_mask"]))[:4]
        loader = L.TileBatchLoader(out, recs, batch_size=2, shuffle=False, seed=0)
        assert loader._use_native
        imgs, masks = next(iter(loader.epoch(0)))
        assert imgs.shape == (2, 128, 128, 3)
        assert masks.shape == (2, 128, 128)
        ref_img = L.load_image(os.path.join(out, recs[0][0]))
        np.testing.assert_array_equal(np.asarray(imgs[0]), ref_img)

    def test_packed_cache_roundtrip(self, prepared, tmp_path):
        from msfwsi_tpu.data import packed as PK

        out, df, _ = prepared
        files = df["filename_img"].tolist()[:6]
        pack = PK.get_or_build_pack(out, files, str(tmp_path / "cache"))
        assert len(pack) == 6
        # byte-identical to direct decode, by path and by index
        ref = L.load_image(os.path.join(out, files[2]))
        np.testing.assert_array_equal(pack.load(files[2]), ref)
        np.testing.assert_array_equal(pack.load(2), ref)
        # second call reuses the cache (same key)
        pack2 = PK.get_or_build_pack(out, files, str(tmp_path / "cache"))
        assert pack2.key == pack.key

    def test_packed_loader_end_to_end(self, prepared, tmp_path):
        from msfwsi_tpu.data import packed as PK

        out, df, _ = prepared
        files = df["filename_img"].tolist()[:6]
        pack = PK.get_or_build_pack(out, files, str(tmp_path / "cache2"))
        loader = L.TileBatchLoader(out, files, batch_size=3, load_fn=pack.load, shuffle=False)
        batches = list(loader.epoch(0))
        assert batches[0].shape == (3, 128, 128, 3)
        np.testing.assert_array_equal(
            np.asarray(batches[0][0]), L.load_image(os.path.join(out, files[0]))
        )

    def test_decode_error_propagates(self, prepared):
        """A failing load_fn must raise in the consumer, not deadlock the
        prefetch pipeline (the decode runs in a background thread)."""
        out, df, _ = prepared
        files = df["filename_img"].tolist()[:4]

        def bad_load(rec):
            raise OSError(f"corrupt: {rec}")

        loader = L.TileBatchLoader(
            out, files, batch_size=2, load_fn=bad_load, use_native=False, seed=0
        )
        with pytest.raises(OSError, match="corrupt"):
            list(loader.epoch(0))

    def test_abandoned_epoch_reaps_threads(self, prepared):
        """Breaking out of an epoch early (the --steps-per-epoch pattern)
        must close the background decode/transfer threads, not leak them."""
        import threading

        out, df, _ = prepared
        files = df["filename_img"].tolist()[:10]
        loader = L.TileBatchLoader(out, files, batch_size=2, seed=0, prefetch=1)
        before = threading.active_count()
        for i, _batch in enumerate(loader.epoch(0)):
            if i == 0:
                break  # abandon with batches still queued
        # generator finalization joins both stages
        assert threading.active_count() <= before

    def test_synthetic_library(self):
        imgs, masks, slides = L.synthetic_tile_library(
            n_slides=2, tiles_per_slide=3, tile_size=64
        )
        assert imgs.shape == (6, 64, 64, 3) and masks.shape == (6, 64, 64)
        assert imgs.dtype == np.uint8
        assert masks.max() <= 5


class TestPrefetchIter:
    """utils.prefetch_iter — the slide-level overlap used by the val loops."""

    def test_order_and_completion(self):
        from msfwsi_tpu.utils import prefetch_iter

        assert list(prefetch_iter(iter(range(257)), depth=3)) == list(range(257))

    def test_producer_exception_reraises(self):
        from msfwsi_tpu.utils import prefetch_iter

        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch_iter(gen())
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_abandon_stops_producer(self):
        import threading
        import time

        from msfwsi_tpu.utils import prefetch_iter

        before = threading.active_count()
        it = prefetch_iter(iter(range(10**9)), depth=2)
        assert next(it) == 0
        it.close()
        # producer polls with 0.1 s timeout; give it a moment to exit
        for _ in range(50):
            if threading.active_count() <= before:
                break
            time.sleep(0.05)
        assert threading.active_count() <= before
