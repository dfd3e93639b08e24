"""Shared slide-iteration helpers for the per-slide inference CLIs
(tools/predict.py, tools/extract_features.py): yield
``(slide_name, tile_stems, imgs (T, H, W, 3) uint8)`` per slide from a
prepared dataset fold, an arbitrary tile folder tree, or synthetic data."""

import os
import os.path as osp

import _common  # noqa: F401


def iter_csv_slides(train_data, data_name, fold, logger, split="val"):
    """Slides of a prepared dataset fold. ``split="val"`` (default) is the
    reference's validation contract (shift tiles excluded,
    ``src/utils/data/bcss.py:136``); ``split="train"`` the complement."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from msfwsi_tpu.data import datasets as D
    from msfwsi_tpu.data.loader import load_image

    groups = D.seg_slide_groups(train_data, data_name, fold=fold, split=split)
    label = "validation" if split == "val" else split
    logger.info(f"=> {len(groups)} {label} slides (fold {fold})")
    for g in groups:
        with ThreadPoolExecutor(8) as pool:
            imgs = list(pool.map(lambda s: load_image(osp.join(train_data, s.img)), g.samples))
        stems = [osp.splitext(osp.basename(s.img))[0] for s in g.samples]
        yield g.filename, stems, np.stack(imgs)


def iter_dir_slides(tiles_dir, logger):
    """Arbitrary tile folders: ``<dir>/images/*.png`` is one slide; else
    every subdirectory containing ``images/`` is a slide. Numeric stems
    sort numerically (prep-layout tile ids), others lexically."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from msfwsi_tpu.data.loader import load_image

    if osp.isdir(osp.join(tiles_dir, "images")):
        slides = [(osp.basename(osp.normpath(tiles_dir)), osp.join(tiles_dir, "images"))]
    else:
        slides = sorted(
            (d, osp.join(tiles_dir, d, "images"))
            for d in os.listdir(tiles_dir)
            if osp.isdir(osp.join(tiles_dir, d, "images"))
        )
    if not slides:
        raise FileNotFoundError(
            f"--tiles-dir {tiles_dir}: no images/ directory found (expected "
            "<dir>/images/*.png or <dir>/<slide>/images/*.png)"
        )
    logger.info(f"=> {len(slides)} tile folder(s) under {tiles_dir}")
    for name, img_dir in slides:
        files = [f for f in os.listdir(img_dir) if f.lower().endswith(".png")]
        if not files:
            logger.warning(f"=> {img_dir}: no .png tiles; skipping {name}")
            continue
        stems = [osp.splitext(f)[0] for f in files]
        order = sorted(
            range(len(stems)),
            key=(lambda i: int(stems[i])) if all(s.isdigit() for s in stems) else (lambda i: stems[i]),
        )
        files = [files[i] for i in order]
        stems = [stems[i] for i in order]
        with ThreadPoolExecutor(8) as pool:
            imgs = list(pool.map(lambda f: load_image(osp.join(img_dir, f)), files))
        yield name, stems, np.stack(imgs)


def iter_synthetic(n, tile_size, num_classes):
    import numpy as np

    from msfwsi_tpu.data.loader import synthetic_tile_library

    imgs, _, slide_ids = synthetic_tile_library(
        n_slides=2, tiles_per_slide=n, tile_size=tile_size, num_classes=num_classes
    )
    for s in np.unique(slide_ids):
        ids = np.nonzero(slide_ids == s)[0]
        yield f"synthetic_{s}", [str(i) for i in range(len(ids))], imgs[ids]
