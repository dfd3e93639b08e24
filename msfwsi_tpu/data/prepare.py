"""WSI tile preparation: region images -> fixed-size patch library + CSV.

Parity with ``tools/bcss_prepare.py``: cut each slide image/mask pair into a
``tile_size`` grid (zero-padded at the edges), remap raw BCSS labels to the
5-class scheme, drop all-background tiles, zero out unmasked pixels, save
img+mask PNGs, and emit ``data.csv`` with the exact column contract the
datasets consume (``bcss_prepare.py:236-252``):

  filename_img, filename_mask, filename, num_masked_pixels,
  ratio_masked_area, ratio_masked_{1..5}_area

``shift != 0`` additionally emits ``_shiftW/_shiftH/_shiftHW`` origin-shifted
variants of every slide — the reference's shift branches reference an
undefined ``train_list`` and would NameError as published
(``bcss_prepare.py:155,182,209``); here they operate on the same slide list,
which is the evident intent (the val loader relies on excluding "shift"
rows, ``bcss.py:136``).
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import Sequence

import numpy as np
import pandas as pd
from PIL import Image

from ..ops.geometry import TileGrid, remap_bcss_labels

__all__ = ["CSV_COLUMNS", "tile_slide", "prepare_bcss", "tile_stats"]

CSV_COLUMNS = [
    "filename_img",
    "filename_mask",
    "filename",
    "num_masked_pixels",
    "ratio_masked_area",
    "ratio_masked_1_area",
    "ratio_masked_2_area",
    "ratio_masked_3_area",
    "ratio_masked_4_area",
    "ratio_masked_5_area",
]

# Disable PIL's decompression-bomb guard: BCSS region PNGs are huge by design.
Image.MAX_IMAGE_PIXELS = None


def tile_stats(mask_patch: np.ndarray, num_fg: int = 5):
    """(num_masked_pixels, ratio_masked_area, per-class ratios) — the CSV
    stats of ``bcss_prepare.py:72-95``."""
    area = mask_patch.shape[0] * mask_patch.shape[1]
    clip = np.clip(mask_patch, 0, 1)
    num_masked = int(clip.sum())
    ratios = [float((mask_patch == c).sum() / area) for c in range(1, num_fg + 1)]
    return num_masked, float(num_masked / area), ratios


def _process_tile(args):
    (out_dir, slide_name, idx, img_patch, mask_patch) = args
    num_masked, ratio, class_ratios = tile_stats(mask_patch)
    if num_masked == 0:
        return None  # drop all-background tiles (bcss_prepare.py:77)

    img_patch = img_patch.copy()
    img_patch[~np.clip(mask_patch, 0, 1).astype(bool)] = 0  # zero unmasked px

    img_rel = f"{slide_name}/images/{idx}.png"
    mask_rel = f"{slide_name}/masks/{idx}.png"
    Image.fromarray(img_patch).save(os.path.join(out_dir, img_rel))
    Image.fromarray(mask_patch).save(os.path.join(out_dir, mask_rel))
    return [img_rel, mask_rel, slide_name, num_masked, ratio, *class_ratios]


def tile_slide(
    img_path: str,
    mask_path: str,
    out_dir: str,
    slide_name: str,
    tile_size: int,
    shift_h: int = 0,
    shift_w: int = 0,
    remap_labels: bool = True,
    workers: int | None = None,
) -> list[list]:
    """Tile one slide; returns CSV rows. ``slide_name`` may carry a shift
    suffix (e.g. ``TCGA-XX_shiftW_512``)."""
    img = np.array(Image.open(img_path))
    mask = np.array(Image.open(mask_path))
    if remap_labels:
        mask = remap_bcss_labels(mask)
    return tile_slide_arrays(
        img, mask, out_dir, slide_name, tile_size,
        shift_h=shift_h, shift_w=shift_w, workers=workers,
    )


def tile_slide_arrays(
    img: np.ndarray,
    mask: np.ndarray,
    out_dir: str,
    slide_name: str,
    tile_size: int,
    shift_h: int = 0,
    shift_w: int = 0,
    workers: int | None = None,
) -> list[list]:
    """Tile one pre-decoded (and pre-remapped) slide — lets callers decode
    the multi-gigapixel PNG pair ONCE and run all four shift variants over
    the same arrays (the decode dominates prep time)."""
    os.makedirs(os.path.join(out_dir, slide_name, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, slide_name, "masks"), exist_ok=True)

    grid = TileGrid(img.shape[0], img.shape[1], tile_size, shift_h, shift_w)
    jobs = [
        (out_dir, slide_name, i, grid.extract(img, i), grid.extract(mask, i))
        for i in range(len(grid))
    ]
    if workers == 0:
        results = [_process_tile(j) for j in jobs]
    else:
        with ProcessPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(_process_tile, jobs, chunksize=16))
    return [r for r in results if r is not None]


def prepare_bcss(
    data_path: str,
    out_path: str,
    tile_size: int = 1024,
    shift: int = 0,
    slides: Sequence[str] | None = None,
    workers: int | None = None,
) -> pd.DataFrame:
    """Full prep: every slide under ``data_path/images`` (+ shift variants
    when ``shift != 0``), writing ``out_path/data.csv``. The README recipe is
    ``-s 1024 --overlap 512`` (``README.md:20``)."""
    img_dir = os.path.join(data_path, "images")
    mask_dir = os.path.join(data_path, "masks")
    os.makedirs(out_path, exist_ok=True)

    names = sorted(slides) if slides is not None else sorted(
        f.split(".png")[0] for f in os.listdir(img_dir) if f.endswith(".png")
    )

    rows: list[list] = []
    variants: list[tuple[str, int, int]] = [("", 0, 0)]
    if shift != 0:
        variants += [
            (f"_shiftW_{shift}", 0, shift),
            (f"_shiftH_{shift}", shift, 0),
            (f"_shiftHW_{shift}", shift, shift),
        ]
    for name in names:
        # Decode + remap the region PNG pair once per slide; the shift
        # variants re-tile the same arrays (4x fewer decodes at shift != 0 —
        # the decode is the dominant prep cost).
        img = np.array(Image.open(os.path.join(img_dir, name + ".png")))
        mask = remap_bcss_labels(
            np.array(Image.open(os.path.join(mask_dir, name + ".png")))
        )
        for suffix, sh, sw in variants:
            rows.extend(
                tile_slide_arrays(
                    img,
                    mask,
                    out_path,
                    name + suffix,
                    tile_size,
                    shift_h=sh,
                    shift_w=sw,
                    workers=workers,
                )
            )

    df = pd.DataFrame(rows, columns=CSV_COLUMNS)
    df.to_csv(os.path.join(out_path, "data.csv"), index=False)
    return df
