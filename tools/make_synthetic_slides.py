"""Generate a synthetic, *learnable* raw dataset (BCSS or Camelyon16 layout).

``--layout bcss`` (default) produces region PNGs in the layout
``tools/bcss_prepare.py`` consumes (``<out>/images/TCGA-XX-....png`` +
``<out>/masks/...``, raw 21-code masks, ``bcss_prepare.py:119-144``):
H&E-looking background with blobby annotated regions whose raw label codes
correlate with a class-specific tint, so the full published recipe
(prepare -> SSL pretrain -> finetune -> evaluate) has signal to learn and
validation micro-F1 can rise. Used for the recipe-path convergence run
logged in BASELINE.md; swap in real BCSS region PNGs for published numbers.

``--layout c16`` produces a prepared Camelyon16 pretrain corpus in the
manifest layout of the reference's ``Camelyon16PretrainDataset``
(``/root/reference/src/utils/data/camelyon.py:56-83``): per-slide tile dirs
``imagesTr/<id>/<id>_<n>.png`` (+ ``imagesTs/`` for ``--c16-mode all``) and
a ``dataset.json`` with ``train_ids`` / ``val_ids`` / ``test_ids`` /
``file_ending`` — what ``scripts/c16.sh`` points ``--data`` at. Tiles are
1024px textured H&E-like crops (no masks: the C16 corpus is pretrain-only).

    python tools/make_synthetic_slides.py -o /tmp/bcss_raw --slides 6 --size 3072
    python tools/make_synthetic_slides.py -o /tmp/c16 --layout c16 \\
        --slides 4 --tiles-per-slide 8
"""

import argparse
import os

import numpy as np

import _common  # noqa: F401

# one raw code per collapsed class (ops/geometry.BCSS_CLASS_REMAP)
CLASS_TO_RAW = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
CLASS_TINT = {
    1: (170, 60, 120),  # tumor: purple-ish
    2: (235, 170, 200),  # stroma: pink
    3: (90, 60, 160),  # inflammatory: blue-purple
    4: (240, 230, 180),  # necrosis: pale yellow
    5: (120, 200, 140),  # other: green tint
}
# BCSS slide IDs carry the institution code in field 2 (filename.split("-")[1],
# src/utils/data/bcss.py:67); fold-0's VAL_SET institutions include "OL".
INSTITUTIONS = ["OL", "A1", "A2", "A7", "A8", "AR"]


def make_slide(rng, size):
    from scipy.ndimage import gaussian_filter

    base = np.array([225, 195, 215], np.float32)  # H&E background
    img = base[None, None] + rng.normal(scale=6.0, size=(size, size, 3))
    mask = np.zeros((size, size), np.uint8)

    n_blobs = rng.integers(16, 28)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(n_blobs):
        cls = int(rng.integers(1, 6))
        cy, cx = rng.integers(0, size, 2)
        ry, rx = rng.integers(size // 16, size // 5, 2)
        ang = rng.uniform(0, np.pi)
        ca, sa = np.cos(ang), np.sin(ang)
        u = (yy - cy) * ca + (xx - cx) * sa
        v = -(yy - cy) * sa + (xx - cx) * ca
        blob = (u / ry) ** 2 + (v / rx) ** 2 < 1.0
        mask[blob] = CLASS_TO_RAW[cls]
        tint = np.asarray(CLASS_TINT[cls], np.float32)
        img[blob] = 0.35 * img[blob] + 0.65 * tint

    # texture so SSL has structure beyond flat color
    tex = gaussian_filter(rng.normal(scale=1.0, size=(size, size)), sigma=3)
    img += 25.0 * tex[..., None]
    return np.clip(img, 0, 255).astype(np.uint8), mask


def main(args):
    from PIL import Image

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "masks"), exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.slides):
        inst = INSTITUTIONS[i % len(INSTITUTIONS)]
        name = f"TCGA-{inst}-S{i:02d}-DX1_xmin0_ymin0_MPP-0.2500"
        img, mask = make_slide(rng, args.size)
        Image.fromarray(img).save(os.path.join(args.out, "images", name + ".png"))
        Image.fromarray(mask).save(os.path.join(args.out, "masks", name + ".png"))
        print(f"wrote {name} ({args.size}px, classes: {sorted(set(np.unique(mask)) - {0})})")


def main_c16(args):
    """Prepared C16 pretrain corpus: imagesTr/<id>/ tile dirs + dataset.json
    (manifest keys per ``camelyon.py:56-61``). One val and one test slide
    are always emitted so --c16-mode all has an imagesTs to pick up."""
    import json

    from PIL import Image

    rng = np.random.default_rng(args.seed)
    tile = args.tile_size
    train_ids, val_ids, test_ids = [], [], []
    # C16 slide naming: tumor_###/normal_### in train, test_### in test.
    specs = [("imagesTr", f"{'tumor' if i % 2 else 'normal'}_{i:03d}", train_ids)
             for i in range(args.slides)]
    specs.append(("imagesTr", f"normal_{args.slides:03d}", val_ids))
    specs.append(("imagesTs", f"test_{0:03d}", test_ids))
    for sub, slide_id, bucket in specs:
        d = os.path.join(args.out, sub, slide_id)
        os.makedirs(d, exist_ok=True)
        bucket.append(slide_id)
        # Tiles crop from one per-slide textured canvas so tiles of a slide
        # share appearance statistics (like real WSI tiles do).
        canvas, _ = make_slide(rng, tile * 2)
        for t in range(args.tiles_per_slide):
            y, x = rng.integers(0, tile, 2)
            Image.fromarray(canvas[y : y + tile, x : x + tile]).save(
                os.path.join(d, f"{slide_id}_{t}.png")
            )
        print(f"wrote {sub}/{slide_id}: {args.tiles_per_slide} x {tile}px tiles")
    meta = {
        "train_ids": train_ids,
        "val_ids": val_ids,
        "test_ids": test_ids,
        "file_ending": ".png",
    }
    with open(os.path.join(args.out, "dataset.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote dataset.json ({len(train_ids)} train / {len(val_ids)} val / "
          f"{len(test_ids)} test ids)")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--layout", choices=("bcss", "c16"), default="bcss")
    p.add_argument("--slides", type=int, default=6)
    p.add_argument("--size", type=int, default=3072)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiles-per-slide", type=int, default=8,
                   help="(c16) tiles per slide dir")
    p.add_argument("--tile-size", type=int, default=1024,
                   help="(c16) tile edge in px (reference corpus: 1024)")
    args = p.parse_args()
    main_c16(args) if args.layout == "c16" else main(args)
