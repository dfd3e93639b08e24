"""Dataset normalization statistics CLI — compute the ``--mean/--std`` a
training run should be given.

The reference computes its per-dataset stats with
``cal_mean_and_std`` (``/root/reference/src/utils/utils.py:26-62``) but
ships no entry point — the recipe values (`scripts/bcss.sh` etc.) were
produced by hand-editing that helper's example. Mismatched normalization
is the silent ~40-F1-point footgun the norm guard warns about
(BASELINE.md), so this tool closes the loop: point it at a prepared
dataset (or any tile folder) and it prints the exact flags to pass.

Stats run over the fold's TRAIN tiles by default (what training will see;
``--fold -1`` = all tiles). Identical math to the reference helper:
channel mean/std of the [0, 1]-scaled pixels in one streaming pass.
"""

import argparse
import os
import os.path as osp
import sys

import _common  # noqa: F401


def _iter_prepared(data_name, train_data, fold, threshold, frac):
    from msfwsi_tpu.data import datasets as D

    if fold == -1:
        import pandas as pd

        df = pd.read_csv(osp.join(train_data, "data.csv"))
        files = df["filename_img"].tolist()
    elif data_name == "bcss":
        files = D.bcss_pretrain_files(train_data, fold=fold, threshold=threshold, frac=frac)
    else:
        files = D.paip_pretrain_files(train_data, fold=fold, threshold=threshold, frac=frac)
    return [osp.join(train_data, f) for f in files]


def _iter_dir(tiles_dir):
    out = []
    for root, _, names in os.walk(tiles_dir):
        if osp.basename(root) == "masks":
            continue
        out += [osp.join(root, n) for n in names if n.lower().endswith((".png", ".jpg", ".jpeg"))]
    return sorted(out)


def main(args):
    from concurrent.futures import ThreadPoolExecutor

    from msfwsi_tpu.data.loader import load_image
    from msfwsi_tpu.utils import cal_mean_and_std

    if args.train_data:
        files = _iter_prepared(args.data_name, args.train_data, args.fold,
                               args.threshold, args.frac)
    elif args.tiles_dir:
        files = _iter_dir(args.tiles_dir)
    else:
        print("=> one of --train-data / --tiles-dir is required", file=sys.stderr)
        sys.exit(2)
    if not files:
        print("=> no images found", file=sys.stderr)
        sys.exit(1)
    print(f"=> {len(files)} images")

    def batches():
        with ThreadPoolExecutor(args.threads) as pool:
            yield from pool.map(load_image, files)

    mean, std = cal_mean_and_std(batches())
    fmt = lambda v: " ".join(f"{x:.4f}" for x in v)  # noqa: E731
    print(f"Dataset MEAN is: {[round(v, 6) for v in mean]}")
    print(f"Dataset STD is: {[round(v, 6) for v in std]}")
    print(f"--mean {fmt(mean)} --std {fmt(std)}")


def build_parser():
    parser = argparse.ArgumentParser(description="MSF-WSI/TPU dataset mean/std")
    parser.add_argument("--data-name", type=str, default="bcss", choices=("bcss", "paip"))
    parser.add_argument("--train-data", type=str,
                        help="prepared dataset root (data.csv): stats over the "
                             "fold's train tiles")
    parser.add_argument("--fold", type=int, default=0, help="-1 = all tiles")
    parser.add_argument("--threshold", type=float, default=0.1,
                        help="min ratio_masked_area (pretrain default)")
    parser.add_argument("--frac", type=float, default=1.0)
    parser.add_argument("--tiles-dir", type=str,
                        help="any folder tree of tiles (masks/ subdirs skipped)")
    parser.add_argument("--threads", type=int, default=8)
    return parser


PARSER = build_parser()

if __name__ == "__main__":
    main(PARSER.parse_args())
