"""BCSS patch extraction CLI — mirrors ``tools/bcss_prepare.py:255-290``
(``-p/-o/-l/-s/--overlap``); README recipe: ``-s 1024 --overlap 512``."""

import argparse

import _common  # noqa: F401


def main(args):
    from msfwsi_tpu.data.prepare import prepare_bcss

    df = prepare_bcss(
        args.data_path, args.out_path, tile_size=args.tile_size, shift=args.overlap
    )
    print(df.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Patch extraction for BCSS")
    parser.add_argument("-p", "--data-path", type=str, default="", help="Path to the dataset")
    parser.add_argument(
        "-o", "--out-path", type=str, default="", help="Path to the save processed dataset"
    )
    parser.add_argument(
        "-l", "--level", type=int, default=0, choices=range(0, 7),
        help="Region level for WSI, chose from [0, 6]",
    )
    parser.add_argument("-s", "--tile-size", type=int, default=256, help="Size of tiles")
    parser.add_argument("--overlap", type=int, default=0, help="Overlaps of tiles")
    main(parser.parse_args())
