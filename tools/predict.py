"""Prediction CLI — export segmentation masks from a fine-tuned HookNet.

The reference has no prediction tool at all: its ``tools/evaluate.py``
argmaxes logits and immediately reduces them to confusion statistics
(``/root/reference/tools/evaluate.py:283-310``), so there is no way to
actually obtain a model's segmentation output. This tool runs the same
chunked per-slide inference datapath as ``tools/evaluate.py`` and writes
class-index mask PNGs (paletted, so they are human-viewable AND read back
as the raw class indices), per tile and optionally stitched into
slide-level maps using the prep grid geometry.

Inputs: a prepared dataset (``--train-data`` + ``--fold``, predicts on the
fold's validation slides), or any directory of tile PNGs (``--tiles-dir``,
no masks/CSV needed), or ``--synthetic`` for smoke runs.
"""

import argparse
import os
import os.path as osp
import random
import sys

import _common  # noqa: F401
from _common import add_error_capture, check_norm_stats
from _slides import iter_csv_slides, iter_dir_slides, iter_synthetic

# Background black + up to 15 distinct foreground colors; class-index PNGs
# are written in PIL "P" mode so np.asarray() reads back the raw indices.
_PALETTE = [
    (0, 0, 0), (230, 60, 60), (60, 140, 230), (250, 200, 40), (70, 200, 120),
    (200, 100, 240), (240, 130, 40), (100, 230, 230), (160, 160, 80),
    (240, 120, 180), (100, 100, 240), (170, 230, 60), (230, 170, 130),
    (60, 170, 170), (200, 60, 130), (130, 130, 130),
]


def _save_pred_png(path, pred):
    from PIL import Image

    im = Image.fromarray(pred, mode="P")
    flat = [c for rgb in _PALETTE for c in rgb]
    im.putpalette(flat + [0] * (768 - len(flat)))
    im.save(path)


def main(args):
    import numpy as np

    from msfwsi_tpu.utils import dump_config, increment_path

    args.log_dir = str(increment_path(args.log_dir, sep="_", mkdir=True))
    if args.seed is not None:
        random.seed(args.seed)
        np.random.seed(args.seed)
    dump_config(args.log_dir, args)
    add_error_capture(args.log_dir)(main_worker)(args)


def main_worker(args):
    import jax
    import numpy as np

    from msfwsi_tpu.data.pipeline import AugConfig, make_seg_val_views_host
    from msfwsi_tpu.ops.geometry import TileGrid
    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train import finetune as FT
    from msfwsi_tpu.train import predict as PR
    from msfwsi_tpu.utils import prefetch_iter, setup_logger

    logger = setup_logger(args.log_dir, name="MSF-WSI")
    logger.info(" ".join([sys.executable, *sys.argv]))

    class_names = {"bcss": FT.BCSS_CLASSES, "paip": FT.PAIP_CLASSES}[args.data_name]
    config = FT.FinetuneConfig(
        arch=args.arch, class_names=tuple(class_names), amp=args.amp,
        seg_size=args.seg_size,
        seed=args.seed if args.seed is not None else 0,
        packed_tail=False,  # eval-mode inference: packed is a measured negative
    )
    logger.info(f"=> creating model '{args.arch}'")
    state = FT.create_finetune_state(jax.random.key(config.seed), config)

    logger.info(f"=> loading fine-tuned weights {args.weights}")
    weights = C.resolve_checkpoint_arg(args.weights)
    if weights is None:
        logger.error(f"=> weights not found: {args.weights}")
        sys.exit(1)
    check_norm_stats(args, weights)
    if os.path.isdir(weights):
        state = C.restore_train_state(weights, state)
    else:
        variables = C.torch_hooknet_to_flax(C.load_torch_file(weights))
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )

    aug_cfg = AugConfig(mean=tuple(args.mean), std=tuple(args.std), seg_size=args.seg_size)
    heads = PR.HEADS if args.head == "both" else (args.head,)

    mesh = None
    chunk_sharding = None
    if jax.device_count() > 1 and args.val_chunk % jax.device_count() == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from msfwsi_tpu.parallel import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec())
        chunk_sharding = NamedSharding(mesh, P("data"))
        logger.info(f"=> sharding prediction chunks over {jax.device_count()} devices")

    preds_fn = PR.make_chunk_preds_for_views(
        state.model, args.val_views, cfg=aug_cfg, mesh=mesh, heads=heads
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.synthetic:
        slides = iter_synthetic(args.synthetic, 4 * args.seg_size, len(class_names))
    elif args.tiles_dir:
        slides = iter_dir_slides(args.tiles_dir, logger)
    else:
        if not args.train_data:
            logger.error("=> one of --train-data / --tiles-dir / --synthetic is required")
            sys.exit(1)
        slides = iter_csv_slides(args.train_data, args.data_name, args.fold, logger)

    out_dir = args.out or osp.join(args.log_dir, "predictions")
    os.makedirs(out_dir, exist_ok=True)
    if args.stitch and not args.raw_data:
        logger.error("=> --stitch needs --raw-data (the prep input dir) for slide geometry")
        sys.exit(1)

    def prepared():
        for name, stems, imgs in slides:
            if args.val_views == "host":
                zeros = np.zeros(imgs.shape[:3], np.uint8)
                ctx_u8, tgt_u8, _ = make_seg_val_views_host(imgs, zeros, aug_cfg)
                arrays = (ctx_u8, tgt_u8)
            else:
                arrays = (imgs,)
            yield name, stems, int(imgs.shape[1]), arrays

    n_tiles = 0
    for name, stems, tile_px, arrays in prefetch_iter(prepared()):
        preds = PR.predict_slide(
            preds_fn, variables, arrays, chunk=args.val_chunk, sharding=chunk_sharding
        )
        for head, head_preds in zip(heads, preds):
            head_dir = osp.join(out_dir, name, head)
            os.makedirs(head_dir, exist_ok=True)
            for stem, p in zip(stems, head_preds):
                _save_pred_png(osp.join(head_dir, stem + ".png"), p)
        n_tiles += len(stems)

        if args.stitch:
            from PIL import Image

            raw = osp.join(args.raw_data, "images", name + ".png")
            if not osp.exists(raw):
                logger.warning(f"=> --stitch: no raw slide at {raw}; skipping {name}")
            elif not all(s.isdigit() for s in stems):
                logger.warning(f"=> --stitch: non-numeric tile ids for {name}; skipping")
            else:
                with Image.open(raw) as im:
                    w, h = im.size  # header read only
                grid = TileGrid(h, w, tile_px)
                indices = [int(s) for s in stems]
                for head, head_preds in zip(heads, preds):
                    stitch = (
                        PR.stitch_context_preds
                        if head == "context"
                        else PR.stitch_target_preds
                    )
                    canvas = stitch(head_preds, indices, grid, seg_size=args.seg_size)
                    _save_pred_png(osp.join(out_dir, f"{name}_{head}_stitched.png"), canvas)
        logger.info(f"=> {name}: wrote {len(stems)} tile prediction(s) per head")

    logger.info(f"=> done: {n_tiles} tiles -> {out_dir}")
    return out_dir


def build_parser():
    parser = argparse.ArgumentParser(description="MSF-WSI/TPU mask prediction")
    parser.add_argument("-a", "--arch", default="resnet18")
    parser.add_argument("--weights", type=str, required=True,
                        help="fine-tuned HookNet checkpoint (Orbax dir or reference .pth.tar)")
    parser.add_argument("--data-name", type=str, default="bcss", choices=("bcss", "paip"),
                        help="class schema (bcss: 5+bg, paip: 3+bg)")
    parser.add_argument("--train-data", type=str,
                        help="prepared dataset root: predict on the fold's val slides")
    parser.add_argument("--fold", type=int, default=0)
    parser.add_argument("--tiles-dir", type=str,
                        help="predict on arbitrary tile PNGs: <dir>/images/*.png "
                             "or <dir>/<slide>/images/*.png (no masks needed)")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--mean", nargs=3, type=float, default=[0.485, 0.456, 0.406])
    parser.add_argument("--std", nargs=3, type=float, default=[0.229, 0.224, 0.225])
    parser.add_argument("--seed", default=3407, type=int)
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--log-dir", default="./logs/temp", type=str)
    parser.add_argument("--out", type=str,
                        help="output dir (default <log_dir>/predictions)")
    parser.add_argument("--head", choices=("target", "context", "both"), default="target",
                        help="target: full-res center crops (what the reference "
                             "scores); context: whole tile at 1/4 scale (gap-free "
                             "stitching)")
    parser.add_argument("--stitch", action="store_true",
                        help="also write slide-level maps assembled with the prep "
                             "grid geometry (needs --raw-data for slide sizes)")
    parser.add_argument("--raw-data", type=str,
                        help="prep input dir (images/<slide>.png) for --stitch geometry")
    parser.add_argument("--val-chunk", type=int, default=128,
                        help="tiles per device pass (reference: 128)")
    parser.add_argument("--val-views", choices=("host", "device"), default="host",
                        help="where eval views are built (see tools/evaluate.py)")
    parser.add_argument("--seg-size", type=int, default=256)
    return parser


PARSER = build_parser()

if __name__ == "__main__":
    main(PARSER.parse_args())
