"""Evaluation CLI — mirrors ``tools/evaluate.py:395-448``: load a fine-tuned
HookNet checkpoint (Orbax dir or torch ``.pth.tar``), run the per-slide
validation loop once, log micro + per-class F1/IoU/accuracy."""

import argparse
import os
import random
import sys

import _common  # noqa: F401
from _common import add_error_capture, check_norm_stats, warn_noop_flags


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

    from msfwsi_tpu.data import datasets as D
    from msfwsi_tpu.data import loader as L
    from msfwsi_tpu.data.pipeline import AugConfig
    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train import evaluate as EV
    from msfwsi_tpu.train import finetune as FT
    from msfwsi_tpu.utils import setup_logger

    logger = setup_logger(args.log_dir, name="MSF-WSI")
    logger.info(" ".join([sys.executable, *sys.argv]))
    # --frac/--lam/--weight-name are parsed-but-unused in the reference's
    # evaluator too (/root/reference/tools/evaluate.py:446-448 — never read
    # after parsing); accepted for recipe compatibility, warned when set.
    warn_noop_flags(
        args,
        {a.dest: a.default for a in PARSER._actions},
        extra={
            "frac": "the reference evaluator parses --frac but never uses it",
            "lam": "the reference evaluator parses --lam but never uses it",
            "weight_name": "the reference evaluator parses --weight-name but never uses it",
        },
    )

    class_names = {"bcss": FT.BCSS_CLASSES, "paip": FT.PAIP_CLASSES}[args.data_name]
    config = FT.FinetuneConfig(
        arch=args.arch, class_names=tuple(class_names), amp=args.amp,
        seg_size=args.seg_size,
        seed=args.seed if args.seed is not None else 0,
        packed_tail=args.packed_tail,
    )
    logger.info(f"=> creating model '{args.arch}'")
    state = FT.create_finetune_state(jax.random.key(config.seed), config)

    logger.info(f"=> loading pretrained weights {args.weights}")
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
    logger.info(f"=> loaded pretrained weights {args.weights}")

    aug_cfg = AugConfig(
        mean=tuple(args.mean), std=tuple(args.std), seg_size=args.seg_size
    )

    if args.synthetic:
        imgs, masks, slide_ids = L.synthetic_tile_library(
            n_slides=2, tiles_per_slide=args.synthetic, tile_size=4 * args.seg_size,
            num_classes=len(class_names),
        )

        def iter_slides():
            for s in np.unique(slide_ids):
                ids = np.nonzero(slide_ids == s)[0]
                yield imgs[ids], masks[ids]
    else:
        root = args.train_data
        if args.data_name == "bcss":
            groups = D.bcss_seg_val_slides(root, fold=args.fold)
        else:
            groups = D.paip_seg_val_slides(root, fold=args.fold)

        def iter_slides():
            for g in groups:
                yield L.load_slide_arrays(root, g)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = None
    chunk_sharding = None
    if jax.device_count() > 1 and args.val_chunk % jax.device_count() == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from msfwsi_tpu.parallel import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec())
        chunk_sharding = NamedSharding(mesh, P("data"))
        logger.info(f"=> sharding validation chunks over {jax.device_count()} devices")
    # No host round trips either way: "host" pre-builds uint8 views on CPU
    # (the reference's literal cv2 pipeline; ~10x fewer H2D bytes — the
    # right choice through the ~50 MB/s axon tunnel), "device" ships raw
    # tiles and builds views inside the chunk jit (direct-attached hosts).
    chunk_stats = EV.make_chunk_stats_for_views(
        state.model, len(class_names), args.val_views, cfg=aug_cfg, mesh=mesh
    )
    if args.val_views == "host":
        from msfwsi_tpu.data.pipeline import make_seg_val_views_host

        def slides():
            for imgs_s, masks_s in iter_slides():
                yield make_seg_val_views_host(imgs_s, masks_s, aug_cfg)

    else:
        slides = iter_slides

    def log_slide(i, micro):
        if i % args.print_freq == 0:
            logger.info(f"Val slide [{i}] f1={micro['f1']:.4f}")

    scores = EV.validate_slides(
        chunk_stats, variables, slides(), args.val_views, class_names,
        chunk=args.val_chunk, sharding=chunk_sharding, on_slide=log_slide,
    )

    s = scores.summary()
    logger.info("=> Best scores:")
    logger.info(
        "=======\n"
        f"MICRO F1: {s['f1_micro']:.4f}\n"
        f"MICRO IOU: {s['iou_micro']:.4f}\n"
        f"MICRO ACC: {s['acc_micro']:.4f}\n"
    )
    for c in class_names:
        logger.info(
            f"{c} F1: {s[f'f1_{c}']:.4f}, IOU: {s[f'iou_{c}']:.4f}, ACC: {s[f'acc_{c}']:.4f}"
        )
    return s


def build_parser():
    parser = argparse.ArgumentParser(description="MSF-WSI/TPU evaluation")
    parser.add_argument("-a", "--arch", default="resnet18")
    parser.add_argument("-b", "--batch-size", default=64, type=int)
    parser.add_argument("-j", "--workers", default=4, type=int)
    parser.add_argument("-p", "--print-freq", default=50, type=int)
    parser.add_argument("--world-size", default=-1, type=int)
    parser.add_argument("--rank", default=-1, type=int)
    parser.add_argument("--dist-url", default="", type=str)
    parser.add_argument("--dist-backend", default="nccl", type=str)
    parser.add_argument("--seed", default=3407, type=int)  # reference evaluate.py:419
    parser.add_argument("--gpu", default=None, type=int)
    parser.add_argument("--multiprocessing-distributed", action="store_true")

    parser.add_argument("--data-name", type=str, default="bcss")
    parser.add_argument("--train-data", type=str)
    parser.add_argument("--mean", nargs=3, type=float, default=[0.485, 0.456, 0.406])
    parser.add_argument("--std", nargs=3, type=float, default=[0.229, 0.224, 0.225])
    parser.add_argument("--fold", type=int, default=0)

    parser.add_argument("--log-dir", default="./logs/temp", type=str)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--wandb", action="store_true")

    parser.add_argument("--tf32", action="store_true")
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--weights", type=str)
    parser.add_argument("--weight-name", type=str,
                        help="parsed but unused, as in the reference (evaluate.py:447)")
    parser.add_argument("--frac", type=float, default=1,
                        help="parsed but unused, as in the reference (evaluate.py:446)")
    parser.add_argument("--lam", type=float, default=1,
                        help="parsed but unused, as in the reference (evaluate.py:448)")

    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--packed-tail", action=argparse.BooleanOptionalAction,
                        default=False,
                        help="run the narrow-channel decoder tail in the "
                             "space-to-depth domain (exact; TPU lane-padding "
                             "fix — see ops/s2d.py); checkpoint-compatible "
                             "either way")
    parser.add_argument("--val-chunk", type=int, default=128,
                        help="tiles per device pass during validation (reference: 128)")
    parser.add_argument("--val-views", choices=("host", "device"), default="host",
                        help="where eval views are built: 'host' = uint8 cv2 "
                             "resize/crop on CPU, normalize on device (the "
                             "reference's literal split; ~10x fewer H2D bytes), "
                             "'device' = ship raw tiles, build views in the "
                             "chunk jit (direct-attached hosts)")
    parser.add_argument("--seg-size", type=int, default=256,
                        help="context/target view size (reference: 256)")
    return parser


PARSER = build_parser()

if __name__ == "__main__":
    main(PARSER.parse_args())
