"""Tile-embedding extraction CLI — export per-tile features from a
pretrained MSFWSI SSL checkpoint.

The reference offers no way to *use* its pretrained encoders except
continuing to train (``tools/ssl_finetune.py`` surgery); exporting tile
embeddings is the standard downstream consumption of an SSL WSI model
(MIL aggregation, retrieval, clustering, linear probes). This tool runs
the deterministic two-branch forward (``train/features.py``) over slides
on the chunked datapath and writes one ``<slide>.npz`` per slide:

* ``stems`` — tile ids (prep-layout basenames), row order of all arrays;
* ``context_s{1..4}`` — (T, C_i) whole-tile context-encoder features;
* ``target_s{1..4}`` — (T, K, C_i) per-sub-tile target-encoder features
  (K = scale^2, spatial row-major);

plus a ``features.json`` manifest (arch, scale, branch/stage channel map).

Inputs: a prepared dataset (``--train-data`` + ``--fold``: the fold's
validation slides), any directory of tile PNGs (``--tiles-dir``), or
``--synthetic`` for smoke runs. Weights: an Orbax SSL checkpoint dir or a
reference-format ``.pth.tar`` (converted on the fly).
"""

import argparse
import json
import os
import os.path as osp
import random
import sys

import _common  # noqa: F401
from _common import add_error_capture, check_norm_stats
from _slides import iter_csv_slides, iter_dir_slides, iter_synthetic


def main(args):
    import numpy as np

    from msfwsi_tpu.utils import dump_config, increment_path

    args.log_dir = str(increment_path(args.log_dir, sep="_", mkdir=True))
    if args.seed is not None:
        random.seed(args.seed)
        np.random.seed(args.seed)
    dump_config(args.log_dir, args)
    add_error_capture(args.log_dir)(main_worker)(args)


def _prune_to_encoders(variables, branches, weights, logger):
    keep = {f"{b}_encoder" for b in branches}
    pruned = {
        col: {k: v for k, v in tree.items() if k in keep}
        for col, tree in variables.items()
    }
    missing = keep - set(pruned["params"])
    if missing:
        logger.error(f"=> checkpoint {weights} has no {sorted(missing)} params — "
                     "is this an SSL checkpoint? (finetuned HookNet checkpoints "
                     "are not supported here)")
        sys.exit(1)
    return pruned


def _random_init_variables(model, branches, seed, img_size, logger):
    """Untrained-encoder control for linear probes: the exact epoch-0
    params/batch_stats a training run with the same ``--seed`` would start
    from (``train/ssl.create_ssl_state`` inits with ``jax.random.key(seed)``
    — tested equal in ``tests/test_features.py``), pruned to the encoders."""
    import jax

    from msfwsi_tpu.train import ssl as S

    cfg = S.SSLConfig(arch=model.arch, scale=model.scale, img_size=img_size,
                      shuffle_views=model.views_shuffled)
    batch = S.make_example_batch(cfg, local_batch=1)
    x1, x2, revs = S.batch_views(batch, model.views_shuffled)
    variables = model.init(jax.random.key(seed), x1, x2, revs, train=False)
    return _prune_to_encoders(dict(variables), branches, "random", logger)


def _load_ssl_variables(weights, branches, logger):
    """SSL checkpoint (either format) -> {"params", "batch_stats"} pruned to
    the requested branch encoders (the heads are ~1.6B params at resnet50 —
    never uploaded here)."""
    from msfwsi_tpu.train import checkpoint as C

    if os.path.isdir(weights):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(os.path.abspath(weights))
        variables = {"params": payload["params"], "batch_stats": payload["batch_stats"]}
    else:
        variables = C.torch_msfwsi_to_flax(C.load_torch_file(weights))
    return _prune_to_encoders(variables, branches, weights, logger)


def main_worker(args):
    import jax
    import numpy as np

    from msfwsi_tpu.data.pipeline import AugConfig
    from msfwsi_tpu.models.backbone import MSFWSI
    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train import features as F
    from msfwsi_tpu.train.predict import predict_slide
    from msfwsi_tpu.utils import prefetch_iter, setup_logger

    logger = setup_logger(args.log_dir, name="MSF-WSI")
    logger.info(" ".join([sys.executable, *sys.argv]))

    branches = F.BRANCHES if args.branch == "both" else (args.branch,)
    scales = tuple(int(s) for s in args.scales.split(","))

    logger.info(f"=> creating model '{args.arch}' (scale {args.scale})")
    import jax.numpy as jnp

    model = MSFWSI(
        arch=args.arch, scale=args.scale,
        dtype=jnp.bfloat16 if args.amp else jnp.float32,
    )

    if args.weights == "random":
        logger.info(f"=> random-init encoders (untrained probe control, seed {args.seed})")
        variables = _random_init_variables(model, branches, args.seed, args.img_sz, logger)
    else:
        logger.info(f"=> loading SSL weights {args.weights}")
        weights = C.resolve_checkpoint_arg(args.weights)
        if weights is None:
            logger.error(f"=> weights not found: {args.weights}")
            sys.exit(1)
        check_norm_stats(args, weights)
        variables = _load_ssl_variables(weights, branches, logger)

    mesh = None
    chunk_sharding = None
    if jax.device_count() > 1 and args.chunk % jax.device_count() == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from msfwsi_tpu.parallel import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec())
        chunk_sharding = NamedSharding(mesh, P("data"))
        logger.info(f"=> sharding extraction chunks over {jax.device_count()} devices")

    aug_cfg = AugConfig(mean=tuple(args.mean), std=tuple(args.std), img_size=args.img_sz)
    feats_fn = F.make_chunk_features(
        model, cfg=aug_cfg, branches=branches, scales=scales, mesh=mesh,
        out_dtype=jnp.float32 if args.out_dtype == "float32" else jnp.float16,
    )
    spec = F.feature_spec(model, branches=branches, scales=scales)

    if args.synthetic:
        slides = iter_synthetic(args.synthetic, args.tile_px, 6)
    elif args.tiles_dir:
        slides = iter_dir_slides(args.tiles_dir, logger)
    else:
        if not args.train_data:
            logger.error("=> one of --train-data / --tiles-dir / --synthetic is required")
            sys.exit(1)
        slides = iter_csv_slides(args.train_data, args.data_name, args.fold, logger,
                                 split=args.split)

    out_dir = args.out or osp.join(args.log_dir, "features")
    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, "features.json"), "w") as f:
        json.dump(
            {
                "arch": args.arch, "scale": args.scale, "img_size": args.img_sz,
                "weights": str(args.weights), "out_dtype": args.out_dtype,
                "keys": [
                    {"key": f"{b}_s{s}", "branch": b, "stage": s, "channels": c,
                     "shape": ["T", c] if b == "context" else ["T", args.scale**2, c]}
                    for b, s, c in spec
                ],
            },
            f, indent=2,
        )

    n_tiles = 0
    for name, stems, imgs in prefetch_iter(slides):
        if imgs.shape[1] % args.scale or imgs.shape[2] % args.scale:
            logger.warning(
                f"=> {name}: tile size {imgs.shape[1]}x{imgs.shape[2]} not divisible "
                f"by --scale {args.scale}; skipping"
            )
            continue
        feats = predict_slide(
            feats_fn, variables, (imgs,), chunk=args.chunk, sharding=chunk_sharding
        )
        payload = {"stems": np.asarray(stems)}
        for (b, s, _), arr in zip(spec, feats):
            payload[f"{b}_s{s}"] = arr
        np.savez(osp.join(out_dir, f"{name}.npz"), **payload)
        n_tiles += len(stems)
        logger.info(f"=> {name}: {len(stems)} tiles x {len(spec)} feature keys")

    logger.info(f"=> done: {n_tiles} tiles -> {out_dir}")
    return out_dir


def build_parser():
    parser = argparse.ArgumentParser(description="MSF-WSI/TPU tile embedding extraction")
    parser.add_argument("-a", "--arch", default="resnet18")
    parser.add_argument("--weights", type=str, required=True,
                        help="SSL checkpoint (Orbax dir or reference .pth.tar), or "
                             "'random' for untrained encoders — the control a linear "
                             "probe compares against (epoch-0 params of --seed)")
    parser.add_argument("--data-name", type=str, default="bcss", choices=("bcss", "paip"))
    parser.add_argument("--train-data", type=str,
                        help="prepared dataset root: extract on the fold's val slides")
    parser.add_argument("--fold", type=int, default=0)
    parser.add_argument("--split", choices=("val", "train"), default="val",
                        help="which side of the fold to extract (--train-data mode); "
                             "train includes shift variants, val excludes them "
                             "(the reference's validation contract)")
    parser.add_argument("--tiles-dir", type=str,
                        help="extract from arbitrary tile PNGs: <dir>/images/*.png "
                             "or <dir>/<slide>/images/*.png")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--branch", choices=("context", "target", "both"), default="both",
                        help="context: whole-tile features; target: per-sub-tile "
                             "feature stacks (K = scale^2)")
    parser.add_argument("--scales", type=str, default="1,2,3,4",
                        help="comma-separated 1-indexed encoder stages to export")
    parser.add_argument("--scale", type=int, default=4,
                        help="sub-tile grid (K = scale^2); must match pretraining")
    parser.add_argument("--img-sz", type=int, default=224,
                        help="encoder input size (reference --img-sz)")
    parser.add_argument("--tile-px", type=int, default=1024,
                        help="synthetic-mode tile size")
    parser.add_argument("--mean", nargs=3, type=float, default=[0.485, 0.456, 0.406])
    parser.add_argument("--std", nargs=3, type=float, default=[0.229, 0.224, 0.225])
    parser.add_argument("--seed", default=3407, type=int)
    parser.add_argument("--amp", action="store_true", help="bf16 encoder compute")
    parser.add_argument("--out-dtype", choices=("float16", "float32"), default="float16",
                        help="dtype of the saved features (fp16 halves file size and "
                             "D2H bytes; pooled activations are well within fp16 range)")
    parser.add_argument("--chunk", type=int, default=32,
                        help="tiles per device pass (each tile is K+1 encoder inputs)")
    parser.add_argument("--log-dir", default="./logs/temp", type=str)
    parser.add_argument("--out", type=str, help="output dir (default <log_dir>/features)")
    return parser


PARSER = build_parser()

if __name__ == "__main__":
    main(PARSER.parse_args())
