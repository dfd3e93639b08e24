"""HookNet fine-tuning CLI — flag surface mirrors the reference
``tools/ssl_finetune.py:637-692``; loads SSL pretrain checkpoints (Orbax
dirs or torch ``.pth.tar``) into the branch encoders, trains with Dice loss,
validates per-slide every epoch, and keeps the best model by val micro-F1.
"""

import argparse
import dataclasses
import logging
import os
import random
import sys
import time

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


def load_pretrain_weights(state, weights_path, logger):
    """SSL checkpoint (either format) -> branch encoders."""
    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train import finetune as FT

    if os.path.isdir(weights_path):  # Orbax SSL checkpoint
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(os.path.abspath(weights_path))
        ssl_vars = {"params": payload["params"], "batch_stats": payload["batch_stats"]}
    else:  # torch .pth.tar from the reference
        sd = C.load_torch_file(weights_path)
        ssl_vars = C.torch_msfwsi_to_flax(sd)
    state = FT.load_ssl_encoders(state, ssl_vars)
    logger.info(f"=> loaded pretrained weights {weights_path} into encoders")
    return state


def main_worker(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msfwsi_tpu.data import datasets as D
    from msfwsi_tpu.data import loader as L
    from msfwsi_tpu.data.pipeline import AugConfig
    from msfwsi_tpu.parallel import MeshSpec, batch_sharding, make_mesh
    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train import evaluate as EV
    from msfwsi_tpu.train import finetune as FT
    from msfwsi_tpu.utils import (
        AverageMeter,
        BestRecorder,
        ProgressMeter,
        prefetch_iter,
        setup_logger,
    )
    from msfwsi_tpu.ops import metrics as M

    logger = setup_logger(args.log_dir, name="MSF-WSI")
    logger.info(" ".join([sys.executable, *sys.argv]))
    warn_noop_flags(args, {a.dest: a.default for a in PARSER._actions})

    mesh = make_mesh(MeshSpec())
    class_names = {"bcss": FT.BCSS_CLASSES, "paip": FT.PAIP_CLASSES}[args.data_name]

    config = FT.FinetuneConfig(
        arch=args.arch,
        class_names=tuple(class_names),
        batch_size=args.batch_size,
        lr=args.lr,
        epochs=args.epochs,
        lam=args.lam,
        amp=args.amp,
        seg_size=args.seg_size,
        seed=args.seed if args.seed is not None else 0,
        packed_tail=args.packed_tail,
        packed_logits=args.packed_tail,
        accum_steps=args.accum_steps,
    )
    logger.info(f"=> creating model '{args.arch}' ({config.num_classes} classes incl. bg)")
    logger.info(f"=> scale lr from {args.lr:.4f} to {config.init_lr:.4f}")

    state = FT.create_finetune_state(jax.random.key(config.seed), config)
    if args.weights:
        # Accepts reference-style checkpoint_NNNN.pth.tar recipe paths
        # (resolved to the Orbax dir when that's what the trainer wrote).
        resolved = C.resolve_checkpoint_arg(args.weights)
        if resolved is None:
            logger.warning("=> Invalid model weights!")
            sys.exit(1)
        check_norm_stats(args, resolved)
        state = load_pretrain_weights(state, resolved, logger)

    tb_writer = None
    if args.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            from msfwsi_tpu.utils import increment_path

            tb_writer = SummaryWriter(
                str(increment_path(f"{args.log_dir}/tb_log/exp", sep="_", mkdir=True))
            )
            logger.info("Initialise tensorboard logger successfully!")
        except Exception as e:  # noqa: BLE001
            logger.info(f"=> tensorboard unavailable: {e}")
    wandb_run = None
    if args.wandb:
        try:
            import wandb

            wandb_run = wandb.init(
                project="DSF-WSI Experiments",
                notes=args.run_notes,
                tags=args.run_tag,
                group=args.run_group,
                name=args.run_name,
                job_type="fine-tune",
                dir=args.log_dir,
                config=vars(args),
            )
            logger.info("=> initialise wandb logger successfully!")
        except Exception as e:  # noqa: BLE001
            logger.info(f"=> wandb unavailable, continuing without it: {e}")

    aug_cfg = AugConfig(
        mean=tuple(args.mean),
        std=tuple(args.std),
        seg_size=args.seg_size,
        compute_dtype="bfloat16" if args.amp else "float32",
    )

    # ---- data -----------------------------------------------------------
    if args.synthetic:
        imgs, masks, slide_ids = L.synthetic_tile_library(
            n_slides=4, tiles_per_slide=args.synthetic, tile_size=4 * args.seg_size,
            num_classes=len(class_names),
        )
        train_recs = [i for i in range(len(imgs)) if slide_ids[i] % 4 != 0]
        val_ids = [i for i in range(len(imgs)) if slide_ids[i] % 4 == 0]
        load_fn = lambda i: (imgs[i], masks[i])
        root = "<synthetic>"
        val_groups = [("synthetic_0", val_ids)]

        def iter_val_slides():
            for name, ids in val_groups:
                yield imgs[ids], masks[ids]
    else:
        root = args.train_data
        if args.data_name == "bcss":
            samples = D.bcss_seg_samples(root, fold=args.fold, frac=args.frac)
            groups = D.bcss_seg_val_slides(root, fold=args.fold)
        else:
            samples = D.paip_seg_samples(root, fold=args.fold, frac=args.frac)
            groups = D.paip_seg_val_slides(root, fold=args.fold)
        train_recs = [(s.img, s.mask) for s in samples]
        load_fn = None  # (img, mask) path pairs: loader's native fast path
        if args.packed_cache:
            from msfwsi_tpu.data.packed import get_or_build_pack

            img_pack = get_or_build_pack(root, [r[0] for r in train_recs], args.packed_cache)
            mask_pack = get_or_build_pack(root, [r[1] for r in train_recs], args.packed_cache)
            load_fn = lambda rec: (img_pack.load(rec[0]), mask_pack.load(rec[1]))
            logger.info("=> streaming raw tiles from the packed cache (no decode)")

        def iter_val_slides():
            for g in groups:
                yield L.load_slide_arrays(root, g)

    n_dev = jax.device_count()
    multi = n_dev > 1 and args.batch_size % n_dev == 0
    if n_dev > 1 and not multi:
        logger.info(
            f"=> batch {args.batch_size} not divisible by {n_dev} devices; "
            "running single-device"
        )
    shard_b = args.batch_size // (n_dev if multi else 1)
    if args.accum_steps > 1 and shard_b % args.accum_steps:
        # Interleaved microbatch slices must stay shard-local (train/ssl.py:366).
        logger.error(
            f"=> per-shard batch {shard_b} must be divisible by "
            f"--accum-steps {args.accum_steps}"
        )
        sys.exit(1)
    from msfwsi_tpu.parallel import batch_sharding

    loader = L.TileBatchLoader(
        root,
        train_recs,
        batch_size=args.batch_size,
        load_fn=load_fn,
        seed=config.seed,
        # The reference keeps the last partial batch (drop_last=False,
        # ssl_finetune.py:276). Under a sharded mesh shapes must be static,
        # so the trailing batch is wrap-padded to full size and the padded
        # suffix masked out of the Dice loss (exact same loss/steps-per-
        # epoch as the reference at any --frac).
        drop_last=False,
        pad_last=multi,
        sharding=batch_sharding(mesh) if multi else None,
    )
    logger.info(f"=> train tiles: {len(train_recs)}, steps/epoch: {len(loader)}")
    if len(loader) == 0:
        logger.error(
            f"=> no full batches: {len(train_recs)} train tiles < batch {args.batch_size}"
        )
        sys.exit(1)

    step_fn = FT.make_jitted_fused_finetune_step(
        config, aug_cfg, mesh=mesh if multi else None, donate=False
    )
    val_mesh = mesh if (n_dev > 1 and args.val_chunk % n_dev == 0) else None
    # Validation runs the unpacked model: eval mode has no BN-stat or
    # backward traffic for the packed layout to save, so the packed tail's
    # 4x conv FLOPs make it a measured loss there (-22%; BASELINE.md).
    # Variable trees are bit-compatible, so the train-state variables apply
    # directly. Training itself is +22% packed.
    val_model = (
        dataclasses.replace(config, packed_tail=False).build_model()
        if config.packed_tail
        else state.model
    )
    # No host round trips: "host" pre-builds uint8 views on CPU (reference's
    # literal cv2 pipeline, ~10x fewer H2D bytes — right through the
    # ~50 MB/s axon tunnel), "device" builds views inside the chunk jit.
    chunk_stats = EV.make_chunk_stats_for_views(
        val_model, len(class_names), args.val_views, cfg=aug_cfg, mesh=val_mesh
    )
    if args.val_views == "host":
        from msfwsi_tpu.data.pipeline import make_seg_val_views_host
    val_sharding = batch_sharding(val_mesh) if val_mesh is not None else None
    base_key = jax.random.key(config.seed)

    # Eval views are deterministic, so in host mode the 256px uint8 views
    # are cached in host RAM after the first pass — per-epoch validation
    # skips the PNG decode + resize of every val slide from then on
    # (~10x smaller than the decoded 1024px tiles; the reference's
    # DataLoader re-decodes every epoch). --no-val-cache restores that.
    val_view_cache: list = []

    def host_view_slides():
        if val_view_cache:
            yield from val_view_cache
            return
        for imgs_s, masks_s in iter_val_slides():
            views = make_seg_val_views_host(imgs_s, masks_s, aug_cfg)
            if not args.no_val_cache:
                val_view_cache.append(views)
            yield views
        if val_view_cache:
            mb = sum(sum(a.nbytes for a in v) for v in val_view_cache) / 1e6
            logger.info(
                f"=> cached val views for {len(val_view_cache)} slides "
                f"({mb:.0f} MB host RAM); --no-val-cache to re-decode per epoch"
            )

    def run_validation(state):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        slides = (
            host_view_slides() if args.val_views == "host" else iter_val_slides()
        )
        scores = EV.validate_slides(
            chunk_stats, variables, slides, args.val_views, class_names,
            chunk=args.val_chunk, sharding=val_sharding,
        )
        return scores.summary()

    micro_f1 = BestRecorder("max")
    micro_iou = BestRecorder("max")
    micro_acc = BestRecorder("max")
    raw_recorders = {
        m: {c: BestRecorder("max") for c in class_names} for m in ("f1", "iou", "acc")
    }

    for epoch in range(args.epochs):
        start = time.time()
        losses = AverageMeter("Loss", ":.4f")
        batch_time = AverageMeter("Time", ":6.3f")
        progress = ProgressMeter(len(loader), [batch_time, losses], prefix=f"Train epoch: [{epoch}]")

        tps, fps, fns, tns = [], [], [], []
        # Per-step metric fetches are deferred: on the tunneled TPU backend
        # every host sync costs ~35-40 ms (more than the 38 ms train step
        # itself — measured 250 vs 834 pairs/s), so steps are queued
        # back-to-back and the small device-side metrics are drained in ONE
        # packed fetch per print window. The drained numbers are identical
        # to the per-step fetches (same meter updates, same tp/fp/fn/tn).
        pending = []  # (metrics dict of small device arrays, n_valid)

        def drain_pending():
            if not pending:
                return
            # One flat vector, not a stack: the single-device loader yields
            # a genuinely short trailing batch (drop_last=False parity), so
            # rows in one drain window can have different (batch, classes)
            # shapes (crashed live on the r50 convergence run, round 4).
            def flat(m):
                parts = [m["loss"].reshape(1).astype(jnp.float32)]
                if "valid" in m:
                    # Echoed sample mask: which global rows are real. Under
                    # multi-host the wrap-pad sits at each process segment's
                    # tail, not the global tail — filter rows by the mask
                    # instead of slicing a suffix.
                    parts.append(m["valid"].ravel().astype(jnp.float32))
                parts += [m[k].ravel().astype(jnp.float32) for k in ("tp", "fp", "fn", "tn")]
                return jnp.concatenate(parts)

            packed = jnp.concatenate([flat(m) for m, _ in pending])
            arr = np.asarray(packed)  # one device->host round trip
            # Per-(sample,class) counts are bounded by the pixels of one
            # view; float32 carries integers exactly below 2^24, so the
            # packed fetch is lossless for seg_size up to 4096px.
            assert config.seg_size**2 < 2**24, (
                "packed f32 metric fetch would lose integer precision"
            )
            off = 0
            for m, n_valid in pending:
                BC = m["tp"].shape  # (batch, classes) of THIS step
                nb = BC[0] if "valid" in m else 0
                n = 1 + nb + 4 * BC[0] * BC[1]
                row = arr[off : off + n]
                off += n
                stats = row[1 + nb :].reshape(4, *BC).astype(np.int64)
                if nb:
                    sel = row[1 : 1 + nb] > 0.5
                    losses.update(float(row[0]), int(sel.sum()))
                    tps.append(stats[0][sel])
                    fps.append(stats[1][sel])
                    fns.append(stats[2][sel])
                    tns.append(stats[3][sel])
                else:
                    losses.update(float(row[0]), n_valid)
                    tps.append(stats[0][:n_valid])
                    fps.append(stats[1][:n_valid])
                    fns.append(stats[2][:n_valid])
                    tns.append(stats[3][:n_valid])
            pending.clear()

        end = time.time()
        steps_total = len(loader)
        for it, (bimgs, bmasks) in enumerate(loader.epoch(epoch)):
            key = jax.random.fold_in(jax.random.fold_in(base_key, epoch), it)
            n_valid = (
                loader.last_batch_valid() if it == steps_total - 1 else args.batch_size
            )
            if multi:
                # Wrap-padded trailing batch: mask the pads out of the Dice
                # loss (drop_last=False parity under sharding). The mask
                # comes from the loader, placed through the same path as
                # the batch, so its rows align with the data rows even
                # under multi-host assembly (per-segment pad suffixes).
                valid = loader.valid_mask(it)
                state, metrics = step_fn(state, bimgs, bmasks, key, valid)
            else:
                state, metrics = step_fn(state, bimgs, bmasks, key)
            pending.append((metrics, n_valid))
            batch_time.update(time.time() - end)
            end = time.time()
            if it % args.print_freq == 0:
                drain_pending()
                logger.info(progress.display(it))
            if args.steps_per_epoch and it + 1 >= args.steps_per_epoch:
                break
        drain_pending()

        train_f1 = float(
            M.f1_score(
                np.concatenate(tps), np.concatenate(fps), np.concatenate(fns),
                np.concatenate(tns), reduction="micro-imagewise",
            )
        )

        summary = run_validation(state)
        best_f1, is_best = micro_f1.update(summary["f1_micro"])
        best_iou, _ = micro_iou.update(summary["iou_micro"])
        best_acc, _ = micro_acc.update(summary["acc_micro"])

        if tb_writer is not None:
            tb_writer.add_scalar("train/loss", losses.avg, epoch)
            tb_writer.add_scalars("train/f1", {"micro": train_f1}, epoch)
            tb_writer.add_scalars("val/f1", {"micro": summary["f1_micro"]}, epoch)
            tb_writer.add_scalars("val/iou", {"micro": summary["iou_micro"]}, epoch)
            tb_writer.add_scalars("val/acc", {"micro": summary["acc_micro"]}, epoch)
        if wandb_run is not None:
            wandb_run.log(
                {"train_f1_micro": train_f1, "val_f1_micro": summary["f1_micro"]}
            )
            wandb_run.summary["best_val_f1_micro"] = best_f1
        for m in ("f1", "iou", "acc"):
            for c in class_names:
                raw_recorders[m][c].update(summary[f"{m}_{c}"])

        if is_best and jax.process_index() == 0:
            C.save_train_state(args.log_dir, state, epoch, keep_name="best_ft_model")
            logger.info(f"=> Best model saved at epoch {epoch}!")

        elapsed = (time.time() - start) / 60
        logger.info(
            "=======\n"
            f"TIME: {elapsed:.2f} mins, LOSS: {losses.avg:.4f}\n"
            f"MICRO F1: {train_f1:.4f}/{summary['f1_micro']:.4f}/{best_f1:.4f}\n"
            f"MICRO IOU: {summary['iou_micro']:.4f}/{best_iou:.4f}\n"
            f"MICRO ACC: {summary['acc_micro']:.4f}/{best_acc:.4f}\n"
            "======="
        )

    C.wait_for_saves()  # best_ft_model saves run async; be durable before exit
    logger.info("=> Best scores:")
    logger.info(
        "=======\n"
        f"MICRO F1: {micro_f1.best:.4f}\n"
        f"MICRO IOU: {micro_iou.best:.4f}\n"
        f"MICRO ACC: {micro_acc.best:.4f}\n"
    )
    for c in class_names:
        logger.info(
            f"{c} F1: {raw_recorders['f1'][c].best:.4f}, "
            f"IOU: {raw_recorders['iou'][c].best:.4f}, "
            f"ACC: {raw_recorders['acc'][c].best:.4f}"
        )

    if tb_writer is not None:
        tb_writer.close()
    if wandb_run is not None:
        wandb_run.finish()


def build_parser():
    parser = argparse.ArgumentParser(description="MSF-WSI/TPU fine-tuning")
    parser.add_argument("-a", "--arch", default="resnet18")
    parser.add_argument("-b", "--batch-size", default=64, type=int)
    parser.add_argument("-j", "--workers", default=4, type=int)
    parser.add_argument("-p", "--print-freq", default=50, type=int)
    parser.add_argument("--epochs", default=50, type=int)
    parser.add_argument("--lr", default=1e-3, type=float)
    parser.add_argument("--world-size", default=-1, type=int)
    parser.add_argument("--rank", default=-1, type=int)
    parser.add_argument("--dist-url", default="", type=str)
    parser.add_argument("--dist-backend", default="nccl", type=str)
    parser.add_argument("--seed", type=int)
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
    parser.add_argument("--run-group", default=None, type=str)
    parser.add_argument("--run-tag", nargs="*", default=None, type=str)
    parser.add_argument("--run-name", default=None, type=str)
    parser.add_argument("--run-notes", default="MSF-WSI/TPU training", type=str)

    parser.add_argument("--tf32", action="store_true")
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--weights", type=str)
    parser.add_argument("--frac", type=float, default=1)
    parser.add_argument("--lam", type=float, default=1)

    # TPU-rebuild extras
    parser.add_argument("--packed-tail", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="train with the narrow-channel decoder tail in "
                             "the space-to-depth domain (exact; TPU "
                             "lane-padding fix — see ops/s2d.py; measured "
                             "+22%% train step). Validation/eval always run "
                             "unpacked; checkpoints are identical either way")
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="gradient accumulation: sequential microbatches inside "
                        "the jitted step, one Adam update on the averaged gradient "
                        "(Dice averaged per microbatch; BN stats per-microbatch)")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--val-chunk", type=int, default=128,
                        help="tiles per device pass during validation (reference: 128)")
    parser.add_argument("--val-views", choices=("host", "device"), default="host",
                        help="where eval views are built: 'host' = uint8 cv2 "
                             "resize/crop on CPU, normalize on device (the "
                             "reference's literal split; ~10x fewer H2D bytes), "
                             "'device' = ship raw tiles, build views in the "
                             "chunk jit (direct-attached hosts)")
    parser.add_argument("--no-val-cache", action="store_true",
                        help="re-decode validation slides every epoch (the "
                             "reference DataLoader's behavior); by default the "
                             "deterministic 256px uint8 val views are cached in "
                             "host RAM after the first validation pass")
    parser.add_argument("--steps-per-epoch", type=int, default=0)
    parser.add_argument("--seg-size", type=int, default=256,
                        help="context/target view size (reference: 256)")
    parser.add_argument("--packed-cache", type=str, default="",
                        help="directory for a decode-once uint8 tile pack")
    return parser


PARSER = build_parser()

if __name__ == "__main__":
    main(PARSER.parse_args())
