"""SSL pre-training CLI for MSF-WSI/TPU.

Flag surface mirrors the reference ``tools/ssl_train.py:544-628`` so the
published recipes (``scripts/{bcss,paip,c16}.sh``) run unchanged; the
runtime underneath is JAX/GSPMD: one process per host, a ("data","model")
device mesh, one jit covering on-device augmentation + forward + backward +
Adam, with gradient/SyncBN collectives inserted by XLA.

Extra flags beyond the reference: ``--synthetic N`` trains on an in-memory
synthetic tile corpus (smoke testing without data), ``--steps-per-epoch``
caps epoch length.
"""

import argparse
import logging
import os
import random
import sys
import time

import _common  # noqa: F401  (sys.path setup)
from _common import add_error_capture, warn_noop_flags


def main(args):
    import numpy as np

    from msfwsi_tpu.utils import dump_config, increment_path, setup_logger

    args.log_dir = str(increment_path(args.log_dir, sep="_", mkdir=True))

    if args.seed is not None:
        random.seed(args.seed)
        np.random.seed(args.seed)

    dump_config(args.log_dir, args)
    add_error_capture(args.log_dir)(main_worker)(args)


def main_worker(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msfwsi_tpu.data import datasets as D
    from msfwsi_tpu.data import loader as L
    from msfwsi_tpu.data.pipeline import AugConfig
    from msfwsi_tpu.parallel import MeshSpec, batch_sharding, make_mesh
    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train import ssl as S
    from msfwsi_tpu.utils import AverageMeter, ProgressMeter, setup_logger

    logger = setup_logger(args.log_dir, name=args.logger_name)
    logger.info(" ".join([sys.executable, *sys.argv]))
    warn_noop_flags(args, {a.dest: a.default for a in PARSER._actions})

    try:
        mesh = make_mesh(MeshSpec(model=args.model_parallel))
    except ValueError as e:
        logger.error(f"=> bad --model-parallel {args.model_parallel}: {e}")
        sys.exit(1)
    n_data = mesh.shape["data"]
    logger.info(
        f"=> mesh: {n_data} device(s) on axis 'data' x "
        f"{mesh.shape['model']} on 'model' ({jax.devices()[0].platform})"
    )
    if args.batch_size % n_data:
        logger.error(
            f"=> global batch {args.batch_size} must be divisible by the "
            f"{n_data}-device data axis"
        )
        sys.exit(1)
    if args.accum_steps > 1 and (args.batch_size // n_data) % args.accum_steps:
        # slice_microbatch's interleaved partition is only shard-local when
        # accum divides the per-shard batch — otherwise GSPMD rebalances
        # every microbatch with collective-permutes (train/ssl.py:366).
        logger.error(
            f"=> per-shard batch {args.batch_size // n_data} must be "
            f"divisible by --accum-steps {args.accum_steps}"
        )
        sys.exit(1)

    if args.amp:
        logger.info("=> bf16 mixed precision enabled (no GradScaler needed on TPU)")

    config = S.SSLConfig(
        arch=args.arch,
        batch_size=args.batch_size,
        lr=args.lr,
        epochs=args.epochs,
        dim=args.dim,
        pred_dim=args.pred_dim,
        mask_ratio=args.mask_ratio,
        scale=args.scale,
        ms_lr=tuple(args.ms_lr),
        fuser_weights=tuple(args.fuser_weights),
        seed=args.seed if args.seed is not None else 0,
        img_size=args.img_sz,
        amp=args.amp,
        use_ac=args.use_ac,
        inter_opt=args.inter_opt,
        inter_dtype=args.inter_dtype,
        remat_stages=tuple(args.remat_stages) if args.remat_stages else None,
        accum_steps=args.accum_steps,
    )
    logger.info(f"=> creating model '{args.arch}' (scale={args.scale}, K={config.scale**2})")
    logger.info(f"=> use init_lr of {config.init_lr:.4f} (sqrt-batch scaling)")

    aug_cfg = AugConfig(
        mean=tuple(args.mean),
        std=tuple(args.std),
        img_size=args.img_sz,
        grid=args.scale,
        tile_px=args.tile_px,
        # Under --amp the whole augmentation pipeline also runs bf16 (halves
        # the full-resolution color-op HBM traffic).
        compute_dtype="bfloat16" if args.amp else "float32",
    )

    # ---- data -----------------------------------------------------------
    camelyon = None
    if args.synthetic:
        tile_px = aug_cfg.tile_px * args.scale
        imgs, _, _ = L.synthetic_tile_library(
            n_slides=1, tiles_per_slide=args.synthetic, tile_size=tile_px
        )
        files = list(range(len(imgs)))
        load_fn = lambda i: imgs[i]
        root = "<synthetic>"
    elif args.data_name == "bcss":
        files = D.bcss_pretrain_files(args.data, fold=args.fold)
        load_fn = None
        root = args.data
    elif args.data_name == "paip":
        files = D.paip_pretrain_files(args.data, fold=args.fold)
        load_fn = None
        root = args.data
    elif args.data_name == "camelyon16":
        camelyon = D.Camelyon16Manifest(
            args.data, mode=args.c16_mode, seed=config.seed
        )
        files = camelyon.resample(0)
        load_fn = None
        root = args.data
    else:
        logger.error("Unsupported dataset!")
        sys.exit(1)

    if args.quick_test:
        files = files[:7680]

    if args.packed_cache and not args.synthetic:
        from msfwsi_tpu.data.packed import get_or_build_pack

        if camelyon is not None:
            # Pack the full candidate pool once; per-epoch resampling then
            # indexes into the pack by path.
            pool = sorted(f for fs in camelyon.all_data.values() for f in fs)
        else:
            pool = files
        logger.info(f"=> building/opening packed tile cache ({len(pool)} tiles)")
        pack = get_or_build_pack(root, pool, args.packed_cache)
        load_fn = pack.load
        logger.info("=> streaming raw tiles from the packed cache (no decode)")

    # Global batch divided per host (the reference divides per GPU,
    # ssl_train.py:165); per-host shards assemble into the global array.
    local_batch = args.batch_size // jax.process_count()
    loader = L.TileBatchLoader(
        root,
        files,
        batch_size=local_batch,
        load_fn=load_fn,
        seed=config.seed,
        sharding=batch_sharding(mesh),
    )
    logger.info(f"=> Size of data: {len(files)}, steps per epoch: {len(loader)}")

    # ---- state ----------------------------------------------------------
    if args.model_parallel > 1:
        # Born distributed: with TP requested, init directly under the
        # fuser-head placements — materialize-then-reshard would blow a
        # small-HBM chip on exactly the models TP exists for (resnet50's
        # ~1.58B-param heads + their optimizer state).
        from msfwsi_tpu.parallel.tp import create_sharded_ssl_state

        state = create_sharded_ssl_state(jax.random.key(config.seed), config, mesh)
    else:
        state = S.create_ssl_state(jax.random.key(config.seed), config)
    # ImageNet init is the reference default (backbone.py:58-63 always builds
    # encoders with pretrained=True); --imagenet-weights none opts out.
    if args.imagenet_weights != "none":
        from msfwsi_tpu.utils.imagenet import resolve_imagenet_weights, search_dirs

        explicit = "" if args.imagenet_weights == "auto" else args.imagenet_weights
        weights_path = resolve_imagenet_weights(config.arch, explicit)
        if weights_path is not None:
            state = S.load_imagenet_encoders(state, C.load_torch_file(weights_path))
            logger.info(f"=> initialized encoders from ImageNet weights {weights_path}")
        else:
            msg = (
                f"ImageNet weights for {config.arch} not found locally and "
                f"download failed. The reference always pretrains from "
                f"torchvision pretrained=True (backbone.py:58-63); place the "
                f".pth in $MSFWSI_IMAGENET_DIR (searched: {search_dirs()}), "
                f"pass --imagenet-weights <path>, or opt out explicitly with "
                f"--imagenet-weights none / --allow-random-init."
            )
            # Random init silently diverges from the published setup — fail
            # hard unless the user opted out (synthetic smoke mode implies it).
            if args.synthetic or args.allow_random_init:
                logger.warning(f"=> {msg} PRETRAINING FROM RANDOM INIT.")
            else:
                logger.error(f"=> {msg}")
                raise RuntimeError(msg)
    start_epoch = args.start_epoch
    if args.resume:
        resume = C.resolve_checkpoint_arg(args.resume)
        if resume is not None:
            import re

            logger.info(f"=> loading checkpoint '{resume}'")
            if os.path.isdir(resume):
                state = C.restore_train_state(resume, state)
            else:
                # Reference-format .pth.tar resume: model weights + BN stats
                # restored; Adam moments restart (documented in PARITY.md —
                # the reference also perturbs the optimizer on resume by
                # forcing eps=0.1, ssl_train.py:325-326).
                variables = C.torch_msfwsi_to_flax(C.load_torch_file(resume))
                state = state.replace(
                    params=variables["params"], batch_stats=variables["batch_stats"]
                )
                logger.warning(
                    "=> torch-format resume restores weights/BN only; "
                    "optimizer moments restart"
                )
            # The checkpoint name encodes the completed epoch (reference
            # contract checkpoint_{epoch:04d}, ssl_train.py:385) — the only
            # derivation that stays correct when --steps-per-epoch capped
            # earlier epochs. Fall back to step arithmetic (cap-aware).
            m = re.search(r"checkpoint_(\d+)", os.path.basename(os.path.normpath(resume)))
            if m:
                start_epoch = int(m.group(1)) + 1
            else:
                spe = min(args.steps_per_epoch, len(loader)) if args.steps_per_epoch else len(loader)
                start_epoch = int(state.step) // max(1, spe)
            logger.info(f"=> loaded checkpoint (step {int(state.step)}, epoch {start_epoch})")
        else:
            logger.info(f"=> no checkpoint found at '{args.resume}'")

    if args.model_parallel > 1:
        # Fuser heads split over the "model" axis (resnet50 at scale 4 has
        # ~1.58B head params — beyond one small-HBM chip replicated). Pure
        # GSPMD placement: shard after any init/resume replaced the params.
        from msfwsi_tpu.parallel.tp import shard_ssl_state

        state = shard_ssl_state(state, mesh)
        logger.info(
            f"=> fuser heads tensor-parallel over {args.model_parallel} devices"
        )
    if camelyon is not None and start_epoch:
        # Resume rejoins the deterministic per-epoch resampling schedule:
        # files were seeded with resample(0) above, but epoch N must train
        # on resample(N) exactly as the uninterrupted run did (the epoch
        # loop advances with resample(epoch + 1) at each epoch's end).
        loader.files = camelyon.resample(start_epoch)
        logger.info(f"=> camelyon resampling rejoined at epoch {start_epoch}")

    step_fn = S.make_jitted_fused_step(
        config, aug_cfg, mesh=mesh, model_parallel=args.model_parallel > 1
    )
    base_key = jax.random.key(config.seed)

    # Experiment tracking on process 0 only, like the reference's rank==0
    # gating (ssl_train.py:105-132) — every process logging would create
    # duplicate wandb runs and conflicting tb event streams.
    tb_writer = None
    if args.tensorboard and jax.process_index() == 0:
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
    if args.wandb and jax.process_index() == 0:
        try:
            import wandb

            wandb_run = wandb.init(
                project="MSF-WSI Experiments",
                notes=args.run_notes,
                tags=args.run_tag,
                group=args.run_group,
                name=args.run_name,
                job_type="pretrain",
                dir=args.log_dir,
                config=vars(args),
            )
            logger.info("=> initialise wandb logger successfully!")
        except Exception as e:  # noqa: BLE001
            logger.info(f"=> wandb unavailable, continuing without it: {e}")

    best_loss = 255.0
    for epoch in range(start_epoch, args.epochs):
        start = time.time()
        batch_time = AverageMeter("Time", ":6.3f")
        data_time = AverageMeter("Data", ":6.3f")
        progress = ProgressMeter(len(loader), [batch_time, data_time], prefix=f"Epoch: [{epoch}]")
        logger.info(f"=> begin epoch {epoch}")

        profiling = args.profile_steps and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(os.path.join(args.log_dir, "profile"))

        pending = []  # device-side loss scalars; fetched off the hot path
        n_steps = 0
        end = time.time()
        for it, tiles in enumerate(loader.epoch(epoch)):
            data_time.update(time.time() - end)
            key = jax.random.fold_in(jax.random.fold_in(base_key, epoch), it)
            state, metrics = step_fn(state, tiles, key)
            pending.append(metrics["loss"])
            n_steps += 1
            batch_time.update(time.time() - end)
            end = time.time()
            if it % args.print_freq == 0:
                logger.info(progress.display(it))
            if profiling and n_steps >= args.profile_steps:
                float(metrics["loss"])  # flush the queue before stopping
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f"=> profiler trace written to {args.log_dir}/profile")
            if args.steps_per_epoch and n_steps >= args.steps_per_epoch:
                break
        if profiling:
            jax.profiler.stop_trace()

        # One packed device->host fetch for the whole epoch's loss scalars
        # (per-scalar float() would pay one ~35-40 ms tunnel round trip each).
        losses = np.asarray(jnp.stack(pending)).tolist() if pending else []
        loss = float(np.mean(losses)) if losses else float("nan")
        # (The reference computes is_best but always saves with
        # is_best=False in pretrain — no best-model checkpoint exists here
        # either; best_loss is logging-only.)
        best_loss = min(loss, best_loss)

        if camelyon is not None:
            loader.files = camelyon.resample(epoch + 1)
            logger.info("=> reset dataset for next epoch!")

        if tb_writer is not None:
            tb_writer.add_scalar("train/loss", loss, epoch)
        if wandb_run is not None:
            wandb_run.log({"train_loss": loss})
            wandb_run.summary["train_loss"] = best_loss

        if jax.process_index() == 0 and (epoch + 1) % args.save_freq == 0:
            C.save_train_state(args.log_dir, state, epoch)
            logger.info(f"=> Model saved at epoch {epoch}!")

        elapsed = (time.time() - start) / 60
        logger.info(
            f"======= TIME: {elapsed:.2f} mins, BEST LOSS: {loss:.4f}/{best_loss:.4f} ======="
        )

    C.wait_for_saves()  # checkpoint saves run async; be durable before exit
    if tb_writer is not None:
        tb_writer.close()
    if wandb_run is not None:
        # Reference copies the run log into the wandb dir before finishing
        # (ssl_train.py:394-405).
        try:
            import shutil

            log_txt = os.path.join(args.log_dir, "log.txt")
            if os.path.exists(log_txt):
                shutil.copyfile(
                    log_txt, os.path.join(wandb_run.dir, "train_output.log")
                )
                logger.info("=> Log is copied into Wandb folder!")
        except Exception as e:  # noqa: BLE001
            logger.info(f"=> wandb log copy failed: {e}")
        wandb_run.finish()


def build_parser():
    parser = argparse.ArgumentParser(description="MSF-WSI pre-training")
    parser.add_argument("-a", "--arch", default="resnet18")
    parser.add_argument("-b", "--batch-size", default=32, type=int)
    parser.add_argument("-j", "--workers", default=8, type=int)
    parser.add_argument("-p", "--print-freq", default=50, type=int)
    parser.add_argument("--lr", "--learning-rate", default=1e-3, type=float)
    parser.add_argument("--wd", "--weight-decay", default=1e-2, type=float,
                        help="parsed but unused, as in the reference (ssl_train.py:551,309)")
    parser.add_argument("--epochs", default=300, type=int)
    parser.add_argument("--start-epoch", default=0, type=int)
    parser.add_argument("--resume", default="", type=str)
    parser.add_argument("--world-size", default=-1, type=int)
    parser.add_argument("--rank", default=-1, type=int)
    parser.add_argument("--dist-url", default="", type=str)
    parser.add_argument("--dist-backend", default="nccl", type=str)
    parser.add_argument("--seed", default=3407, type=int)
    parser.add_argument("--gpu", default=None, type=int)
    parser.add_argument("--multiprocessing-distributed", action="store_true")

    # simsiam specific configs:
    parser.add_argument("--dim", default=2048, type=int)
    parser.add_argument("--pred-dim", default=512, type=int)

    # Data settings
    parser.add_argument("--data-name", type=str)
    parser.add_argument("--data", metavar="DIR", help="path to dataset")
    parser.add_argument("--inter-opt", type=str, default="adam",
                        choices=("adam", "adafactor", "fused_adafactor"),
                        help="fuser-head optimizer; adafactor = factored second moment "
                        "(fits resnet50's ~1.6B-param heads on small-HBM chips); "
                        "fused_adafactor = same math with the big-kernel updates "
                        "computed from outer-product factors without materializing "
                        "dense gradients (fastest; see train/factored.py)")
    parser.add_argument("--inter-dtype", type=str, default="float32", choices=("float32", "bfloat16"),
                        help="fuser-head parameter storage dtype (bfloat16 halves head "
                        "param/grad HBM traffic; single-small-chip resnet50 option)")
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="gradient accumulation: split each global batch into this "
                        "many sequential microbatches inside the jitted step (one Adam "
                        "update on the averaged gradient). Makes the published global "
                        "batches fit small-HBM chips, e.g. resnet50 -b 32 on one v5e "
                        "with --accum-steps 2. BN stats are per-microbatch.")
    parser.add_argument("--remat-stages", type=int, nargs="*", default=None,
                        help="with --use-ac: 1-indexed encoder stages to checkpoint "
                        "(default all; '1 2' keeps the FLOP-heavy stages 3-4 stored)")
    parser.add_argument("--c16-mode", type=str, default="train", choices=("train", "all"),
                        help="Camelyon16 slide pool: train = train_ids only (reference "
                        "CLI default), all = imagesTr + imagesTs (camelyon.py:56-83)")
    parser.add_argument("--mean", nargs=3, type=float, default=[0.485, 0.456, 0.406])
    parser.add_argument("--std", nargs=3, type=float, default=[0.229, 0.224, 0.225])
    parser.add_argument("-i", "--img-sz", type=int, default=224)
    parser.add_argument("--fold", type=int, default=0)

    # Log setting
    parser.add_argument("--logger-name", default="MSF-WSI", type=str)
    parser.add_argument("--log-dir", default="./logs/temp", type=str)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--run-group", default=None, type=str)
    parser.add_argument("--run-tag", nargs="*", default=None, type=str)
    parser.add_argument("--run-name", default=None, type=str)
    parser.add_argument("--run-notes", default="MSF-WSI/TPU training", type=str)

    # MSF-WSI specific configs:
    parser.add_argument("--quick-test", action="store_true")
    parser.add_argument("--save-freq", default=50, type=int)
    parser.add_argument("--mask_ratio", type=int, default=50)
    parser.add_argument("--tf32", action="store_true")
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--use-ac", action="store_true")
    parser.add_argument("--ms_lr", nargs=3, type=float, default=[1.0, 1.0, 1.0])
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--fuser_weights", nargs=4, type=float, default=[0.1, 0.4, 0.7, 1.0])

    # TPU-rebuild extras (not in the reference)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N in-memory synthetic tiles (smoke mode)")
    parser.add_argument("--steps-per-epoch", type=int, default=0,
                        help="cap steps per epoch (0 = full epoch)")
    parser.add_argument("--tile-px", type=int, default=256,
                        help="target sub-tile size before per-tile RRC (reference: 256)")
    parser.add_argument("--profile-steps", type=int, default=0,
                        help="trace the first N steps with jax.profiler into <log-dir>/profile")
    parser.add_argument("--model-parallel", type=int, default=1,
                        help="size of the 'model' mesh axis: fuser-head tensor "
                             "parallelism (parallel/tp.py); device count must be "
                             "divisible by it")
    parser.add_argument("--allow-random-init", action="store_true",
                        help="proceed from random init when ImageNet weights "
                        "cannot be resolved (default: hard error, since the "
                        "published setup always starts from pretrained=True)")
    parser.add_argument("--imagenet-weights", type=str, default="auto",
                        help="ImageNet init for both encoders (reference default: "
                        "pretrained=True via torch.hub). 'auto' = search "
                        "$MSFWSI_IMAGENET_DIR / caches then try downloading; "
                        "'none' = random init; or a local torchvision .pth path")
    parser.add_argument("--packed-cache", type=str, default="",
                        help="directory for a decode-once uint8 tile pack; training "
                        "then streams raw bytes (no per-epoch PNG decode)")
    return parser


PARSER = build_parser()

if __name__ == "__main__":
    main(PARSER.parse_args())
