"""Released-checkpoint accuracy parity harness.

North star (BASELINE.json / BASELINE.md): BCSS fold-0 fine-tuned micro-IoU
within 0.5 pts of the released checkpoint (released weights listed at
``/root/reference/README.md:25-29``; validation semantics at
``/root/reference/tools/evaluate.py:207-237,240-326``).

THE ONE COMMAND (where the released ``.pth.tar`` and prepared BCSS data are
available):

    python tools/parity_check.py \
        --weights /path/to/bcss_fold0_ft_model.pth.tar \
        --train-data /path/to/prepared_bcss \
        --data-name bcss --fold 0 \
        --reference-miou <mIoU printed by the reference's evaluate.py>

Steps performed:
  1. convert the released torch HookNet checkpoint -> Flax pytree
     (``train/checkpoint.torch_hooknet_to_flax`` — forward-parity tested
     against torch oracles in tests/test_checkpoint.py);
  2. run the per-slide chunked validation loop once (identical code path to
     ``tools/evaluate.py``);
  3. print a one-line JSON verdict with the measured micro-IoU, the
     reference value, and the delta; exit 0 iff |delta| <= --tolerance
     (default 0.005 = 0.5 pts). Without --reference-miou it prints the
     measured scores and exits 0 (establishing the rebuild-side number).

Optionally pass --ssl-weights <released pretrain .pth.tar> to also verify
the SSL-checkpoint surgery path (``ssl_finetune.py:146-172`` semantics)
loads cleanly into a fresh HookNet.

This image has no network and no released weights/data, so the harness is
exercised end-to-end by a fixture-scale test (fake ``.pth.tar`` + synthetic
slides): ``tests/test_tools.py::TestParityCheck``.
"""

import argparse
import json
import sys

import _common  # noqa: F401

import evaluate as EVAL_CLI


def build_parser():
    parser = argparse.ArgumentParser(
        description="MSF-WSI/TPU released-checkpoint parity check",
        epilog=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--weights", type=str, required=True,
                        help="released fine-tuned HookNet .pth.tar (or an Orbax dir)")
    parser.add_argument("--ssl-weights", type=str, default="",
                        help="optionally also check the released SSL pretrain "
                        ".pth.tar loads through the finetune surgery path")
    parser.add_argument("--train-data", type=str,
                        help="prepared dataset dir (bcss_prepare output)")
    parser.add_argument("--data-name", type=str, default="bcss", choices=("bcss", "paip"))
    parser.add_argument("--fold", type=int, default=0)
    parser.add_argument("-a", "--arch", default="resnet18")
    parser.add_argument("--seed", type=int, default=3407)
    parser.add_argument("--val-chunk", type=int, default=128)
    parser.add_argument("--seg-size", type=int, default=256)
    # Evaluation MUST use the same normalization stats as the checkpoint's
    # training run (BASELINE.md: the ImageNet defaults silently cost ~40 F1
    # points on a dataset-stats model) — threaded through to evaluate.py.
    parser.add_argument("--mean", nargs=3, type=float, default=None,
                        help="normalization mean used at training time "
                        "(default: evaluate.py's ImageNet stats)")
    parser.add_argument("--std", nargs=3, type=float, default=None)
    parser.add_argument("--log-dir", default="./logs/parity", type=str)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="fixture mode: N synthetic tiles/slide instead of real data")
    parser.add_argument("--reference-miou", type=float, default=None,
                        help="micro-IoU of the released checkpoint as printed by the "
                        "reference evaluate.py on the same fold")
    parser.add_argument("--tolerance", type=float, default=0.005,
                        help="max |delta| in absolute mIoU (0.005 == 0.5 pts)")
    return parser


def main(args):
    if args.ssl_weights:
        check_ssl_surgery(args)

    # Run the regular evaluation CLI loop with the converted checkpoint —
    # the exact code path a user would run; no parallel reimplementation.
    eval_args = EVAL_CLI.PARSER.parse_args([
        "--arch", args.arch,
        "--weights", args.weights,
        "--data-name", args.data_name,
        "--fold", str(args.fold),
        "--seed", str(args.seed),
        "--val-chunk", str(args.val_chunk),
        "--seg-size", str(args.seg_size),
        "--log-dir", args.log_dir,
        *(["--train-data", args.train_data] if args.train_data else []),
        *(["--synthetic", str(args.synthetic)] if args.synthetic else []),
        *(["--mean", *map(str, args.mean)] if args.mean else []),
        *(["--std", *map(str, args.std)] if args.std else []),
    ])
    from msfwsi_tpu.utils import increment_path

    eval_args.log_dir = str(increment_path(eval_args.log_dir, sep="_", mkdir=True))
    summary = EVAL_CLI.main_worker(eval_args)

    result = {
        "metric": f"{args.data_name}_fold{args.fold}_micro_iou",
        "measured": round(summary["iou_micro"], 6),
        "f1_micro": round(summary["f1_micro"], 6),
        "acc_micro": round(summary["acc_micro"], 6),
    }
    if args.reference_miou is not None:
        delta = summary["iou_micro"] - args.reference_miou
        result.update(
            reference=args.reference_miou,
            delta=round(delta, 6),
            tolerance=args.tolerance,
            parity=bool(abs(delta) <= args.tolerance),
        )
    print(json.dumps(result))
    if args.reference_miou is not None and not result["parity"]:
        return 1
    return 0


def check_ssl_surgery(args):
    """Load a released SSL pretrain checkpoint into a fresh HookNet via the
    branch-encoder surgery (``ssl_finetune.py:146-172``) and assert the
    encoder weights actually changed."""
    import jax
    import numpy as np

    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train import finetune as FT

    class_names = {"bcss": FT.BCSS_CLASSES, "paip": FT.PAIP_CLASSES}[args.data_name]
    config = FT.FinetuneConfig(arch=args.arch, class_names=tuple(class_names))
    state = FT.create_finetune_state(jax.random.key(0), config, local_batch=1)
    ssl_variables = C.torch_msfwsi_to_flax(C.load_torch_file(args.ssl_weights))
    grafted = FT.load_ssl_encoders(state, ssl_variables)
    before = jax.tree.leaves(state.params["context_branch"]["encoder"])
    after = jax.tree.leaves(grafted.params["context_branch"]["encoder"])
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed, "SSL surgery left encoder weights unchanged"
    print(json.dumps({"ssl_surgery": "ok", "weights": args.ssl_weights}))


if __name__ == "__main__":
    sys.exit(main(build_parser().parse_args()))
