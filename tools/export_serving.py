"""Freeze a fine-tuned HookNet checkpoint into a StableHLO serving artifact.

Usage:
  python tools/export_serving.py --checkpoint logs/ft/best_ft_model \
      --out hooknet.stablehlo --data-name bcss [--chunk 128] [--seg-size 256]

The artifact embeds the weights and the eval-mode chunked-inference graph;
load anywhere with msfwsi_tpu.train.serving.load_serving_artifact.
"""

import argparse

import _common  # noqa: F401


def main(args):
    import jax

    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train import finetune as FT
    from msfwsi_tpu.train import serving

    class_names = {"bcss": FT.BCSS_CLASSES, "paip": FT.PAIP_CLASSES}[args.data_name]
    config = FT.FinetuneConfig(
        arch=args.arch, class_names=tuple(class_names), amp=args.amp, seg_size=args.seg_size
    )
    state = FT.create_finetune_state(jax.random.key(0), config, local_batch=1)
    if args.checkpoint.endswith((".pth", ".pth.tar", ".tar")):
        variables = C.torch_hooknet_to_flax(C.load_torch_file(args.checkpoint))
    else:
        state = C.restore_train_state(args.checkpoint, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    path = serving.export_hooknet_serving(
        state.model, variables, args.out, chunk=args.chunk, size=args.seg_size
    )
    print(f"exported serving artifact -> {path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Export HookNet to StableHLO")
    parser.add_argument("--checkpoint", required=True, help="Orbax dir or torch .pth.tar")
    parser.add_argument("--out", required=True)
    parser.add_argument("-a", "--arch", default="resnet18")
    parser.add_argument("--data-name", default="bcss", choices=["bcss", "paip"])
    parser.add_argument("--chunk", type=int, default=128)
    parser.add_argument("--seg-size", type=int, default=256)
    parser.add_argument("--amp", action="store_true")
    main(parser.parse_args())
