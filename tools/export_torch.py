"""Export an Orbax checkpoint to a reference-format PyTorch ``.pth.tar``.

Reverse interop: SSL checkpoints trained here can be consumed by the
reference's ``tools/ssl_finetune.py`` surgery, and fine-tuned HookNets by
its ``tools/evaluate.py``.

Usage:
  python tools/export_torch.py --kind ssl --arch resnet18 --scale 4 \
      --checkpoint logs/run/checkpoint_0299 --out checkpoint_0299.pth.tar
  python tools/export_torch.py --kind hooknet --arch resnet18 --classes 6 \
      --checkpoint logs/ft/best_ft_model --out best_ft_model.pth.tar
"""

import argparse

import _common  # noqa: F401


def main(args):
    import jax

    from msfwsi_tpu.train import checkpoint as C

    if args.kind == "ssl":
        from msfwsi_tpu.train import ssl as S

        config = S.SSLConfig(
            arch=args.arch, scale=args.scale, mask_ratio=args.mask_ratio, amp=False
        )
        state = S.create_ssl_state(jax.random.key(0), config)
        state = C.restore_train_state(args.checkpoint, state)
        sd = C.flax_msfwsi_to_torch(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
    else:
        from msfwsi_tpu.train import finetune as FT

        class_names = tuple(f"c{i}" for i in range(args.classes - 1))
        config = FT.FinetuneConfig(arch=args.arch, class_names=class_names, amp=False)
        state = FT.create_finetune_state(jax.random.key(0), config, local_batch=1)
        state = C.restore_train_state(args.checkpoint, state)
        sd = C.flax_hooknet_to_torch(
            {"params": state.params, "batch_stats": state.batch_stats}
        )

    C.save_torch_file(args.out, sd, epoch=int(state.step), arch=args.arch)
    print(f"exported {args.kind} checkpoint -> {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Export Orbax checkpoint to .pth.tar")
    parser.add_argument("--kind", choices=["ssl", "hooknet"], required=True)
    parser.add_argument("--checkpoint", required=True, help="Orbax checkpoint dir")
    parser.add_argument("--out", required=True, help="output .pth.tar path")
    parser.add_argument("-a", "--arch", default="resnet18")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--mask_ratio", type=int, default=50)
    parser.add_argument("--classes", type=int, default=6, help="hooknet: classes incl. bg")
    main(parser.parse_args())
