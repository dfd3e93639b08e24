"""Checkpointing: Orbax-native save/resume + torch ``.pth(.tar)`` interop.

Native path (Orbax): the full train state — params, BN stats, optimizer
state, step — saved as ``checkpoint_{epoch:04d}`` directories, mirroring the
reference's file-name contract the recipes glob
(``ssl_train.py:375-387``, ``scripts/bcss.sh:24-34``).

Interop path (torch, CPU-only): one-way converters between the reference's
released PyTorch checkpoints and our Flax pytrees, so fine-tuning can start
from released SSL weights and the evaluator can score released fine-tuned
HookNets (``README.md:25-29``):

  * ``torch_resnet_to_flax``: torchvision ResNet state_dict -> (params,
    batch_stats) for :class:`~msfwsi_tpu.models.resnet.ResNet` (OIHW->HWIO,
    bn weight/bias -> scale/bias, running stats -> batch_stats).
  * ``torch_msfwsi_to_flax``: full MSF-WSI SSL checkpoint (DDP ``module.``
    prefixes, ModuleList projectors/predictors with Sequential indices,
    ``ssl_train.py:376-383``).
  * ``torch_hooknet_to_flax``: smp-based HookNet checkpoints
    (``evaluate.py:122-132``: strip ``module.``; decoder ``blocks.i.convN.0``
    conv / ``.1`` bn; ``segmentation_head.0``).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "save_train_state",
    "restore_train_state",
    "latest_checkpoint",
    "load_torch_file",
    "torch_resnet_to_flax",
    "torch_msfwsi_to_flax",
    "torch_hooknet_to_flax",
]


# --------------------------------------------------------------------------
# Orbax-native checkpoints
# --------------------------------------------------------------------------

def _state_payload(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_train_state(ckpt_dir: str, state, epoch: int, keep_name: str | None = None) -> str:
    """Save as ``<ckpt_dir>/checkpoint_{epoch:04d}`` (or ``keep_name``)."""
    import orbax.checkpoint as ocp

    name = keep_name or f"checkpoint_{epoch:04d}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _state_payload(state), force=True)
    return path


def restore_train_state(path: str, state):
    """Restore a saved payload into ``state`` (same model/optimizer config)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), _state_payload(state))
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    pat = re.compile(r"checkpoint_(\d{4})$")
    best = None
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m:
            if best is None or int(m.group(1)) > best[0]:
                best = (int(m.group(1)), name)
    return os.path.join(ckpt_dir, best[1]) if best else None


# --------------------------------------------------------------------------
# Torch interop
# --------------------------------------------------------------------------

def load_torch_file(path: str) -> dict:
    """Load a torch checkpoint on CPU and return its ``state_dict`` payload
    (torch is used purely as a pickle reader — never in the compute path)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def _strip_prefix(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _set_in(tree: dict, path: tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


def torch_resnet_to_flax(sd: dict, include_fc: bool = False):
    """torchvision ResNet state_dict -> (params, batch_stats) trees matching
    :class:`msfwsi_tpu.models.resnet.ResNet` naming (``layer{i}_{j}`` blocks,
    ``downsample_conv``/``downsample_bn``)."""
    params: dict = {}
    stats: dict = {}

    def handle(flax_path: tuple[str, ...], torch_key: str, value):
        if torch_key.endswith("num_batches_tracked"):
            return
        leaf = torch_key.rsplit(".", 1)[-1]
        if leaf == "weight":
            if value.ndim == 4:  # conv OIHW -> HWIO
                _set_in(params, flax_path + ("kernel",), np.transpose(value, (2, 3, 1, 0)))
            elif value.ndim == 2:  # linear (O, I) -> (I, O)
                _set_in(params, flax_path + ("kernel",), np.transpose(value))
            else:  # bn scale
                _set_in(params, flax_path + ("scale",), value)
        elif leaf == "bias":
            _set_in(params, flax_path + ("bias",), value)
        elif leaf == "running_mean":
            _set_in(stats, flax_path + ("mean",), value)
        elif leaf == "running_var":
            _set_in(stats, flax_path + ("var",), value)

    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] in ("conv1", "bn1"):
            handle((parts[0],), key, value)
        elif parts[0] == "fc":
            if include_fc:
                handle(("fc",), key, value)
        elif parts[0].startswith("layer"):
            block = f"{parts[0]}_{parts[1]}"
            if parts[2] == "downsample":
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                handle((block, sub), key, value)
            else:
                handle((block, parts[2]), key, value)
    return params, stats


_PROJECTOR_SEQ = {"0": "fc1", "1": "bn1", "3": "fc2", "4": "bn2", "6": "fc3", "7": "bn3"}
_PREDICTOR_SEQ = {"0": "fc1", "1": "bn1", "3": "fc2"}


def _torch_mlp_to_flax(sd: dict, seq_map: dict, params: dict, stats: dict, name: str):
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        idx, leaf = key.split(".")
        sub = seq_map[idx]
        if leaf == "weight":
            if value.ndim == 2:
                _set_in(params, (name, sub, "kernel"), np.transpose(value))
            else:
                _set_in(params, (name, sub, "scale"), value)
        elif leaf == "bias":
            _set_in(params, (name, sub, "bias"), value)
        elif leaf == "running_mean":
            _set_in(stats, (name, sub, "mean"), value)
        elif leaf == "running_var":
            _set_in(stats, (name, sub, "var"), value)


def torch_msfwsi_to_flax(sd: dict):
    """MSF-WSI SSL checkpoint -> {"params", "batch_stats"} for
    :class:`~msfwsi_tpu.models.backbone.MSFWSI` (fc excluded, as in the
    finetune surgery ``ssl_finetune.py:153-164``)."""
    if any(k.startswith("module.") for k in sd):
        sd = _strip_prefix(sd, "module.")

    params: dict = {}
    stats: dict = {}
    for enc in ("context_encoder", "target_encoder"):
        enc_sd = _strip_prefix(sd, enc + ".")
        p, s = torch_resnet_to_flax(enc_sd, include_fc=False)
        params[enc] = p
        stats[enc] = s

    for kind, seq_map in (("projector", _PROJECTOR_SEQ), ("predictor", _PREDICTOR_SEQ)):
        for side in ("context", "target", "inter"):
            prefix = f"{side}_{kind}."
            sub_sd = _strip_prefix(sd, prefix)
            indices = sorted({k.split(".")[0] for k in sub_sd}, key=int)
            for i in indices:
                _torch_mlp_to_flax(
                    _strip_prefix(sub_sd, f"{i}."),
                    seq_map,
                    params,
                    stats,
                    f"{side}_{kind}_{i}",
                )
    return {"params": params, "batch_stats": stats}


def _torch_unet_decoder_to_flax(sd: dict, params: dict, stats: dict):
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        # blocks.{i}.conv{n}.{0|1}.{leaf}
        if parts[0] != "blocks":
            continue  # center is Identity for resnet encoders
        block = f"block{parts[1]}"
        convn = parts[2]
        sub = "conv" if parts[3] == "0" else "bn"
        leaf = parts[4]
        path = (block, convn, sub)
        if leaf == "weight":
            if value.ndim == 4:
                _set_in(params, path + ("kernel",), np.transpose(value, (2, 3, 1, 0)))
            else:
                _set_in(params, path + ("scale",), value)
        elif leaf == "bias":
            _set_in(params, path + ("bias",), value)
        elif leaf == "running_mean":
            _set_in(stats, path + ("mean",), value)
        elif leaf == "running_var":
            _set_in(stats, path + ("var",), value)


def torch_hooknet_to_flax(sd: dict):
    """Fine-tuned HookNet checkpoint -> {"params", "batch_stats"} for
    :class:`~msfwsi_tpu.models.hooknet.HookNet`."""
    if any(k.startswith("module.") for k in sd):
        sd = _strip_prefix(sd, "module.")

    params: dict = {}
    stats: dict = {}
    for branch in ("context_branch", "target_branch"):
        bsd = _strip_prefix(sd, branch + ".")
        bp: dict = {}
        bs: dict = {}

        enc_p, enc_s = torch_resnet_to_flax(_strip_prefix(bsd, "encoder."), include_fc=False)
        bp["encoder"], bs["encoder"] = enc_p, enc_s

        dec_p: dict = {}
        dec_s: dict = {}
        _torch_unet_decoder_to_flax(_strip_prefix(bsd, "decoder."), dec_p, dec_s)
        bp["decoder"], bs["decoder"] = dec_p, dec_s

        head_sd = _strip_prefix(bsd, "segmentation_head.")
        hp: dict = {}
        for key, value in head_sd.items():
            idx, leaf = key.split(".")
            if idx != "0":
                continue  # 1 = identity activation / upsample
            if leaf == "weight":
                _set_in(hp, ("conv", "kernel"), np.transpose(value, (2, 3, 1, 0)))
            else:
                _set_in(hp, ("conv", "bias"), value)
        bp["segmentation_head"] = hp

        params[branch] = bp
        stats[branch] = bs
    return {"params": params, "batch_stats": stats}
