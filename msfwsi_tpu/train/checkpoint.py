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
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "save_train_state",
    "restore_train_state",
    "wait_for_saves",
    "latest_checkpoint",
    "resolve_checkpoint_arg",
    "load_torch_file",
    "torch_resnet_to_flax",
    "torch_msfwsi_to_flax",
    "torch_hooknet_to_flax",
    "flax_resnet_to_torch",
    "flax_msfwsi_to_torch",
    "flax_hooknet_to_torch",
    "save_torch_file",
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


_checkpointer = None


def _get_checkpointer():
    """Process-wide Orbax ``StandardCheckpointer`` (an ``AsyncCheckpointer``:
    ``save`` returns once values are snapshotted to host; serialization runs
    in background threads, overlapping checkpoint IO with the next training
    epochs — the reference's ``torch.save`` blocks the loop instead,
    ``ssl_train.py:375-387``). Consecutive saves self-serialize (Orbax waits
    for the in-flight save); readers must call :func:`wait_for_saves`."""
    global _checkpointer
    if _checkpointer is None:
        import atexit

        import orbax.checkpoint as ocp

        _checkpointer = ocp.StandardCheckpointer()
        # Don't let a CLI process exit with a half-written checkpoint.
        atexit.register(_checkpointer.wait_until_finished)
    return _checkpointer


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint saves are durable."""
    if _checkpointer is not None:
        _checkpointer.wait_until_finished()


def save_train_state(
    ckpt_dir: str, state, epoch: int, keep_name: str | None = None, block: bool = False
) -> str:
    """Save as ``<ckpt_dir>/checkpoint_{epoch:04d}`` (or ``keep_name``).

    Asynchronous by default: returns after the device->host snapshot, with
    directory finalization in the background (``block=True`` to wait)."""
    name = keep_name or f"checkpoint_{epoch:04d}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = _get_checkpointer()
    # Fetch the whole payload to host up front: jax.device_get issues
    # copy_to_host_async on every leaf before converting, pipelining the
    # device->host transfers (~20x a per-array synchronous fetch through
    # the tunneled axon backend). Orbax then serializes pure host arrays,
    # so the async write needs no further device access.
    payload = jax.device_get(_state_payload(state))
    ckptr.save(path, payload, force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, state):
    """Restore a saved payload into ``state`` (same model/optimizer config)."""
    wait_for_saves()  # a just-saved checkpoint may still be finalizing
    ckptr = _get_checkpointer()
    restored = ckptr.restore(os.path.abspath(path), _state_payload(state))
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def resolve_checkpoint_arg(path: str) -> str | None:
    """Resolve a user-supplied checkpoint path, accepting the reference's
    naming. The published recipes pass ``checkpoint_NNNN.pth.tar`` /
    ``best_ft_model.pth.tar`` (``scripts/bcss.sh:24-34``); our trainer writes
    Orbax directories named ``checkpoint_NNNN`` / ``best_ft_model``. So a
    verbatim reference recipe line resolves as:

      1. ``path`` exists (dir or file) -> use as-is;
      2. ``path`` ends in ``.pth.tar``/``.pth`` and the stem exists as an
         Orbax dir -> use the dir (the recipe's glob-name, our format);
      3. otherwise ``None``.
    """
    if os.path.exists(path):
        return path
    for suffix in (".pth.tar", ".pth"):
        if path.endswith(suffix):
            stem = path[: -len(suffix)]
            if os.path.isdir(stem):
                return stem
    return None


def latest_checkpoint(ckpt_dir: str) -> str | None:
    wait_for_saves()  # async saves rename into place only at finalization
    if not os.path.isdir(ckpt_dir):
        return None
    # \d{4,}: the name template {epoch:04d} widens past epoch 9999 —
    # \d{4}$ would silently resume from checkpoint_9999 forever.
    pat = re.compile(r"checkpoint_(\d{4,})$")
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


# --------------------------------------------------------------------------
# Torch export (reverse interop: train here, evaluate with the reference)
# --------------------------------------------------------------------------

def _flat_items(tree, prefix=""):
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flat_items(v, path)
        else:
            yield path, np.asarray(v)


def flax_resnet_to_torch(params: dict, stats: dict) -> dict:
    """Inverse of :func:`torch_resnet_to_flax`: emit torchvision-layout keys
    (``layer{i}.{j}.…``, ``downsample.0/1``, HWIO->OIHW)."""
    out: dict = {}

    def torch_key(path: str) -> str:
        parts = path.split(".")
        head = parts[0]
        if head.startswith("layer"):
            stage, block = head.rsplit("_", 1)
            rest = parts[1:]
            if rest[0] == "downsample_conv":
                rest[0] = "downsample.0"
            elif rest[0] == "downsample_bn":
                rest[0] = "downsample.1"
            return ".".join([stage, block, *rest])
        return path

    for path, value in _flat_items(params):
        key = torch_key(path)
        mod, leaf = key.rsplit(".", 1)
        if leaf == "kernel":
            if value.ndim == 4:
                out[f"{mod}.weight"] = np.transpose(value, (3, 2, 0, 1))
            else:
                out[f"{mod}.weight"] = np.transpose(value)
        elif leaf == "scale":
            out[f"{mod}.weight"] = value
        elif leaf == "bias":
            out[f"{mod}.bias"] = value
    for path, value in _flat_items(stats):
        key = torch_key(path)
        mod, leaf = key.rsplit(".", 1)
        out[f"{mod}.running_mean" if leaf == "mean" else f"{mod}.running_var"] = value
    return out


_PROJECTOR_SEQ_INV = {v: k for k, v in _PROJECTOR_SEQ.items()}
_PREDICTOR_SEQ_INV = {v: k for k, v in _PREDICTOR_SEQ.items()}


def _flax_mlp_to_torch(params: dict, stats: dict, seq_inv: dict, out: dict, prefix: str):
    for path, value in _flat_items(params):
        sub, leaf = path.split(".")
        idx = seq_inv[sub]
        if leaf == "kernel":
            out[f"{prefix}.{idx}.weight"] = np.transpose(value)
        elif leaf == "scale":
            out[f"{prefix}.{idx}.weight"] = value
        elif leaf == "bias":
            out[f"{prefix}.{idx}.bias"] = value
    for path, value in _flat_items(stats):
        sub, leaf = path.split(".")
        idx = seq_inv[sub]
        out[f"{prefix}.{idx}.running_mean" if leaf == "mean" else f"{prefix}.{idx}.running_var"] = value


def flax_msfwsi_to_torch(variables: dict, ddp_prefix: bool = True) -> dict:
    """MSFWSI Flax variables -> reference-format state_dict (optionally with
    the DDP ``module.`` prefix, as ``torch.save`` wrote it,
    ``ssl_train.py:376-383``). Consumable by the reference's finetune
    surgery (``ssl_finetune.py:146-172``)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: dict = {}
    for enc in ("context_encoder", "target_encoder"):
        for k, v in flax_resnet_to_torch(params[enc], stats[enc]).items():
            out[f"{enc}.{k}"] = v
    for name in params:
        if "projector" in name or "predictor" in name:
            side_kind, idx = name.rsplit("_", 1)
            seq_inv = _PROJECTOR_SEQ_INV if "projector" in name else _PREDICTOR_SEQ_INV
            _flax_mlp_to_torch(
                params[name], stats.get(name, {}), seq_inv, out, f"{side_kind}.{idx}"
            )
    if ddp_prefix:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def flax_hooknet_to_torch(variables: dict, ddp_prefix: bool = True) -> dict:
    """HookNet Flax variables -> reference/smp-format state_dict
    (``context_branch.encoder…``, ``decoder.blocks.i.convN.0/1``,
    ``segmentation_head.0``)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: dict = {}
    for branch in ("context_branch", "target_branch"):
        for k, v in flax_resnet_to_torch(
            params[branch]["encoder"], stats[branch]["encoder"]
        ).items():
            out[f"{branch}.encoder.{k}"] = v
        dec_p = params[branch]["decoder"]
        dec_s = stats[branch]["decoder"]
        for block_name in dec_p:
            i = block_name[len("block"):]
            for convn in dec_p[block_name]:
                sub_p = dec_p[block_name][convn]
                sub_s = dec_s[block_name][convn]
                pre = f"{branch}.decoder.blocks.{i}.{convn}"
                out[f"{pre}.0.weight"] = np.transpose(sub_p["conv"]["kernel"], (3, 2, 0, 1))
                out[f"{pre}.1.weight"] = np.asarray(sub_p["bn"]["scale"])
                out[f"{pre}.1.bias"] = np.asarray(sub_p["bn"]["bias"])
                out[f"{pre}.1.running_mean"] = np.asarray(sub_s["bn"]["mean"])
                out[f"{pre}.1.running_var"] = np.asarray(sub_s["bn"]["var"])
        head = params[branch]["segmentation_head"]["conv"]
        out[f"{branch}.segmentation_head.0.weight"] = np.transpose(
            head["kernel"], (3, 2, 0, 1)
        )
        out[f"{branch}.segmentation_head.0.bias"] = np.asarray(head["bias"])
    if ddp_prefix:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def save_torch_file(path: str, state_dict: dict, epoch: int = 0, arch: str = "resnet18"):
    """Write a reference-format ``.pth.tar`` payload (``ssl_train.py:376-383``
    keys; optimizer/scaler omitted — the reference only reads state_dict on
    the consume paths)."""
    import torch

    payload = {
        "epoch": epoch,
        "arch": arch,
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()},
    }
    torch.save(payload, path)
    return path
