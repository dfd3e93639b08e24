"""ImageNet encoder bootstrap: locate (or fetch) torchvision ResNet weights.

The reference always builds its encoders with ``pretrained=True``
(``src/models/backbone.py:58-63``), downloading torchvision checkpoints via
torch.hub (``src/models/resnet.py:262-275``). This module restores that
default behavior in environments with or without network access.

Resolution order for an architecture (e.g. ``resnet18``):
  1. an explicit local path (``--imagenet-weights /path/file.pth``);
  2. a file named ``<arch>.pth`` or ``<arch>-*.pth`` in, in order:
     ``$MSFWSI_IMAGENET_DIR``, ``~/.cache/msfwsi_tpu``, ``<repo>/weights``,
     and the torch.hub cache ``~/.cache/torch/hub/checkpoints``;
  3. a download from the torchvision URL (the same URL table the reference
     uses) into ``~/.cache/msfwsi_tpu``.

Returns ``None`` when nothing is found — callers fall back to random init
and must log loudly, since that deviates from the published training setup.
"""

from __future__ import annotations

import os
import urllib.request

__all__ = ["MODEL_URLS", "resolve_imagenet_weights", "search_dirs"]

# torchvision ImageNet checkpoint URLs — constant table mirrored from the
# reference (``src/models/resnet.py:12-22``), which loads them via torch.hub.
MODEL_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-f37072fd.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-b627a593.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-0676ba61.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-63fe2227.pth",
    "resnet152": "https://download.pytorch.org/models/resnet152-394f9c45.pth",
    "resnext50_32x4d": "https://download.pytorch.org/models/resnext50_32x4d-7cdf4587.pth",
    "resnext101_32x8d": "https://download.pytorch.org/models/resnext101_32x8d-8ba56ff5.pth",
    "wide_resnet50_2": "https://download.pytorch.org/models/wide_resnet50_2-95faca4d.pth",
    "wide_resnet101_2": "https://download.pytorch.org/models/wide_resnet101_2-32ee1156.pth",
}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def search_dirs() -> list[str]:
    dirs = []
    if os.environ.get("MSFWSI_IMAGENET_DIR"):
        dirs.append(os.environ["MSFWSI_IMAGENET_DIR"])
    dirs.append(os.path.expanduser("~/.cache/msfwsi_tpu"))
    dirs.append(os.path.join(_REPO_ROOT, "weights"))
    dirs.append(os.path.expanduser("~/.cache/torch/hub/checkpoints"))
    return dirs


def _find_local(arch: str) -> str | None:
    for d in search_dirs():
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name == f"{arch}.pth" or (
                name.startswith(f"{arch}-") and name.endswith(".pth")
            ):
                return os.path.join(d, name)
    return None


def _download(arch: str, timeout: float = 30.0) -> str | None:
    url = MODEL_URLS.get(arch)
    if url is None:
        return None
    cache = os.path.expanduser("~/.cache/msfwsi_tpu")
    os.makedirs(cache, exist_ok=True)
    dest = os.path.join(cache, os.path.basename(url))
    # Per-process temp name: concurrent downloaders (e.g. multiple hosts on
    # a shared filesystem) interleaving one .part file could os.replace a
    # corrupt blob into the cache; distinct temps make the replace atomic
    # whoever finishes last.
    tmp = f"{dest}.{os.getpid()}.part"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dest)
        return dest
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
        return None


def resolve_imagenet_weights(arch: str, explicit: str = "") -> str | None:
    """Resolve a local path to torchvision ImageNet weights for ``arch``.

    ``explicit`` short-circuits the search; a non-empty explicit path that
    does not exist raises (a silently ignored user-supplied path would be
    worse than failing).
    """
    if explicit:
        if not os.path.exists(explicit):
            raise FileNotFoundError(f"--imagenet-weights file not found: {explicit}")
        return explicit
    found = _find_local(arch)
    if found is not None:
        return found
    return _download(arch)
