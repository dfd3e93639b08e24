"""Tile embedding extraction from a pretrained MSFWSI SSL model.

The reference has no feature-export path at all — its encoders can only be
consumed by continuing to train (``tools/ssl_finetune.py`` surgery) even
though exporting tile embeddings is the standard downstream use of an SSL
WSI model (MIL aggregation, retrieval, clustering, linear probes). This
module adds it on the same chunked, transfer-minimal datapath as
validation/prediction.

What is extracted, per source tile (the SSL model's own two branches,
``/root/reference/src/models/backbone.py:129-158``):

* ``"context"`` — the whole tile resized to the SSL input size (224) through
  the context encoder: 4 avg-pooled stage features ``(C1..C4)``
  (``resnet.py:244-256``; r18: 64/128/256/512).
* ``"target"`` — the tile cut into the K = scale^2 sub-tiles (the reference's
  ``blockshaped`` grid, spatial order, no jigsaw — extraction is
  deterministic), each resized to the SSL input size through the target
  encoder: per-scale ``(K, C_i)`` feature stacks.

Views are deterministic (plain bilinear resize + Normalize — the aug-free
analog of the SSL pipeline) and built on device inside the same jit as the
encoder forward: uploading the raw uint8 tile (H*W*3 bytes) is no more
traffic than prebuilt views here ((K+1)*224^2*3), unlike the eval path
where host views win 10x.

Features leave the device as float16 by default (pooled post-ReLU
activations; halves D2H bytes through slow links) with one blocking fetch
per slide (``predict.predict_slide``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..models.backbone import MSFWSI
from ..ops import augment as A
from ..ops.geometry import batched_blockshaped
from .predict import _shard

__all__ = ["BRANCHES", "make_chunk_features", "feature_spec"]

BRANCHES = ("context", "target")


def _check(branches, scales):
    branches = tuple(branches)
    scales = tuple(int(s) for s in scales)
    if not branches or any(b not in BRANCHES for b in branches):
        raise ValueError(f"branches must be a non-empty subset of {BRANCHES}, got {branches!r}")
    if not scales or any(s not in (1, 2, 3, 4) for s in scales):
        raise ValueError(f"scales are 1-indexed encoder stages in 1..4, got {scales!r}")
    return branches, scales


def feature_spec(model: MSFWSI, branches=BRANCHES, scales=(1, 2, 3, 4)):
    """The flat output layout of :func:`make_chunk_features`: a list of
    ``(branch, stage, channels)`` in output order (branch-major, stages
    ascending). Channel counts derive from the encoder block expansion
    (``models/resnet.feature_dims`` — correct for Bottleneck archs too,
    unlike the reference's hardcode, ``backbone.py:67``)."""
    from ..models.resnet import feature_dims

    branches, scales = _check(branches, scales)
    dims = feature_dims(model.arch)
    return [(b, s, dims[s - 1]) for b in branches for s in scales]


def make_chunk_features(
    model: MSFWSI,
    cfg=None,
    branches: Sequence[str] = BRANCHES,
    scales: Sequence[int] = (1, 2, 3, 4),
    mesh=None,
    out_dtype=jnp.float16,
):
    """Jitted embedding extraction over one chunk of raw uint8 tiles.

    Returns ``(variables, tiles_u8 (B, T, T, 3)) -> tuple`` of feature
    arrays in :func:`feature_spec` order: ``(B, C_i)`` for context entries,
    ``(B, K, C_i)`` for target entries (K sub-tiles in spatial row-major
    order). ``variables`` needs only the requested branch encoders'
    params/batch_stats — the SSL heads are never touched, so checkpoints
    can be pruned before upload (r50 fuser heads are ~1.6B params).
    """
    from ..data.pipeline import AugConfig, _to_float

    cfg = cfg or AugConfig()
    branches, scales = _check(branches, scales)

    def features_impl(variables, tiles_u8):
        B = tiles_u8.shape[0]
        x = _to_float(tiles_u8, cfg.dtype)
        out = []
        if "context" in branches:
            ctx = A.normalize(A.resize_bilinear(x, cfg.img_size), cfg.mean, cfg.std)
            feats = model.apply(variables, ctx, train=False, method=MSFWSI.encode_context)
            out += [feats[s - 1].astype(out_dtype) for s in scales]
        if "target" in branches:
            if x.shape[1] % model.scale or x.shape[2] % model.scale:
                raise ValueError(
                    f"tile size {x.shape[1]}x{x.shape[2]} is not divisible by "
                    f"--scale {model.scale} (sub-tile grid)"
                )
            sub = batched_blockshaped(x, x.shape[1] // model.scale, x.shape[2] // model.scale)
            sub = sub.reshape(B * model.K, *sub.shape[2:])
            tgt = A.normalize(A.resize_bilinear(sub, cfg.img_size), cfg.mean, cfg.std)
            feats = model.apply(variables, tgt, train=False, method=MSFWSI.encode_target)
            out += [feats[s - 1].reshape(B, model.K, -1).astype(out_dtype) for s in scales]
        return tuple(out)

    n_out = len(branches) * len(scales)
    return _shard(features_impl, mesh, n_in_data=1, n_out=n_out)
