"""Jit-compiled view construction: raw uint8 tiles -> SSL / seg batches.

This is the device-side replacement for the reference's per-sample CPU
``__getitem__`` pipelines:

  * :func:`make_ssl_views` == ``BcssPretrainDataset.__getitem__``
    (``src/utils/data/bcss.py:164-182``) + the three albumentations pipelines
    built in ``tools/ssl_train.py:175-217`` — two context views (RRC 224 +
    color aug), two target views (full-res color aug -> 4x4 blockshape ->
    per-sample jigsaw shuffle -> per-tile RRC 224), plus inverse
    permutations.
  * :func:`make_seg_train_views` == ``BcssSegDatasetMS.__getitem__``
    (``bcss.py:39-60``) + ``ssl_finetune.py:198-223``: ColorJitter+HFlip on
    the 1024 context, CenterCrop(256) target, both resized/normalized to 256
    (masks nearest / label-preserving).
  * :func:`make_seg_val_views` == ``ssl_finetune.py:226-253`` /
    ``evaluate.py:151-178``: Resize(256)+Normalize context and
    CenterCrop(256)+Normalize target.

Everything is batched and static-shape; one jit covers aug + model step.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import augment as A
from ..ops.geometry import batched_blockshaped

__all__ = [
    "AugConfig",
    "make_ssl_views",
    "make_seg_train_views",
    "make_seg_val_views",
    "make_seg_val_views_host",
]


@dataclasses.dataclass(frozen=True)
class AugConfig:
    mean: Sequence[float] = (0.485, 0.456, 0.406)
    std: Sequence[float] = (0.229, 0.224, 0.225)
    img_size: int = 224  # SSL view size (--img-sz)
    grid: int = 4  # sqrt(K): 4x4 target tiles  (hardcoded 16 in reference)
    tile_px: int = 256  # sub-tile size pre-RRC (hardcoded in reference)
    seg_size: int = 256  # finetune/eval output size
    rrc_scale: tuple[float, float] = (0.5, 1.0)
    # Augmentation compute dtype. bf16 halves the HBM traffic of the
    # full-resolution color ops — augmentation noise dwarfs bf16 rounding.
    # f32 default keeps unit tests bit-comparable with torch oracles.
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def _to_float(img, dtype=jnp.float32):
    if img.dtype == jnp.uint8:
        return img.astype(dtype) / 255.0
    return img.astype(dtype)


def _context_view(key, x, cfg: AugConfig):
    """context_aug pipeline (``ssl_train.py:175-194``): RRC -> ColorJitter ->
    ToGray -> OneOf(blur/sharpen) -> HFlip -> Normalize.

    The HFlip is folded into the RRC sampling grid (free) instead of a
    separate reversal pass: it commutes exactly with the pixelwise color
    ops and the symmetric blur/sharpen kernels that sit between them."""
    k = jax.random.split(key, 5)
    flip = jax.random.uniform(k[4], (x.shape[0],)) < 0.5
    v = A.random_resized_crop(k[0], x, cfg.img_size, scale=cfg.rrc_scale, flip=flip)
    v = A.color_jitter(k[1], v)
    v = A.to_gray(k[2], v)
    v = A.blur_or_sharpen(k[3], v)
    return A.normalize(v, cfg.mean, cfg.std)


def _target_view(key, x, cfg: AugConfig, shuffle: bool = True):
    """target_aug (color-only, full res) + blockshape + jigsaw shuffle +
    per-tile misc_aug (``ssl_train.py:196-217``, ``bcss.py:171-178``).

    Returns (tiles (B*K, s, s, 3) normalized, reverse_idx (B, K)).

    ``shuffle=False`` keeps the view stack in spatial order and leaves the
    (identical) permutation to the model's feature level — pair with
    ``MSFWSI(views_shuffled=False)``; saves a ~300 MB view permute."""
    B = x.shape[0]
    K = cfg.grid**2
    k = jax.random.split(key, 6)
    t = A.color_jitter(k[0], x)
    t = A.to_gray(k[1], t)
    t = A.blur_or_sharpen(k[2], t)

    tiles = batched_blockshaped(t, cfg.tile_px, cfg.tile_px)  # (B, K, s, s, 3)
    flat = tiles.reshape(B * K, cfg.tile_px, cfg.tile_px, 3)

    # misc_aug RRC + HFlip, with the flip folded into the sampling grid.
    flip = jax.random.uniform(k[5], (flat.shape[0],)) < 0.5
    v = A.random_resized_crop(k[4], flat, cfg.img_size, scale=cfg.rrc_scale, flip=flip)
    v = A.normalize(v, cfg.mean, cfg.std)

    # Jigsaw-shuffle *after* the per-tile aug (iid per tile, so the
    # distribution is identical to the reference's shuffle-then-aug order,
    # bcss.py:171-178) — the gather moves 224^2 views instead of 256^2 tiles.
    perm = jax.vmap(lambda kk: jax.random.permutation(kk, K))(jax.random.split(k[3], B))
    if shuffle:
        v = v.reshape(B, K, cfg.img_size, cfg.img_size, 3)
        v = jnp.take_along_axis(v, perm[:, :, None, None, None], axis=1)
        v = v.reshape(B * K, cfg.img_size, cfg.img_size, 3)
    return v, jnp.argsort(perm, axis=1)


def make_ssl_views(key, tiles_u8, cfg: AugConfig = AugConfig(), shuffle_views: bool = True):
    """Full SSL batch from raw uint8 tiles (B, 1024, 1024, 3).

    Returns the train-step batch dict: two context views (B, s, s, 3), two
    flattened target view stacks (B*K, s, s, 3), two (B, K) inverse jigsaw
    permutations. The default ``shuffle_views=True`` is the reference's
    shuffled-view-stack contract and matches ``MSFWSI``'s default
    ``views_shuffled=True``; pass False only together with
    ``MSFWSI(views_shuffled=False)`` for the feature-level-jigsaw fast path
    (see :func:`_target_view`). The mode is encoded in the target key names
    (``train.ssl.target_keys``), so feeding the batch to a model in the
    other mode raises instead of silently training on scrambled features;
    ``SSLConfig`` wires both sides from its ``shuffle_views`` field.
    """
    from ..train.ssl import target_keys

    x = _to_float(tiles_u8, cfg.dtype)
    kc1, kc2, kt1, kt2 = jax.random.split(key, 4)
    ctx1 = _context_view(kc1, x, cfg)
    ctx2 = _context_view(kc2, x, cfg)
    tgt1, rev1 = _target_view(kt1, x, cfg, shuffle=shuffle_views)
    tgt2, rev2 = _target_view(kt2, x, cfg, shuffle=shuffle_views)
    t1, t2 = target_keys(shuffle_views)
    return {
        "context1": ctx1,
        "context2": ctx2,
        t1: tgt1,
        t2: tgt2,
        "rev1": rev1,
        "rev2": rev2,
    }


def make_seg_train_views(key, imgs_u8, masks, cfg: AugConfig = AugConfig()):
    """Finetune train batch: ((context, target) images, (context, target)
    masks), all (B, 256, 256, ...).

    The reference order (``ssl_finetune.py:198-223``) jitters the full-res
    source, then derives CenterCrop(256) target and Resize(256) context.
    Here the views are derived FIRST and jittered at 256px — 16x fewer
    color-op pixels. Correctness:

      * target: ColorJitter is pixelwise, so it commutes exactly with the
        centered crop; the contrast op's whole-image gray means are taken
        from the context pass (``means=``), not the crop, preserving the
        reference's full-image statistics.
      * context: the brightness/contrast/saturation ops are affine in
        ``(x, gray(x), 1)`` and commute exactly with the linear bilinear
        resize; the hue op and the final clip do not commute with averaging
        (documented deviation — interpolation-order noise, ≤1e-2).
      * contrast means come from the resized context view rather than the
        full-res source (sampled vs exact mean, ≤~1e-3 difference).

    Flip commutes exactly with the centered crop and the half-pixel
    bilinear resize, so NO standalone reversal pass remains anywhere in
    this pipeline: the context image/mask fold the flip into their resample
    grids, the target image folds it into an identity-scale MXU crop matrix
    (the interpolation rows are exact one-hots at integer coordinates, so
    the "resample" IS the crop bit-exactly, and the mirrored column matrix
    is the flip), and the target mask uses a one-pass conditional-mirror
    column gather (int path — exact permutation). ColorJitter is per-pixel
    and commutes with the permutation. Nearest-neighbor rounding does NOT
    commute at tie coordinates, so the context-mask fold uses exact
    ``nearest(flip(x))`` index semantics. (All three target-flip
    formulations measured within noise at b32 on the v5e — 838.5
    where+reverse / 836.1 gather / 840.0 MXU fold pairs/s; the folded form
    is kept for uniformity, closing the round-4 flip residual.)"""
    x = _to_float(imgs_u8, cfg.dtype)
    k_cj, k_flip = jax.random.split(key)
    B = x.shape[0]
    flip = jax.random.uniform(k_flip, (B, 1, 1, 1)) < 0.5

    S0 = cfg.seg_size
    H0 = x.shape[1]
    c0 = jnp.full((x.shape[0],), (H0 - S0) // 2)
    sz = jnp.full((x.shape[0],), S0)
    tgt = A.crop_and_resize_mxu(x, (c0, c0, sz, sz), S0, flip=flip[:, 0, 0, 0])
    tgt_mask = A.center_crop(masks[..., None], cfg.seg_size)[..., 0]

    # Context flip folds into the bilinear resize's column matrix — bit-
    # identical to flipping the output (mirror-symmetric half-pixel grid;
    # ColorJitter is per-pixel and commutes with the permutation), minus
    # the standalone lane-reversal pass (round-4 trace: ~90 GB/s).
    ctx = A.resize_bilinear(x, cfg.seg_size, flip=flip[:, 0, 0, 0])
    ctx_mask = A.resize_nearest(masks[..., None], cfg.seg_size, flip=flip[:, 0, 0, 0])[..., 0]

    jit_params = A._sample_jitter_params(k_cj, B, A.ColorJitterConfig(), x.dtype)
    ctx, means = A.apply_color_jitter(ctx, *jit_params, return_means=True)
    tgt = A.apply_color_jitter(tgt, *jit_params, means=means)

    # Target-mask flip: one-pass conditional-mirror column gather (exact
    # permutation; the int mask has no resample matrix to fold into).
    S = tgt.shape[1]
    ar = jnp.arange(S)
    cols = jnp.where(flip[:, 0, 0], S - 1 - ar, ar)  # (B, S)
    tgt_mask = jnp.take_along_axis(tgt_mask, cols[:, None, :], axis=2)

    ctx = A.normalize(ctx, cfg.mean, cfg.std)
    tgt = A.normalize(tgt, cfg.mean, cfg.std)
    return (ctx, tgt), (ctx_mask.astype(jnp.int32), tgt_mask.astype(jnp.int32))


def _resize_u8_host_np(img: "np.ndarray", out: int) -> "np.ndarray":
    """Numpy fallback for the host uint8 bilinear resize: the same 2-tap
    half-pixel sampling as :func:`ops.augment.resize_bilinear` (== cv2
    INTER_LINEAR within the augment-oracle bounds), rounded back to uint8
    the way cv2's uint8 path rounds."""
    import numpy as np

    def taps(src, dst):
        x = (np.arange(dst) + 0.5) * src / dst - 0.5
        lo = np.clip(np.floor(x).astype(np.int64), 0, src - 1)
        hi = np.clip(lo + 1, 0, src - 1)
        return lo, hi, (x - np.floor(x)).astype(np.float32)

    H, W = img.shape[0], img.shape[1]
    ylo, yhi, yf = taps(H, out)
    xlo, xhi, xf = taps(W, out)
    x = img.astype(np.float32)
    rows = x[ylo] * (1.0 - yf)[:, None, None] + x[yhi] * yf[:, None, None]
    cols = rows[:, xlo] * (1.0 - xf)[None, :, None] + rows[:, xhi] * xf[None, :, None]
    # Round half UP like cv2's fixed-point uint8 path ((v + (1<<(b-1))) >> b);
    # np.round's half-to-even would differ by 1 on exact .5 ties, which 2-tap
    # bilinear hits systematically at dyadic fractions on integer inputs.
    return np.clip(np.floor(cols + 0.5), 0, 255).astype(np.uint8)


def make_seg_val_views_host(imgs_u8, masks, cfg: AugConfig = AugConfig(), num_threads: int = 8):
    """Host-side uint8 eval pre-views: cv2 ``Resize(256)`` on uint8 for the
    context + CenterCrop slices for the target — the reference's literal
    CPU pipeline (``/root/reference/tools/evaluate.py:151-178``: albu
    Resize/CenterCrop run on uint8 via cv2, THEN Normalize). Normalization
    stays on device (:func:`train.evaluate.make_chunk_stats_hostviews`).

    Returns ``(ctx_u8 (T,s,s,3), tgt_u8 (T,s,s,3), tgt_mask (T,s,s) int32)``
    numpy arrays.

    Why host: through the axon tunnel H2D runs at ~50 MB/s regardless of
    transfer size (``tools/diag/h2d_size_probe.py``), so shipping 256px
    uint8 views instead of full 1024px tiles is ~10x fewer bytes and turns
    an ~8 s/slide upload into <1 s. On a direct-attached host either path
    is cheap — pick with ``--val-views``. cv2 releases the GIL, so the
    per-tile resizes thread; without cv2 a numpy 2-tap fallback (same
    sampling grid) is used.
    """
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    try:
        import cv2

        def resize_one(im):
            return cv2.resize(im, (cfg.seg_size, cfg.seg_size), interpolation=cv2.INTER_LINEAR)

    except ImportError:

        def resize_one(im):
            return _resize_u8_host_np(im, cfg.seg_size)

    imgs_u8 = np.ascontiguousarray(imgs_u8)
    masks = np.ascontiguousarray(masks)
    with ThreadPoolExecutor(num_threads) as pool:
        ctx = np.stack(list(pool.map(resize_one, imgs_u8)))
    H, W = imgs_u8.shape[1], imgs_u8.shape[2]
    y0, x0 = (H - cfg.seg_size) // 2, (W - cfg.seg_size) // 2
    tgt = imgs_u8[:, y0 : y0 + cfg.seg_size, x0 : x0 + cfg.seg_size]
    tmask = masks[:, y0 : y0 + cfg.seg_size, x0 : x0 + cfg.seg_size].astype(np.int32)
    return ctx, tgt, tmask


def make_seg_val_views(imgs_u8, masks, cfg: AugConfig = AugConfig()):
    """Eval batch: deterministic Resize(256) context + CenterCrop(256) target
    (``evaluate.py:151-178``)."""
    x = _to_float(imgs_u8, cfg.dtype)
    ctx = A.normalize(A.resize_bilinear(x, cfg.seg_size), cfg.mean, cfg.std)
    ctx_mask = A.resize_nearest(masks[..., None], cfg.seg_size)[..., 0]
    tgt = A.normalize(A.center_crop(x, cfg.seg_size), cfg.mean, cfg.std)
    tgt_mask = A.center_crop(masks[..., None], cfg.seg_size)[..., 0]
    return (ctx, tgt), (ctx_mask.astype(jnp.int32), tgt_mask.astype(jnp.int32))
