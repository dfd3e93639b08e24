"""On-device, batched, jit-compiled image augmentation.

The reference runs ~36 albumentations ``Compose`` invocations per sample on
CPU dataloader workers (2 context + 2 target pipelines + 2x16 per-tile RRCs,
``tools/ssl_train.py:175-217``, ``src/utils/data/bcss.py:164-182``) — its
main throughput bottleneck (SURVEY §3.1). Here the entire pipeline runs on
TPU inside one jit: uint8 tile batches stream to HBM and every view is
produced with vectorized, static-shape ops:

  * RandomResizedCrop: the torchvision/albumentations 10-attempt area/ratio
    sampling, fully vectorized (all 10 candidates sampled at once, first
    valid selected, center-crop fallback) + separable 2-tap gather-based
    bilinear resampling (VPU-friendly; no dynamic shapes).
  * ColorJitter (brightness/contrast/saturation/hue in per-sample random
    order), ToGray, GaussianBlur (per-sample sigma, 23-tap separable conv,
    REFLECT_101 padding) / Sharpen OneOf, HFlip, Normalize.

Convention: images are float32 in [0, 1], NHWC. ``normalize`` emits
(x - mean)/std matching albu ``Normalize(max_pixel_value=255)`` on uint8
inputs scaled by 1/255. All randomness from explicit ``jax.random`` keys —
reproducible across hosts (the deterministic-shared-seed replacement for
``broadcast_object_list``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ColorJitterConfig",
    "rgb_to_grayscale",
    "color_jitter",
    "apply_color_jitter",
    "to_gray",
    "gaussian_blur",
    "sharpen",
    "blur_or_sharpen",
    "hflip",
    "normalize",
    "denormalize",
    "sample_rrc_boxes",
    "crop_and_resize",
    "random_resized_crop",
    "center_crop",
    "resize_bilinear",
    "resize_nearest",
]

# --------------------------------------------------------------------------
# Color ops
# --------------------------------------------------------------------------

# torchvision rgb_to_grayscale weights (albumentations mirrors torchvision in
# ColorJitter; ToGray uses the cv2 0.299/0.587/0.114 triple — the difference
# is < 1e-3 and irrelevant for augmentation). Kept as a plain numpy array:
# a module-level jnp constant would initialize the JAX backend at import
# time, silently defeating the post-import force-CPU pattern this repo
# relies on (tools/_common.py, tests/conftest.py).
_GRAY_WEIGHTS = np.asarray([0.299, 0.587, 0.114])


def rgb_to_grayscale(img, keepdims: bool = True):
    g = jnp.tensordot(img, _GRAY_WEIGHTS.astype(img.dtype), axes=[[-1], [0]])
    return g[..., None] if keepdims else g


def _blend(a, b, f):
    """f*a + (1-f)*b, clipped to [0,1]; f broadcast per sample."""
    return jnp.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    """Branchless, continuous HSV->RGB (the "K-formula", as in kornia).

    Each channel is ``v - v*s*clip(min(k, 4-k), 0, 1)`` with
    ``k = (n + 6h) mod 6`` — a continuous, 1-periodic, piecewise-linear
    function of ``h``, algebraically identical to the classic
    sextant-branch formulation (floor(6h) + p/q/t selects) in exact
    arithmetic. The branch form is NOT safe under XLA fusion: when a
    fusion rematerializes ``h`` twice with different FMA contraction, the
    sextant index ``floor(6h)`` and the fraction ``6h - i`` can come from
    *different* roundings, and near the %1 wrap that mismatch produced
    O(1) per-pixel color errors (observed on XLA:CPU in the fully fused
    aug+train step). The K-formula is Lipschitz in all inputs, so
    duplicated evaluation costs at most a few ulps."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = h * 6.0

    def chan(n):
        k = (n + h6) % 6.0
        w = jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
        return v - v * s * w

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


@dataclasses.dataclass(frozen=True)
class ColorJitterConfig:
    brightness: float = 0.4
    contrast: float = 0.4
    saturation: float = 0.4
    hue: float = 0.1
    p: float = 0.8


def _sample_jitter_params(key, B, cfg: ColorJitterConfig, dt):
    k_apply, k_b, k_c, k_s, k_h, k_ord = jax.random.split(key, 6)
    fb = jax.random.uniform(
        k_b, (B, 1, 1, 1), minval=max(0.0, 1 - cfg.brightness), maxval=1 + cfg.brightness
    ).astype(dt)
    fc = jax.random.uniform(
        k_c, (B, 1, 1, 1), minval=max(0.0, 1 - cfg.contrast), maxval=1 + cfg.contrast
    ).astype(dt)
    fs = jax.random.uniform(
        k_s, (B, 1, 1, 1), minval=max(0.0, 1 - cfg.saturation), maxval=1 + cfg.saturation
    ).astype(dt)
    fh = jax.random.uniform(k_h, (B, 1, 1), minval=-cfg.hue, maxval=cfg.hue).astype(dt)
    perm = jax.vmap(lambda k: jax.random.permutation(k, 4))(jax.random.split(k_ord, B))
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < cfg.p
    return fb, fc, fs, fh, perm, apply


def _apply_hue(x, fh):
    hsv = _rgb_to_hsv(x)
    h = (hsv[..., 0] + fh) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(key, img, cfg: ColorJitterConfig = ColorJitterConfig(), method: str = "fused"):
    """Per-sample ColorJitter in random op order, applied with prob ``cfg.p``
    (``ssl_train.py:177``: ColorJitter(0.4,0.4,0.4,0.1, p=0.8)).

    ``method="fused"`` (default, TPU-fast): brightness/contrast/saturation
    are affine maps of ``(x, gray(x), 1)`` — with gray linear and idempotent,
    their composition in *any* order is exactly ``a*x + b*gray(x) + c`` with
    per-sample scalar coefficients (contrast's gray-mean reduces to scalar
    algebra on the input mean). The pipeline becomes affine-before-hue ->
    hue -> affine-after-hue -> clip: 3 image passes instead of 16. The only
    difference vs the sequential reference is that intermediate clipping is
    deferred to the end (albu clips per op in uint8); when no intermediate
    clip binds the two methods agree exactly (tested).

    ``method="sequential"`` applies the four ops literally, clipping each.
    """
    B = img.shape[0]
    dt = img.dtype
    fb, fc, fs, fh, perm, apply = _sample_jitter_params(key, B, cfg, dt)
    return apply_color_jitter(img, fb, fc, fs, fh, perm, apply, method=method)


def apply_color_jitter(
    img, fb, fc, fs, fh, perm, apply, method: str = "fused",
    means=None, return_means: bool = False,
):
    """:func:`color_jitter` with injected per-sample parameters (the oracle
    tests drive this directly with chosen factors). Shapes: fb/fc/fs/apply
    (B,1,1,1), fh (B,1,1), perm (B,4) with op ids 0=brightness 1=contrast
    2=saturation 3=hue.

    ``means``/``return_means`` (fused method only): the contrast op blends
    with the *image-wide* gray mean — once before the hue op (``mg``) and
    once after (``mg2``). ``return_means=True`` additionally returns the
    ``(mg, mg2)`` pair this image produced; ``means=(mg, mg2)`` substitutes
    externally supplied means instead. This lets a cropped/resized view be
    jittered with the statistics of its *source* image (the reference
    jitters the full-resolution source and derives views afterwards — the
    pixelwise ops commute with crop/resize, only the contrast means carry
    whole-image information)."""
    B = img.shape[0]
    dt = img.dtype
    if means is not None or return_means:
        assert method == "fused", "injected means require the fused method"

    if method == "sequential":
        def op_brightness(x):
            return jnp.clip(x * fb, 0.0, 1.0)

        def op_contrast(x):
            mean = jnp.mean(
                rgb_to_grayscale(x), axis=(1, 2, 3), keepdims=True, dtype=jnp.float32
            ).astype(x.dtype)
            return _blend(x, mean, fc)

        def op_saturation(x):
            return _blend(x, rgb_to_grayscale(x), fs)

        ops = [op_brightness, op_contrast, op_saturation, lambda x: _apply_hue(x, fh)]
        out = img
        for r in range(4):
            which = perm[:, r][:, None, None, None]
            # Chained jnp.where selects (pure elementwise, fused on the VPU)
            # — never stack+gather, which serializes on TPU.
            sel = ops[3](out)
            for idx in (2, 1, 0):
                sel = jnp.where(which == idx, ops[idx](out), sel)
            out = sel
        return jnp.where(apply, out, img)

    # ---- fused affine composition -------------------------------------
    def compose_affine(active, a, b, c, mg):
        """One composition round: where ``active``, apply op perm[:, r] to the
        running affine (a*x + b*g + c); gray of that state is (a+b)*g + c and
        its mean is (a+b)*mg + c."""
        a2b, b2b = fb * a, fb * b
        c2b = fb * c
        a2s = fs * a
        b2s = fs * b + (1.0 - fs) * (a + b)
        c2s = c  # fs*c + (1-fs)*c
        mean_cur = (a + b) * mg + c
        a2c, b2c = fc * a, fc * b
        c2c = fc * c + (1.0 - fc) * mean_cur

        def sel(op_id, vb, vs, vc, orig):
            out = orig  # hue or inactive: affine unchanged
            out = jnp.where(active & (op_id == 0), vb, out)
            out = jnp.where(active & (op_id == 1), vc, out)
            out = jnp.where(active & (op_id == 2), vs, out)
            return out

        return sel, (a2b, a2s, a2c), (b2b, b2s, b2c), (c2b, c2s, c2c)

    g = rgb_to_grayscale(img)
    if means is not None:
        mg = means[0]
    else:
        mg = jnp.mean(g, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32).astype(dt)

    hue_pos = jnp.argmax(perm == 3, axis=1)[:, None, None, None]  # (B,1,1,1)

    def run_segment(before: bool, mg_seg):
        a = jnp.ones((B, 1, 1, 1), dt)
        b = jnp.zeros((B, 1, 1, 1), dt)
        c = jnp.zeros((B, 1, 1, 1), dt)
        for r in range(4):
            op_id = perm[:, r][:, None, None, None]
            active = (jnp.full_like(op_id, r) < hue_pos) if before else (
                jnp.full_like(op_id, r) > hue_pos
            )
            sel, aa, bb, cc = compose_affine(active, a, b, c, mg_seg)
            a = sel(op_id, aa[0], aa[1], aa[2], a)
            b = sel(op_id, bb[0], bb[1], bb[2], b)
            c = sel(op_id, cc[0], cc[1], cc[2], c)
        return a, b, c

    a1, b1, c1 = run_segment(True, mg)
    y = a1 * img + b1 * g + c1
    z = _apply_hue(jnp.clip(y, 0.0, 1.0), fh)
    g2 = rgb_to_grayscale(z)
    if means is not None:
        mg2 = means[1]
    else:
        mg2 = jnp.mean(g2, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32).astype(dt)
    a2, b2, c2 = run_segment(False, mg2)
    out = jnp.clip(a2 * z + b2 * g2 + c2, 0.0, 1.0)
    out = jnp.where(apply, out, img)
    if return_means:
        return out, (mg, mg2)
    return out


def to_gray(key, img, p: float = 0.2):
    """albu ToGray(p): replace with 3-channel grayscale per sample."""
    B = img.shape[0]
    apply = jax.random.uniform(key, (B, 1, 1, 1)) < p
    gray = jnp.broadcast_to(rgb_to_grayscale(img), img.shape)
    return jnp.where(apply, gray, img)


def _reflect_pad_hw(img, pad: int):
    """REFLECT_101 (cv2 default) padding on H and W."""
    return jnp.pad(
        img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )


def _blur_kmax(dtype, blur_limit, sigma_limit) -> int:
    """Effective static tap budget. Half-precision images can't represent the
    outermost taps' contribution: at sigma_max the tap at |t| carries
    exp(-t^2/(2*sigma_max^2)) of the center weight — truncate taps below bf16
    resolution (~2e-3) and renormalize (per-pixel error < 1e-3). For
    sigma<=2 this caps the window at 17 taps, saving ~1/4 of the FMA passes.
    """
    kmax = blur_limit[1]
    if dtype in (jnp.bfloat16, jnp.float16):
        t_needed = int(math.ceil(sigma_limit[1] * math.sqrt(2.0 * math.log(1.0 / 2e-3))))
        kmax = min(kmax, 2 * t_needed + 1)
    return kmax


def _blur_taps(key, B, blur_limit, sigma_limit, kmax):
    """Per-sample normalized 1-D Gaussian taps (B, kmax), f32; taps beyond
    the sampled odd ksize in ``blur_limit`` are zero-masked."""
    half = kmax // 2
    k_size, k_sigma = jax.random.split(key)
    n_sizes = (blur_limit[1] - blur_limit[0]) // 2 + 1
    ksize = blur_limit[0] + 2 * jax.random.randint(k_size, (B,), 0, n_sizes)
    sigma = jax.random.uniform(
        k_sigma, (B,), minval=sigma_limit[0], maxval=sigma_limit[1]
    )
    taps = jnp.arange(-half, half + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (taps[None, :] / sigma[:, None]) ** 2)
    mask = jnp.abs(taps[None, :]) <= (ksize[:, None] // 2)
    kern = jnp.where(mask, kern, 0.0)
    return kern / jnp.sum(kern, axis=1, keepdims=True)


def _sharpen_kern(key, B, alpha=(0.2, 0.5), lightness=(0.5, 1.0)):
    """Per-sample albu Sharpen 3x3 kernels (B, 3, 3), f32."""
    k_a, k_l = jax.random.split(key)
    a = jax.random.uniform(k_a, (B, 1, 1), minval=alpha[0], maxval=alpha[1])
    li = jax.random.uniform(k_l, (B, 1, 1), minval=lightness[0], maxval=lightness[1])
    ident = jnp.zeros((3, 3)).at[1, 1].set(1.0)
    effect = jnp.full((3, 3), -1.0)
    effect = jnp.broadcast_to(effect, (B, 3, 3)).at[:, 1, 1].set(8.0 + li[:, 0, 0])
    return (1.0 - a) * ident[None] + a * effect


def gaussian_blur(key, img, blur_limit=(19, 23), sigma_limit=(0.1, 2.0), use_pallas=None):
    """albu GaussianBlur: random odd kernel size in ``blur_limit``, sigma in
    ``sigma_limit``; separable per-sample kernels.

    Static max tap count (max ksize); smaller sampled ksizes mask the outer
    taps to zero — same math, XLA-friendly fixed shapes. The default path is
    the shifted-FMA XLA formulation everywhere; the Pallas single-pass
    kernel is strictly OPT-IN (``use_pallas=True``, for standalone
    large-batch blurring) — see the measured rationale at the dispatch
    below.
    """
    B, H, W, C = img.shape
    kmax = _blur_kmax(img.dtype, blur_limit, sigma_limit)
    half = kmax // 2
    kern = _blur_taps(key, B, blur_limit, sigma_limit, kmax).astype(img.dtype)

    # Measured on v5e: inside the fused aug+train jit the XLA shifted-FMA
    # chain fuses with the surrounding elementwise ops and beats the Pallas
    # kernel (whose H<->W transposes pay full HBM traffic), so Pallas stays
    # opt-in (use_pallas=True) for standalone large-batch blurring.
    if use_pallas:
        from .pallas import blur as pallas_blur

        if kmax != pallas_blur.KMAX or not pallas_blur.blur_supported(img.shape):
            raise ValueError("pallas blur requires 23-tap budget and C=3, 8-aligned H/W")
        return pallas_blur.separable_blur_nhwc(img, kern.astype(jnp.float32))

    padded = _reflect_pad_hw(img, half)

    # Separable per-sample kernel as kmax static shifted FMAs per axis —
    # XLA fuses these into straight VPU multiply-adds (no per-sample conv
    # plumbing needed).
    rows = jnp.zeros((B, H, W + 2 * half, C), img.dtype)
    for t in range(kmax):
        rows = rows + kern[:, t, None, None, None] * padded[:, t : t + H]
    out = jnp.zeros((B, H, W, C), img.dtype)
    for t in range(kmax):
        out = out + kern[:, t, None, None, None] * rows[:, :, t : t + W]
    return out


def sharpen(key, img, alpha=(0.2, 0.5), lightness=(0.5, 1.0)):
    """albu Sharpen: 3x3 kernel = (1-a)*identity + a*effect(lightness)."""
    B, H, W, C = img.shape
    kern = _sharpen_kern(key, B, alpha, lightness).astype(img.dtype)  # (B, 3, 3)

    padded = _reflect_pad_hw(img, 1)
    out = jnp.zeros((B, H, W, C), img.dtype)
    for dy in range(3):
        for dx in range(3):
            out = out + kern[:, dy, dx, None, None, None] * padded[
                :, dy : dy + H, dx : dx + W
            ]
    return jnp.clip(out, 0.0, 1.0)


def blur_or_sharpen(key, img, p: float = 0.5, use_pallas=None):
    """albu OneOf([GaussianBlur(p=.5), Sharpen(p=.5)], p=0.5): with prob 1-p
    nothing; else 50/50 blur or sharpen (``ssl_train.py:179-185``).

    On TPU with half-precision images this dispatches to the fused Pallas
    kernel (``ops/pallas/colorops.py``), which computes only the selected op
    per sample in one VMEM pass — the XLA fallback must compute both ops
    full-resolution for every sample and select.
    """
    B, H, W, C = img.shape
    k_apply, k_pick, k_blur, k_sharp = jax.random.split(key, 4)
    apply = jax.random.uniform(k_apply, (B, 1, 1, 1)) < p
    pick_blur = jax.random.uniform(k_pick, (B, 1, 1, 1)) < 0.5

    if use_pallas is None:
        from .pallas import colorops

        use_pallas = (
            jax.default_backend() == "tpu"
            and C == 3
            and H % 8 == 0
            and W % 8 == 0
            # reflect pad of HALF needs dim-1 >= HALF (8px images crash)
            and H > colorops.HALF
            and W > colorops.HALF
            and _blur_kmax(img.dtype, (19, 23), (0.1, 2.0)) == colorops.KMAX17
        )
    if use_pallas:
        from .pallas import colorops

        kern = _blur_taps(k_blur, B, (19, 23), (0.1, 2.0), colorops.KMAX17)
        sk = _sharpen_kern(k_sharp, B)
        sel = jnp.where(
            apply[:, 0, 0, 0], jnp.where(pick_blur[:, 0, 0, 0], 1, 2), 0
        ).astype(jnp.int32)
        return colorops.blur_or_sharpen_fused(img, kern, sk, sel)

    blurred = gaussian_blur(k_blur, img)
    sharped = sharpen(k_sharp, img)
    return jnp.where(apply, jnp.where(pick_blur, blurred, sharped), img)


def hflip(key, img, p: float = 0.5):
    B = img.shape[0]
    flip = jax.random.uniform(key, (B, 1, 1, 1)) < p
    return jnp.where(flip, img[:, :, ::-1, :], img)


def normalize(img, mean: Sequence[float], std: Sequence[float]):
    """(x - mean) / std on [0,1] images == albu Normalize(max_pixel_value=255)
    on the uint8 source."""
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def denormalize(img, mean: Sequence[float], std: Sequence[float]):
    """Inverse of :func:`normalize` (parity with the reference's GPU-side
    ``Normalize.denormalize``, ``src/utils/utils.py:65-76``)."""
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return img * std + mean


# --------------------------------------------------------------------------
# Spatial ops
# --------------------------------------------------------------------------


def sample_rrc_boxes(
    key,
    batch: int,
    src_hw: tuple[int, int],
    scale: tuple[float, float] = (0.5, 1.0),
    ratio: tuple[float, float] = (3 / 4, 4 / 3),
    attempts: int = 10,
):
    """Vectorized torchvision/albu RandomResizedCrop box sampling.

    Returns (top, left, height, width) arrays of shape (B,), int32. All
    ``attempts`` candidates are sampled at once; the first valid one wins,
    else the aspect-clamped center-crop fallback.
    """
    H, W = src_hw
    area = H * W
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)

    target_area = (
        jax.random.uniform(k_area, (batch, attempts), minval=scale[0], maxval=scale[1])
        * area
    )
    log_ratio = jax.random.uniform(
        k_ratio,
        (batch, attempts),
        minval=math.log(ratio[0]),
        maxval=math.log(ratio[1]),
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    h = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    valid = (w > 0) & (w <= W) & (h > 0) & (h <= H)

    any_valid = jnp.any(valid, axis=1)
    first = jnp.argmax(valid, axis=1)  # first True (0 if none)
    pick = lambda arr: jnp.take_along_axis(arr, first[:, None], axis=1)[:, 0]
    w_sel, h_sel = pick(w), pick(h)

    # Fallback: clamp aspect then center crop (torchvision semantics).
    in_ratio = W / H
    if in_ratio < ratio[0]:
        fw, fh = W, int(round(W / ratio[0]))
    elif in_ratio > ratio[1]:
        fh, fw = H, int(round(H * ratio[1]))
    else:
        fw, fh = W, H
    w_sel = jnp.where(any_valid, w_sel, fw)
    h_sel = jnp.where(any_valid, h_sel, fh)

    u_i = jax.random.uniform(k_i, (batch,))
    u_j = jax.random.uniform(k_j, (batch,))
    top = jnp.floor(u_i * (H - h_sel + 1).astype(jnp.float32)).astype(jnp.int32)
    left = jnp.floor(u_j * (W - w_sel + 1).astype(jnp.float32)).astype(jnp.int32)
    top = jnp.where(any_valid, top, (H - h_sel) // 2)
    left = jnp.where(any_valid, left, (W - w_sel) // 2)
    return top, left, h_sel, w_sel


def _axis_resample_indices(start, size, src_len: int, out_len: int, flip=None):
    """2-tap bilinear sampling indices/weights along one axis (cv2
    half-pixel convention, border clamp). start/size are traced (B,) ints.

    ``flip``: optional (B,) bool — mirror the sampling grid about the crop
    center, i.e. fold a horizontal flip into the resample at zero cost
    (a separate ``img[:, :, ::-1]`` pass is a full HBM read+write and the
    W-axis reversal lowers to an expensive relayout on TPU)."""
    startf = start.astype(jnp.float32)
    scalef = size.astype(jnp.float32) / out_len
    coords = (jnp.arange(out_len, dtype=jnp.float32)[None, :] + 0.5) * scalef[
        :, None
    ] - 0.5 + startf[:, None]
    if flip is not None:
        mirrored = 2.0 * startf[:, None] + size.astype(jnp.float32)[:, None] - 1.0 - coords
        coords = jnp.where(flip[:, None], mirrored, coords)
    # Resizing a *crop* must replicate the crop's own border (cv2.resize on
    # the cropped array never sees pixels outside it). When upscaling, the
    # half-pixel grid extends ±scale/2 beyond the crop edges — clamp to the
    # crop box, not the image border, or edge rows leak neighboring pixels.
    coords = jnp.clip(
        coords, startf[:, None], startf[:, None] + size.astype(jnp.float32)[:, None] - 1.0
    )
    coords = jnp.clip(coords, 0.0, src_len - 1.0)
    lo = jnp.floor(coords)
    frac = coords - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, src_len - 1)
    return lo_i, hi_i, frac


def crop_and_resize(img, boxes, out_size: int, flip=None):
    """Per-sample crop (top, left, h, w) + bilinear resize to (out, out).

    Separable gather implementation: resample rows, then columns — two 2-tap
    lerps instead of a dense resize matmul; static output shape.
    img: (B, H, W, C) float; boxes: tuple of 4 (B,) int arrays;
    flip: optional (B,) bool folding a horizontal flip into the resample.
    """
    top, left, h, w = boxes
    B, H, W, C = img.shape
    ylo, yhi, yf = _axis_resample_indices(top, h, H, out_size)
    xlo, xhi, xf = _axis_resample_indices(left, w, W, out_size, flip=flip)

    yf = yf.astype(img.dtype)
    xf = xf.astype(img.dtype)

    def one(im, ylo, yhi, yf, xlo, xhi, xf):
        rows = jnp.take(im, ylo, axis=0) * (1.0 - yf[:, None, None]) + jnp.take(
            im, yhi, axis=0
        ) * yf[:, None, None]
        cols = jnp.take(rows, xlo, axis=1) * (1.0 - xf[None, :, None]) + jnp.take(
            rows, xhi, axis=1
        ) * xf[None, :, None]
        return cols

    return jax.vmap(one)(img, ylo, yhi, yf, xlo, xhi, xf)


def _resize_matrix(start, size, src_len: int, out_len: int, dtype=jnp.float32, flip=None):
    """Per-sample (out_len, src_len) 2-tap interpolation matrices.

    Expressing the separable resize as batched matmuls targets the MXU —
    on TPU this is usually much faster than per-sample gathers, which XLA
    lowers to serial dynamic-slices.
    """
    lo, hi, frac = _axis_resample_indices(start, size, src_len, out_len, flip=flip)
    s = jnp.arange(src_len)
    onehot_lo = (s[None, None, :] == lo[:, :, None]).astype(dtype)
    onehot_hi = (s[None, None, :] == hi[:, :, None]).astype(dtype)
    frac = frac[:, :, None].astype(dtype)
    return onehot_lo * (1.0 - frac) + onehot_hi * frac  # (B, out, src)


def crop_and_resize_mxu(img, boxes, out_size: int, compute_dtype=None, flip=None):
    """MXU formulation of :func:`crop_and_resize`: rows then cols as batched
    2-tap interpolation matmuls. Same math, same sampling indices.
    ``compute_dtype`` defaults to the image dtype (f32 images stay exact)."""
    if compute_dtype is None:
        compute_dtype = img.dtype
    top, left, h, w = boxes
    B, H, W, C = img.shape
    Rm = _resize_matrix(top, h, H, out_size, compute_dtype)  # (B, out, H)
    Cm = _resize_matrix(left, w, W, out_size, compute_dtype, flip=flip)  # (B, out, W)
    x = img.astype(compute_dtype)
    rows = jnp.einsum("boh,bhwc->bowc", Rm, x, preferred_element_type=compute_dtype)
    out = jnp.einsum("btw,bowc->botc", Cm, rows, preferred_element_type=compute_dtype)
    return out.astype(img.dtype)


def random_resized_crop(
    key,
    img,
    out_size: int,
    scale: tuple[float, float] = (0.5, 1.0),
    ratio: tuple[float, float] = (3 / 4, 4 / 3),
    use_mxu: bool | None = None,
    flip=None,
):
    """albu RandomResizedCrop(out, out, scale=scale) (``ssl_train.py:176``).

    ``use_mxu`` selects the matmul resampler (default on for every
    backend). Besides being the fast TPU form, the matmul resampler is
    the *numerically reproducible* one: when XLA fuses the gather+lerp
    form into downstream consumers it may duplicate the index/weight
    computation per fusion with different FMA contraction, and on
    XLA:CPU that produced O(1) per-pixel differences between eager and
    fully-fused evaluations of the same key (~6% of pixels in the fused
    aug+train step). The interpolation-matrix form keeps the sampling
    decision in integer one-hots consumed by a single matmul, which XLA
    does not duplicate. ``flip``: optional (B,) bool — a horizontal flip
    folded into the sampling grid for free (exact; flips commute with
    every pixelwise op and with the symmetric blur/sharpen kernels, so
    albu's flip-late pipelines can flip-early here)."""
    B, H, W, _ = img.shape
    boxes = sample_rrc_boxes(key, B, (H, W), scale, ratio)
    if use_mxu is None:
        use_mxu = True
    if use_mxu:
        return crop_and_resize_mxu(img, boxes, out_size, flip=flip)
    return crop_and_resize(img, boxes, out_size, flip=flip)


def center_crop(img, crop: int):
    """albu CenterCrop(crop, crop) — static slice."""
    H, W = img.shape[1], img.shape[2]
    y0, x0 = (H - crop) // 2, (W - crop) // 2
    return img[:, y0 : y0 + crop, x0 : x0 + crop]


def resize_bilinear(img, out_size: int, flip=None):
    """Full-image bilinear resize (albu Resize, cv2 INTER_LINEAR).

    Uses the MXU matmul resampler: same 2-tap sampling indices as the
    gather form (the interpolation matrices have exactly two nonzeros per
    row, and adding exact zeros is exact), but the TPU executes the two
    batched matmuls at MXU speed while per-sample gathers on a
    (B, 1024, 1024, 3) source run at <200 GB/s *and* force a physical
    relayout of the source (round-3 finetune trace).

    ``flip``: optional (B,) bool — per-sample horizontal flip folded into
    the column interpolation matrix. The half-pixel sampling grid is
    mirror-symmetric, so ``resize(flip(x)) == flip(resize(x))`` exactly
    and the fold is bit-identical to flipping the output — without the
    lane-reversal pass a standalone ``reverse`` costs on TPU (measured
    ~90 GB/s effective on the W-on-lanes 256px layout, round 4)."""
    B = img.shape[0]
    boxes = (
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), img.shape[1], jnp.int32),
        jnp.full((B,), img.shape[2], jnp.int32),
    )
    return crop_and_resize_mxu(img, boxes, out_size, flip=flip)


def resize_nearest(img, out_size: int, flip=None):
    """Nearest-neighbor resize (albu resizes masks with INTER_NEAREST).

    ``flip``: optional (B,) bool — per-sample horizontal flip folded into
    the column indices (``nearest(flip(x)) == x[..., W-1-xs]`` exactly;
    note flip does NOT commute with nearest rounding at tie coordinates,
    so folding — not flipping the output — is the correct zero-cost form).
    """
    H, W = img.shape[1], img.shape[2]
    ys = jnp.clip(
        jnp.round((jnp.arange(out_size) + 0.5) * H / out_size - 0.5).astype(jnp.int32), 0, H - 1
    )
    xs = jnp.clip(
        jnp.round((jnp.arange(out_size) + 0.5) * W / out_size - 0.5).astype(jnp.int32), 0, W - 1
    )
    rows = img[:, ys]
    if flip is None:
        return rows[:, :, xs]
    return jnp.where(
        flip[:, None, None, None] if img.ndim == 4 else flip[:, None, None],
        rows[:, :, W - 1 - xs],
        rows[:, :, xs],
    )
