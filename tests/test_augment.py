"""On-device augmentation tests: op semantics vs torch oracles + pipeline
shape/distribution checks."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from msfwsi_tpu.ops import augment as A
from msfwsi_tpu.data import pipeline as P


def rand_img(b=2, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))


def test_import_does_not_initialize_backend():
    """Importing the augment module must not create jnp constants: that
    initializes the JAX backend at import time, after which the repo's
    post-import force-CPU pattern (tools/_common.py, conftest) is silently
    ignored (regression: a module-level jnp _GRAY_WEIGHTS pinned everything
    to the tunneled TPU)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)  # the real CLI environment
    code = (
        "import msfwsi_tpu.ops.augment as A\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "d = list(A.rgb_to_grayscale(jnp.ones((1, 2, 2, 3))).devices())[0]\n"
        "assert d.platform == 'cpu', d\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=300, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


class TestColorOps:
    def test_grayscale_weights(self):
        img = rand_img()
        g = np.asarray(A.rgb_to_grayscale(img))[..., 0]
        ref = np.asarray(img) @ np.array([0.299, 0.587, 0.114], np.float32)
        np.testing.assert_allclose(g, ref, rtol=1e-5)

    def test_color_jitter_p0_identity(self):
        img = rand_img()
        cfg = A.ColorJitterConfig(p=0.0)
        out = A.color_jitter(jax.random.key(0), img, cfg)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_color_jitter_changes_and_bounded(self):
        img = rand_img()
        cfg = A.ColorJitterConfig(p=1.0)
        out = np.asarray(A.color_jitter(jax.random.key(1), img, cfg))
        assert not np.array_equal(out, np.asarray(img))
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_hue_roundtrip(self):
        img = rand_img()
        hsv = A._rgb_to_hsv(img)
        back = A._hsv_to_rgb(hsv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)

    def test_fused_matches_sequential_when_clips_dont_bind(self):
        """The fused affine composition must equal the literal sequential
        application whenever no intermediate clip binds (tight factors,
        mid-range pixels)."""
        rng = np.random.default_rng(11)
        img = jnp.asarray(rng.uniform(0.4, 0.6, size=(8, 16, 16, 3)).astype(np.float32))
        cfg = A.ColorJitterConfig(brightness=0.05, contrast=0.05, saturation=0.05, hue=0.02, p=1.0)
        for seed in range(3):
            k = jax.random.key(seed)
            fused = A.color_jitter(k, img, cfg, method="fused")
            seq = A.color_jitter(k, img, cfg, method="sequential")
            np.testing.assert_allclose(np.asarray(fused), np.asarray(seq), atol=2e-5)

    def test_fused_default_distribution_sane(self):
        img = rand_img(b=64, h=8, w=8, seed=12)
        out = np.asarray(A.color_jitter(jax.random.key(2), img, A.ColorJitterConfig(p=1.0)))
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.array_equal(out, np.asarray(img))
        # roughly centered: mean shift bounded
        assert abs(out.mean() - np.asarray(img).mean()) < 0.15

    def test_to_gray_probabilistic(self):
        img = rand_img(b=512, h=4, w=4)
        out = np.asarray(A.to_gray(jax.random.key(2), img, p=0.2))
        is_gray = np.isclose(out[..., 0], out[..., 1], atol=1e-6).all(axis=(1, 2))
        # ~20% of samples gray (binomial tolerance).
        assert 0.1 < is_gray.mean() < 0.35


class TestBlurSharpen:
    def test_blur_uniform_invariant(self):
        img = jnp.full((2, 40, 40, 3), 0.5, jnp.float32)
        out = np.asarray(A.gaussian_blur(jax.random.key(0), img))
        np.testing.assert_allclose(out, 0.5, atol=1e-5)

    def test_blur_reduces_variance_preserves_mean(self):
        img = rand_img(b=2, h=64, w=64)
        out = np.asarray(A.gaussian_blur(jax.random.key(1), img))
        assert out.var() < np.asarray(img).var() * 0.6
        assert abs(out.mean() - np.asarray(img).mean()) < 0.02

    def test_blur_matches_torch_conv(self):
        # Fixed sigma path vs torch depthwise gaussian (reflect-101 pad).
        img = rand_img(b=1, h=48, w=48, seed=3)
        out = np.asarray(
            A.gaussian_blur(jax.random.key(0), img, blur_limit=(23, 23), sigma_limit=(1.5, 1.5))
        )
        t = torch.from_numpy(np.asarray(img)).permute(0, 3, 1, 2)
        taps = torch.arange(-11, 12, dtype=torch.float32)
        k1d = torch.exp(-0.5 * (taps / 1.5) ** 2)
        k1d = k1d / k1d.sum()
        tp = F.pad(t, (11, 11, 11, 11), mode="reflect")
        kh = k1d.view(1, 1, 1, 23).repeat(3, 1, 1, 1)
        kv = k1d.view(1, 1, 23, 1).repeat(3, 1, 1, 1)
        ref = F.conv2d(F.conv2d(tp, kh, groups=3), kv, groups=3)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_sharpen_alpha0_identity(self):
        img = rand_img()
        out = np.asarray(A.sharpen(jax.random.key(0), img, alpha=(0.0, 0.0)))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)

    def test_sharpen_increases_contrast(self):
        rng = np.random.default_rng(4)
        img = jnp.asarray(np.clip(rng.uniform(0.3, 0.7, size=(1, 32, 32, 3)), 0, 1).astype(np.float32))
        out = np.asarray(A.sharpen(jax.random.key(1), img, alpha=(0.5, 0.5)))
        assert out.var() > np.asarray(img).var()


class TestSpatial:
    def test_hflip(self):
        img = rand_img(b=256, h=4, w=6)
        out = np.asarray(A.hflip(jax.random.key(0), img, p=1.0))
        np.testing.assert_array_equal(out, np.asarray(img)[:, :, ::-1, :])
        frac = [
            np.array_equal(o, i[:, ::-1])
            for o, i in zip(np.asarray(A.hflip(jax.random.key(1), img, p=0.5)), np.asarray(img))
        ]
        assert 0.3 < np.mean(frac) < 0.7

    def test_normalize(self):
        img = rand_img()
        mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
        out = np.asarray(A.normalize(img, mean, std))
        ref = (np.asarray(img) - np.array(mean)) / np.array(std)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_center_crop(self):
        img = rand_img(h=10, w=10)
        out = np.asarray(A.center_crop(img, 6))
        np.testing.assert_array_equal(out, np.asarray(img)[:, 2:8, 2:8])

    def test_resize_bilinear_matches_torch(self):
        img = rand_img(b=2, h=37, w=53, seed=5)
        out = np.asarray(A.resize_bilinear(img, 16))
        t = torch.from_numpy(np.asarray(img)).permute(0, 3, 1, 2)
        ref = (
            F.interpolate(t, size=(16, 16), mode="bilinear", align_corners=False)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_crop_and_resize_matches_torch(self):
        img = rand_img(b=1, h=64, w=64, seed=6)
        top, left, h, w = 7, 11, 40, 33
        boxes = tuple(jnp.asarray([v], jnp.int32) for v in (top, left, h, w))
        out = np.asarray(A.crop_and_resize(img, boxes, 24))
        t = torch.from_numpy(np.asarray(img)[:, top : top + h, left : left + w]).permute(0, 3, 1, 2)
        ref = (
            F.interpolate(t, size=(24, 24), mode="bilinear", align_corners=False)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_resize_nearest_labels_preserved(self):
        mask = jnp.asarray(np.random.default_rng(7).integers(0, 5, size=(2, 33, 33, 1)))
        out = np.asarray(A.resize_nearest(mask, 16))
        assert set(np.unique(out)) <= set(np.unique(np.asarray(mask)))
        assert out.shape == (2, 16, 16, 1)

    def test_rrc_boxes_in_bounds_and_scaled(self):
        B, H, W = 512, 100, 80
        top, left, h, w = A.sample_rrc_boxes(
            jax.random.key(0), B, (H, W), scale=(0.5, 1.0)
        )
        top, left, h, w = (np.asarray(v) for v in (top, left, h, w))
        assert (top >= 0).all() and (left >= 0).all()
        assert (top + h <= H).all() and (left + w <= W).all()
        areas = h * w / (H * W)
        # Rounding slop around the [0.5, 1.0] area bounds.
        assert areas.min() > 0.42 and areas.max() <= 1.01
        assert 0.55 < areas.mean() < 0.95

    def test_random_resized_crop_shape(self):
        img = rand_img(b=3, h=64, w=64)
        out = A.random_resized_crop(jax.random.key(0), img, 32)
        assert out.shape == (3, 32, 32, 3)


class TestPipelines:
    def test_ssl_views_shapes(self):
        cfg = P.AugConfig(img_size=32, grid=2, tile_px=32)
        tiles = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
        )
        batch = jax.jit(lambda k, t: P.make_ssl_views(k, t, cfg))(jax.random.key(0), tiles)
        assert batch["context1"].shape == (2, 32, 32, 3)
        assert batch["target1"].shape == (8, 32, 32, 3)
        assert batch["rev1"].shape == (2, 4)
        # rev is a valid permutation per sample
        rev = np.asarray(batch["rev1"])
        for r in rev:
            assert sorted(r.tolist()) == [0, 1, 2, 3]
        # two views differ (augmentation applied)
        assert not np.allclose(np.asarray(batch["context1"]), np.asarray(batch["context2"]))

    def test_ssl_views_deterministic_under_key(self):
        cfg = P.AugConfig(img_size=16, grid=2, tile_px=16)
        tiles = jnp.asarray(
            np.random.default_rng(1).integers(0, 255, size=(1, 32, 32, 3), dtype=np.uint8)
        )
        b1 = P.make_ssl_views(jax.random.key(7), tiles, cfg)
        b2 = P.make_ssl_views(jax.random.key(7), tiles, cfg)
        for k in b1:
            np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))

    def test_ssl_views_deterministic_across_fusion_contexts(self):
        """Same key must give the same views whether the pipeline runs
        eagerly, jitted alone, or jitted with key-folding and batch
        slicing inside (the fused train step / accumulation contexts).

        Regression test: XLA may duplicate a producer computation into
        several consumer fusions with different FMA contraction, so any
        float-derived *discrete* decision (gather indices, floor/%-based
        sextant branches) can flip between copies. The gather-form
        resampler and the branch-form HSV->RGB both did exactly that on
        XLA:CPU — O(1) differences on ~6% of pixels between eager and
        fully-fused evaluation — which is why the pipeline uses the
        matmul resampler and the branchless K-formula hue everywhere.
        Tolerance is plain f32 reassociation noise; any index flip shows
        up as an O(1) pixel error."""
        cfg = P.AugConfig(img_size=32, grid=2, tile_px=32)
        tiles = jnp.asarray(
            np.random.default_rng(23).integers(
                0, 255, size=(4, 64, 64, 3), dtype=np.uint8
            )
        )
        key = jax.random.key(42)
        k0 = jax.random.fold_in(key, 0)
        half = tiles[:2]

        eager = P.make_ssl_views(k0, half, cfg)
        jitted = jax.jit(lambda k, t: P.make_ssl_views(k, t, cfg))(k0, half)
        folded = jax.jit(
            lambda k, t: P.make_ssl_views(
                jax.random.fold_in(k, 0),
                jax.lax.slice_in_dim(t, 0, 2, axis=0),
                cfg,
            )
        )(key, tiles)
        for name, other in (("jit", jitted), ("fold+slice jit", folded)):
            for k in eager:
                np.testing.assert_allclose(
                    np.asarray(eager[k], np.float32),
                    np.asarray(other[k], np.float32),
                    atol=2e-5,
                    err_msg=f"{name}:{k}",
                )

    def test_seg_train_views(self):
        cfg = P.AugConfig(seg_size=32)
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.integers(0, 255, size=(2, 128, 128, 3), dtype=np.uint8))
        masks = jnp.asarray(rng.integers(0, 6, size=(2, 128, 128), dtype=np.uint8))
        (ctx, tgt), (cm, tm) = jax.jit(
            lambda k, i, m: P.make_seg_train_views(k, i, m, cfg)
        )(jax.random.key(0), imgs, masks)
        assert ctx.shape == (2, 32, 32, 3) and tgt.shape == (2, 32, 32, 3)
        assert cm.shape == (2, 32, 32) and tm.shape == (2, 32, 32)
        assert cm.dtype == jnp.int32
        # target mask values come from the center crop region of the source
        assert set(np.unique(np.asarray(tm))) <= set(np.unique(np.asarray(masks)))

    def test_seg_train_views_matches_reference_order(self):
        """The optimized seg-train pipeline (crop/resize first, jitter at
        256px, flip late, folded nearest indices) must match the reference
        order (jitter + flip the full-res sources, then derive views) for
        the same key. Masks are exact; the target image deviates only
        through the contrast means (sampled from the resized view, ≤~1e-2
        after normalize); the context image additionally carries the
        hue/resize interchange noise (documented deviation)."""
        cfg = P.AugConfig(seg_size=32)
        rng = np.random.default_rng(9)
        # Smooth sources (upsampled low-res noise): the hue op's
        # interchange-with-averaging error concentrates at hard texture
        # edges, which WSI tiles — unlike white noise — don't have.
        base = rng.integers(0, 255, size=(4, 16, 16, 3), dtype=np.uint8)
        imgs = jnp.asarray(np.kron(base, np.ones((1, 8, 8, 1))).astype(np.uint8))
        masks = jnp.asarray(rng.integers(0, 6, size=(4, 128, 128), dtype=np.uint8))
        key = jax.random.key(11)
        (ctx, tgt), (cm, tm) = jax.jit(
            lambda k, i, m: P.make_seg_train_views(k, i, m, cfg)
        )(key, imgs, masks)

        # reference order, same RNG consumption
        from msfwsi_tpu.ops import augment as A

        x = imgs.astype(jnp.float32) / 255.0
        k_cj, k_flip = jax.random.split(key)
        x = A.color_jitter(k_cj, x)
        flip = jax.random.uniform(k_flip, (4, 1, 1, 1)) < 0.5
        assert bool(jnp.any(flip)) and not bool(jnp.all(flip))  # both branches hit
        xf = jnp.where(flip, x[:, :, ::-1, :], x)
        mf = jnp.where(flip[:, :, :, 0], masks[:, :, ::-1], masks)
        ref_tgt = A.normalize(A.center_crop(xf, 32), cfg.mean, cfg.std)
        ref_tm = A.center_crop(mf[..., None], 32)[..., 0]
        ref_ctx = A.normalize(A.resize_bilinear(xf, 32), cfg.mean, cfg.std)
        ref_cm = A.resize_nearest(mf[..., None], 32)[..., 0]

        np.testing.assert_allclose(np.asarray(tgt), np.asarray(ref_tgt), atol=2e-2)
        np.testing.assert_allclose(np.asarray(ctx), np.asarray(ref_ctx), atol=5e-2)
        np.testing.assert_array_equal(np.asarray(tm), np.asarray(ref_tm))
        np.testing.assert_array_equal(np.asarray(cm), np.asarray(ref_cm))

    def test_jitter_commutes_with_crop_under_injected_means(self):
        """ColorJitter(crop(x), means-of-x) == crop(ColorJitter(x)) exactly —
        the mathematical basis of the crop-before-jitter seg pipeline."""
        from msfwsi_tpu.ops import augment as A

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(size=(3, 64, 64, 3)), jnp.float32)
        params = A._sample_jitter_params(
            jax.random.key(5), 3, A.ColorJitterConfig(p=1.0), jnp.float32
        )
        full, means = A.apply_color_jitter(x, *params, return_means=True)
        ref = A.center_crop(full, 16)
        new = A.apply_color_jitter(A.center_crop(x, 16), *params, means=means)
        np.testing.assert_array_equal(np.asarray(new), np.asarray(ref))

    def test_host_val_views_match_cv2_and_slices(self):
        """make_seg_val_views_host: context == per-tile cv2 uint8 resize
        (the reference's literal albu.Resize), target/mask == exact center
        slices of the source."""
        cv2 = pytest.importorskip("cv2")
        cfg = P.AugConfig(seg_size=32)
        rng = np.random.default_rng(4)
        imgs = rng.integers(0, 256, size=(3, 64, 64, 3), dtype=np.uint8)
        masks = rng.integers(0, 6, size=(3, 64, 64), dtype=np.uint8)
        ctx, tgt, tmask = P.make_seg_val_views_host(imgs, masks, cfg)
        assert ctx.dtype == np.uint8 and tgt.dtype == np.uint8
        for b in range(3):
            ref = cv2.resize(imgs[b], (32, 32), interpolation=cv2.INTER_LINEAR)
            np.testing.assert_array_equal(ctx[b], ref)
        np.testing.assert_array_equal(tgt, imgs[:, 16:48, 16:48])
        np.testing.assert_array_equal(tmask, masks[:, 16:48, 16:48].astype(np.int32))

    def test_host_resize_numpy_fallback_close_to_cv2(self):
        """The no-cv2 numpy fallback resize samples the same half-pixel
        grid; uint8 outputs may differ from cv2's fixed-point rounding by
        at most one gray level."""
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(97, 103, 3), dtype=np.uint8)
        ours = P._resize_u8_host_np(img, 32)
        ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1
        # cv2's uint8 path rounds in 11-bit fixed point; ±1 on ~13% of pixels
        assert (diff == 0).mean() > 0.8

    def test_seg_val_views_deterministic(self):
        cfg = P.AugConfig(seg_size=32)
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8))
        masks = jnp.asarray(rng.integers(0, 6, size=(2, 64, 64), dtype=np.uint8))
        (ctx1, tgt1), (cm1, tm1) = P.make_seg_val_views(imgs, masks, cfg)
        (ctx2, tgt2), _ = P.make_seg_val_views(imgs, masks, cfg)
        np.testing.assert_array_equal(np.asarray(ctx1), np.asarray(ctx2))
        # center-crop target: mask is an exact slice of the source
        np.testing.assert_array_equal(
            np.asarray(tm1), np.asarray(masks)[:, 16:48, 16:48].astype(np.int32)
        )
