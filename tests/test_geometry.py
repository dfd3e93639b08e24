"""Geometry contract tests: blockshaped, jigsaw, tile grid, label remap.

Golden behaviors from the reference: ``src/utils/data/bcss.py:203-216``
(blockshaped), ``bcss.py:171-177`` (jigsaw), ``tools/bcss_prepare.py:36-69``
(grid), ``bcss_prepare.py:25-34`` (remap).
"""

import numpy as np
import pytest

from msfwsi_tpu.ops import geometry as G


def _ramp(h, w, c=3, dtype=np.uint8):
    return (np.arange(h * w * c).reshape(h, w, c) % 251).astype(dtype)


class TestBlockshaped:
    def test_matches_reference_layout(self):
        # Reference implementation, verbatim semantics on a small case.
        img = _ramp(8, 12, 3)
        tiles = G.blockshaped(img, 4, 4)
        assert tiles.shape == (6, 4, 4, 3)
        # Row-major grid: tile 0 = top-left, tile 2 = top-right, tile 3 = bottom-left.
        np.testing.assert_array_equal(tiles[0], img[0:4, 0:4])
        np.testing.assert_array_equal(tiles[2], img[0:4, 8:12])
        np.testing.assert_array_equal(tiles[3], img[4:8, 0:4])
        np.testing.assert_array_equal(tiles[5], img[4:8, 8:12])

    def test_roundtrip(self):
        img = _ramp(1024, 1024)
        tiles = G.blockshaped(img, 256, 256)
        assert tiles.shape == (16, 256, 256, 3)
        np.testing.assert_array_equal(G.unblockshaped(tiles, 1024, 1024), img)

    def test_not_divisible_raises(self):
        with pytest.raises(ValueError):
            G.blockshaped(_ramp(10, 8), 4, 4)

    def test_batched_matches_single(self):
        imgs = np.stack([_ramp(8, 8), _ramp(8, 8)[::-1].copy()])
        batched = G.batched_blockshaped(imgs, 4, 4)
        for b in range(2):
            np.testing.assert_array_equal(batched[b], G.blockshaped(imgs[b], 4, 4))

    def test_jax_jit(self):
        import jax
        import jax.numpy as jnp

        img = jnp.asarray(_ramp(512, 512))
        fn = jax.jit(lambda x: G.blockshaped(x, 256, 256))
        np.testing.assert_array_equal(np.asarray(fn(img)), G.blockshaped(np.asarray(img), 256, 256))


class TestJigsaw:
    def test_inverse_permutation(self):
        rng = np.random.default_rng(0)
        perm = rng.permutation(16)
        inv = G.invert_permutation(perm)
        np.testing.assert_array_equal(perm[inv], np.arange(16))
        np.testing.assert_array_equal(inv[perm], np.arange(16))

    def test_shuffle_then_unshuffle_tiles(self):
        rng = np.random.default_rng(1)
        tiles = rng.normal(size=(16, 4, 4, 3))
        perm = rng.permutation(16)
        shuffled = G.gather_tiles(tiles, perm)
        restored = G.gather_tiles(shuffled, G.invert_permutation(perm))
        np.testing.assert_array_equal(restored, tiles)

    def test_unshuffle_features_batched(self):
        # The exact backbone.py:147-158 semantics: features of shuffled tiles,
        # gathered by the reverse index, line up with spatial order.
        rng = np.random.default_rng(2)
        B, K, C = 4, 16, 8
        spatial_feats = rng.normal(size=(B, K, C))
        perms = np.stack([rng.permutation(K) for _ in range(B)])
        shuffled_feats = np.take_along_axis(spatial_feats, perms[:, :, None], axis=1)
        restored = G.unshuffle_features(shuffled_feats, G.invert_permutation(perms))
        np.testing.assert_array_equal(restored, spatial_feats)

    def test_unshuffle_features_jax(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        B, K, C = 2, 16, 4
        feats = rng.normal(size=(B, K, C)).astype(np.float32)
        perms = np.stack([rng.permutation(K) for _ in range(B)])
        shuffled = np.take_along_axis(feats, perms[:, :, None], axis=1)
        out = G.unshuffle_features(jnp.asarray(shuffled), jnp.asarray(G.invert_permutation(perms)))
        np.testing.assert_allclose(np.asarray(out), feats)


class TestTileGrid:
    def test_exact_division(self):
        g = G.TileGrid(height=512, width=768, tile_size=256)
        # Reference pads even on exact division (pad = sz - 0 = sz... no:
        # 512 % 256 == 0 -> pad_h = 256, num_h = (512+256)//256 = 3).
        assert g.pad_h == 256 and g.num_h == 3
        assert g.num_w == 4
        assert len(g) == 12

    def test_padding_tile_is_zero_filled(self):
        img = np.full((300, 300, 3), 7, np.uint8)
        g = G.TileGrid(height=300, width=300, tile_size=256)
        assert (g.num_h, g.num_w) == (2, 2)
        t = g.extract(img, 3)  # bottom-right tile: only 44x44 valid
        assert t.shape == (256, 256, 3)
        assert (t[:44, :44] == 7).all()
        assert (t[44:, :] == 0).all() and (t[:, 44:] == 0).all()

    def test_shift_drops_last_row_col(self):
        # h % sz = 44 < shift 128 -> one fewer row of tiles.
        g = G.TileGrid(height=300, width=300, tile_size=256, shift_h=128, shift_w=128)
        assert (g.num_h, g.num_w) == (1, 1)
        img = _ramp(300, 300)
        t = g.extract(img, 0)
        np.testing.assert_array_equal(t[:172, :172], img[128:300, 128:300])
        assert (t[172:, :] == 0).all()

    def test_origin_row_major(self):
        g = G.TileGrid(height=1000, width=1000, tile_size=256, shift_w=10)
        assert g.origin(0) == (0, 10)
        assert g.origin(1) == (0, 266)
        assert g.origin(g.num_w) == (256, 10)

    def test_matches_reference_loop(self):
        # Brute-force the reference's __getitem__ math over several geometries.
        for (h, w, sz, sh, sw) in [(700, 900, 256, 0, 0), (1024, 1024, 256, 0, 0),
                                   (513, 700, 128, 64, 32), (255, 255, 256, 0, 0)]:
            img = _ramp(h, w)
            g = G.TileGrid(h, w, sz, sh, sw)
            pad_h, pad_w = sz - h % sz, sz - w % sz
            num_h, num_w = (h + pad_h) // sz, (w + pad_w) // sz
            if h % sz < sh:
                num_h -= 1
            if w % sz < sw:
                num_w -= 1
            assert (g.num_h, g.num_w) == (num_h, num_w)
            for idx in range(num_h * num_w):
                i_h, i_w = idx // num_w, idx % num_w
                y, x = i_h * sz + sh, i_w * sz + sw
                py0, py1 = max(0, y), min(y + sz, h)
                px0, px1 = max(0, x), min(x + sz, w)
                ref = np.zeros((sz, sz, 3), np.uint8)
                ref[0 : py1 - py0, 0 : px1 - px0] = img[py0:py1, px0:px1]
                np.testing.assert_array_equal(g.extract(img, idx), ref)


class TestLabelRemap:
    def test_lut_matches_sequential_isin(self):
        rng = np.random.default_rng(4)
        mask = rng.integers(0, 22, size=(64, 64)).astype(np.uint8)
        # Reference loop, reimplemented literally for the oracle.
        ref = mask.copy()
        for k, v in G.BCSS_CLASS_REMAP.items():
            ref[np.isin(ref, list(v))] = k
        np.testing.assert_array_equal(G.remap_bcss_labels(mask), ref)

    def test_all_outputs_in_range(self):
        mask = np.arange(22, dtype=np.uint8).reshape(1, 22)
        out = G.remap_bcss_labels(mask)
        assert out.max() <= 5
        assert out[0, 0] == 0  # background stays background
