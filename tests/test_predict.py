"""Prediction-path tests (`train/predict.py`): chunked mask prediction
plumbing and parity with a direct forward, plus the stitching geometry.

The reference offers no counterpart (its evaluate loop reduces predictions
to confusion stats immediately, ``/root/reference/tools/evaluate.py:283-310``);
the contract tested here is internal consistency with our own eval views.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfwsi_tpu.data.pipeline import AugConfig, make_seg_val_views, make_seg_val_views_host
from msfwsi_tpu.ops.geometry import TileGrid
from msfwsi_tpu.train import finetune as FT
from msfwsi_tpu.train import predict as PR

SEG = 64
TILE = 4 * SEG


@pytest.fixture(scope="module")
def model_state():
    config = FT.FinetuneConfig(
        arch="resnet18", class_names=tuple(FT.BCSS_CLASSES), seg_size=SEG, amp=False
    )
    state = FT.create_finetune_state(jax.random.key(0), config)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return state.model, variables


@pytest.fixture(scope="module")
def tiles():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(5, TILE, TILE, 3), dtype=np.uint8)


def _cfg():
    return AugConfig(seg_size=SEG)


class TestChunkPreds:
    def test_predict_slide_matches_manual_chunks(self, model_state, tiles):
        """predict_slide's padding / double-buffered upload / trim must
        reproduce calling the chunk function by hand — exact."""
        model, variables = model_state
        preds_fn = PR.make_chunk_preds_u8(model, cfg=_cfg(), heads=("context", "target"))
        ctx, tgt = PR.predict_slide(preds_fn, variables, (tiles,), chunk=4)
        assert ctx.shape == (5, SEG, SEG) and tgt.shape == (5, SEG, SEG)
        assert ctx.dtype == np.uint8 and tgt.dtype == np.uint8

        padded = np.concatenate([tiles, np.zeros((3, TILE, TILE, 3), np.uint8)])
        outs = [preds_fn(variables, padded[i : i + 4]) for i in (0, 4)]
        man_ctx = np.concatenate([np.asarray(o[0]) for o in outs])[:5]
        man_tgt = np.concatenate([np.asarray(o[1]) for o in outs])[:5]
        np.testing.assert_array_equal(ctx, man_ctx)
        np.testing.assert_array_equal(tgt, man_tgt)

    def test_chunked_matches_direct_forward(self, model_state, tiles):
        """Chunked predictions agree with one unchunked forward over the
        reference eval views. Argmax ties can flip under different XLA
        fusion groupings, so a tiny mismatch budget is allowed."""
        model, variables = model_state
        preds_fn = PR.make_chunk_preds_u8(model, cfg=_cfg(), heads=("target",))
        (pt,) = PR.predict_slide(preds_fn, variables, (tiles,), chunk=4)

        zeros = jnp.zeros(tiles.shape[:3], jnp.int32)
        (ctx_v, tgt_v), _ = make_seg_val_views(jnp.asarray(tiles), zeros, _cfg())
        _, tgt_logits = model.apply(variables, ctx_v, tgt_v, train=False)
        direct = np.asarray(
            jnp.argmax(tgt_logits.astype(jnp.float32), axis=-1).astype(jnp.uint8)
        )
        mismatch = float((pt != direct).mean())
        assert mismatch < 0.02, f"{mismatch:.4f} of pixels differ"

    def test_hostviews_path(self, model_state, tiles):
        """Host-view predictions run and match a direct apply on the same
        host-built views (exact plumbing check through predict_slide)."""
        model, variables = model_state
        cfg = _cfg()
        zeros = np.zeros(tiles.shape[:3], np.uint8)
        ctx_u8, tgt_u8, _ = make_seg_val_views_host(tiles, zeros, cfg)
        preds_fn = PR.make_chunk_preds_hostviews(model, cfg=cfg, heads=("target",))
        (pt,) = PR.predict_slide(preds_fn, variables, (ctx_u8, tgt_u8), chunk=4)

        pads = [np.concatenate([a, np.zeros((3, *a.shape[1:]), a.dtype)]) for a in (ctx_u8, tgt_u8)]
        outs = [preds_fn(variables, pads[0][i : i + 4], pads[1][i : i + 4]) for i in (0, 4)]
        manual = np.concatenate([np.asarray(o[0]) for o in outs])[:5]
        np.testing.assert_array_equal(pt, manual)
        assert pt.max() <= len(FT.BCSS_CLASSES)  # classes 0..C

    def test_bad_head_raises(self, model_state):
        model, _ = model_state
        with pytest.raises(ValueError, match="heads"):
            PR.make_chunk_preds_u8(model, heads=("bogus",))
        with pytest.raises(ValueError, match="heads"):
            PR.make_chunk_preds_hostviews(model, heads=())


class TestStitch:
    # 300x500 slide, 128px tiles: grid is 3x4 (zero-padded at the edges).
    GRID = TileGrid(300, 500, 128)

    def test_grid_shape(self):
        assert (self.GRID.num_h, self.GRID.num_w) == (3, 4)

    def test_context_stitch_places_blocks_and_crops(self):
        seg = 32  # 1/4 scale
        idx = [0, 5, 11]  # corners + middle of the 3x4 grid
        preds = np.stack([np.full((seg, seg), i + 1, np.uint8) for i in range(len(idx))])
        canvas = PR.stitch_context_preds(preds, idx, self.GRID, seg_size=seg)
        # ceil(300*32/128)=75, ceil(500*32/128)=125
        assert canvas.shape == (75, 125)
        assert (canvas[0:32, 0:32] == 1).all()  # tile 0 at (0, 0)
        assert (canvas[32:64, 32:64] == 2).all()  # tile 5 = row 1, col 1
        # tile 11 = row 2, col 3: block starts at (64, 96), cropped to 75x125
        assert (canvas[64:75, 96:125] == 3).all()
        assert (canvas[0:32, 32:64] == 0).all()  # dropped tiles stay class 0

    def test_target_stitch_center_crops_full_res(self):
        seg = 32
        off = (128 - seg) // 2  # 48
        preds = np.stack([np.full((seg, seg), 7, np.uint8)])
        canvas = PR.stitch_target_preds(preds, [5], self.GRID, seg_size=seg)
        assert canvas.shape == (300, 500)
        y, x = 128 + off, 128 + off  # tile 5 = row 1, col 1
        assert (canvas[y : y + seg, x : x + seg] == 7).all()
        canvas[y : y + seg, x : x + seg] = 0
        assert (canvas == 0).all()  # nothing outside the center crop

    def test_target_stitch_clips_at_boundary(self):
        seg = 32
        # tile 11 (row 2, col 3) starts at (256, 384); crop at (304, 432)
        # exceeds the 300-row slide entirely in y -> skipped, no error.
        preds = np.stack([np.full((seg, seg), 9, np.uint8)])
        canvas = PR.stitch_target_preds(preds, [11], self.GRID, seg_size=seg)
        assert (canvas == 0).all()
