"""Embedding-extraction tests (`train/features.py`): the deterministic
two-branch feature forward, sub-tile ordering, chunked-datapath plumbing.

No reference counterpart exists (the reference's encoders can only be
consumed by further training); the contracts tested are internal: the
target branch must see exactly the reference's ``blockshaped`` sub-tile
grid (``src/utils/data/bcss.py:203-216``) in spatial order, and the
chunked path must reproduce direct calls."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfwsi_tpu.data.pipeline import AugConfig, _to_float
from msfwsi_tpu.models.backbone import MSFWSI
from msfwsi_tpu.ops import augment as A
from msfwsi_tpu.train import features as F
from msfwsi_tpu.train.predict import predict_slide

SCALE = 2  # K = 4
TILE = 64
IMG = 32


@pytest.fixture(scope="module")
def model_vars():
    model = MSFWSI(arch="resnet10", scale=SCALE, dtype=jnp.float32)
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    # Init only the two encoders (what a pruned checkpoint supplies).
    vc = model.init(k1, x, train=False, method=MSFWSI.encode_context)
    vt = model.init(k2, x, train=False, method=MSFWSI.encode_target)
    variables = {
        col: {**vc.get(col, {}), **vt.get(col, {})} for col in ("params", "batch_stats")
    }
    return model, variables


@pytest.fixture(scope="module")
def tiles():
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, size=(5, TILE, TILE, 3), dtype=np.uint8)


def _cfg():
    return AugConfig(img_size=IMG)


def test_feature_spec_dims_and_order(model_vars):
    model, _ = model_vars
    spec = F.feature_spec(model, branches=("context", "target"), scales=(1, 2, 3, 4))
    assert spec == [
        ("context", 1, 64), ("context", 2, 128), ("context", 3, 256), ("context", 4, 512),
        ("target", 1, 64), ("target", 2, 128), ("target", 3, 256), ("target", 4, 512),
    ]
    assert F.feature_spec(model, branches=("target",), scales=(4,)) == [("target", 4, 512)]


def test_bad_args_raise(model_vars):
    model, _ = model_vars
    with pytest.raises(ValueError, match="branches"):
        F.make_chunk_features(model, branches=("bogus",))
    with pytest.raises(ValueError, match="scales"):
        F.make_chunk_features(model, scales=(0, 5))


def test_shapes_and_dtype(model_vars, tiles):
    model, variables = model_vars
    fn = F.make_chunk_features(model, cfg=_cfg())
    out = fn(variables, tiles)
    assert len(out) == 8
    for i, (b, s, c) in enumerate(F.feature_spec(model)):
        want = (5, c) if b == "context" else (5, SCALE**2, c)
        assert out[i].shape == want, (b, s)
        assert out[i].dtype == jnp.float16


def test_context_matches_direct_encode(model_vars, tiles):
    """Context features == encoding resize+normalize(tile) directly."""
    model, variables = model_vars
    cfg = _cfg()
    fn = F.make_chunk_features(model, cfg=cfg, branches=("context",), out_dtype=jnp.float32)
    out = fn(variables, tiles)

    x = A.normalize(A.resize_bilinear(_to_float(jnp.asarray(tiles)), IMG), cfg.mean, cfg.std)
    direct = jax.jit(
        lambda v, x: model.apply(v, x, train=False, method=MSFWSI.encode_context)
    )(variables, x)
    for got, want in zip(out, direct):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_target_subtile_order_is_blockshaped(model_vars, tiles):
    """target[:, k] must be the k-th spatial (row-major) sub-tile's
    encoding: encode the manually-sliced block and compare."""
    model, variables = model_vars
    cfg = _cfg()
    fn = F.make_chunk_features(model, cfg=cfg, branches=("target",), scales=(4,),
                               out_dtype=jnp.float32)
    (tgt,) = fn(variables, tiles)  # (5, 4, 512)

    sub = TILE // SCALE
    for k in (0, 1, 3):  # corners + last of the 2x2 grid
        r, c = divmod(k, SCALE)
        block = tiles[:, r * sub : (r + 1) * sub, c * sub : (c + 1) * sub]
        x = A.normalize(A.resize_bilinear(_to_float(jnp.asarray(block)), IMG), cfg.mean, cfg.std)
        direct = jax.jit(
            lambda v, x: model.apply(v, x, train=False, method=MSFWSI.encode_target)
        )(variables, x)[3]
        np.testing.assert_allclose(
            np.asarray(tgt[:, k]), np.asarray(direct), rtol=2e-5, atol=2e-5
        )


def test_predict_slide_chunking_matches_manual(model_vars, tiles):
    """The shared chunked datapath (pad / double-buffer / trim) reproduces
    calling the chunk function by hand — exact."""
    model, variables = model_vars
    fn = F.make_chunk_features(model, cfg=_cfg(), branches=("context",), scales=(4,))
    (feats,) = predict_slide(fn, variables, (tiles,), chunk=4)
    assert feats.shape == (5, 512)

    padded = np.concatenate([tiles, np.zeros((3, TILE, TILE, 3), np.uint8)])
    outs = [fn(variables, padded[i : i + 4]) for i in (0, 4)]
    manual = np.concatenate([np.asarray(o[0]) for o in outs])[:5]
    np.testing.assert_array_equal(feats, manual)


def test_indivisible_tile_raises(model_vars):
    model, variables = model_vars
    fn = F.make_chunk_features(model, cfg=_cfg(), branches=("target",))
    bad = np.zeros((2, 67, 67, 3), np.uint8)  # 67 % SCALE != 0
    with pytest.raises(ValueError, match="divisible"):
        fn(variables, bad)


def test_knn_predict_matches_numpy_oracle():
    """`linear_probe.py --probe knn` == the Wu et al. weighted-kNN rule
    computed straightforwardly in NumPy, including across chunk boundaries
    (chunk=8 forces two chunks + padding on 11 queries)."""
    import os
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import linear_probe as LP  # noqa: E402

    rng = np.random.default_rng(7)
    num_classes, k, temp = 4, 5, 0.07
    X_tr = rng.normal(size=(23, 16)).astype(np.float32)
    y_tr = rng.integers(0, num_classes, size=23).astype(np.int32)
    X_va = rng.normal(size=(11, 16)).astype(np.float32)

    got = LP._knn_predict(X_tr, y_tr, X_va, num_classes, k, temp, chunk=8)

    n = lambda a: a / (np.linalg.norm(a, axis=1, keepdims=True) + 1e-12)
    sim = n(X_va) @ n(X_tr).T  # (11, 23)
    want = np.empty(11, np.int32)
    for i in range(11):
        top = np.argsort(sim[i])[::-1][:k]
        votes = np.zeros(num_classes)
        for j in top:
            votes[y_tr[j]] += np.exp(sim[i, j] / temp)
        want[i] = np.argmax(votes)
    np.testing.assert_array_equal(got, want)

    # k larger than the train set must clamp, not crash.
    small = LP._knn_predict(X_tr[:3], y_tr[:3], X_va, num_classes, 50, temp)
    assert small.shape == (11,)


def test_knn_exclude_self_is_leave_one_out():
    """Scoring the train set with exclude_self=True must ignore each query's
    own sim=1 column (Wu et al./DINO leave-one-out protocol): with k=1 every
    prediction is the label of the nearest *other* row, not its own."""
    import os
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import linear_probe as LP  # noqa: E402

    # Pairs of near-identical points with DIFFERENT labels: self-match would
    # score acc=1.0; leave-one-out must predict the partner's label -> acc=0.
    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 8)).astype(np.float32)
    X_tr = np.repeat(base, 2, axis=0) + rng.normal(scale=1e-3, size=(12, 8)).astype(np.float32)
    y_tr = np.tile([0, 1], 6).astype(np.int32)

    loo = LP._knn_predict(X_tr, y_tr, X_tr, 2, k=1, temperature=0.07, chunk=5,
                          exclude_self=True)
    np.testing.assert_array_equal(loo, 1 - y_tr)  # partner's label, every row

    with_self = LP._knn_predict(X_tr, y_tr, X_tr, 2, k=1, temperature=0.07)
    np.testing.assert_array_equal(with_self, y_tr)  # the artifact, for contrast

    # exclude_self clamps k to N-1 (all-but-self) without crashing.
    big_k = LP._knn_predict(X_tr, y_tr, X_tr, 2, k=50, temperature=0.07,
                            exclude_self=True)
    assert big_k.shape == (12,)


def test_random_weights_equal_epoch0_training_state():
    """``extract_features.py --weights random`` exports features of exactly
    the epoch-0 model a training run with the same ``--seed`` would start
    from: the CLI helper's pruned variables match ``create_ssl_state``'s."""
    import logging
    import os
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import extract_features as X  # noqa: E402

    from msfwsi_tpu.train import ssl as S

    seed, img = 11, IMG
    model = MSFWSI(arch="resnet10", scale=SCALE, dtype=jnp.float32)
    got = X._random_init_variables(
        model, ("context", "target"), seed, img, logging.getLogger("test")
    )
    cfg = S.SSLConfig(arch="resnet10", scale=SCALE, img_size=img, seed=seed,
                      shuffle_views=model.views_shuffled)
    state = S.create_ssl_state(jax.random.key(seed), cfg)
    want_p = {k: v for k, v in state.params.items() if k.endswith("_encoder")}
    want_s = {k: v for k, v in state.batch_stats.items() if k.endswith("_encoder")}

    assert set(got["params"]) == set(want_p) == {"context_encoder", "target_encoder"}
    jax.tree.map(np.testing.assert_array_equal, dict(got["params"]), want_p)
    jax.tree.map(np.testing.assert_array_equal, dict(got["batch_stats"]), want_s)
