"""Linear/kNN-probe evaluation of SSL features — score a pretrained
encoder without fine-tuning.

The reference's only measure of SSL quality is a full HookNet fine-tune
(50 epochs, ``scripts/bcss.sh:24-40``); the community-standard quick
check — freeze the encoder, fit a linear classifier on tile embeddings —
has no counterpart there. This tool fits a multinomial logistic-regression
head on features exported by ``tools/extract_features.py`` and reports
smp-compatible micro / per-class F1 and accuracy (``ops/metrics.py``).
``--probe knn`` instead runs the fit-free weighted-kNN classifier
(cosine similarity, exp(sim/T)-weighted class votes over the top-k train
neighbours — the protocol of Wu et al. 2018 as used by DINO/MoCo evals).

Tile labels derive from the prep CSV's class-area ratios: a tile's label
is its dominant class (argmax of [background = 1 - ratio_masked_area,
ratio_masked_1_area, ...]) — the standard tile-level reduction of the
segmentation ground truth.

Workflow:
  python tools/extract_features.py --train-data P --split train --out F_tr ...
  python tools/extract_features.py --train-data P --split val   --out F_va ...
  python tools/linear_probe.py --features F_tr --features-val F_va \
      --train-data P --data-name bcss
"""

import argparse
import json
import os
import os.path as osp
import sys

import _common  # noqa: F401
from _common import add_error_capture


def main(args):
    from msfwsi_tpu.utils import dump_config, increment_path

    args.log_dir = str(increment_path(args.log_dir, sep="_", mkdir=True))
    dump_config(args.log_dir, args)
    add_error_capture(args.log_dir)(main_worker)(args)


def _load_labels(train_data, data_name):
    """(slide, stem) -> dominant-class id, from the prep CSV ratios."""
    import pandas as pd

    name = "data.csv" if data_name == "bcss" else "train_data.csv"
    df = pd.read_csv(osp.join(train_data, name))
    ratio_cols = []
    c = 1
    while f"ratio_masked_{c}_area" in df.columns:
        ratio_cols.append(f"ratio_masked_{c}_area")
        c += 1
    if not ratio_cols:
        raise ValueError(f"{name} has no ratio_masked_<c>_area columns")
    import numpy as np

    ratios = df[ratio_cols].to_numpy(dtype=np.float64)
    bg = 1.0 - df["ratio_masked_area"].to_numpy(dtype=np.float64)
    labels = np.argmax(np.concatenate([bg[:, None], ratios], axis=1), axis=1)
    out = {}
    for fname_img, slide, y in zip(df["filename_img"], df["filename"], labels):
        stem = osp.splitext(osp.basename(fname_img))[0]
        out[(slide, stem)] = int(y)
    return out, len(ratio_cols) + 1  # classes 0 (bg) .. C


def _load_features(feat_dir, key, labels, agg, logger):
    """Stack (X, y) from a features dir written by extract_features.py."""
    import numpy as np

    xs, ys, missing = [], [], 0
    slides = sorted(f for f in os.listdir(feat_dir) if f.endswith(".npz"))
    if not slides:
        raise FileNotFoundError(f"no .npz feature files under {feat_dir}")
    for f in slides:
        slide = osp.splitext(f)[0]
        z = np.load(osp.join(feat_dir, f))
        if key not in z.files:
            raise KeyError(
                f"{f} has no key {key!r} (has {sorted(set(z.files) - {'stems'})}); "
                "re-run extract_features.py with matching --branch/--scales"
            )
        x = z[key].astype(np.float32)
        if x.ndim == 3:  # target branch: (T, K, C)
            x = x.mean(axis=1) if agg == "mean" else x.reshape(x.shape[0], -1)
        for stem, row in zip(z["stems"], x):
            y = labels.get((slide, str(stem)))
            if y is None:
                missing += 1
                continue
            xs.append(row)
            ys.append(y)
    if missing:
        logger.warning(f"=> {missing} tiles in {feat_dir} have no CSV label; skipped")
    if not xs:
        raise ValueError(f"no labeled tiles found in {feat_dir}")
    return np.stack(xs), np.asarray(ys, np.int32)


def _fit_probe(X, y, num_classes, epochs, lr, l2, seed):
    """Full-batch Adam on softmax cross-entropy (+ L2 on W)."""
    import jax
    import jax.numpy as jnp
    import optax

    W = jax.random.normal(jax.random.key(seed), (X.shape[1], num_classes)) * 0.01
    b = jnp.zeros((num_classes,))
    tx = optax.adam(lr)
    opt = tx.init((W, b))
    Xd, yd = jnp.asarray(X), jnp.asarray(y)

    def loss_fn(params):
        W, b = params
        logits = Xd @ W + b
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, yd).mean()
        return ce + l2 * jnp.sum(W * W)

    @jax.jit
    def step(params, opt):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    params = (W, b)
    loss = None
    for _ in range(epochs):
        params, opt, loss = step(params, opt)
    return jax.device_get(params), float(loss)


def _knn_predict(
    X_tr, y_tr, X_va, num_classes, k, temperature, chunk=4096, exclude_self=False
):
    """Weighted-kNN class prediction (Wu et al. 2018 protocol).

    Cosine similarity on L2-normalized embeddings; each of the top-k train
    neighbours votes its label with weight exp(sim / T). Chunked over val
    rows so the (N_va, N_tr) similarity matrix never materializes whole.

    ``exclude_self=True`` is for scoring the train split against itself:
    query row i is train row i, so its own sim=1 column is masked to -inf
    before top_k (the Wu et al./DINO convention — otherwise the self vote's
    exp(1/0.07) weight dominates and train accuracy is ~1.0 by construction).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    k = min(k, X_tr.shape[0] - 1 if exclude_self else X_tr.shape[0])
    k = max(k, 1)
    norm = lambda a: a / (np.linalg.norm(a, axis=1, keepdims=True) + 1e-12)
    Xt = jnp.asarray(norm(X_tr))
    yt = jnp.asarray(y_tr)

    @jax.jit
    def predict(q, base):  # (chunk, D), scalar global offset -> (chunk,) labels
        sim = q @ Xt.T  # (chunk, N_tr)
        if exclude_self:
            self_col = base + jnp.arange(q.shape[0])[:, None]  # (chunk, 1)
            sim = jnp.where(
                self_col == jnp.arange(Xt.shape[0])[None, :], -jnp.inf, sim
            )
        top_sim, top_idx = jax.lax.top_k(sim, k)
        w = jnp.exp(top_sim / temperature)  # (chunk, k)
        onehot = jax.nn.one_hot(yt[top_idx], num_classes)  # (chunk, k, C)
        votes = jnp.einsum("nk,nkc->nc", w, onehot)
        return jnp.argmax(votes, axis=1).astype(jnp.int32)

    Xq = norm(X_va)
    preds = []
    for i in range(0, Xq.shape[0], chunk):
        q = Xq[i : i + chunk]
        pad = chunk - q.shape[0]  # fixed shape -> one compile
        if pad:
            q = np.pad(q, ((0, pad), (0, 0)))
        preds.append(np.asarray(predict(jnp.asarray(q), i))[: chunk - pad])
    return np.concatenate(preds)


def _score(X, y, params, num_classes, pred=None):
    import numpy as np

    from msfwsi_tpu.ops import metrics as M

    if pred is None:
        W, b = params
        pred = np.argmax(X @ W + b, axis=1).astype(np.int32)
    tp, fp, fn, tn = (np.asarray(s) for s in M.get_stats(pred[None], y[None], num_classes))
    return {
        "acc": float((pred == y).mean()),
        "micro_f1": float(M.f1_score(tp, fp, fn, tn, reduction="micro")),
        "f1_per_class": [float(v) for v in np.asarray(M.f1_score(tp, fp, fn, tn))[0]],
    }


def _bootstrap_ci(pred, y, n_boot: int = 10000, seed: int = 0):
    """Nonparametric 95% CI of accuracy over tiles (resample tiles with
    replacement) — at 36-tile val columns the point estimate alone
    overstates the precision; the interval is the honest report."""
    import numpy as np

    rng = np.random.default_rng(seed)
    N = len(y)
    idx = rng.integers(0, N, size=(n_boot, N))
    accs = (pred[idx] == y[idx]).mean(axis=1)
    return [float(np.percentile(accs, 2.5)), float(np.percentile(accs, 97.5))]


def main_worker(args):
    import numpy as np

    from msfwsi_tpu.utils import setup_logger

    logger = setup_logger(args.log_dir, name="MSF-WSI")
    logger.info(" ".join([sys.executable, *sys.argv]))

    labels, num_classes = _load_labels(args.train_data, args.data_name)
    X_tr, y_tr = _load_features(args.features, args.key, labels, args.agg, logger)
    X_va, y_va = _load_features(args.features_val, args.key, labels, args.agg, logger)
    logger.info(
        f"=> probe on {args.key}: {X_tr.shape[0]} train / {X_va.shape[0]} val tiles, "
        f"{X_tr.shape[1]} dims, {num_classes} classes"
    )

    if args.probe == "knn":
        k = min(args.knn_k, X_tr.shape[0])
        logger.info(f"=> weighted kNN: k={k}, T={args.knn_t} (no fit)")
        pred_tr = _knn_predict(
            X_tr, y_tr, X_tr, num_classes, k, args.knn_t, exclude_self=True
        )
        pred_va = _knn_predict(X_tr, y_tr, X_va, num_classes, k, args.knn_t)
        results = {
            "train": _score(X_tr, y_tr, None, num_classes, pred=pred_tr),
            "val": _score(X_va, y_va, None, num_classes, pred=pred_va),
        }
        params = mu = sigma = None
    else:
        # Standardize with train statistics (a probe convention, not a model
        # change — the affine folds into (W, b)).
        mu = X_tr.mean(axis=0)
        sigma = X_tr.std(axis=0) + 1e-6
        X_tr = (X_tr - mu) / sigma
        X_va = (X_va - mu) / sigma

        params, final_loss = _fit_probe(
            X_tr, y_tr, num_classes, args.epochs, args.lr, args.l2, args.seed
        )
        logger.info(f"=> fitted {args.epochs} epochs, final loss {final_loss:.4f}")

        W, b = params
        pred_tr = np.argmax(X_tr @ W + b, axis=1).astype(np.int32)
        pred_va = np.argmax(X_va @ W + b, axis=1).astype(np.int32)
        results = {
            "train": _score(X_tr, y_tr, params, num_classes, pred=pred_tr),
            "val": _score(X_va, y_va, params, num_classes, pred=pred_va),
        }
    results["val"]["acc_ci95"] = _bootstrap_ci(pred_va, y_va)
    results["val"]["pred"] = [int(v) for v in pred_va]
    results["val"]["labels"] = [int(v) for v in y_va]
    for split, r in results.items():
        logger.info(
            f"=> {split}: acc {r['acc']:.4f}"
            + (
                "  ci95 [%.3f, %.3f]" % tuple(r["acc_ci95"])
                if "acc_ci95" in r
                else ""
            )
            + f"  micro-F1 {r['micro_f1']:.4f}  "
            f"per-class F1 {['%.3f' % v for v in r['f1_per_class']]}"
        )

    out = args.out or osp.join(args.log_dir, "probe")
    if params is not None:
        np.savez(
            out + ".npz", W=params[0], b=params[1], mu=mu, sigma=sigma,
            key=args.key, num_classes=num_classes,
        )
    with open(out + ".json", "w") as f:
        json.dump(
            {"key": args.key, "probe": args.probe, "num_classes": num_classes,
             **results},
            f, indent=2,
        )
    logger.info(
        f"=> wrote {out}.json" + ("" if params is None else f" / {out}.npz")
    )
    return results


def build_parser():
    parser = argparse.ArgumentParser(description="MSF-WSI/TPU linear probe")
    parser.add_argument("--features", type=str, required=True,
                        help="train features dir (extract_features.py --split train)")
    parser.add_argument("--features-val", type=str, required=True,
                        help="val features dir (extract_features.py --split val)")
    parser.add_argument("--train-data", type=str, required=True,
                        help="prepared dataset root (labels come from its CSV ratios)")
    parser.add_argument("--data-name", type=str, default="bcss", choices=("bcss", "paip"))
    parser.add_argument("--key", type=str, default="context_s4",
                        help="feature key to probe (e.g. context_s4, target_s4)")
    parser.add_argument("--agg", choices=("mean", "flatten"), default="mean",
                        help="how to pool target-branch (T, K, C) stacks")
    parser.add_argument("--probe", choices=("linear", "knn"), default="linear",
                        help="linear = fit logistic regression; knn = fit-free "
                        "weighted kNN (cosine sim, exp(sim/T) votes)")
    parser.add_argument("--knn-k", type=int, default=20,
                        help="neighbours for --probe knn (clamped to N_train)")
    parser.add_argument("--knn-t", type=float, default=0.07,
                        help="vote temperature for --probe knn")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--l2", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=3407)
    parser.add_argument("--log-dir", default="./logs/temp", type=str)
    parser.add_argument("--out", type=str, help="output stem (default <log_dir>/probe)")
    return parser


PARSER = build_parser()

if __name__ == "__main__":
    main(PARSER.parse_args())
