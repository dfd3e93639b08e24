"""The normalization-footgun guard (tools/_common.check_norm_stats): eval /
finetune / predict warn when --mean/--std differ from the stats recorded in
the checkpoint's training-run configs.txt (a silent ~40-F1-point trap —
BASELINE.md convergence-run note; the reference shares the trap and has no
guard)."""

import logging
import os
import sys
from argparse import Namespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "tools"))

from _common import check_norm_stats  # noqa: E402

TRAINED_MEAN = [0.6998, 0.4785, 0.6609]
TRAINED_STD = [0.2203, 0.2407, 0.1983]
IMAGENET = Namespace(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225])


def _run_dir(tmp_path, ckpt_is_dir=True):
    run = tmp_path / "run"
    os.makedirs(run, exist_ok=True)
    (run / "configs.txt").write_text(
        f"arch: resnet18\nmean: {TRAINED_MEAN}\nstd: {TRAINED_STD}\nfold: 0\n"
    )
    if ckpt_is_dir:
        ckpt = run / "best_ft_model"
        os.makedirs(ckpt, exist_ok=True)
        return str(ckpt)
    ckpt = run / "best_ft_model.pth.tar"
    ckpt.write_bytes(b"")
    return str(ckpt)


def test_warns_on_mismatched_stats(tmp_path, caplog):
    ckpt = _run_dir(tmp_path)
    with caplog.at_level(logging.WARNING, logger="MSF-WSI"):
        check_norm_stats(IMAGENET, ckpt)
    assert "differs from the checkpoint's training run" in caplog.text
    assert "--mean 0.6998 0.4785 0.6609" in caplog.text  # copy-pasteable fix


def test_warns_for_pth_file_next_to_configs(tmp_path, caplog):
    ckpt = _run_dir(tmp_path, ckpt_is_dir=False)
    with caplog.at_level(logging.WARNING, logger="MSF-WSI"):
        check_norm_stats(IMAGENET, ckpt)
    assert "differs from the checkpoint's training run" in caplog.text


def test_silent_on_matching_stats(tmp_path, caplog):
    ckpt = _run_dir(tmp_path)
    args = Namespace(mean=list(TRAINED_MEAN), std=list(TRAINED_STD))
    with caplog.at_level(logging.WARNING, logger="MSF-WSI"):
        check_norm_stats(args, ckpt)
    assert caplog.text == ""


def test_silent_without_configs(tmp_path, caplog):
    ckpt = tmp_path / "bare" / "checkpoint_0001"
    os.makedirs(ckpt)
    with caplog.at_level(logging.WARNING, logger="MSF-WSI"):
        check_norm_stats(IMAGENET, str(ckpt))
    assert caplog.text == ""


def test_silent_on_unparseable_configs(tmp_path, caplog):
    run = tmp_path / "run"
    os.makedirs(run)
    (run / "configs.txt").write_text("mean: <garbage\n")
    ckpt = run / "ck"
    os.makedirs(ckpt)
    with caplog.at_level(logging.WARNING, logger="MSF-WSI"):
        check_norm_stats(IMAGENET, str(ckpt))
    assert caplog.text == ""
