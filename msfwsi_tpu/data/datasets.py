"""Dataset manifests: CSV/JSON-driven tile indices with fold filters.

Host-side metadata layer (pandas) — exact parity with the reference's
``src/utils/data/{bcss,paip,camelyon}.py`` selection semantics:

  * BCSS: 5 hardcoded folds of slide-ID codes; membership by
    ``filename.split("-")[1]`` (``bcss.py:13-19,67``); drop rows with
    ``ratio_masked_area < threshold`` (default 0.1); subsample ``frac`` with
    pandas ``sample(random_state=1)`` (``bcss.py:74``); val additionally
    excludes "shift" rows (``bcss.py:136``).
  * PAIP: ``train_data.csv``; fold membership by full filename
    (``paip.py:13-19,70``); seg threshold 0.7 (``paip.py:28``), pretrain 0.1;
    ``fold=-1`` -> use all files (``paip.py:210-211``).
  * Camelyon16: ``dataset.json`` manifest with per-epoch resampling of
    ``n_sample`` tiles per slide (``camelyon.py:56-83``) — here driven by an
    explicit epoch seed so every host resamples identically (the
    deterministic replacement for ``broadcast_object_list``,
    ``ssl_train.py:356-360``).

Pixel loading lives in :mod:`.loader`; these classes only decide *which*
files are in play.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random

import pandas as pd

__all__ = [
    "BCSS_VAL_SET",
    "PAIP_VAL_SET",
    "SegSample",
    "SlideGroup",
    "bcss_pretrain_files",
    "bcss_seg_samples",
    "bcss_seg_val_slides",
    "paip_pretrain_files",
    "paip_seg_samples",
    "paip_seg_val_slides",
    "seg_slide_groups",
    "Camelyon16Manifest",
]

# bcss.py:13-19
BCSS_VAL_SET = [
    ["OL", "LL", "E2", "EW", "GM", "S3"],
    ["E2", "EW", "HN", "D8", "AC", "AQ"],
    ["BH", "EW", "LL", "GI", "A1", "A7"],
    ["E9", "BH", "A8", "AR", "EW", "LL"],
    ["D8", "AQ", "AR", "C8", "OL", "A7"],
]

# paip.py:13-19
PAIP_VAL_SET = [
    ["01_01_0100", "01_01_0101", "01_01_0103", "01_01_0106", "01_01_0113",
     "01_01_0115", "01_01_0120", "01_01_0121", "01_01_0133", "01_01_0135"],
    ["01_01_0083", "01_01_0093", "01_01_0096", "01_01_0107", "01_01_0110",
     "01_01_0113", "01_01_0118", "01_01_0121", "01_01_0123", "01_01_0131"],
    ["01_01_0088", "01_01_0100", "01_01_0104", "01_01_0115", "01_01_0122",
     "01_01_0128", "01_01_0129", "01_01_0132", "01_01_0133", "01_01_0134"],
    ["01_01_0083", "01_01_0085", "01_01_0094", "01_01_0101", "01_01_0104",
     "01_01_0108", "01_01_0117", "01_01_0122", "01_01_0124", "01_01_0133"],
    ["01_01_0089", "01_01_0091", "01_01_0094", "01_01_0108", "01_01_0110",
     "01_01_0122", "01_01_0123", "01_01_0127", "01_01_0134", "01_01_0137"],
]


@dataclasses.dataclass(frozen=True)
class SegSample:
    img: str
    mask: str


@dataclasses.dataclass(frozen=True)
class SlideGroup:
    filename: str
    samples: tuple[SegSample, ...]


def _bcss_slide_code(series: pd.Series) -> pd.Series:
    return series.str.split("-").str[1]


def _apply_common(df, threshold: float, frac: float):
    df = df[df["ratio_masked_area"] >= threshold].reset_index(drop=True)
    # bcss.py:74 — fixed random_state so subsampling is reproducible.
    return df.sample(frac=frac, replace=False, random_state=1).reset_index(drop=True)


def _read_csv(data_path: str, name: str) -> pd.DataFrame:
    return pd.read_csv(os.path.join(data_path, name))


def bcss_pretrain_files(
    data_path: str, fold: int = 0, threshold: float = 0.1, frac: float = 1.0
) -> list[str]:
    """Train-fold tile image paths (relative to ``data_path``)."""
    df = _read_csv(data_path, "data.csv")
    df = df[~_bcss_slide_code(df["filename"]).isin(BCSS_VAL_SET[fold])].reset_index(drop=True)
    df = _apply_common(df, threshold, frac)
    return df["filename_img"].tolist()


def bcss_seg_samples(
    data_path: str, fold: int = 0, threshold: float = 0.1, frac: float = 1.0
) -> list[SegSample]:
    df = _read_csv(data_path, "data.csv")
    df = df[~_bcss_slide_code(df["filename"]).isin(BCSS_VAL_SET[fold])].reset_index(drop=True)
    df = _apply_common(df, threshold, frac)
    return [SegSample(i, m) for i, m in zip(df["filename_img"], df["filename_mask"])]


def bcss_seg_val_slides(
    data_path: str, fold: int = 0, threshold: float = 0.1
) -> list[SlideGroup]:
    df = _read_csv(data_path, "data.csv")
    df = df[_bcss_slide_code(df["filename"]).isin(BCSS_VAL_SET[fold])].reset_index(drop=True)
    df = df[~df["filename"].str.contains("shift")].reset_index(drop=True)
    df = df[df["ratio_masked_area"] >= threshold].reset_index(drop=True)
    groups = []
    for fname in df["filename"].unique():
        sub = df[df["filename"] == fname]
        groups.append(
            SlideGroup(
                fname,
                tuple(SegSample(i, m) for i, m in zip(sub["filename_img"], sub["filename_mask"])),
            )
        )
    return groups


def paip_pretrain_files(
    data_path: str, fold: int = 0, threshold: float = 0.1, frac: float = 1.0
) -> list[str]:
    df = _read_csv(data_path, "train_data.csv")
    if fold != -1:  # paip.py:210-211 — fold -1 keeps every training file
        df = df[~df["filename"].isin(PAIP_VAL_SET[fold])].reset_index(drop=True)
    df = _apply_common(df, threshold, frac)
    return df["filename_img"].tolist()


def paip_seg_samples(
    data_path: str, fold: int = 0, threshold: float = 0.7, frac: float = 1.0
) -> list[SegSample]:
    df = _read_csv(data_path, "train_data.csv")
    df = df[~df["filename"].isin(PAIP_VAL_SET[fold])].reset_index(drop=True)
    df = _apply_common(df, threshold, frac)
    return [SegSample(i, m) for i, m in zip(df["filename_img"], df["filename_mask"])]


def paip_seg_val_slides(
    data_path: str, fold: int = 0, threshold: float = 0.7
) -> list[SlideGroup]:
    df = _read_csv(data_path, "train_data.csv")
    df = df[df["filename"].isin(PAIP_VAL_SET[fold])].reset_index(drop=True)
    df = df[df["ratio_masked_area"] >= threshold].reset_index(drop=True)
    groups = []
    for fname in df["filename"].unique():
        sub = df[df["filename"] == fname]
        groups.append(
            SlideGroup(
                fname,
                tuple(SegSample(i, m) for i, m in zip(sub["filename_img"], sub["filename_mask"])),
            )
        )
    return groups


def seg_slide_groups(
    data_path: str,
    data_name: str,
    fold: int = 0,
    split: str = "val",
    threshold: float | None = None,
) -> list[SlideGroup]:
    """Slide-grouped tiles of either side of a fold — the generic form
    behind the feature-export/probe tools.

    ``split="val"`` matches the validation contract exactly
    (``bcss_seg_val_slides``/``paip_seg_val_slides``: shift tiles excluded,
    reference ``src/utils/data/bcss.py:135-136``). ``split="train"`` is the
    complement with the seg-train table semantics (same threshold default,
    shift variants included — they are real training tiles in the
    reference, ``bcss.py:67-71``), grouped by slide for per-slide outputs.
    Thresholds default per dataset: bcss 0.1, paip 0.7.
    """
    if split not in ("val", "train"):
        raise ValueError(f"split must be 'val' or 'train', got {split!r}")
    if data_name == "bcss":
        df = _read_csv(data_path, "data.csv")
        in_val = _bcss_slide_code(df["filename"]).isin(BCSS_VAL_SET[fold])
        threshold = 0.1 if threshold is None else threshold
    elif data_name == "paip":
        df = _read_csv(data_path, "train_data.csv")
        in_val = df["filename"].isin(PAIP_VAL_SET[fold])
        threshold = 0.7 if threshold is None else threshold
    else:
        raise ValueError(f"unknown data_name {data_name!r}")
    df = df[in_val if split == "val" else ~in_val].reset_index(drop=True)
    if split == "val":
        df = df[~df["filename"].str.contains("shift")].reset_index(drop=True)
    df = df[df["ratio_masked_area"] >= threshold].reset_index(drop=True)
    groups = []
    for fname in df["filename"].unique():
        sub = df[df["filename"] == fname]
        groups.append(
            SlideGroup(
                fname,
                tuple(SegSample(i, m) for i, m in zip(sub["filename_img"], sub["filename_mask"])),
            )
        )
    return groups


class Camelyon16Manifest:
    """JSON-manifest pretrain corpus with per-epoch resampling.

    ``resample(epoch)`` draws ``n_sample`` tiles per slide and shuffles,
    seeded by (seed, epoch) — deterministic across hosts, replacing the
    reference's rank-0 ``reset_data`` + object broadcast
    (``camelyon.py:79-83``, ``ssl_train.py:354-361``).
    """

    def __init__(self, data_path: str, n_sample: int = 500, mode: str = "train", seed: int = 0):
        self.data_path = data_path
        self.n_sample = n_sample
        self.mode = mode
        self.seed = seed
        with open(os.path.join(data_path, "dataset.json")) as f:
            meta = json.load(f)
        self.train_ids = meta["train_ids"]
        self.val_ids = meta["val_ids"]
        self.test_ids = meta["test_ids"]
        self.file_ending = meta.get("file_ending", ".png")

        self.all_data: dict[str, list[str]] = {}
        tr_dir = os.path.join(data_path, "imagesTr")
        if mode == "train":
            for d in sorted(os.listdir(tr_dir)):
                if d in self.train_ids:
                    self.all_data[d] = sorted(
                        f"imagesTr/{d}/{f}" for f in os.listdir(os.path.join(tr_dir, d))
                    )
        elif mode == "all":
            for sub in ("imagesTr", "imagesTs"):
                sdir = os.path.join(data_path, sub)
                if not os.path.isdir(sdir):
                    continue
                for d in sorted(os.listdir(sdir)):
                    self.all_data[d] = sorted(
                        f"{sub}/{d}/{f}" for f in os.listdir(os.path.join(sdir, d))
                    )
        else:
            raise ValueError(f"unknown mode {mode!r}")

    def resample(self, epoch: int) -> list[str]:
        rng = random.Random(f"{self.seed}-{epoch}")
        files = []
        for slide in self.all_data:
            pool = self.all_data[slide]
            files.extend(rng.sample(pool, k=len(pool))[: self.n_sample])
        rng.shuffle(files)
        return files
