"""Run-dir management and meters (parity: ``src/utils/utils.py:10-24``
increment_path; ``tools/ssl_train.py:502-541`` AverageMeter/ProgressMeter;
``tools/ssl_finetune.py:614-634`` BestRecorder)."""

from __future__ import annotations

import glob
import os
import re
from pathlib import Path

__all__ = [
    "increment_path",
    "dump_config",
    "AverageMeter",
    "ProgressMeter",
    "BestRecorder",
    "cal_mean_and_std",
    "prefetch_iter",
]


def prefetch_iter(iterable, depth: int = 1):
    """Run ``iterable`` on a background thread, keeping up to ``depth``
    items ready ahead of the consumer.

    Used to overlap host-side slide work (PNG decode + cv2 view build,
    which release the GIL) with device compute in the validation loops.
    Preserves order; exceptions from the producer re-raise at the
    consumer's next ``next()``; the producer thread is a daemon and stops
    early if the consumer abandons the iterator.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    done = object()
    stop = threading.Event()

    def put(msg) -> bool:
        while not stop.is_set():
            try:
                q.put(msg, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for item in iterable:
                if not put((False, item)):
                    return
            put((True, done))
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            put((True, e))

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            is_last, item = q.get()
            if is_last:
                if item is done:
                    return
                raise item
            yield item
    finally:
        stop.set()


def cal_mean_and_std(image_iter, max_value: float = 255.0):
    """Dataset channel mean/std in one streaming pass (Welford-style sums) —
    the statistics helper behind the per-dataset ``--mean/--std`` values in
    the recipes (parity: ``src/utils/utils.py:26-62``).

    ``image_iter`` yields (H, W, C) uint8/float arrays; returns
    (mean, std) as length-C float lists scaled to [0, 1].
    """
    import numpy as np

    n = 0
    s1 = None
    s2 = None
    for img in image_iter:
        x = np.asarray(img, dtype=np.float64) / max_value
        x = x.reshape(-1, x.shape[-1])
        if s1 is None:
            s1 = x.sum(axis=0)
            s2 = (x**2).sum(axis=0)
        else:
            s1 += x.sum(axis=0)
            s2 += (x**2).sum(axis=0)
        n += x.shape[0]
    if n == 0:
        raise ValueError("cal_mean_and_std: image_iter yielded no images")
    mean = s1 / n
    std = np.sqrt(s2 / n - mean**2)
    return mean.tolist(), std.tolist()


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """YOLOv5-style run-dir auto-increment: runs/exp -> runs/exp{sep}2, ..."""
    path = Path(path)
    if path.exists() and not exist_ok:
        suffix = path.suffix
        path = path.with_suffix("")
        dirs = glob.glob(f"{path}{sep}*")
        matches = [re.search(rf"%s{sep}(\d+)" % re.escape(path.stem), d) for d in dirs]
        i = [int(m.groups()[0]) for m in matches if m]
        n = max(i) + 1 if i else 2
        path = Path(f"{path}{sep}{n}{suffix}")
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def dump_config(log_dir: str, args) -> None:
    """Write every flag to configs.txt (``ssl_train.py:55-57``)."""
    with open(os.path.join(log_dir, "configs.txt"), "w") as f:
        for key in vars(args):
            f.write(f"{key}: {getattr(args, key)}\n")


class AverageMeter:
    """Weighted running mean that also remembers the last value.

    ``str()`` renders ``"<name> <val> (<avg>)"`` — the reference's training
    log line format (``ssl_train.py:502-518``), which downstream log parsing
    may rely on. ``fmt`` is a ``":"``-prefixed format spec (e.g. ``":6.3f"``).
    """

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    def __str__(self):
        spec = self.fmt.removeprefix(":")
        return f"{self.name} {self.val:{spec}} ({self.avg:{spec}})"


class ProgressMeter:
    """Joins a ``prefix[batch/total]`` heading with its meters, tab-separated
    (log-format parity: ``ssl_train.py:521-536``)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.total = num_batches
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int) -> str:
        width = len(str(self.total))
        heading = f"{self.prefix}[{batch:{width}d}/{self.total}]"
        return "\t".join([heading, *(str(m) for m in self.meters)])


class BestRecorder:
    """Tracks the best value seen so far; ``update`` returns
    ``(best, improved)`` (parity: ``ssl_finetune.py:614-634``)."""

    def __init__(self, mode: str):
        if mode not in ("min", "max"):
            raise ValueError(f"invalid mode: {mode!r}")
        self._better = (lambda a, b: a < b) if mode == "min" else (lambda a, b: a > b)
        self.mode = mode
        self.best = float("inf") if mode == "min" else float("-inf")

    def update(self, val):
        improved = self._better(val, self.best)
        if improved:
            self.best = val
        return self.best, improved
