"""Host-side streaming tile loader with prefetch.

The reference feeds the GPU from 8 torch DataLoader workers doing PIL decode
+ 36 albumentations calls per sample (``ssl_train.py:267-275``). Here the
host only has to *decode PNGs and batch uint8 pixels* — every augmentation
runs on-device (:mod:`..data.pipeline`) — so a small thread pool saturates
the TPU:

  * files are sharded across hosts like ``DistributedSampler``
    (rank-strided after a seeded global shuffle, ``ssl_train.py:262-263``);
  * batches are decoded into one contiguous buffer by the native C++
    tileio library (parallel libpng/libjpeg, ``msfwsi_tpu/native`` — ~2x a
    PIL thread pool, bit-exact) when available, else a PIL thread pool,
    and staged through a two-stage prefetch pipeline — a decode thread and
    a host->device transfer thread, each buffering ``prefetch`` batches —
    so decode(i+2), H2D(i+1), and compute(i) overlap (``device_put`` blocks
    on some backends, e.g. the tunneled axon TPU, so it gets its own
    thread off the consumer's critical path);
  * arrays are placed on device (optionally with a batch `NamedSharding`)
    as raw uint8 — 4x less PCIe/ICI traffic than float32.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from os import path as osp
from typing import Callable, Iterator, Sequence

import jax
import numpy as np
from PIL import Image

__all__ = ["TileBatchLoader", "load_image", "load_slide_arrays", "synthetic_tile_library"]


def load_image(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im)


def _shard_files(files: list, epoch_seed: int, process_index: int, process_count: int, shuffle: bool):
    files = list(files)
    if shuffle:
        rng = np.random.default_rng(epoch_seed)
        order = rng.permutation(len(files))
        files = [files[i] for i in order]
    if process_count > 1:
        # DistributedSampler parity: pad to a multiple of world size, stride.
        pad = (-len(files)) % process_count
        files = files + files[:pad]
        files = files[process_index::process_count]
    return files


class TileBatchLoader:
    """Iterates device-resident uint8 batches from a file list.

    Args:
      root: directory the manifest paths are relative to.
      files: relative image paths (optionally (img, mask) tuples).
      batch_size: per-host batch size.
      load_fn: file record -> numpy array(s); default: decode single image.
      sharding: optional `jax.sharding.Sharding` for the batch.
      drop_last: drop the trailing partial batch (True matches the
        reference's pretrain loader, ``ssl_train.py:274``).
    """

    def __init__(
        self,
        root: str,
        files: Sequence,
        batch_size: int,
        *,
        load_fn: Callable | None = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        pad_last: bool = False,
        num_threads: int = 8,
        prefetch: int = 2,
        sharding=None,
        use_native: bool | None = None,
    ):
        self.root = root
        self.files = list(files)
        self.batch_size = batch_size
        self.load_fn = load_fn or self._default_load
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # pad_last (requires drop_last=False): wrap-pad the trailing partial
        # batch to full batch_size with samples from the epoch's start, so
        # every batch has the same static shape under a sharded mesh. The
        # training step masks the padded suffix out of the loss (see
        # train/finetune.py); use last_batch_valid() for the real count.
        self.pad_last = pad_last
        if pad_last and drop_last:
            raise ValueError(
                "pad_last requires drop_last=False (a dropped trailing batch "
                "leaves nothing to wrap-pad)"
            )
        # Multi-host pad_last: every process wrap-pads its own trailing
        # batch (all processes have equal per-process file counts after
        # _shard_files' world-size padding, so the same pad count), and the
        # pads sit at each host's SEGMENT tail in the assembled global
        # batch, not the global tail. Consumers must therefore use
        # last_batch_valid_mask() — assembled through the same placement
        # path as the data, so mask rows align with data rows by
        # construction — rather than an arange()<n global-suffix mask.
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.sharding = sharding
        # Native batch decoding applies to the default loader only: records
        # are plain paths or (img, mask) path pairs. A custom load_fn means
        # custom records — PIL thread-pool path.
        self._native_shapes = None
        if use_native is None:
            use_native = load_fn is None
        self._use_native = bool(use_native) and self._native_probe()

    def _default_load(self, rec):
        if isinstance(rec, (tuple, list)):
            return tuple(load_image(osp.join(self.root, r)) for r in rec)
        return load_image(osp.join(self.root, rec))

    def _native_probe(self) -> bool:
        from .. import native

        if not self.files or not native.available():
            return False
        try:
            rec = self.files[0]
            recs = rec if isinstance(rec, (tuple, list)) else (rec,)
            shapes = []
            for r in recs:
                if not isinstance(r, str):
                    return False
                h, w, c = native.probe(osp.join(self.root, r))
                if c not in (1, 3):
                    return False
                shapes.append((h, w, c))
            self._native_shapes = shapes
            return True
        except Exception:
            return False

    def _decode_batch_native(self, batch_files):
        from .. import native

        if isinstance(batch_files[0], (tuple, list)):
            outs = []
            for j, (h, w, c) in enumerate(self._native_shapes):
                paths = [osp.join(self.root, rec[j]) for rec in batch_files]
                outs.append(native.decode_batch(paths, h, w, c, self.num_threads))
            return tuple(outs)
        h, w, c = self._native_shapes[0]
        paths = [osp.join(self.root, rec) for rec in batch_files]
        return native.decode_batch(paths, h, w, c, self.num_threads)

    def __len__(self):
        # Per-PROCESS batches per epoch — the count epoch() actually yields.
        # Under multi-host, _shard_files pads the global list to a multiple
        # of process_count and strides, so each process iterates ceil(n/P)
        # files; deriving from the global length would overreport by P
        # (and mis-derive start_epoch on a step-arithmetic resume).
        P = jax.process_count()
        n_local = -(-len(self.files) // P) if P > 1 else len(self.files)
        n = n_local // self.batch_size
        if not self.drop_last and n_local % self.batch_size:
            n += 1
        return n

    def _batches(self, files):
        n = len(files)
        stop = n - n % self.batch_size if self.drop_last else n
        for i in range(0, stop - stop % self.batch_size, self.batch_size):
            yield files[i : i + self.batch_size]
        rem = stop % self.batch_size
        if rem:
            tail = files[stop - rem :]
            if self.pad_last:
                need = self.batch_size - rem
                wrap = (files * (need // max(1, len(files)) + 1))[:need]
                tail = tail + wrap
            yield tail

    def last_batch_valid(self) -> int:
        """Number of real (non-padded) samples in the final *per-process*
        batch of an epoch (== batch_size when the list divides evenly).

        Under multi-host, ``_shard_files`` pads the global list to a
        multiple of ``process_count`` and strides, so each process iterates
        ``ceil(n / P)`` files — the count is derived from that per-process
        length, not the global one (the DistributedSampler-style duplicate
        pads count as real samples, matching the reference)."""
        n = len(self.files)
        P = jax.process_count()
        if P > 1:
            n = (n + (-n) % P) // P
        rem = n % self.batch_size
        return rem if (rem and not self.drop_last) else self.batch_size

    def last_batch_valid_mask(self):
        """Device-resident (global_batch,) bool mask marking the REAL
        samples of an epoch's final batch — False on the wrap-padded
        suffix of each process's segment (requires ``pad_last``).

        Single-host this equals ``arange(batch_size) < last_batch_valid()``.
        Multi-host, every process's pad sits at its own segment's tail
        inside the assembled global batch, so a global-suffix mask would
        hit real samples; this mask is assembled through the exact same
        placement path as the batches (:meth:`_place`, i.e.
        ``make_array_from_process_local_data`` under a sharding), so mask
        rows align with data rows by construction regardless of the mesh's
        device order. Pass it as the train step's ``valid`` argument
        (``train/finetune.py`` Dice ``sample_mask``, pattern-agnostic)."""
        if not self.pad_last:
            raise ValueError(
                "last_batch_valid_mask requires pad_last (without it the "
                "trailing batch is genuinely short — no mask needed)"
            )
        local = np.arange(self.batch_size) < self.last_batch_valid()
        return self._place(local)

    def valid_mask(self, batch_index: int):
        """Placed (global_batch,) bool mask for epoch batch ``batch_index``:
        all-True except on the final batch, where the per-segment wrap-pads
        are False (see :meth:`last_batch_valid_mask`)."""
        if batch_index == len(self) - 1:
            return self.last_batch_valid_mask()
        return self._place(np.ones(self.batch_size, bool))

    def _place(self, item):
        """Host batch -> device arrays under the configured sharding."""
        if self.sharding is not None:
            if jax.process_count() > 1:
                # Each host holds only its shard of the global batch —
                # assemble the logical global array from local data.
                return jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(self.sharding, x),
                    item,
                )
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.sharding), item
            )
        return jax.tree_util.tree_map(jax.device_put, item)

    def epoch(self, epoch: int = 0) -> Iterator:
        """Yield one epoch of batches (device arrays).

        Two background stages pipeline the host work against device compute:
        a decode thread fills a host-batch queue, and a transfer thread moves
        those batches onto the device (``device_put`` blocks on some backends
        — e.g. the tunneled axon TPU — so it must not sit on the consumer's
        critical path). Steady state overlaps decode(i+2) / H2D(i+1) /
        compute(i); each queue holds ``prefetch`` batches.
        """
        # SeedSequence is a stable, documented mixer (unlike builtin hash(),
        # an implementation detail that an interpreter upgrade could change
        # and silently reorder data across a resumed run).
        files = _shard_files(
            self.files,
            epoch_seed=np.random.SeedSequence([self.seed & 0x7FFFFFFF, epoch]),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            shuffle=self.shuffle,
        )

        q_host: queue.Queue = queue.Queue(maxsize=self.prefetch)
        q_dev: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        errors: list[BaseException] = []
        # Set when the consumer abandons the generator mid-epoch (e.g. a
        # --steps-per-epoch cap breaks out of the loop): lets the background
        # threads drop out of blocking queue ops instead of leaking.
        abandoned = threading.Event()

        def _put(q: queue.Queue, item) -> bool:
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def _get(q: queue.Queue):
            while not abandoned.is_set():
                try:
                    return q.get(timeout=0.2)
                except queue.Empty:
                    continue
            return stop

        def produce():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for batch_files in self._batches(files):
                        if self._use_native:
                            try:
                                decoded = self._decode_batch_native(batch_files)
                            except Exception:
                                self._use_native = False  # corrupt/odd file: fall back
                            else:
                                if not _put(q_host, decoded):
                                    return
                                continue
                        arrays = list(pool.map(self.load_fn, batch_files))
                        if isinstance(arrays[0], tuple):
                            stacked = tuple(
                                np.stack([a[j] for a in arrays])
                                for j in range(len(arrays[0]))
                            )
                        else:
                            stacked = np.stack(arrays)
                        if not _put(q_host, stacked):
                            return
            except BaseException as e:  # propagate to the consumer, don't hang
                errors.append(e)
            finally:
                _put(q_host, stop)

        def transfer():
            try:
                while True:
                    item = _get(q_host)
                    if item is stop:
                        break
                    if not _put(q_dev, self._place(item)):
                        return
            except BaseException as e:
                errors.append(e)
            finally:
                _put(q_dev, stop)

        t_prod = threading.Thread(target=produce, daemon=True)
        t_xfer = threading.Thread(target=transfer, daemon=True)
        t_prod.start()
        t_xfer.start()
        completed = False
        try:
            while True:
                item = q_dev.get()
                if item is stop:
                    completed = True
                    break
                yield item
        finally:
            abandoned.set()
            t_prod.join()
            t_xfer.join()
            # Surface background failures only on a normally-consumed epoch;
            # an abandoned generator (GeneratorExit) must close quietly.
            if errors and completed:
                raise errors[0]


def load_slide_arrays(root: str, group, num_threads: int = 8):
    """Decode one validation slide group -> (imgs (T,H,W,3), masks (T,H,W))."""
    with ThreadPoolExecutor(num_threads) as pool:
        imgs = list(pool.map(lambda s: load_image(osp.join(root, s.img)), group.samples))
        masks = list(pool.map(lambda s: load_image(osp.join(root, s.mask)), group.samples))
    return np.stack(imgs), np.stack(masks)


def synthetic_tile_library(
    n_slides: int = 4,
    tiles_per_slide: int = 8,
    tile_size: int = 1024,
    num_classes: int = 5,
    seed: int = 0,
):
    """In-memory synthetic tile corpus mirroring the prep output — smooth
    color fields + blobby masks. For smoke tests / benchmarks (the analog of
    ``--quick-test``)."""
    rng = np.random.default_rng(seed)
    imgs, masks, slide_ids = [], [], []
    for s in range(n_slides):
        for t in range(tiles_per_slide):
            yy, xx = np.mgrid[0:tile_size, 0:tile_size]
            freq = rng.uniform(1, 4, size=(2, 3))
            phase = rng.uniform(0, 2 * np.pi, size=3)
            img = np.stack(
                [
                    127
                    + 120
                    * np.sin(
                        freq[0, c] * np.pi * yy / tile_size
                        + freq[1, c] * np.pi * xx / tile_size
                        + phase[c]
                    )
                    for c in range(3)
                ],
                axis=-1,
            ).astype(np.uint8)
            cy, cx = rng.integers(0, tile_size, 2)
            r = rng.integers(tile_size // 8, tile_size // 2)
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r**2
            mask = np.zeros((tile_size, tile_size), np.uint8)
            cls = int(rng.integers(1, num_classes + 1))
            mask[blob] = cls
            # Tint the blob with a class-specific color so the labels are
            # *learnable* from pixels (smoke-training metrics can rise).
            tint = np.array(
                [
                    64 + (191 * cls) % 192,
                    64 + (113 * cls) % 192,
                    64 + (53 * cls) % 192,
                ],
                np.int32,
            )
            img = img.astype(np.int32)
            img[blob] = (img[blob] + 2 * tint) // 3
            img = img.astype(np.uint8)
            imgs.append(img)
            masks.append(mask)
            slide_ids.append(s)
    return np.stack(imgs), np.stack(masks), np.asarray(slide_ids)
