"""Host-side dataset over preprocessed .npy cases.

Counterpart of reference ``transoar/data/dataset.py`` +
``dataloader.py``. Directory layout is identical to the reference
(``dataset/<name>/<split>/<case>/{data,label}.npy``,
dataset.py:18-20,31-36) so preprocessed reference datasets drop in.

Differences (TPU-first):
- The collator's bbox-from-segmentation (dataloader.py:56) moves *on device*
  into the jitted train step (``transoar_tpu.utils.boxes.segmentation2bbox``)
  — the loader only stacks numpy arrays.
- Augmentation is a jittable on-device function of a PRNG key
  (``transoar_tpu.data.transforms``) instead of MONAI CPU workers; the
  loader emits raw volumes plus the per-sample augmentation seeds.
- Layout is channels-last ``[S0, S1, S2, 1]``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class TransoarDataset:
    """Lists and loads preprocessed cases for one split."""

    def __init__(self, config, split, data_dir=None):
        assert split in ("train", "val", "test")
        self._config = config
        self._split = split
        root = Path(data_dir) if data_dir else Path.cwd() / "dataset"
        self._path = root / config["dataset"] / split
        if not self._path.exists():
            raise FileNotFoundError(f"dataset split not found: {self._path}")
        self._cases = sorted(p.name for p in self._path.iterdir()
                             if p.is_dir())
        self._overfit = bool(config.get("overfit"))

    def __len__(self):
        return len(self._cases)

    @property
    def cases(self):
        return list(self._cases)

    def __getitem__(self, idx):
        if self._overfit:  # reference dataset.py:28-29
            idx = 0
        case_dir = self._path / self._cases[idx]
        image = np.load(case_dir / "data.npy")
        label = np.load(case_dir / "label.npy")
        # accept both [S0,S1,S2] and channel-first [1,S0,S1,S2] layouts
        if image.ndim == 4:
            image = image[0]
        if label.ndim == 4:
            label = label[0]
        return image.astype(np.float32)[..., None], label.astype(np.int32)


class Loader:
    """Simple epoch iterator producing fixed-shape numpy batches.

    ``drop_last`` mirrors the reference (dataloader.py:22); shuffling is
    seeded per epoch for reproducibility.
    """

    def __init__(self, dataset, batch_size, shuffle=False, seed=0,
                 drop_last=True, rows=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0
        # Multi-host input sharding: ``rows`` = the positions within each
        # GLOBAL batch this process provides (parallel.mesh.local_batch_rows)
        # — the shuffle order is seeded identically on every process, so the
        # union over processes reconstructs exactly the single-process epoch
        # while each host only reads/augments its own rows.
        self.rows = None if rows is None else np.asarray(rows, dtype=np.int64)
        if self.rows is not None:
            assert drop_last, "sharded loading requires fixed-size batches"

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        stop = (n - n % self.batch_size) if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.rows is not None:
                idx = idx[self.rows]
            images, labels = zip(*(self.dataset[int(i)] for i in idx))
            yield {
                "image": np.stack(images),
                "seg": np.stack(labels),
                "index": idx.astype(np.int32),
            }


def get_loader(config, split, batch_size=None, data_dir=None, seed=None,
               rows=None):
    """Reference-compatible entry point (dataloader.py:10-24).

    Uses the native C++ threaded loader (``transoar_tpu.native``) when
    ``trainer.num_workers > 0`` and the toolchain is available — the
    replacement for the reference's DataLoader worker subprocesses; falls
    back to the in-process Python loader otherwise.

    ``rows`` (multi-host training): per-global-batch row positions this
    process loads (``parallel.mesh.local_batch_rows``); forces the Python
    loader — the native loader streams whole batches and per-row subsetting
    there would still read every case from disk.
    """
    tcfg = config["trainer"]
    batch_size = batch_size or tcfg["batch_size"]
    shuffle = split == "train" and tcfg.get("shuffle", True)
    dataset = TransoarDataset(config, split, data_dir=data_dir)
    seed = config.get("seed", 0) if seed is None else seed

    num_workers = int(tcfg.get("num_workers", 0))
    if num_workers > 0 and rows is None:
        from transoar_tpu.native.native_loader import (NativeLoader,
                                                       native_available)

        if native_available():
            return NativeLoader(dataset, batch_size, shuffle=shuffle,
                                seed=seed, n_threads=num_workers)
    return Loader(dataset, batch_size, shuffle=shuffle, seed=seed, rows=rows)
