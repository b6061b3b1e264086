"""ctypes binding + Python iterator for the native C++ case loader.

Builds ``libloader.so`` on first use (g++, cached next to the source) and
exposes ``NativeLoader`` with the same batch-dict interface as the pure-
Python ``transoar_tpu.data.dataset.Loader``. Falls back loudly if the
toolchain or the shared object is unavailable — callers use
``native_available()`` to pick.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("loader.cpp")
_LIB = Path(__file__).with_name("libloader.so")
_lib = None


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    lib.nl_create.restype = ctypes.c_void_p
    lib.nl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.nl_set_epoch.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.c_int]
    lib.nl_next.restype = ctypes.c_int64
    lib.nl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_int32)]
    lib.nl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


class NativeLoader:
    """Threaded prefetching loader over a preprocessed dataset split.

    Yields the same batch dicts as the Python ``Loader``:
    {'image': [B, S0, S1, S2, 1] f32, 'seg': [B, S0, S1, S2] i32,
     'index': [B] i32}.
    """

    def __init__(self, dataset, batch_size, shuffle=False, seed=0,
                 drop_last=True, n_threads=8, capacity=16):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

        # resolve per-case file paths + fixed shape from case 0
        image0, _ = dataset[0]
        self._shape = image0.shape[:3]
        voxels = int(np.prod(self._shape))

        img_paths, lbl_paths = [], []
        for case in dataset.cases:
            case_dir = dataset._path / case
            img_paths.append(str(case_dir / "data.npy").encode())
            lbl_paths.append(str(case_dir / "label.npy").encode())

        lib = _load_lib()
        n = len(img_paths)
        ImgArr = ctypes.c_char_p * n
        self._handle = lib.nl_create(
            ImgArr(*img_paths), ImgArr(*lbl_paths), n, voxels,
            n_threads, capacity)
        self._lib = lib
        self._n = n

    def __len__(self):
        n = self._n
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(self._n, dtype=np.int64)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        if getattr(self.dataset, "_overfit", False):
            order[:] = 0

        stop = (self._n - self._n % self.batch_size) if self.drop_last \
            else self._n
        OrderArr = ctypes.c_int64 * len(order)
        self._lib.nl_set_epoch(self._handle, OrderArr(*order), len(order))

        s = self._shape
        for start in range(0, stop, self.batch_size):
            bsz = min(self.batch_size, stop - start)
            images = np.empty((bsz, *s, 1), np.float32)
            labels = np.empty((bsz, *s), np.int32)
            idx = np.empty(bsz, np.int32)
            for b in range(bsz):
                img_view = images[b, ..., 0]
                got = self._lib.nl_next(
                    self._handle,
                    img_view.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    labels[b].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
                if got < 0:
                    raise RuntimeError(f"native loader failure (code {got})")
                idx[b] = got
            yield {"image": images, "seg": labels, "index": idx}

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.nl_destroy(self._handle)
            self._handle = None
