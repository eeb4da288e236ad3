"""Native (C++) runtime components: degradation pipeline + prefetching loader.

The framework's compute path is JAX/XLA/Pallas; the host-side runtime around
it is native where it matters: frame degradation (LR synthesis, corruption
masks) runs in C++ worker threads via ctypes — the GIL is released for the
whole call — and :class:`PrefetchLoader` overlaps that host work with TPU
steps through a background-thread double buffer.

The shared library is built on demand with g++ (cached next to the source);
every entry point has a NumPy fallback so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Dict, Iterator, Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "degrade.cc")
_LIB = os.path.join(_DIR, "_nerve_native.so")

_lib = None
_lib_lock = threading.Lock()


def _build_library() -> Optional[str]:
    """Compile degrade.cc → shared library; returns path or None."""
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            cmd = [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                _SRC, "-o", _LIB,
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def load_native():
    """Load (building if needed) the native library; None on failure."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = _build_library()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.nerve_degrade_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int,
        ]
        lib.nerve_corruption_masks.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None


def _as_float_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# --------------------------------------------------------------------------- #
# Degradation (native + NumPy fallback)
# --------------------------------------------------------------------------- #


def _degrade_numpy(hr: np.ndarray, scale: int, sigma: float, blur_k: int,
                   seed: int) -> np.ndarray:
    n, h, w, c = hr.shape
    x = hr.astype(np.float32)
    if blur_k > 1:
        r = blur_k // 2
        idx = np.clip(np.arange(-r, r + 1)[None, :] + np.arange(w)[:, None], 0, w - 1)
        x = x[:, :, idx, :].mean(axis=3)
        idy = np.clip(np.arange(-r, r + 1)[None, :] + np.arange(h)[:, None], 0, h - 1)
        x = x[:, idy, :, :].mean(axis=2)
    lh, lw = h // scale, w // scale
    x = x[:, : lh * scale, : lw * scale, :]
    x = x.reshape(n, lh, scale, lw, scale, c).mean(axis=(2, 4))
    if sigma > 0:
        rng = np.random.default_rng(seed)
        x = x + rng.normal(0, sigma, x.shape).astype(np.float32)
    return np.clip(x, 0.0, 1.0).astype(np.float32)


def degrade_batch(
    hr: np.ndarray,
    scale: int = 2,
    noise_sigma: float = 0.0,
    blur_k: int = 0,
    seed: int = 0,
    num_threads: int = 0,
    force_numpy: bool = False,
) -> np.ndarray:
    """HR (N, H, W, C) [0,1] → degraded LR (N, H/s, W/s, C).

    Pipeline: box blur (blur_k odd; ≤1 disables) → box downsample → Gaussian
    noise → clamp (the degradation suite declared at the reference's
    default.yaml:179-192, implemented for real).
    """
    hr = np.ascontiguousarray(hr, np.float32)
    n, h, w, c = hr.shape
    lib = None if force_numpy else load_native()
    if lib is None:
        return _degrade_numpy(hr, scale, noise_sigma, blur_k, seed)
    lr = np.empty((n, h // scale, w // scale, c), np.float32)
    threads = num_threads or min(8, os.cpu_count() or 1)
    lib.nerve_degrade_batch(
        _as_float_ptr(hr), n, h, w, c, _as_float_ptr(lr), scale,
        ctypes.c_float(noise_sigma), blur_k, ctypes.c_uint64(seed), threads,
    )
    return lr


def corruption_masks(
    n: int, h: int, w: int, min_frac: float = 0.1, max_frac: float = 0.4,
    seed: int = 0, num_threads: int = 0, force_numpy: bool = False,
) -> np.ndarray:
    """(N, H, W, 1) float32 masks with one random corrupted rectangle each."""
    lib = None if force_numpy else load_native()
    if lib is None:
        rng = np.random.default_rng(seed)
        masks = np.zeros((n, h, w), np.float32)
        for i in range(n):
            bh = max(1, int(rng.uniform(min_frac, max_frac) * h))
            bw = max(1, int(rng.uniform(min_frac, max_frac) * w))
            y0 = rng.integers(0, max(1, h - bh + 1))
            x0 = rng.integers(0, max(1, w - bw + 1))
            masks[i, y0 : y0 + bh, x0 : x0 + bw] = 1.0
        return masks[..., None]
    masks = np.empty((n, h, w), np.float32)
    threads = num_threads or min(8, os.cpu_count() or 1)
    lib.nerve_corruption_masks(
        _as_float_ptr(masks), n, h, w, ctypes.c_float(min_frac),
        ctypes.c_float(max_frac), ctypes.c_uint64(seed), threads,
    )
    return masks[..., None]


# --------------------------------------------------------------------------- #
# Prefetching loader
# --------------------------------------------------------------------------- #


class PrefetchLoader:
    """Background-thread batch pipeline: degrade on CPU while TPU computes.

    Wraps an HR dataset; each yielded batch is {'lr', 'hr'} with LR produced
    by the native degradation pipeline. A bounded queue (default depth 2)
    double-buffers host work against device steps.
    """

    def __init__(
        self,
        hr_data: np.ndarray,
        batch_size: int,
        scale: int = 2,
        noise_sigma: float = 0.0,
        blur_k: int = 0,
        seed: int = 0,
        depth: int = 2,
        shuffle: bool = True,
    ):
        self.hr = np.ascontiguousarray(hr_data, np.float32)
        self.batch_size = batch_size
        self.scale = scale
        self.noise_sigma = noise_sigma
        self.blur_k = blur_k
        self.seed = seed
        self.depth = depth
        self.shuffle = shuffle

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = object()

        def worker():
            rng = np.random.default_rng(self.seed)
            idx = np.arange(len(self.hr))
            if self.shuffle:
                rng.shuffle(idx)
            n_batches = len(idx) // self.batch_size
            for bi in range(n_batches):
                sel = idx[bi * self.batch_size : (bi + 1) * self.batch_size]
                hr = self.hr[sel]
                lr = degrade_batch(
                    hr, self.scale, self.noise_sigma, self.blur_k,
                    seed=self.seed + bi,
                )
                q.put({"lr": lr, "hr": hr})
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()

    def __len__(self) -> int:
        return len(self.hr) // self.batch_size
