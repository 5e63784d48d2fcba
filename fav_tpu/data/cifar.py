"""CIFAR-10 loading with a deterministic synthetic fallback.

The reference operates on live camera frames; its ML strategy docs name
normal-data training with corruption-driven failure injection (reference
docs/system_notes.md:146-198). BASELINE.json pins the TPU build's benchmark
to CIFAR-10(-C)-style corruption sweeps. This environment has no network
egress and ships no CIFAR archives, so:

* :func:`load_cifar10` reads the standard ``cifar-10-batches-py`` pickle
  layout if a copy exists under ``root`` (or ``$FAV_CIFAR_DIR``),
* otherwise it falls back to :func:`synthetic_cifar10` — a *deterministic*
  procedural dataset with 10 visually distinct, learnable classes
  (class-coded gradients, stripes, disks and checkers + instance jitter).
  Every consumer (training, calibration, corruption sweeps, benchmarks)
  works identically on either source; the synthetic set exists so the full
  train -> calibrate -> corrupt -> detect pipeline is exercisable and
  reproducible anywhere.

Arrays are float32 in [0,1], NHWC, labels int32 — device-ready.
"""

from __future__ import annotations

import os
import pickle
import tarfile
from typing import Iterator, NamedTuple

import numpy as np

__all__ = ["Dataset", "load_cifar10", "synthetic_cifar10", "batch_iterator"]

CIFAR_DIRNAME = "cifar-10-batches-py"


class Dataset(NamedTuple):
    train_images: np.ndarray  # [N, 32, 32, 3] float32 in [0,1]
    train_labels: np.ndarray  # [N] int32
    test_images: np.ndarray
    test_labels: np.ndarray
    source: str  # "cifar10" | "synthetic"


def _find_cifar_dir(root: str | None) -> str | None:
    candidates = []
    if root:
        candidates += [root, os.path.join(root, CIFAR_DIRNAME)]
    env = os.environ.get("FAV_CIFAR_DIR")
    if env:
        candidates += [env, os.path.join(env, CIFAR_DIRNAME)]
    candidates += [
        os.path.join(os.path.expanduser("~"), "data", CIFAR_DIRNAME),
        os.path.join("/tmp", CIFAR_DIRNAME),
    ]
    for c in candidates:
        if c and os.path.isfile(os.path.join(c, "data_batch_1")):
            return c
        tgz = os.path.join(c or ".", "cifar-10-python.tar.gz")
        if c and os.path.isfile(tgz):
            with tarfile.open(tgz) as tf:
                tf.extractall(os.path.dirname(tgz))
            out = os.path.join(os.path.dirname(tgz), CIFAR_DIRNAME)
            if os.path.isfile(os.path.join(out, "data_batch_1")):
                return out
    return None


def _read_batch(path: str) -> tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    images = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return images.astype(np.float32) / 255.0, np.asarray(d[b"labels"], np.int32)


def load_cifar10(root: str | None = None, allow_synthetic: bool = True) -> Dataset:
    """Load real CIFAR-10 if available, else the synthetic stand-in."""
    cdir = _find_cifar_dir(root)
    if cdir is not None:
        train = [_read_batch(os.path.join(cdir, f"data_batch_{i}")) for i in range(1, 6)]
        xs = np.concatenate([t[0] for t in train])
        ys = np.concatenate([t[1] for t in train])
        xt, yt = _read_batch(os.path.join(cdir, "test_batch"))
        return Dataset(xs, ys, xt, yt, "cifar10")
    if not allow_synthetic:
        raise FileNotFoundError("CIFAR-10 not found and synthetic fallback disabled")
    return synthetic_cifar10()


def synthetic_cifar10(
    train_size: int = 20000, test_size: int = 4000, seed: int = 0, size: int = 32
) -> Dataset:
    """Deterministic 10-class procedural image set.

    Class identity is encoded redundantly in hue, texture (stripes /
    checkers / disks / gradients) and orientation, with per-instance
    positional and photometric jitter — hard enough that a linear model
    can't saturate it, easy enough that the small CNN reaches high accuracy
    in a few epochs on CPU. Purely vectorized NumPy; same seed -> same bytes.
    """
    rng = np.random.default_rng(seed)
    n = train_size + test_size
    labels = rng.integers(0, 10, n).astype(np.int32)

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    yy = yy[None]
    xx = xx[None]

    # per-instance jitter
    phase = rng.uniform(0, 2 * np.pi, (n, 1, 1)).astype(np.float32)
    cx = rng.uniform(0.3, 0.7, (n, 1, 1)).astype(np.float32)
    cy = rng.uniform(0.3, 0.7, (n, 1, 1)).astype(np.float32)
    freq = rng.uniform(2.5, 4.5, (n, 1, 1)).astype(np.float32)

    k = labels.astype(np.float32)[:, None, None]
    angle = k * (np.pi / 10.0)
    u = np.cos(angle) * xx + np.sin(angle) * yy  # class-oriented coordinate

    stripes = 0.5 + 0.5 * np.sin(2 * np.pi * freq * u + phase)
    checker = 0.5 + 0.5 * np.sign(
        np.sin(2 * np.pi * freq * xx + phase) * np.sin(2 * np.pi * freq * yy + phase)
    )
    r2 = (xx - cx) ** 2 + (yy - cy) ** 2
    disk = (r2 < (0.05 + 0.02 * k)).astype(np.float32)
    grad = np.clip(u, 0.0, 1.0)

    texture_id = labels % 4
    base = np.where(
        (texture_id == 0)[:, None, None], stripes,
        np.where((texture_id == 1)[:, None, None], checker,
                 np.where((texture_id == 2)[:, None, None], disk, grad)),
    )

    # class-coded hue rotation
    hue = (k / 10.0) * 2 * np.pi
    r = 0.5 + 0.45 * base * np.cos(hue)
    g = 0.5 + 0.45 * base * np.cos(hue + 2 * np.pi / 3)
    b = 0.5 + 0.45 * base * np.cos(hue + 4 * np.pi / 3)
    images = np.stack([r, g, b], axis=-1).astype(np.float32)

    images += rng.normal(0.0, 0.03, images.shape).astype(np.float32)
    images = np.clip(images, 0.0, 1.0)

    return Dataset(
        images[:train_size], labels[:train_size],
        images[train_size:], labels[train_size:],
        "synthetic",
    )


def batch_iterator(
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    seed: int = 0,
    epochs: int | None = None,
    drop_remainder: bool = True,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Shuffled epoch iterator (host-side; device put happens at the caller
    so sharding/donation stays in one place)."""
    rng = np.random.default_rng(seed)
    n = images.shape[0]
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        end = n - (n % batch_size) if drop_remainder else n
        for i in range(0, end, batch_size):
            idx = order[i : i + batch_size]
            yield images[idx], labels[idx]
        epoch += 1
