"""Fixture tests for the REAL `cifar-10-batches-py` loader branch.

Round-2 verdict: every shipped quality number runs the synthetic fallback
(zero egress), so the real-layout pickle parser in fav_tpu/data/cifar.py was
the one untested path that fires first the day `FAV_CIFAR_DIR` is mounted.
These tests build a byte-exact miniature of the standard CIFAR-10 python
layout (data_batch_1..5 + test_batch, uint8 [N, 3072] row-major CHW) and pin
parsing, NHWC conversion, normalization, split sizes and the tarball
extraction path.
"""

from __future__ import annotations

import os
import pickle
import tarfile

import numpy as np
import pytest

from fav_tpu.data.cifar import CIFAR_DIRNAME, load_cifar10


def _make_batch(path: str, images_chw: np.ndarray, labels: list[int]) -> None:
    """Write one batch file in the upstream format: dict with b'data' as
    uint8 [N, 3072] (flattened C-major: 1024 R, 1024 G, 1024 B, each row-
    major 32x32) and b'labels' as a plain python list."""
    flat = images_chw.reshape(images_chw.shape[0], -1)
    with open(path, "wb") as f:
        pickle.dump({b"data": flat, b"labels": labels}, f)


def _render_fixture(n: int, seed: int) -> tuple[np.ndarray, list[int]]:
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 256, (n, 3, 32, 32), dtype=np.uint8),
        [int(v) for v in rng.integers(0, 10, n)],
    )


@pytest.fixture
def cifar_fixture_dir(tmp_path):
    d = tmp_path / CIFAR_DIRNAME
    d.mkdir()
    per_batch = 20
    train_chw, train_labels = [], []
    for i in range(1, 6):
        chw, labels = _render_fixture(per_batch, seed=i)
        _make_batch(str(d / f"data_batch_{i}"), chw, labels)
        train_chw.append(chw)
        train_labels.extend(labels)
    test_chw, test_labels = _render_fixture(10, seed=99)
    _make_batch(str(d / "test_batch"), test_chw, test_labels)
    return {
        "root": str(tmp_path),
        "train_chw": np.concatenate(train_chw),
        "train_labels": np.asarray(train_labels, np.int32),
        "test_chw": test_chw,
        "test_labels": np.asarray(test_labels, np.int32),
    }


def test_real_layout_parses_with_exact_pixels(cifar_fixture_dir):
    fx = cifar_fixture_dir
    ds = load_cifar10(root=fx["root"], allow_synthetic=False)
    assert ds.source == "cifar10"
    assert ds.train_images.shape == (100, 32, 32, 3)
    assert ds.test_images.shape == (10, 32, 32, 3)
    assert ds.train_images.dtype == np.float32
    assert ds.train_labels.dtype == np.int32
    assert float(ds.train_images.min()) >= 0.0
    assert float(ds.train_images.max()) <= 1.0
    np.testing.assert_array_equal(ds.train_labels, fx["train_labels"])
    np.testing.assert_array_equal(ds.test_labels, fx["test_labels"])
    # NHWC conversion is exact: loaded[n, y, x, c] == raw_chw[n, c, y, x]/255
    want = fx["train_chw"].transpose(0, 2, 3, 1).astype(np.float32) / 255.0
    np.testing.assert_allclose(ds.train_images, want, rtol=0, atol=0)
    np.testing.assert_allclose(
        ds.test_images,
        fx["test_chw"].transpose(0, 2, 3, 1).astype(np.float32) / 255.0,
        rtol=0, atol=0,
    )


def test_channel_plane_orientation(tmp_path):
    """Pin the CHW->HWC mapping with a hand-built asymmetric image: R plane
    constant 10, G constant 20, B constant 30, plus one marked pixel at
    (y=1, x=2) in the R plane — catches any transpose-order regression."""
    d = tmp_path / CIFAR_DIRNAME
    d.mkdir()
    img = np.zeros((1, 3, 32, 32), np.uint8)
    img[0, 0] = 10
    img[0, 1] = 20
    img[0, 2] = 30
    img[0, 0, 1, 2] = 99  # R channel, row 1, col 2
    for i in range(1, 6):
        _make_batch(str(d / f"data_batch_{i}"), img, [3])
    _make_batch(str(d / "test_batch"), img, [7])
    ds = load_cifar10(root=str(tmp_path), allow_synthetic=False)
    np.testing.assert_allclose(
        ds.train_images[0, 0, 0], np.array([10, 20, 30], np.float32) / 255.0
    )
    assert ds.train_images[0, 1, 2, 0] == pytest.approx(99 / 255.0)
    assert ds.train_images[0, 1, 2, 1] == pytest.approx(20 / 255.0)
    assert int(ds.train_labels[0]) == 3
    assert int(ds.test_labels[0]) == 7


def test_tarball_is_extracted_and_loaded(cifar_fixture_dir, tmp_path):
    """A `cifar-10-python.tar.gz` dropped in the root (the exact artifact the
    download mirrors serve) is extracted in place and then loaded."""
    fx = cifar_fixture_dir
    src = os.path.join(fx["root"], CIFAR_DIRNAME)
    tar_root = tmp_path / "tarball_root"
    tar_root.mkdir()
    with tarfile.open(str(tar_root / "cifar-10-python.tar.gz"), "w:gz") as tf:
        tf.add(src, arcname=CIFAR_DIRNAME)
    ds = load_cifar10(root=str(tar_root), allow_synthetic=False)
    assert ds.source == "cifar10"
    assert ds.train_images.shape == (100, 32, 32, 3)
    np.testing.assert_array_equal(ds.train_labels, fx["train_labels"])


def test_env_var_discovery(cifar_fixture_dir, monkeypatch):
    """`FAV_CIFAR_DIR` (the documented serving-time knob, CLAUDE.md) finds
    the same layout with no explicit root argument."""
    monkeypatch.setenv("FAV_CIFAR_DIR", cifar_fixture_dir["root"])
    ds = load_cifar10(allow_synthetic=False)
    assert ds.source == "cifar10"
    assert ds.train_images.shape == (100, 32, 32, 3)


@pytest.mark.slow
def test_synthetic_draws_independent(monkeypatch):
    """FAV_SYNTH_DRAW selects an independent synthetic draw (seed AND
    generator recipe change together); draw 0 is bitwise the original
    dataset (golden trajectories depend on it)."""
    import hashlib

    from fav_tpu.data.cifar import DRAWS, load_cifar10, synthetic_cifar10

    def hsh(ds):
        h = hashlib.sha256()
        for a in (ds.train_images, ds.train_labels, ds.test_images, ds.test_labels):
            h.update(np.ascontiguousarray(a).tobytes())
        return h.hexdigest()

    # draw 0 byte identity with the recipe-less call (the original dataset)
    monkeypatch.delenv("FAV_CIFAR_DIR", raising=False)
    monkeypatch.setenv("FAV_SYNTH_DRAW", "0")
    assert hsh(load_cifar10()) == hsh(synthetic_cifar10())

    seen = set()
    for d in sorted(DRAWS):
        monkeypatch.setenv("FAV_SYNTH_DRAW", str(d))
        ds = load_cifar10()
        assert ds.source == ("synthetic" if d == 0 else f"synthetic_draw{d}")
        assert ds.train_images.shape == (20000, 32, 32, 3)
        assert ds.train_images.min() >= 0.0 and ds.train_images.max() <= 1.0
        seen.add(hsh(ds))
    assert len(seen) == len(DRAWS)  # every draw is a distinct dataset

    monkeypatch.setenv("FAV_SYNTH_DRAW", "99")
    with pytest.raises(ValueError, match="99"):
        load_cifar10()
