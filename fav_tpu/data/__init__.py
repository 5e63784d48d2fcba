"""Data pipeline: CIFAR-10 loading (real batches when present on disk, a
deterministic procedural set otherwise) and corruption-sweep batching."""

from fav_tpu.data.cifar import load_cifar10, synthetic_cifar10, Dataset  # noqa: F401
