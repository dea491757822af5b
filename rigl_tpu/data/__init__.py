"""Input pipelines: file-based MNIST/CIFAR loaders, synthetic fallback,
host-overlapped device prefetch."""

from rigl_tpu.data.datasets import (
    MEAN_RGB,
    STDDEV_RGB,
    create_dataset,
    load_cifar10_arrays,
    load_mnist_arrays,
    normalize,
    synthetic_arrays,
)
from rigl_tpu.data.pipeline import (
    ArrayDataset,
    pad_crop_flip,
    prefetch_to_device,
    standardize_per_image,
)
