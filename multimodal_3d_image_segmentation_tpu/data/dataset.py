"""Multimodal dataset + parallel input pipeline (host side).

Re-designs of reference ``experiments/data_io/dataset.py`` (dataset) and
``experiments/data_io/input_data.py`` (InputData facade). Instead of the
torch DataLoader, a self-contained multiprocess prefetcher feeds numpy
batches; the training loop overlaps host loading with device compute via
async dispatch (``jax.device_put`` double buffering).
"""
from __future__ import annotations

import math
import multiprocessing
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from .augmentation import ImageTransform

__all__ = ["MultimodalImageDataset", "InputData"]


def _identity(sample):
    return sample


class MultimodalImageDataset:
    """Random-access view of per-modality sample lists as channel-first
    arrays (behavioral contract of reference
    ``experiments/data_io/dataset.py:14-60``; the ctor keywords are the
    ``[input_args]`` config keys and must keep these names).

    Sample ``idx`` is assembled as: read + stack the x modalities ->
    ``x_processing`` (e.g. z-score normalization) -> joint random
    ``transform`` of (x, y). Labels are just another modality list
    selected by ``idx_y_modalities``; without it the dataset yields x
    only (the inference flow).

    Args:
        data_lists: list of per-modality filename lists (equal lengths).
        reader: filename -> numpy array (default: identity, for
            pre-loaded arrays).
        idx_x_modalities / idx_y_modalities: modality indices for inputs /
            labels; ``idx_x_modalities=None`` selects every modality as
            input (and requires no labels).
        x_processing: applied to the stacked x before augmentation.
        transform: joint random augmentation applied to (x, y) or x.
    """

    def __init__(self, data_lists, reader=None, idx_x_modalities=None,
                 idx_y_modalities=None, x_processing=None, transform=None):
        if idx_x_modalities is None and idx_y_modalities is not None:
            raise ValueError("idx_y_modalities requires idx_x_modalities")
        self.data_lists = data_lists
        self.reader = reader or _identity
        self.idx_x_modalities = (list(range(len(data_lists)))
                                 if idx_x_modalities is None
                                 else idx_x_modalities)
        self.idx_y_modalities = idx_y_modalities
        self.x_processing = x_processing or _identity
        self.transform = transform

    def __len__(self):
        return len(self.data_lists[0])

    def _stack(self, modalities, idx):
        return np.stack([self.reader(self.data_lists[m][idx])
                         for m in modalities])

    def __getitem__(self, idx):
        x = self.x_processing(self._stack(self.idx_x_modalities, idx))
        if self.idx_y_modalities is None:
            return x if self.transform is None else self.transform(x)
        y = self._stack(self.idx_y_modalities, idx)
        return (x, y) if self.transform is None else self.transform(x, y)


# -- worker-process plumbing -------------------------------------------------

_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_get(idx, aug_seed=None):
    # per-task augmentation stream: deterministic for a given config
    # seed regardless of worker count/scheduling (an os.urandom per-
    # worker reseed used to silently break the documented "same seed ->
    # same augmentation sequence" contract whenever num_workers > 0)
    tf = _WORKER_DATASET.transform
    if aug_seed is not None and tf is not None and hasattr(tf, "rng"):
        tf.rng = np.random.default_rng(np.random.SeedSequence(aug_seed))
    return _WORKER_DATASET[idx]


class _Flow:
    """Iterable over batches with multiprocess prefetching.

    Keeps a persistent worker pool for its lifetime (the analog of
    ``persistent_workers=True``).
    """

    def __init__(self, dataset, batch_size, shuffle, num_workers, seed=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self._rng = np.random.default_rng(seed)
        self._pool = None
        if num_workers and num_workers > 0:
            # spawn: fork() in a threaded (JAX) process risks deadlock
            self._pool = ProcessPoolExecutor(
                max_workers=num_workers, initializer=_worker_init,
                initargs=(dataset,),
                mp_context=multiprocessing.get_context("spawn"))

    def __len__(self):
        return math.ceil(len(self.dataset) / self.batch_size)

    def _collate(self, samples):
        if isinstance(samples[0], tuple):
            xs, ys = zip(*samples)
            return np.stack(xs), np.stack(ys)
        return np.stack(samples)

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)

        if self._pool is None:
            for i in range(0, n, self.batch_size):
                idxs = order[i:i + self.batch_size]
                yield self._collate([self.dataset[j] for j in idxs])
            return

        # per-task augmentation seeds, drawn in submission order from the
        # TRANSFORM's rng (not the flow rng): determinism follows the
        # configured [augmentation] seed exactly like num_workers == 0,
        # independent of which worker picks up which task and of whether
        # the flow itself is seeded (the flow seed governs shuffling)
        has_aug = (self.dataset.transform is not None
                   and hasattr(self.dataset.transform, "rng"))
        aug_rng = self.dataset.transform.rng if has_aug else None

        def _submit(k):
            seed = (int(aug_rng.integers(2 ** 63)) if has_aug else None)
            return self._pool.submit(_worker_get, int(order[k]), seed)

        # submit-ahead window of ~2 batches per worker
        window = max(2 * self.num_workers, self.batch_size)
        futures = {}
        submitted = 0
        for _ in range(min(window, n)):
            futures[submitted] = _submit(submitted)
            submitted += 1

        batch = []
        for i in range(n):
            sample = futures.pop(i).result()
            if submitted < n:
                futures[submitted] = _submit(submitted)
                submitted += 1
            batch.append(sample)
            if len(batch) == self.batch_size or i == n - 1:
                yield self._collate(batch)
                batch = []

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class InputData:
    """Facade producing train/valid/test flows
    (reference ``experiments/data_io/input_data.py:15-151``):
    shuffling and augmentation apply to training only."""

    def __init__(self, reader=None, data_lists_train=None,
                 data_lists_valid=None, data_lists_test=None,
                 idx_x_modalities=None, idx_y_modalities=None,
                 x_processing=None, batch_size=1, num_workers=1,
                 transform_kwargs=None, seed=None):
        self.reader = reader or (lambda x: x)
        self.data_lists_train = data_lists_train
        self.data_lists_valid = data_lists_valid
        self.data_lists_test = data_lists_test
        self.idx_x_modalities = idx_x_modalities
        self.idx_y_modalities = idx_y_modalities
        self.x_processing = x_processing
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.transform_kwargs = transform_kwargs
        self.seed = seed

        assert self.idx_x_modalities is not None

    def _get_flow(self, data_lists, shuffle=False, transform_kwargs=None):
        transform = (ImageTransform(**transform_kwargs)
                     if transform_kwargs is not None else None)
        dataset = MultimodalImageDataset(
            data_lists, reader=self.reader,
            idx_x_modalities=self.idx_x_modalities,
            idx_y_modalities=self.idx_y_modalities,
            x_processing=self.x_processing, transform=transform)
        return _Flow(dataset, self.batch_size, shuffle, self.num_workers,
                     seed=self.seed)

    def get_train_flow(self, shuffle=True):
        return self._get_flow(self.data_lists_train, shuffle=shuffle,
                              transform_kwargs=self.transform_kwargs)

    def get_valid_flow(self):
        return self._get_flow(self.data_lists_valid)

    def get_test_flow(self):
        return self._get_flow(self.data_lists_test)

    def _get_num_batches(self, data):
        if data is None:
            return 0
        return int(math.ceil(len(data[0]) / self.batch_size))

    def get_train_num_batches(self):
        return self._get_num_batches(self.data_lists_train)

    def get_valid_num_batches(self):
        return self._get_num_batches(self.data_lists_valid)

    def get_test_num_batches(self):
        return self._get_num_batches(self.data_lists_test)

    def _get_image_size(self, data):
        if data is None:
            return None
        from .nifti import read_img, read_shape
        if self.reader is read_img:
            # header-only probe: no full read/decompress just for a shape
            try:
                return read_shape(data[0][0])
            except Exception:
                pass  # non-NIfTI path despite the NIfTI reader — full read
        return self.reader(data[0][0]).shape

    def get_train_image_size(self):
        return self._get_image_size(self.data_lists_train)

    def get_valid_image_size(self):
        return self._get_image_size(self.data_lists_valid)

    def get_test_image_size(self):
        return self._get_image_size(self.data_lists_test)

    def get_num_x_modalities(self):
        return len(self.idx_x_modalities)

    def get_num_y_modalities(self):
        if self.idx_y_modalities is None:
            return 0
        return len(self.idx_y_modalities)
