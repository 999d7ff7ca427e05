"""Dataset partitioning CLI (BraTS'23 layout).

Re-design of reference
``experiments/brats23_data_preparation/partitioning.py:17-134``: scan
patient-ID folders, seeded permutation into train/valid/test fractions,
per-modality path lists ``{prefix}/{id}/{id}-{m}.{ext}``, disjointness
asserts, ``{modality}_{split}-{fraction}.txt`` outputs + config snapshot.

Natural (OS-style) sorting is implemented locally — no natsort dependency.
"""
from __future__ import annotations

import copy
import os
import re
import sys

import numpy as np

from ..runtime.config import get_config, save_config

__all__ = ["partitioning", "merge_dict", "save_files", "main",
           "natural_sorted"]

_NUM_RE = re.compile(r"(\d+)")


def natural_sorted(items):
    """Natural sort: digit runs compare numerically ('id2' < 'id10').

    String tokens compare case-SENSITIVELY (byte order), matching the
    reference's ``natsort.os_sorted`` under the C locale
    (``brats23_data_preparation/partitioning.py:49``) — the id ordering
    feeds the seeded permutation, so any ordering difference would yield
    a different train/valid/test split for mixed-case datasets."""

    def key(s):
        s = os.fspath(s)
        # (0, int) / (1, str) pairs: ints sort before strings at the same
        # position instead of raising on int-vs-str comparison
        return [(0, int(tok)) if tok.isdigit() else (1, tok)
                for tok in _NUM_RE.split(s)]

    return sorted(items, key=key)


def partitioning(base_path, train_fraction=0.0, valid_fraction=0.0,
                 test_fraction=0.0, modalities=None, ext=None, remove_str="",
                 seed=None, naming="brats23"):
    """Split patient-ID folders under ``base_path`` into per-modality
    train/valid/test path lists.

    ``naming``: file naming scheme inside each ID folder —
    'brats23' -> ``{id}-{m}.{ext}`` (reference
    ``brats23_data_preparation/partitioning.py:66-70``), 'brats19' ->
    ``{id}_{m}.{ext}`` (TF-tree variant,
    ``tensorflow/experiments/data_split/partitioning.py``).
    """
    sep = {"brats23": "-", "brats19": "_"}[naming]
    assert 0.9999 < train_fraction + valid_fraction + test_fraction < 1.0001

    ids = natural_sorted(os.listdir(base_path))
    ids = [i for i in ids if os.path.isdir(os.path.join(base_path, i))]
    num_samples = len(ids)

    thres1 = round(train_fraction * num_samples)
    thres2 = round((train_fraction + valid_fraction) * num_samples)
    rng = np.random.default_rng(seed)
    ids = rng.permutation(ids)
    train_ids = natural_sorted(ids[:thres1])
    valid_ids = natural_sorted(ids[thres1:thres2])
    test_ids = natural_sorted(ids[thres2:])

    prefix = base_path.replace(remove_str, "")
    train_dict, valid_dict, test_dict = {}, {}, {}
    for m in modalities:
        train_p = [os.path.join(prefix, i, f"{i}{sep}{m}.{ext}")
                   for i in train_ids]
        valid_p = [os.path.join(prefix, i, f"{i}{sep}{m}.{ext}")
                   for i in valid_ids]
        test_p = [os.path.join(prefix, i, f"{i}{sep}{m}.{ext}")
                  for i in test_ids]

        assert np.all(np.isin(train_p, valid_p, invert=True))
        assert np.all(np.isin(train_p, test_p, invert=True))
        assert np.all(np.isin(test_p, valid_p, invert=True))

        train_dict[m] = train_p
        valid_dict[m] = valid_p
        test_dict[m] = test_p

    return train_dict, valid_dict, test_dict


def merge_dict(dict_all, adict):
    if dict_all is None:
        return adict
    return {m: dict_all[m] + ls for m, ls in adict.items()}


def save_files(dict_all, output_dir, suffix):
    for m, ls in dict_all.items():
        if not ls:
            continue
        with open(os.path.join(output_dir, f"{m}_{suffix}.txt"), "w") as f:
            f.writelines([ln + "\n" for ln in ls])


def run(config_file):
    config_args = get_config(config_file)

    partition_args = copy.deepcopy(config_args["partitioning"])
    base_paths = partition_args.pop("base_paths")

    train_all = valid_all = test_all = None
    for base_path in base_paths:
        tr, va, te = partitioning(base_path, **partition_args)
        train_all = merge_dict(train_all, tr)
        valid_all = merge_dict(valid_all, va)
        test_all = merge_dict(test_all, te)

    output_dir = config_args["io"]["output_dir"]
    os.makedirs(output_dir, exist_ok=True)
    save_config(config_args, output_dir)

    # .get with partitioning()'s own defaults: a config may legitimately
    # omit a fraction (it defaults to 0.0 in the split itself)
    save_files(train_all, output_dir,
               f"train-{partition_args.get('train_fraction', 0.0)}")
    save_files(valid_all, output_dir,
               f"valid-{partition_args.get('valid_fraction', 0.0)}")
    save_files(test_all, output_dir,
               f"test-{partition_args.get('test_fraction', 0.0)}")
    print("Done!\n")


def main():
    run(sys.argv[1])


if __name__ == "__main__":
    main()
