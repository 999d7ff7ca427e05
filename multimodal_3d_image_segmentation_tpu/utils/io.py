"""Small IO helpers (reference ``experiments/utils.py:187-207``)."""
from __future__ import annotations

import numpy as np

__all__ = ["load_np_data"]


def load_np_data(file_path, allow_pickle: bool = False):
    """Load data from a single-array npy or npz file."""
    if file_path is None:
        return None
    data = np.load(file_path, allow_pickle=allow_pickle)
    if isinstance(data, np.lib.npyio.NpzFile):
        data = data[data.files[0]]
    return data
