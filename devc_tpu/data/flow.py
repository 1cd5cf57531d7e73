"""Middlebury .flo optical-flow I/O (reference utils/flowlib.py:82-106).

The training videoloader consumes precomputed forward/backward .flo files
per frame pair (reference lib/videoloader.py:235-236).
"""

from __future__ import annotations

import numpy as np

_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Read a .flo file -> float32 [H, W, 2] (u, v)."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != _MAGIC:
            raise ValueError(f"{path}: not a .flo file (bad magic)")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    if data.size != 2 * w * h:
        # tolerate truncated files like the reference's np.resize does
        data = np.resize(data, 2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    """Write float32 [H, W, 2] flow as .flo."""
    h, w, c = flow.shape
    assert c == 2, "flow must be HxWx2"
    with open(path, "wb") as f:
        np.array([_MAGIC], np.float32).tofile(f)
        np.array([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)
