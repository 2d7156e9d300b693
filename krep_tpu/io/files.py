"""File input.

The reference mmaps large files (krep.c:2674-2723) and read()s small ones
(krep.c:2630-2670). Host-side we use numpy memmap for zero-copy staging of
large files (pages stream straight into the device transfer) and plain reads
below that threshold.
"""

from __future__ import annotations

import os

import numpy as np

MMAP_THRESHOLD = 64 * 1024  # mirror of the reference's 64KB read/mmap split


def read_bytes(path: str):
    size = os.path.getsize(path)
    if size >= MMAP_THRESHOLD:
        return np.memmap(path, dtype=np.uint8, mode="r")
    with open(path, "rb") as f:
        return f.read()
