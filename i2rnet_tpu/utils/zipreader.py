"""Read images from ``archive.zip@inner/path`` specs (reference
``lib/utils/zipreader.py:23-70``), with a cached zipfile handle per archive.
Used when DATASET.DATA_FORMAT == 'zip'.
"""

from __future__ import annotations

import os
import zipfile
from typing import Dict

import cv2
import numpy as np

_cache: Dict[str, zipfile.ZipFile] = {}


def split_zip_path(path: str):
    pos = path.index("@")
    return path[:pos], path[pos + 1:]


def is_zip_path(path: str) -> bool:
    return "@" in path


def imread(path: str, flags=cv2.IMREAD_COLOR):
    zip_path, inner = split_zip_path(path)
    zf = _cache.get(zip_path)
    if zf is None:
        zf = zipfile.ZipFile(zip_path, "r")
        _cache[zip_path] = zf
    data = zf.read(inner.lstrip(os.sep))
    buf = np.frombuffer(data, np.uint8)
    return cv2.imdecode(buf, flags)
