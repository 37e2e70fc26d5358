"""Native (C++) host data-path kernels with ctypes bindings + numpy fallback.

Builds ``libmmor_native.so`` from mmor_native.cpp on first use (g++ -O3); if
the toolchain is unavailable, every entry point falls back to the pure-numpy
implementations in ``mmor_tpu.data``. The C ABI keeps the binding layer to a
few ctypes signatures — no pybind11 required.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "mmor_native.cpp"
_LIB = _DIR / "libmmor_native.so"

_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.priority_downsample.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, u8p]
        lib.clean_mask.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, u8p]
        lib.panoptic_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p,
                                        ctypes.c_int, i32p, i32p, i64p,
                                        ctypes.c_int]
        lib.rgb_to_labels.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p,
                                      u8p, ctypes.c_int, u8p]
        _lib = lib
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def priority_downsample(mask: np.ndarray, out_res: int = 32) -> np.ndarray:
    lib = _load()
    if lib is None:
        from mmor_tpu.data.artifacts import downsample_mask_preserve_classes

        return downsample_mask_preserve_classes(mask, out_res)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    out = np.zeros((out_res, out_res), np.uint8)
    lib.priority_downsample(_u8(mask), mask.shape[0], mask.shape[1], out_res, _u8(out))
    return out


def clean_mask(mask: np.ndarray, area_threshold: int = 10) -> np.ndarray:
    lib = _load()
    if lib is None:
        from mmor_tpu.data.panoptic import clean_mask as np_clean

        return np_clean(mask, area_threshold)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    out = np.zeros_like(mask)
    lib.clean_mask(_u8(mask), mask.shape[0], mask.shape[1], area_threshold, _u8(out))
    return out


def rgb_to_labels(rgb: np.ndarray) -> np.ndarray:
    from mmor_tpu.data.panoptic import TRACK_TO_METAINFO

    lib = _load()
    if lib is None:
        from mmor_tpu.data.artifacts import color_mask_to_labels

        return color_mask_to_labels(rgb)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    names = list(TRACK_TO_METAINFO)
    colors = np.ascontiguousarray(
        np.array([TRACK_TO_METAINFO[n]["color"] for n in names], np.uint8)
    )
    labels_table = np.ascontiguousarray(
        np.array([TRACK_TO_METAINFO[n]["label"] for n in names], np.uint8)
    )
    out = np.zeros(rgb.shape[:2], np.uint8)
    lib.rgb_to_labels(_u8(rgb), rgb.shape[0], rgb.shape[1], _u8(colors),
                      _u8(labels_table), len(names), _u8(out))
    return out


def panoptic_encode(
    mask: np.ndarray, label_to_category: dict[int, int], divisor: int = 10,
    max_categories: int = 64,
):
    """label map -> (pan_map int32, cat_map int32, areas int64)."""
    lib = _load()
    table = np.full((256,), -1, np.int32)
    for label, cat in label_to_category.items():
        table[label] = cat
    if lib is None:
        cat_map = np.where(mask > 0, table[mask], 0)
        cat_map = np.where(cat_map < 0, 0, cat_map).astype(np.int32)
        pan = (cat_map * divisor).astype(np.int32)
        areas = np.bincount(cat_map.reshape(-1), minlength=max_categories
                            )[:max_categories].astype(np.int64)
        areas[0] = 0
        return pan, cat_map, areas
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    pan = np.zeros(mask.shape, np.int32)
    cat = np.zeros(mask.shape, np.int32)
    areas = np.zeros((max_categories,), np.int64)
    lib.panoptic_encode(
        _u8(mask), mask.shape[0], mask.shape[1],
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), divisor,
        pan.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_categories,
    )
    return pan, cat, areas
