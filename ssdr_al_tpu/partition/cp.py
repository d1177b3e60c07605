"""ctypes bindings for the native cut-pursuit library (native/libssdrcp.so).

Mirrors the reference's libcp Python surface (partition/cut-pursuit/src/
cutpursuit.cpp:92-120): `cutpursuit(obs, source, target, edge_weight, λ)` →
(components, in_component). Builds the .so on first use via make (g++).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libssdrcp.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cutpursuit_l0.restype = ctypes.c_int
    lib.cutpursuit_l0.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.connected_components.restype = ctypes.c_int
    lib.connected_components.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.grid_subsample.restype = ctypes.c_int
    lib.grid_subsample.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def cutpursuit(obs, source, target, edge_weight, reg_strength,
               max_ite: int = 10) -> Tuple[List[np.ndarray], np.ndarray]:
    """L0 minimal partition. Returns (components, in_component) with the
    reference's types: ragged list of point-index arrays + int32 [N] map."""
    obs = np.ascontiguousarray(obs, np.float32)
    source = np.ascontiguousarray(source, np.uint32)
    target = np.ascontiguousarray(target, np.uint32)
    edge_weight = np.ascontiguousarray(edge_weight, np.float32)
    n_ver, dim = obs.shape
    n_edg = len(source)
    in_component = np.empty(n_ver, np.int32)
    lib = _load()
    n_comp = lib.cutpursuit_l0(
        n_ver, n_edg, dim,
        _ptr(obs, ctypes.c_float),
        _ptr(source, ctypes.c_uint32), _ptr(target, ctypes.c_uint32),
        _ptr(edge_weight, ctypes.c_float),
        ctypes.c_float(float(reg_strength)), int(max_ite),
        _ptr(in_component, ctypes.c_int32),
    )
    order = np.argsort(in_component, kind="stable")
    bounds = np.searchsorted(in_component[order], np.arange(n_comp + 1))
    components = [order[bounds[c]: bounds[c + 1]] for c in range(n_comp)]
    return components, in_component


def connected_components(n_ver, source, target, labels) -> np.ndarray:
    """Label-respecting connected components (libply_c.connected_comp
    equivalent, reference ply_c.cpp:466-480)."""
    source = np.ascontiguousarray(source, np.uint32)
    target = np.ascontiguousarray(target, np.uint32)
    labels = np.ascontiguousarray(labels, np.int32)
    out = np.empty(n_ver, np.int32)
    lib = _load()
    lib.connected_components(
        int(n_ver), len(source),
        _ptr(source, ctypes.c_uint32), _ptr(target, ctypes.c_uint32),
        _ptr(labels, ctypes.c_int32), _ptr(out, ctypes.c_int32),
    )
    return out


def grid_subsample_native(points, features=None, labels=None, grid_size=0.1):
    """Host-native voxel-grid subsampling (same semantics as
    ops.grid_subsample.grid_subsample_np, backed by native/cutpursuit's C++
    implementation — the reference's cpp_subsampling parity path)."""
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    fdim = 0
    feat_ptr = ctypes.POINTER(ctypes.c_float)()
    out_feat_ptr = ctypes.POINTER(ctypes.c_float)()
    out_features = None
    if features is not None:
        features = np.ascontiguousarray(features, np.float32)
        fdim = features.shape[1]
        out_features = np.empty((n, fdim), np.float32)
        feat_ptr = _ptr(features, ctypes.c_float)
        out_feat_ptr = _ptr(out_features, ctypes.c_float)
    lab_ptr = ctypes.POINTER(ctypes.c_int32)()
    out_lab_ptr = ctypes.POINTER(ctypes.c_int32)()
    out_labels = None
    num_classes = 0
    if labels is not None:
        labels = np.ascontiguousarray(labels, np.int32).ravel()
        num_classes = int(labels.max()) + 1
        out_labels = np.empty(n, np.int32)
        lab_ptr = _ptr(labels, ctypes.c_int32)
        out_lab_ptr = _ptr(out_labels, ctypes.c_int32)
    out_points = np.empty((n, 3), np.float32)
    lib = _load()
    s = lib.grid_subsample(
        n, fdim, _ptr(points, ctypes.c_float), feat_ptr, lab_ptr,
        num_classes, ctypes.c_float(float(grid_size)),
        _ptr(out_points, ctypes.c_float), out_feat_ptr, out_lab_ptr,
    )
    out = [out_points[:s]]
    if features is not None:
        out.append(out_features[:s])
    if labels is not None:
        out.append(out_labels[:s])
    return out[0] if len(out) == 1 else tuple(out)
