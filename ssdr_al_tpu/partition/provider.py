"""SPG artifact IO: superpoint graphs and partitions as HDF5.

Parity with the reference's partition/provider.py (write_spg / read_spg,
write_components / read_components): the superpoint graph built by
partition/sp_graph.py round-trips through the same h5 layout consumed by
SPG-style downstream models.
"""

from __future__ import annotations

from typing import List

import numpy as np

_SP_KEYS = (
    "sp_centroids", "sp_length", "sp_surface", "sp_volume", "sp_point_count",
    "source", "target", "se_delta_mean", "se_delta_std", "se_delta_norm",
    "se_delta_centroid", "se_length_ratio", "se_surface_ratio",
    "se_volume_ratio", "se_point_count_ratio",
)


def write_spg(path: str, graph: dict):
    """Persist a superpoint graph (reference provider.write_spg layout)."""
    import h5py

    with h5py.File(path, "w") as f:
        for k in _SP_KEYS:
            f.create_dataset(k, data=np.asarray(graph[k]))
        if np.size(graph.get("sp_labels", [])) > 0:
            f.create_dataset("sp_labels", data=np.asarray(graph["sp_labels"]))


def read_spg(path: str) -> dict:
    import h5py

    out = {"is_nn": False}
    with h5py.File(path, "r") as f:
        for k in f.keys():
            out[k] = f[k][()]
    out.setdefault("sp_labels", [])
    return out


def write_components(path: str, components: List[np.ndarray],
                     in_component: np.ndarray):
    """Persist a partition (reference provider.write_components layout:
    one ragged dataset per component + the dense map)."""
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("in_component",
                         data=np.asarray(in_component, np.int32))
        grp = f.create_group("components")
        for i, c in enumerate(components):
            grp.create_dataset(str(i), data=np.asarray(c, np.int64))


def read_components(path: str):
    import h5py

    with h5py.File(path, "r") as f:
        in_component = f["in_component"][()]
        grp = f["components"]
        components = [grp[str(i)][()] for i in range(len(grp))]
    return components, in_component
