"""Superpoint partition pipeline: knn graphs → geof → cut-pursuit → registry.

Per-cloud driver with the semantics of partition/compute_superpoint.py:20-89:
  1. 10-NN adjacency graph + 45-NN geometric-feature neighborhoods
     (compute_graph_nn_2, partition/graphs.py:23-70)
  2. geometric features linearity/planarity/scattering/verticality
     (libply_c.compute_geof — here the batched on-device ops.geof kernel)
  3. partition features = [geof, rgb] with verticality ×2
     (compute_superpoint.py:54-55)
  4. edge weights 1/(λ_edge + d/mean d) (compute_superpoint.py:57-59)
  5. L0 cut-pursuit (native C++, ssdr_al_tpu.partition.cp)
  6. artifacts: <cloud>.superpoint, zeroed <cloud>.gt, total.pkl registry
"""

from __future__ import annotations

from typing import List

import numpy as np

from ssdr_al_tpu.active.state import ALState
from ssdr_al_tpu.data.cloud import Cloud
from ssdr_al_tpu.ops.geof import geometric_features
from ssdr_al_tpu.partition.cp import cutpursuit


def knn_graph(xyz: np.ndarray, k_adj: int, k_geof: int, backend: str = "auto"):
    """Simultaneous k_adj-NN graph (with distances) + k_geof-NN targets,
    excluding self — compute_graph_nn_2 (graphs.py:23-70).

    Returns (source [N*k_adj], target [N*k_adj], distances [N*k_adj],
    target_geof [N, k_geof])."""
    n = len(xyz)
    k = min(k_geof + 1, n)
    if backend == "auto":
        import jax

        backend = "device" if jax.default_backend() == "tpu" else "host"
    if backend == "device":
        from ssdr_al_tpu.ops.knn import knn_approx

        # bucket the cloud size so every cloud hits the same compiled kernel;
        # approx engine (recall ≥0.997): the 45-NN geof neighborhoods and the
        # 10-NN partition graph are statistical features, not exact structures
        n_pad = ((n + 2047) // 2048) * 2048
        far = xyz.max(axis=0) + 1e5  # sentinel rows, never true neighbors
        xyz_p = np.vstack([xyz, np.tile(far, (n_pad - n, 1))]).astype(np.float32)
        idx = np.asarray(knn_approx(xyz_p[None], xyz_p[None], k)[0])[:n]
        d = np.sqrt(
            ((xyz[:, None, :] - xyz_p[idx[:, :k_adj + 1]]) ** 2).sum(-1)
        )
        neighbors, distances = idx[:, 1:], d[:, 1:k_adj + 1]
    else:
        from scipy.spatial import cKDTree

        tree = cKDTree(xyz)
        d, idx = tree.query(xyz, k=k)
        neighbors, distances = idx[:, 1:], d[:, 1:k_adj + 1]

    target_geof = neighbors[:, : k_geof].astype(np.int32)
    adj = neighbors[:, : k_adj]
    source = np.repeat(np.arange(n, dtype=np.uint32), adj.shape[1])
    target = adj.astype(np.uint32).ravel()
    return source, target, distances.astype(np.float32).ravel(), target_geof


def partition_cloud(
    xyz: np.ndarray,
    rgb: np.ndarray,
    reg_strength: float,
    *,
    k_adj: int = 10,
    k_geof: int = 45,
    lambda_edge_weight: float = 1.0,
    knn_backend: str = "auto",
):
    """One cloud → (components, in_component). Parity with
    compute_superpoint.py:46-64."""
    xyz = np.asarray(xyz, np.float32)
    source, target, distances, target_geof = knn_graph(
        xyz, k_adj, k_geof, backend=knn_backend
    )
    geof = np.asarray(geometric_features(xyz, target_geof))
    features = np.hstack([geof, np.asarray(rgb, np.float32)]).astype(np.float32)
    features[:, 3] *= 2.0  # verticality boost heuristic (compute_superpoint.py:55)
    edge_weight = (
        1.0 / (lambda_edge_weight + distances / distances.mean())
    ).astype(np.float32)
    return cutpursuit(features, source, target, edge_weight, reg_strength)


def compute_superpoints(
    clouds: List[Cloud],
    state: ALState,
    reg_strength: float,
    *,
    k_adj: int = 10,
    k_geof: int = 45,
    lambda_edge_weight: float = 1.0,
    knn_backend: str = "auto",
    log=print,
) -> dict:
    """All training clouds → superpoint artifacts + total.pkl registry
    (compute_superpoint.py:20-89)."""
    total_obj = {"unlabeled": {}}
    sp_num = file_num = point_num = 0
    for cloud in clouds:
        components, in_component = partition_cloud(
            cloud.xyz, cloud.colors, reg_strength,
            k_adj=k_adj, k_geof=k_geof,
            lambda_edge_weight=lambda_edge_weight, knn_backend=knn_backend,
        )
        state.write_superpoints(
            cloud.name, components, in_component, cloud.num_points
        )
        total_obj["unlabeled"][cloud.name] = np.arange(len(components))
        sp_num += len(components)
        file_num += 1
        point_num += cloud.num_points
        log(f"partition {cloud.name}: {cloud.num_points} pts → "
            f"{len(components)} superpoints")
    total_obj["file_num"] = file_num
    total_obj["sp_num"] = sp_num
    total_obj["point_num"] = point_num
    state.write_registry(total_obj)
    log(f"total: file_num={file_num} sp_num={sp_num} point_num={point_num}")
    return total_obj


def superpoint_size_distribution(state: ALState, cloud_names: List[str]):
    """Histogram of superpoint sizes (test_superpoint_distribution,
    compute_superpoint.py:92-116)."""
    sp_count = point_count = 0
    hist = {}
    for name in cloud_names:
        sp = state.load_superpoints(name)
        sp_count += sp.num_superpoints
        for c in sp.components:
            point_count += len(c)
            bucket = len(c) // 10
            hist[bucket] = hist.get(bucket, 0) + 1
    return {
        "sp_count": sp_count,
        "point_count": point_count,
        "mean_size": point_count / max(sp_count, 1),
        "hist": dict(sorted(hist.items())),
    }
