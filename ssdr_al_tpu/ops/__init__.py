"""Device ops library — the contract every higher layer builds on.

TPU-native equivalents of the reference's native kernels (SURVEY.md §2.1):
  knn             N1  batched exact KNN (utils/nearest_neighbors/knn_.cxx)
  grid_subsample  N2  voxel-barycenter subsampling (cpp_subsampling/grid_subsampling.cpp)
  geof            N3  geometric features (partition/ply_c/ply_c.cpp:385-464)
  chamfer         N5  pairwise chamfer distance (chamfer3D/chamfer3D.cu, fps_gcn_cpu.py:12-38)
  fps / kcenter   on-device greedy selection loops (fps_gcn_cpu.py:119-147, kcenterGreedy.py)
  segment         ragged per-superpoint reductions with static shapes
"""

from ssdr_al_tpu.ops.knn import (  # noqa: F401
    knn,
    knn_approx,
    knn_pallas,
    knn_window,
    knn_xla,
)
from ssdr_al_tpu.ops.grid_subsample import grid_subsample_np  # noqa: F401
from ssdr_al_tpu.ops.chamfer import chamfer_pairwise  # noqa: F401
from ssdr_al_tpu.ops.geof import geometric_features  # noqa: F401
from ssdr_al_tpu.ops.fps import farthest_feature_sample, farthest_superpoint_sample  # noqa: F401
from ssdr_al_tpu.ops.kcenter import kcenter_greedy  # noqa: F401
from ssdr_al_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_majority,
    segment_count,
)
