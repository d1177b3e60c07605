from ssdr_al_tpu.partition.cp import cutpursuit, connected_components  # noqa: F401
from ssdr_al_tpu.partition.superpoint import compute_superpoints, partition_cloud  # noqa: F401
