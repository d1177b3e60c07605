from ssdr_al_tpu.models.randlanet import (  # noqa: F401
    RandLANet,
    build_pyramid,
    forward_with_pyramid,
    masked_weighted_ce,
    label_reduce_table,
)
