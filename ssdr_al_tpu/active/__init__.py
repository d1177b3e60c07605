from ssdr_al_tpu.active.state import ALState, RoundStats, sampler_args_str  # noqa: F401
from ssdr_al_tpu.active.uncertainty import (  # noqa: F401
    point_uncertainty,
    region_uncertainty,
    add_classbal,
    add_clsbal,
)
from ssdr_al_tpu.active.oracle import oracle_labeling, seed_labeling  # noqa: F401
