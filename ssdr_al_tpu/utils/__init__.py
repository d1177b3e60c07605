from ssdr_al_tpu.utils.logging import Timer, MetricsWriter, log_out  # noqa: F401
