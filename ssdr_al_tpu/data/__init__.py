from ssdr_al_tpu.data.ply import read_ply, write_ply  # noqa: F401
