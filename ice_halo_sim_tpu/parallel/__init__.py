from ice_halo_sim_tpu.parallel.sharding import ShardedEngine, make_mesh  # noqa: F401
