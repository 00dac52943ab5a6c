from ice_halo_sim_tpu.engine.simulator import Engine  # noqa: F401
