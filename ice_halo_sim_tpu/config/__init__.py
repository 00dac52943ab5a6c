from ice_halo_sim_tpu.config import schema  # noqa: F401
from ice_halo_sim_tpu.config.loader import load_project, load_project_file  # noqa: F401
