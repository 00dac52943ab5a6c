"""Multi-host distribution: N processes x local devices, one global mesh.

The reference is strictly single-node (SURVEY §2.9: thread pool + queues,
no MPI/NCCL). The TPU-native scaling story past one host is the standard
JAX multi-controller model:

  - every host runs the SAME program (this module + ShardedEngine);
  - ``jax.distributed.initialize`` wires the processes into one runtime;
  - the mesh spans ``jax.devices()`` (ALL hosts' chips), so the existing
    ``ShardedEngine`` shard_map step runs unchanged — each chip traces its
    own ray shard with counter-RNG streams keyed by the GLOBAL device
    index (``jax.lax.axis_index`` over the global mesh), which is exactly
    the reference's (seed, global_ray_idx, slot) stream-collision design
    (trace_backend.hpp:160-190) lifted to a fleet;
  - accumulators stay device-resident; the drain reduction is one psum
    that rides ICI within a host and DCN across hosts (third-clock drain
    cadence, trace_backend.hpp:495-503 — cross-host traffic only at drain
    time, never per batch).

Scaling expectation: rays are embarrassingly parallel and the per-batch
step has NO cross-device communication, so efficiency at N hosts is
bounded only by drain frequency (amortized over many batches) — the
BASELINE ">= 85% at 4 hosts" bar is structural headroom, not a tuned
constant.

Tested without real multi-host hardware by running N local processes with
CPU devices and a localhost coordinator (tests/test_multihost.py), the
same pattern the reference uses for backend seams without GPUs
(doc/testing-architecture.md:264-269).
"""

from __future__ import annotations

from typing import Optional

import jax

from ice_halo_sim_tpu.config.schema import ProjectConfig
from ice_halo_sim_tpu.parallel.sharding import ShardedEngine, make_mesh
from ice_halo_sim_tpu.utils.log import get_logger


def init_multi_host(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[list] = None,
) -> None:
    """Wire this process into the multi-controller runtime. Call ONCE,
    before any other JAX API touches the backend. coordinator_address:
    "host:port" of process 0."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    get_logger("parallel").info(
        "multi-host init: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


class MultiHostEngine(ShardedEngine):
    """ShardedEngine over every device of every process.

    Identical step/fold/drain program as single-host ShardedEngine — the
    global mesh is the only difference. Construct AFTER init_multi_host.
    Each process must construct with the same (cfg, seed, per_device_batch)
    or the compiled programs diverge (same rule as any SPMD JAX program).
    """

    def __init__(self, cfg: ProjectConfig, seed: int = 1,
                 per_device_batch: int = 1 << 17, **kw):
        super().__init__(
            cfg, make_mesh(jax.devices()), seed=seed,
            per_device_batch=per_device_batch, **kw,
        )

    @property
    def process_index(self) -> int:
        return jax.process_index()

    @property
    def process_count(self) -> int:
        return jax.process_count()
