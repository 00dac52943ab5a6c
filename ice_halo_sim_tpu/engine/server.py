"""Async render server: commit/poll lifecycle over the Engine.

TPU-native counterpart of the reference server layer
(/root/reference/src/server/server.cpp). The reference runs N simulator
worker threads + a scene-generator thread + a consumer thread joined by
blocking queues; on TPU one jitted step IS the whole pipeline, so the server
reduces to a single pump thread feeding batches to the device plus a
commit/snapshot protocol. What is preserved is the *semantics*:

  - ``commit()`` with a value-equal config reuses the accumulated image
    (Server::CommitConfig reuse predicate, server.cpp:530 +
    config_compare.hpp); an appearance-only render change (background,
    ray_color, intensity_factor, grid...) keeps accumulators and re-tone-maps
    (RenderConfig::NeedsRebuild layout-vs-appearance split,
    render_config.hpp:71-111); anything else resets and bumps the
    generation.
  - Stale work cannot leak across generations: the pump thread holds the
    engine lock for exactly one batch, and commit swaps the engine under the
    same lock (the reference's generation-tagged batch discard,
    server.cpp:1229).
  - ``acquire_frame()`` returns an immutable snapshot tagged with
    ``snapshot_generation`` — the only sameness test (ResultFrame,
    server.hpp:229-242).
  - Lifecycle: ``state()`` reports RUNNING while committed work remains,
    IDLE when the ray budget is drained (the 6-term idle predicate collapses
    to two terms here because there are no queues, server.cpp:1018-1128).
  - ``sim_ray_count()`` is O(1) and render-free (stats.hpp:18-25).
"""

from __future__ import annotations

import dataclasses
import enum
import threading
import time
from typing import Optional, Union

import numpy as np

from ice_halo_sim_tpu.config.loader import load_project, load_project_file
from ice_halo_sim_tpu.config.schema import ProjectConfig, RenderConfig
from ice_halo_sim_tpu.engine.simulator import DEFAULT_GEOM_CLOCK, Engine, Stats

# Render fields whose change requires NO re-simulation (appearance pass only;
# reference render_config.hpp NeedsRebuild == false set).
_APPEARANCE_FIELDS = (
    "background",
    "ray_color",
    "opacity",
    "intensity_factor",
    "central_grid",
    "elevation_grid",
    "celestial_outline",
)


class SimState(enum.Enum):
    IDLE = "idle"
    RUNNING = "running"
    STOPPED = "stopped"


@dataclasses.dataclass(frozen=True)
class ResultFrame:
    """Immutable result snapshot (reference ResultFrame, server.hpp:229-242)."""

    generation: int
    ray_count: int
    images: tuple          # per renderer: uint8 [H, W, 3]
    raw_xyz: tuple         # per renderer: float32 [H, W, 3]
    composites: tuple      # per renderer: float [H, W, 3] or None
    stats: Stats
    is_idle: bool
    timestamp: float


def _layout_key(cfg: ProjectConfig):
    """Config with appearance-only render fields masked to fixed values."""
    renders = tuple(
        dataclasses.replace(
            r,
            background=(0.0, 0.0, 0.0),
            ray_color=(-1.0, -1.0, -1.0),
            opacity=1.0,
            intensity_factor=1.0,
            central_grid=(),
            elevation_grid=(),
            celestial_outline=True,
        )
        for r in cfg.renders
    )
    return dataclasses.replace(cfg, renders=renders)


class Server:
    """Commit-and-poll renderer server.

    One background pump thread advances the active Engine one batch at a
    time until the committed ray budget is met (ray_num < 0 = run forever).
    """

    def __init__(self, seed: int = 1, batch_size: Optional[int] = None,
                 geom_clock: int = DEFAULT_GEOM_CLOCK):
        self._seed = seed
        self._batch_size = batch_size
        self._geom_clock = geom_clock
        self._lock = threading.RLock()
        self._wake = threading.Condition(self._lock)
        self._engine: Optional[Engine] = None
        self._cfg: Optional[ProjectConfig] = None
        self._generation = 0
        self._target_rays: Optional[int] = 0   # None = infinite
        self._shutdown = False
        self._thread = threading.Thread(target=self._pump, daemon=True,
                                        name="iht-server-pump")
        self._thread.start()

    # -- commit protocol ----------------------------------------------------

    def commit(self, config: Union[ProjectConfig, dict, str]) -> bool:
        """Commit a scene. Returns True if the previous accumulation was
        reused (value-equal layout), False if simulation restarted."""
        if isinstance(config, str):
            cfg = load_project_file(config)
        elif isinstance(config, dict):
            cfg = load_project(config)
        else:
            cfg = config

        with self._wake:
            if self._shutdown:
                raise RuntimeError("server is shut down")
            reused = False
            if self._cfg is not None and self._engine is not None:
                if cfg == self._cfg:
                    reused = True          # identical: nothing to do
                elif _layout_key(cfg) == _layout_key(self._cfg):
                    # Appearance-only change: keep accumulators, swap config.
                    self._engine.cfg = cfg
                    reused = True
            if not reused:
                bs = self._batch_size
                if bs is None:
                    import jax
                    bs = 1 << 17 if jax.devices()[0].platform == "cpu" else 1 << 20
                self._engine = Engine(cfg, seed=self._seed, batch_size=bs,
                                      geom_clock=self._geom_clock)
                self._generation += 1
            self._cfg = cfg
            rn = cfg.scene.ray_num
            self._target_rays = None if rn < 0 else int(rn)
            self._wake.notify_all()
            return reused

    # -- pump ---------------------------------------------------------------

    def _work_remaining_locked(self) -> bool:
        if self._engine is None:
            return False
        if self._target_rays is None:
            return True
        return self._engine.stats.rays_traced < self._target_rays

    def _pump(self) -> None:
        while True:
            with self._wake:
                while not self._shutdown and not self._work_remaining_locked():
                    self._wake.wait()
                if self._shutdown:
                    return
                engine = self._engine
                engine.run(n_batches=1)
                self._wake.notify_all()

    # -- results ------------------------------------------------------------

    def acquire_frame(self) -> Optional[ResultFrame]:
        """Immutable snapshot of the current accumulation (None before the
        first commit)."""
        with self._lock:
            eng = self._engine
            if eng is None:
                return None
            images = tuple(np.array(i) for i in eng.snapshot())
            raw = tuple(np.array(eng.raw_xyz(r)) for r in range(len(eng.proj_plans)))
            comps = tuple(
                (np.array(c) if (c := eng.composite(r)) is not None else None)
                for r in range(len(eng.proj_plans))
            )
            stats = eng.drain_stats()
            return ResultFrame(
                generation=self._generation,
                ray_count=stats.rays_traced,
                images=images,
                raw_xyz=raw,
                composites=comps,
                stats=stats,
                is_idle=not self._work_remaining_locked(),
                timestamp=time.time(),
            )

    def sim_ray_count(self) -> int:
        with self._lock:
            return 0 if self._engine is None else self._engine.stats.rays_traced

    def state(self) -> SimState:
        with self._lock:
            if self._shutdown:
                return SimState.STOPPED
            return SimState.RUNNING if self._work_remaining_locked() else SimState.IDLE

    def generation(self) -> int:
        with self._lock:
            return self._generation

    def wait_idle(self, timeout: Optional[float] = None) -> bool:
        """Block until the committed ray budget is drained."""
        deadline = None if timeout is None else time.time() + timeout
        with self._wake:
            while self._work_remaining_locked():
                remaining = None if deadline is None else deadline - time.time()
                if remaining is not None and remaining <= 0:
                    return False
                self._wake.wait(timeout=remaining)
            return True

    # -- lifecycle ----------------------------------------------------------

    def stop(self) -> None:
        """Stop pumping (keeps state; a new commit restarts). Mirrors
        LUMICE_StopServer semantics: halt work, keep results readable."""
        with self._wake:
            self._target_rays = 0
            self._wake.notify_all()

    def shutdown(self) -> None:
        with self._wake:
            self._shutdown = True
            self._wake.notify_all()
        self._thread.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False
