"""Differentiable rendering: pixel gradients vs finite differences.

BASELINE config-2 class of checks on a plate parhelia scene. What the
estimator covers (and the test asserts): smooth transport — Fresnel weights,
refraction directions, rotations, splat positions — plus the REINFORCE
score-function term for the discrete entry-face choice. Known gap (round-2
work): boundary terms from internal slab-face reassignments under geometry
changes, so the autodiff estimate sits somewhat below seed-averaged finite
differences for shape parameters; the test pins sign, finiteness, and a
factor-band agreement of seed-averaged estimates rather than tight equality.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ice_halo_sim_tpu.config.loader import load_project
from ice_halo_sim_tpu.engine.gradient import RenderParams, default_params, make_render_fn

CFG = {
    "crystal": [
        {"id": 1, "type": "prism", "shape": {"height": 0.3},
         "axis": {"zenith": {"type": "gauss", "mean": 90, "std": 1.5},
                  "azimuth": {"type": "uniform", "mean": 0, "std": 360},
                  "roll": {"type": "uniform", "mean": 0, "std": 360}}}
    ],
    "filter": [],
    "scene": {
        "light_source": {"type": "sun", "altitude": 25, "azimuth": 0, "diameter": 0.5,
                         "spectrum": [{"wavelength": 550, "weight": 1.0}]},
        "ray_num": 100000, "max_hits": 5,
        "scattering": [{"prob": 0.0, "entries": [{"crystal": 1, "proportion": 100}]}],
    },
    "render": [
        {"id": 1, "lens": {"type": "fisheye_equal_area", "fov": 150},
         "resolution": [96, 96], "view": {"elevation": 90}, "visible": "full"}
    ],
}


def smooth_loss(img):
    """Gaussian-window-weighted radiance: a smooth scalar with no hard pixel
    cutoffs, so finite differences converge."""
    h, w, _ = img.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    win = jnp.exp(-(((xx - w / 2) ** 2 + (yy - h * 0.3) ** 2) / (2 * 8.0**2)))
    return jnp.sum(img[..., 1] * win)


@pytest.fixture(scope="module")
def cfg():
    return load_project(CFG)


def test_render_fn_runs_and_is_finite(cfg):
    fn = make_render_fn(cfg, batch_size=1 << 13, seed=3)
    img = fn(default_params(cfg))
    assert np.isfinite(np.asarray(img)).all()
    assert float(img.sum()) > 0


def _seed_averaged(cfg, field, eps, n_seeds=3, batch=1 << 14):
    params = default_params(cfg)
    v0 = float(getattr(params, field))
    gs, fds = [], []
    for s in range(n_seeds):
        fn = make_render_fn(cfg, batch_size=batch, seed=50 + s)

        def loss(p):
            return smooth_loss(fn(p))

        gs.append(float(jax.grad(lambda v: loss(params._replace(**{field: v})))(
            getattr(params, field))))
        lp = float(loss(params._replace(**{field: jnp.float32(v0 + eps)})))
        lm = float(loss(params._replace(**{field: jnp.float32(v0 - eps)})))
        fds.append((lp - lm) / (2 * eps))
    return float(np.mean(gs)), float(np.mean(fds))


@pytest.mark.parametrize("field,eps", [("sun_altitude_deg", 1.0), ("height", 0.05)])
def test_gradient_tracks_finite_difference(cfg, field, eps):
    g, fd = _seed_averaged(cfg, field, eps)
    assert np.isfinite(g) and g != 0.0
    assert abs(fd) > 0
    # Same sign and within a factor band (see module docstring for the known
    # boundary-term gap on shape parameters).
    assert np.sign(g) == np.sign(fd), (g, fd)
    assert 0.4 < g / fd < 2.5, (g, fd)


def test_gradient_wrt_face_distance(cfg):
    fn = make_render_fn(cfg, batch_size=1 << 14, seed=7)
    params = default_params(cfg)

    def loss(fd):
        return smooth_loss(fn(params._replace(face_distance=fd)))

    g = np.asarray(jax.grad(loss)(params.face_distance))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
