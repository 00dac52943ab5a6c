"""C API tests: build libiht, drive it standalone and in-process.

Covers both interpreter-ownership modes of the native layer
(native/src/c_api.cpp): the standalone C front-end (iht_smoke embeds
Python itself — the reference-CLI role) and ctypes loading into an already
running interpreter (the reference GUI/FFI role).
"""

import ctypes
import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "native", "build")

SCENE = {
    "crystal": [
        {
            "id": 1,
            "type": "prism",
            "shape": {"height": 1.0},
            "axis": {
                "zenith": {"type": "uniform", "mean": 90, "std": 360},
                "azimuth": {"type": "uniform", "mean": 0, "std": 360},
            },
        }
    ],
    "filter": [],
    "scene": {
        "light_source": {
            "type": "sun",
            "altitude": 25,
            "spectrum": [{"wavelength": 550, "weight": 1.0}],
        },
        "ray_num": 32768,
        "max_hits": 6,
        "scattering": [{"prob": 0.0, "entries": [{"crystal": 1, "proportion": 1}]}],
    },
    "render": [
        {
            "id": 1,
            "lens": {"type": "fisheye_equal_area", "fov": 120},
            "resolution": [64, 64],
            "view": {"elevation": 25},
        }
    ],
}


@pytest.fixture(scope="module")
def native_build():
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    if not os.path.exists(os.path.join(BUILD, "build.ninja")):
        gen = ["-G", "Ninja"] if shutil.which("ninja") else []
        subprocess.run(
            ["cmake", "-S", os.path.join(REPO, "native"), "-B", BUILD, *gen],
            check=True, capture_output=True,
        )
    subprocess.run(
        ["cmake", "--build", BUILD], check=True, capture_output=True
    )
    return BUILD


def test_standalone_c_frontend(native_build, tmp_path):
    """iht_smoke embeds Python itself and exercises the full C surface."""
    scene = tmp_path / "scene.json"
    scene.write_text(json.dumps(SCENE))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    res = subprocess.run(
        [os.path.join(native_build, "iht_smoke"), str(scene)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, f"stderr: {res.stderr}\nstdout: {res.stdout}"
    assert "iht_smoke OK" in res.stdout


@pytest.fixture(scope="module")
def lib(native_build):
    lib = ctypes.CDLL(os.path.join(native_build, "libiht.so"))
    lib.IHT_ApiVersion.restype = ctypes.c_int
    lib.IHT_LastError.restype = ctypes.c_char_p
    lib.IHT_CreateServer.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint, ctypes.c_int,
    ]
    lib.IHT_CommitSceneJson.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
    ]
    lib.IHT_WaitIdle.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.IHT_GetSimRayCount.argtypes = [ctypes.c_void_p]
    lib.IHT_GetSimRayCount.restype = ctypes.c_longlong
    lib.IHT_AcquireResultFrame.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.IHT_FrameGetRenderSize.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.IHT_FrameGetRender.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.IHT_DestroyServer.argtypes = [ctypes.c_void_p]
    lib.IHT_ReleaseResultFrame.argtypes = [ctypes.c_void_p]
    lib.IHT_ValidateRaypathText.argtypes = [ctypes.c_char_p, ctypes.c_int]
    return lib


def test_inprocess_ctypes_roundtrip(lib):
    """libiht joins the running interpreter (GUI/FFI embedding mode)."""
    assert lib.IHT_ApiVersion() == 1
    server = ctypes.c_void_p()
    assert lib.IHT_CreateServer(ctypes.byref(server), 7, 16384) == 0, (
        lib.IHT_LastError()
    )
    reused = ctypes.c_int(-1)
    rc = lib.IHT_CommitSceneJson(
        server, json.dumps(SCENE).encode(), ctypes.byref(reused)
    )
    assert rc == 0, lib.IHT_LastError()
    assert reused.value == 0
    assert lib.IHT_WaitIdle(server, 300.0) == 0
    assert lib.IHT_GetSimRayCount(server) >= SCENE["scene"]["ray_num"]

    frame = ctypes.c_void_p()
    assert lib.IHT_AcquireResultFrame(server, ctypes.byref(frame)) == 0
    w, h = ctypes.c_int(), ctypes.c_int()
    assert lib.IHT_FrameGetRenderSize(frame, 0, ctypes.byref(w), ctypes.byref(h)) == 0
    assert (w.value, h.value) == (64, 64)
    buf = ctypes.create_string_buffer(w.value * h.value * 3)
    assert lib.IHT_FrameGetRender(frame, 0, buf, len(buf)) == 0
    assert any(b > 10 for b in buf.raw)
    assert lib.IHT_ReleaseResultFrame(frame) == 0
    assert lib.IHT_DestroyServer(server) == 0


def test_validation_helpers_no_python(lib):
    assert lib.IHT_ValidateRaypathText(b"3-5-1", -1) == 0
    assert lib.IHT_ValidateRaypathText(b"3-5-", -1) == 1
    assert lib.IHT_ValidateRaypathText(b"3--5", -1) == 2
    assert lib.IHT_ValidateRaypathText(b"3-13", 0) == 2   # prism: 13 illegal
    assert lib.IHT_ValidateRaypathText(b"3-13", 1) == 0   # pyramid: legal
