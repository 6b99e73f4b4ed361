r"""Exercise the pyrender backend of ``viz.render.Renderer`` with a fake
pyrender/trimesh implementing the minimal API surface.

pyrender is absent in this image, so the real GL path cannot run; this
verifies everything on OUR side of the pyrender API — backend selection,
scene assembly (mesh + intrinsics camera + the reference's 3 directional
lights, articulate/renderer.py:37-60), the OpenGL camera-convention pose,
depth-mask compositing, and renderer cleanup — against a deterministic
software-backed stand-in.
"""

import sys
import types

import numpy as np
import pytest


class _FakeScene:
    def __init__(self, ambient_light=None):
        self.ambient_light = ambient_light
        self.nodes = []          # (obj, pose) in add order

    def add(self, obj, pose=None):
        self.nodes.append((obj, pose))


class _FakeMesh:
    def __init__(self, trimesh_obj):
        self.trimesh = trimesh_obj

    @staticmethod
    def from_trimesh(tm):
        return _FakeMesh(tm)


class _FakeTrimesh:
    def __init__(self, vertices=None, faces=None):
        self.vertices = np.asarray(vertices)
        self.faces = np.asarray(faces)
        self.visual = types.SimpleNamespace(vertex_colors=None)


class _FakeIntrinsicsCamera:
    def __init__(self, fx, fy, cx, cy):
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy


class _FakeDirectionalLight:
    def __init__(self, intensity=1.0):
        self.intensity = intensity


class _FakeOffscreenRenderer:
    r"""Deterministic 'GL': fills a centered quarter-size square with a flat
    color and depth 1, everything else depth 0 (background)."""
    deleted = []

    def __init__(self, width, height):
        self.width, self.height = int(width), int(height)

    def render(self, scene):
        H, W = self.height, self.width
        color = np.zeros((H, W, 4), np.uint8)
        depth = np.zeros((H, W), np.float32)
        y0, y1 = H // 4, 3 * H // 4
        x0, x1 = W // 4, 3 * W // 4
        color[y0:y1, x0:x1] = (10, 200, 30, 255)
        depth[y0:y1, x0:x1] = 1.0
        self._scene = scene
        return color, depth

    def delete(self):
        _FakeOffscreenRenderer.deleted.append(self)


@pytest.fixture()
def fake_pyrender(monkeypatch):
    pyr = types.ModuleType("pyrender")
    pyr.Scene = _FakeScene
    pyr.Mesh = _FakeMesh
    pyr.IntrinsicsCamera = _FakeIntrinsicsCamera
    pyr.DirectionalLight = _FakeDirectionalLight
    pyr.OffscreenRenderer = _FakeOffscreenRenderer
    tm = types.ModuleType("trimesh")
    tm.Trimesh = _FakeTrimesh
    monkeypatch.setitem(sys.modules, "pyrender", pyr)
    monkeypatch.setitem(sys.modules, "trimesh", tm)
    _FakeOffscreenRenderer.deleted.clear()
    return pyr


@pytest.fixture(scope="module")
def model():
    from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
    return ParametricModel(data=synthetic_smpl_data(num_verts=200))


def _verts_K(model):
    rng = np.random.RandomState(0)
    verts = rng.randn(200, 3).astype(np.float32)
    verts[:, 2] += 4.0
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    return verts, K


def test_backend_selected(fake_pyrender, model):
    from robustcap_tpu.viz.render import Renderer
    r = Renderer(resolution=(64, 64), model=model)
    assert r._backend == "pyrender"


def test_scene_assembly_and_cleanup(fake_pyrender, model):
    from robustcap_tpu.viz.render import Renderer
    r = Renderer(resolution=(64, 64), model=model)
    verts, K = _verts_K(model)
    out = r.render(None, verts, K, mesh_color=(0.2, 0.5, 0.9, 1.0))
    assert out.shape == (64, 64, 3)

    ren = _FakeOffscreenRenderer.deleted
    assert len(ren) == 1, "OffscreenRenderer.delete() must be called"
    scene = ren[0]._scene
    meshes = [o for o, _ in scene.nodes if isinstance(o, _FakeMesh)]
    cams = [(o, p) for o, p in scene.nodes
            if isinstance(o, _FakeIntrinsicsCamera)]
    lights = [o for o, _ in scene.nodes
              if isinstance(o, _FakeDirectionalLight)]
    assert len(meshes) == 1 and len(cams) == 1
    assert len(lights) == 3  # the reference's 3 directional lights

    # intrinsics map straight from K
    cam, pose = cams[0]
    assert cam.fx == 100.0 and cam.cx == 32
    # OpenGL convention: y/z axes flipped
    assert pose[1, 1] == -1 and pose[2, 2] == -1 and pose[0, 0] == 1

    # mesh got the vertices and per-vertex colors
    tmobj = meshes[0].trimesh
    np.testing.assert_array_equal(tmobj.vertices, verts)
    assert tmobj.visual.vertex_colors.shape == (len(verts), 4)
    assert tuple(tmobj.visual.vertex_colors[0][:3]) == (51, 127, 229)


def test_depth_mask_composite(fake_pyrender, model):
    from robustcap_tpu.viz.render import Renderer
    r = Renderer(resolution=(64, 64), model=model)
    verts, K = _verts_K(model)
    bg = np.full((64, 64, 3), 7, np.uint8)
    out = r.render(bg, verts, K)
    # inside the fake depth mask: rendered color; outside: background kept
    assert tuple(out[32, 32]) == (10, 200, 30)
    assert tuple(out[0, 0]) == (7, 7, 7)
    # background array itself untouched
    assert tuple(bg[32, 32]) == (7, 7, 7)


def test_no_background_returns_color(fake_pyrender, model):
    from robustcap_tpu.viz.render import Renderer
    r = Renderer(resolution=(64, 64), model=model)
    verts, K = _verts_K(model)
    out = r.render(None, verts, K)
    assert out.shape == (64, 64, 3)
    assert tuple(out[32, 32]) == (10, 200, 30)
    assert tuple(out[0, 0]) == (0, 0, 0)


def test_software_fallback_without_pyrender(model):
    # no fake installed -> bare stubs (reference harness) or absence must
    # both select the software rasterizer
    from robustcap_tpu.viz.render import Renderer
    r = Renderer(resolution=(32, 32), model=model)
    assert r._backend == "software"
