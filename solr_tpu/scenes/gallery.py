"""The demo gallery (reference: apps/scenes/*Scene.cpp — each a small
class building geometry through the engine API and animating it).

Scenes are registered by name for the viewer CLI
(`python -m solr_tpu.viewer --scene <name>`); `SCENE_REGISTRY` lists
them all.
"""

from __future__ import annotations

import numpy as np

import solr_tpu as st
from solr_tpu.scenes.base import DemoScene, register_scene
from solr_tpu.types import CameraMode, PlaneAxis, ProceduralKind


@register_scene("cornell")
class CornellBoxScene(DemoScene):
    """(reference: CornellBoxScene.cpp)"""

    default_camera = dict(position=(0.0, 0.0, -1.6), fov=1.1)

    def do_initialize(self):
        b = self.builder
        white = b.add_material(color=(0.75, 0.75, 0.75, 1.0))
        red = b.add_material(color=(0.75, 0.15, 0.15, 1.0))
        green = b.add_material(color=(0.15, 0.75, 0.15, 1.0))
        mirror = b.add_material(color=(0.9, 0.9, 0.9, 1.0),
                                reflection=0.7, specular=0.8)
        glass = b.add_material(color=(0.95, 1.0, 0.95, 1.0),
                               transparency=0.85, ior=1.5)
        b.add_plane(PlaneAxis.XZ, (0, -1, 1), (1, 1), white)
        b.add_plane(PlaneAxis.XZ, (0, 1, 1), (1, 1), white)
        b.add_plane(PlaneAxis.YZ, (-1, 0, 1), (1, 1), red)
        b.add_plane(PlaneAxis.YZ, (1, 0, 1), (1, 1), green)
        b.add_plane(PlaneAxis.XY, (0, 0, 2), (1, 1), white)
        b.add_sphere((-0.45, -0.6, 1.2), 0.38, mirror)
        b.add_sphere((0.45, -0.62, 0.9), 0.36, glass)
        b.add_light((0.0, 0.85, 1.0), color=(1.0, 1.0, 0.95, 1.0),
                    radius=0.12)


@register_scene("spheres")
class SpheresScene(DemoScene):
    """Random material-matrix spheres on a checkerboard (reference:
    the random sphere demos + createRandomMaterials)."""

    default_camera = dict(position=(0.0, 1.5, -8.0), fov=0.9,
                          angles=(0.12, 0.0, 0.0))

    def do_initialize(self, n: int = 24):
        self.add_ground(extent=14.0)
        for _ in range(n):
            r = float(self.rng.uniform(0.3, 0.9))
            pos = (
                float(self.rng.uniform(-6, 6)),
                -1.0 + r,
                float(self.rng.uniform(0, 10)),
            )
            self.builder.add_sphere(pos, r, self.random_material())
        self.default_light()


@register_scene("cubes")
class CubesScene(DemoScene):
    """Boxes from triangles (reference: CubesScene.cpp)."""

    default_camera = dict(position=(0.0, 2.0, -9.0), fov=0.9,
                          angles=(0.15, 0.0, 0.0))

    def do_initialize(self, n: int = 12):
        self.add_ground(extent=12.0)
        for _ in range(n):
            s = float(self.rng.uniform(0.4, 1.0))
            cx = float(self.rng.uniform(-5, 5))
            cz = float(self.rng.uniform(0, 8))
            cy = -1.0 + s
            v, f = _box_mesh((cx, cy, cz), s)
            self.builder.add_mesh(v, f, self.random_material())
        self.default_light()

    def do_animate(self, frame: int):
        cam = self.camera.replace(
            angles=self.camera.angles.at[1].set(0.05 * frame)
        )
        return self.scene, cam


@register_scene("cylinders")
class CylinderScene(DemoScene):
    """(reference: CylinderScene.cpp)"""

    default_camera = dict(position=(0.0, 1.5, -8.0), fov=0.9)

    def do_initialize(self):
        self.add_ground(extent=12.0)
        for i in range(10):
            ang = i / 10.0 * 2.0 * np.pi
            x, z = 4.0 * np.cos(ang), 4.0 + 3.0 * np.sin(ang)
            h = float(self.rng.uniform(0.5, 2.5))
            self.builder.add_cylinder(
                (x, -1.0, z), (x, -1.0 + h, z), 0.3,
                self.random_material(),
            )
            self.builder.add_sphere((x, -1.0 + h, z), 0.3,
                                    self.random_material())
        self.default_light()


@register_scene("triangles")
class TrianglesScene(DemoScene):
    """Random triangle soup (reference: TrianglesScene.cpp)."""

    default_camera = dict(position=(0.0, 0.0, -8.0), fov=0.9)

    def do_initialize(self, n: int = 400):
        c = self.rng.uniform(-4, 4, (n, 3)) + np.array([0, 0, 4.0])
        d1 = self.rng.normal(0, 0.4, (n, 3))
        d2 = self.rng.normal(0, 0.4, (n, 3))
        m = self.builder.add_material(color=(0.5, 0.7, 0.9, 1.0),
                                      specular=0.4)
        self.builder.add_triangles_raw(c, c + d1, c + d2, m)
        self.default_light()


@register_scene("fractals")
class FractalsScene(DemoScene):
    """Procedural Mandelbrot/Julia-textured quads and spheres
    (reference: FractalsScene.cpp + TextureMapping.cuh fractals)."""

    default_camera = dict(position=(0.0, 0.0, -4.5), fov=0.9)

    def do_initialize(self):
        b = self.builder
        mandel = b.add_material(procedural=ProceduralKind.MANDELBROT,
                                procedural_scale=1.0)
        julia = b.add_material(procedural=ProceduralKind.JULIA,
                               procedural_scale=1.0)
        marble = b.add_material(procedural=ProceduralKind.MARBLE,
                                procedural_scale=6.0)
        b.add_plane(PlaneAxis.XY, (-1.6, 0.0, 3.0), (1.5, 1.5), mandel)
        b.add_plane(PlaneAxis.XY, (1.6, 0.0, 3.0), (1.5, 1.5), julia)
        b.add_sphere((0.0, 0.0, 2.0), 0.8, marble)
        self.default_light(position=(3.0, 5.0, -4.0))


@register_scene("molecule")
class MoleculeScene(DemoScene):
    """Caffeine-ish synthetic molecule via the PDB pipeline shapes
    (reference: MoleculeScene.cpp; real files load via io.load_pdb)."""

    default_camera = dict(position=(0.0, 0.0, -6.0), fov=0.9)

    def do_initialize(self, path: str = None):
        if path is not None:
            from solr_tpu.io import load_pdb

            load_pdb(path, self.builder, scale=0.25)
        else:
            ring = 6
            from solr_tpu.io.pdb import CPK_COLORS

            c_mat = self.builder.add_material(
                color=CPK_COLORS["C"] + (1.0,), specular=0.5)
            o_mat = self.builder.add_material(
                color=CPK_COLORS["O"] + (1.0,), specular=0.5)
            grey = self.builder.add_material(color=(0.6, 0.6, 0.6, 1.0))
            pts = []
            for i in range(ring):
                a = i / ring * 2 * np.pi
                p = (2.0 * np.cos(a), 2.0 * np.sin(a), 3.0)
                pts.append(p)
                self.builder.add_sphere(p, 0.45, c_mat)
            for i in range(ring):
                self.builder.add_cylinder(pts[i], pts[(i + 1) % ring],
                                          0.12, grey)
            self.builder.add_sphere((0.0, 0.0, 3.0), 0.5, o_mat)
        self.default_light()


@register_scene("graph")
class GraphScene(DemoScene):
    """3-D bar chart (reference: GraphScene.cpp)."""

    default_camera = dict(position=(0.0, 4.0, -10.0), fov=0.9,
                          angles=(0.3, 0.0, 0.0))

    def do_initialize(self, rows: int = 6, cols: int = 8):
        self.add_ground(y=0.0, extent=10.0, checker=False)
        for i in range(rows):
            for j in range(cols):
                h = 0.4 + 2.2 * float(
                    np.abs(np.sin(i * 0.9) * np.cos(j * 0.7))
                )
                x = (j - cols / 2) * 1.1
                z = 2.0 + i * 1.1
                v, f = _box_mesh((x, h / 2, z), 0.45, height=h / 2)
                self.builder.add_mesh(v, f, self.random_material())
        self.default_light(position=(0.0, 10.0, -6.0))


@register_scene("water")
class WaterScene(DemoScene):
    """Sinusoidal water sheet over a checker floor (reference:
    WaterScene.cpp — its animated height field)."""

    default_camera = dict(position=(0.0, 1.8, -7.0), fov=0.9,
                          angles=(0.2, 0.0, 0.0))

    def do_initialize(self, res: int = 48, phase: float = 0.0):
        self.add_ground(y=-1.5, extent=10.0)
        v, f = _height_mesh(
            res, extent=6.0, z0=1.0,
            fn=lambda x, z: 0.15 * np.sin(2.0 * x + phase)
            * np.cos(2.0 * z + phase),
        )
        water = self.builder.add_material(
            color=(0.7, 0.85, 1.0, 1.0), transparency=0.7, ior=1.33,
            reflection=0.2,
        )
        self.builder.add_mesh(v, f, water)
        self.default_light()

    def do_animate(self, frame: int):
        # Rebuild the sheet with a new phase (reference: per-frame
        # vertex morphing); host rebuild + refit is the analog.
        fresh = WaterScene(seed=0)
        fresh.do_initialize(phase=frame * 0.4)
        return fresh.builder.build(), self.camera


@register_scene("anaglyph")
class AnaglyphScene(CornellBoxScene):
    """Cornell box in red/cyan stereo (reference: k_anaglyphRenderer)."""

    default_config = st.RenderConfig(camera_mode=CameraMode.ANAGLYPH)


@register_scene("obj")
class ObjScene(DemoScene):
    """OBJ model viewer scene (reference: ObjScene.cpp); pass ``path``."""

    default_camera = dict(position=(0.0, 0.5, -3.0), fov=0.9)

    def __init__(self, seed: int = 0, path: str = None):
        super().__init__(seed)
        self.path = path

    def do_initialize(self):
        self.add_ground()
        if self.path:
            from solr_tpu.io import load_obj

            load_obj(self.path, self.builder, scale=1.0)
        else:  # built-in fallback: icosahedron
            v, f = _icosahedron()
            self.builder.add_mesh(
                v, f,
                self.builder.add_material(color=(0.8, 0.6, 0.3, 1.0),
                                          specular=0.6),
            )
        self.default_light()


# ---------------------------------------------------------------------------
# mesh helpers


def _box_mesh(center, half, height=None):
    cx, cy, cz = center
    hy = half if height is None else height
    v = np.array(
        [
            [cx - half, cy - hy, cz - half],
            [cx + half, cy - hy, cz - half],
            [cx + half, cy + hy, cz - half],
            [cx - half, cy + hy, cz - half],
            [cx - half, cy - hy, cz + half],
            [cx + half, cy - hy, cz + half],
            [cx + half, cy + hy, cz + half],
            [cx - half, cy + hy, cz + half],
        ],
        np.float32,
    )
    quads = [
        (0, 1, 2, 3), (5, 4, 7, 6), (4, 0, 3, 7),
        (1, 5, 6, 2), (3, 2, 6, 7), (4, 5, 1, 0),
    ]
    f = []
    for a, b, c, d in quads:
        f.append((a, b, c))
        f.append((a, c, d))
    return v, np.asarray(f)


def _height_mesh(res, extent, z0, fn):
    xs = np.linspace(-extent, extent, res + 1, dtype=np.float32)
    zs = np.linspace(z0, z0 + 2 * extent, res + 1, dtype=np.float32)
    xg, zg = np.meshgrid(xs, zs)
    yg = fn(xg, zg).astype(np.float32)
    v = np.stack([xg, yg, zg], -1).reshape(-1, 3)
    idx = np.arange((res + 1) ** 2).reshape(res + 1, res + 1)
    q00 = idx[:-1, :-1].ravel()
    q10 = idx[:-1, 1:].ravel()
    q01 = idx[1:, :-1].ravel()
    q11 = idx[1:, 1:].ravel()
    f = np.concatenate(
        [np.stack([q00, q10, q11], -1), np.stack([q00, q11, q01], -1)]
    )
    return v, f


def _icosahedron():
    p = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [
            [-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
            [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
            [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1],
        ],
        np.float32,
    )
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    return v, f
