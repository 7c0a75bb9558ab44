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


@register_scene("terrain")
class TerrainScene(DemoScene):
    """Sinusoidal heightfield with mirror spheres — the bench archetype
    at gallery scale (reference: the landscape/Spindizzy-style demos)."""

    default_camera = dict(position=(0.0, 2.0, -4.0), fov=1.0,
                          angles=(0.25, 0.0, 0.0))

    def do_initialize(self, res: int = 96):
        b = self.builder
        terrain = b.add_material(color=(0.55, 0.5, 0.4, 1.0),
                                 specular=0.2)
        mirror = b.add_material(color=(0.9, 0.9, 0.9, 1.0),
                                reflection=0.6, specular=0.8)
        extent = 20.0

        def h(x, z):
            return (
                2.0 * np.sin(x * 0.25) * np.cos(z * 0.25)
                + 0.7 * np.sin(x * 1.1 + 2.0) * np.cos(z * 0.9)
                - 4.0
            )

        v, f = _height_mesh(res, extent, 5.0, h)
        b.add_mesh(v, f, terrain)
        for _ in range(8):
            x = float(self.rng.uniform(-extent * 0.7, extent * 0.7))
            z = float(self.rng.uniform(8.0, 5.0 + 1.6 * extent))
            b.add_sphere((x, -1.5, z), float(self.rng.uniform(0.8, 1.6)),
                         mirror)
        b.add_light((0.0, extent, 10.0), intensity=1.0)


@register_scene("glass")
class GlassScene(DemoScene):
    """Refractive showcase: glass spheres/ellipsoid over a checkerboard
    (reference: the transparent-scene demos; BASELINE config #3's
    3-bounce glass chain)."""

    default_camera = dict(position=(0.0, 0.8, -6.0), fov=0.9,
                          angles=(0.1, 0.0, 0.0))

    def do_initialize(self):
        b = self.builder
        self.add_ground(extent=12.0)
        for i, ior in enumerate((1.1, 1.33, 1.5, 1.8)):
            g = b.add_material(
                color=(0.9, 0.95, 1.0, 1.0), transparency=0.9, ior=ior,
                specular=0.9, specular_power=60.0,
            )
            b.add_sphere((-3.0 + 2.0 * i, -0.2, 1.0), 0.8, g)
        amber = b.add_material(color=(1.0, 0.8, 0.4, 1.0),
                               transparency=0.85, ior=1.45)
        b.add_ellipsoid((0.0, -0.55, -1.5), (1.2, 0.45, 0.6), amber)
        mirror = b.add_material(color=(0.95, 0.95, 0.95, 1.0),
                                reflection=0.85, specular=0.9)
        b.add_plane(PlaneAxis.XY, (0.0, 2.0, 6.0), (8.0, 3.0), mirror)
        self.default_light(position=(4.0, 7.0, -4.0))


@register_scene("caustics")
class CausticsScene(DemoScene):
    """Glass sphere focusing a tight light onto the floor — the
    transparent-shadow attenuation path produces the bright caustic
    disk (reference: CausticScene.cpp [?] / the water-glass demos)."""

    default_camera = dict(position=(0.0, 1.4, -4.5), fov=0.9,
                          angles=(0.3, 0.0, 0.0))

    def do_initialize(self):
        b = self.builder
        floor = b.add_material(color=(0.8, 0.8, 0.75, 1.0))
        b.add_plane(PlaneAxis.XZ, (0.0, -1.0, 0.0), (8.0, 8.0), floor)
        glass = b.add_material(color=(0.95, 1.0, 1.0, 1.0),
                               transparency=0.95, ior=1.5)
        b.add_sphere((0.0, 0.4, 0.0), 0.9, glass)
        tinted = b.add_material(color=(0.4, 0.9, 0.5, 1.0),
                                transparency=0.9, ior=1.4)
        b.add_sphere((2.0, 0.1, 1.0), 0.6, tinted)
        b.add_light((0.0, 6.0, -1.0), intensity=1.4, radius=0.05)


@register_scene("metaballs")
class MetaballsScene(DemoScene):
    """Animated metaballs polygonized by marching tetrahedra
    (reference: MetaballsScene.cpp).  Per-frame re-polygonization is
    the reference's morphing-frames pattern: do_animate rebuilds the
    mesh for each frame."""

    default_camera = dict(position=(0.0, 0.5, -5.0), fov=0.9,
                          angles=(0.1, 0.0, 0.0))

    n_balls = 4

    def _centers(self, phase: float):
        t = phase
        return np.array(
            [
                [1.0 * np.sin(t), 0.4 * np.cos(t * 1.3), 0.5 * np.sin(t * 0.7)],
                [0.9 * np.cos(t * 1.1), 0.5 * np.sin(t * 0.9), 0.4],
                [0.0, 0.9 * np.sin(t * 0.5), 0.8 * np.cos(t)],
                [0.6 * np.sin(t * 1.7), -0.4, -0.5 * np.cos(t * 1.2)],
            ],
            np.float32,
        )[: self.n_balls]

    def _build(self, phase: float):
        b = st.SceneBuilder()
        ground = b.add_material(
            color=(0.85, 0.85, 0.85, 1.0),
            procedural=ProceduralKind.CHECKER, procedural_scale=10.0,
        )
        b.add_plane(PlaneAxis.XZ, (0.0, -1.6, 0.0), (10.0, 10.0), ground)
        blob = b.add_material(color=(0.3, 0.6, 0.9, 1.0), specular=0.8,
                              specular_power=50.0, reflection=0.2)
        centers = self._centers(phase)
        radii = np.full((len(centers),), 0.55, np.float32)
        v, f = marching_tetrahedra(
            lambda p: _metaball_field(p, centers, radii),
            lo=(-2.2, -2.2, -2.2), hi=(2.2, 2.2, 2.2), res=28, iso=1.0,
        )
        if len(f):
            b.add_mesh(v, f, blob)
        b.add_light((4.0, 7.0, -5.0), intensity=1.1)
        return b.build()

    def do_initialize(self):
        # Build frame 0 through the shared builder so self.scene works.
        self._frame0 = self._build(0.0)

    @property
    def scene(self):
        return self._frame0

    def do_animate(self, frame: int):
        return self._build(frame * 0.35), self.camera


def _metaball_field(p, centers, radii):
    """Classic sum of r_i^2 / |p - c_i|^2 (iso = 1)."""
    d2 = ((p[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    return (radii[None, :] ** 2 / np.maximum(d2, 1e-9)).sum(-1)


# 6 tetrahedra per cube (corner indices into the cube's 8 vertices).
_TETS = np.array(
    [
        [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
        [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
    ]
)


def marching_tetrahedra(field, lo, hi, res: int, iso: float = 1.0):
    """Polygonize an implicit surface on a res^3 grid via marching
    tetrahedra (host-side numpy; runs once per scene build/frame —
    the TPU renders the resulting triangles through the normal BVH
    path).  Returns (verts (V, 3) f32, faces (F, 3) i32)."""
    axes = [np.linspace(lo[i], hi[i], res + 1, dtype=np.float32)
            for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    vals = field(pts).reshape(res + 1, res + 1, res + 1)

    # Cube corner offsets in (i, j, k).
    corner = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
    )
    base = np.stack(
        np.meshgrid(np.arange(res), np.arange(res), np.arange(res),
                    indexing="ij"), -1,
    ).reshape(-1, 1, 3)  # (C, 1, 3)
    idx = base + corner[None]  # (C, 8, 3)
    cvals = vals[idx[..., 0], idx[..., 1], idx[..., 2]]  # (C, 8)
    step = np.array([(hi[i] - lo[i]) / res for i in range(3)],
                    np.float32)
    cpos = np.asarray(lo, np.float32) + idx.astype(np.float32) * step

    tris = []
    tv = cvals[:, _TETS]  # (C, 6, 4)
    tp = cpos[:, _TETS]  # (C, 6, 4, 3)
    inside = tv > iso  # (C, 6, 4)

    def interp(pa, va, pb, vb):
        t = (iso - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
        return pa + np.clip(t, 0.0, 1.0)[..., None] * (pb - pa)

    tv = tv.reshape(-1, 4)
    tp = tp.reshape(-1, 4, 3)
    inside = inside.reshape(-1, 4)
    code = (
        inside[:, 0] * 1 + inside[:, 1] * 2
        + inside[:, 2] * 4 + inside[:, 3] * 8
    )
    # Per-case edge pairs: each case emits 1 or 2 triangles, vertices on
    # the edges between inside/outside corners.  (a, b) = edge corner
    # ids; orientation is irrelevant (the renderer flips normals to
    # oppose the ray).
    one_tri = {
        1: (0, [1, 2, 3]), 2: (1, [0, 2, 3]), 4: (2, [0, 1, 3]),
        8: (3, [0, 1, 2]), 14: (0, [1, 2, 3]), 13: (1, [0, 2, 3]),
        11: (2, [0, 1, 3]), 7: (3, [0, 1, 2]),
    }
    two_tri = {
        3: ([0, 1], [2, 3]), 5: ([0, 2], [1, 3]), 9: ([0, 3], [1, 2]),
        6: ([1, 2], [0, 3]), 10: ([1, 3], [0, 2]), 12: ([2, 3], [0, 1]),
    }
    for c, (a, outs) in one_tri.items():
        m = code == c
        if not m.any():
            continue
        pa, va = tp[m, a], tv[m, a]
        vs = [interp(pa, va, tp[m, o], tv[m, o]) for o in outs]
        tris.append(np.stack(vs, axis=1))
    for c, (ins, outs) in two_tri.items():
        m = code == c
        if not m.any():
            continue
        # Quad with corners e(i0,o0) e(i0,o1) e(i1,o1) e(i1,o0).
        i0, i1 = ins
        o0, o1 = outs
        e00 = interp(tp[m, i0], tv[m, i0], tp[m, o0], tv[m, o0])
        e01 = interp(tp[m, i0], tv[m, i0], tp[m, o1], tv[m, o1])
        e11 = interp(tp[m, i1], tv[m, i1], tp[m, o1], tv[m, o1])
        e10 = interp(tp[m, i1], tv[m, i1], tp[m, o0], tv[m, o0])
        tris.append(np.stack([e00, e01, e11], axis=1))
        tris.append(np.stack([e00, e11, e10], axis=1))
    if not tris:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    tri = np.concatenate(tris, axis=0)  # (F, 3, 3)
    v = tri.reshape(-1, 3)
    f = np.arange(len(v)).reshape(-1, 3)
    return v, f


@register_scene("neuron")
class NeuronScene(DemoScene):
    """Procedural neuron morphology: soma sphere + recursively branching
    dendrites as sphere-jointed cylinder segments — the geometry an SWC
    import produces (reference: SWCReader / the neuron demos; the file
    path is solr_tpu.io.swc.load_swc)."""

    default_camera = dict(position=(0.0, 0.5, -7.0), fov=0.9)

    def do_initialize(self):
        b = self.builder
        soma = b.add_material(color=(0.85, 0.45, 0.35, 1.0),
                              specular=0.3)
        dend = b.add_material(color=(0.75, 0.6, 0.4, 1.0), specular=0.3)
        axon = b.add_material(color=(0.4, 0.55, 0.8, 1.0), specular=0.3)
        b.add_sphere((0.0, 0.0, 0.0), 0.55, soma)

        def grow(pos, direction, radius, depth, mat):
            if depth == 0 or radius < 0.02:
                return
            length = float(self.rng.uniform(0.7, 1.3))
            end = pos + direction * length
            b.add_cylinder(tuple(pos), tuple(end), radius, mat)
            b.add_sphere(tuple(end), radius, mat)
            n_child = 2 if self.rng.uniform() < 0.7 else 1
            for _ in range(n_child):
                d2 = direction + self.rng.normal(0.0, 0.45, 3)
                d2 = d2 / np.linalg.norm(d2)
                grow(end, d2, radius * 0.72, depth - 1, mat)

        for k in range(5):
            ang = 2 * np.pi * k / 5.0
            d0 = np.array([np.cos(ang), 0.5 * np.sin(2 * ang),
                           np.sin(ang)])
            d0 = d0 / np.linalg.norm(d0)
            grow(np.zeros(3), d0, 0.14, 4, dend)
        grow(np.array([0.0, -0.4, 0.0]), np.array([0.0, -1.0, 0.0]),
             0.1, 5, axon)
        self.default_light(position=(4.0, 8.0, -6.0), intensity=1.2)


@register_scene("spindizzy")
class SpindizzyScene(DemoScene):
    """Isometric terraced block landscape with a mirror ball (reference:
    SpindizzyScene.cpp — the 8-bit game homage)."""

    default_camera = dict(position=(6.0, 6.5, -6.0), fov=0.8,
                          angles=(0.62, -0.785, 0.0))

    def do_initialize(self):
        b = self.builder
        n = 7
        palette = [
            b.add_material(color=(0.8, 0.5, 0.45, 1.0), specular=0.3),
            b.add_material(color=(0.45, 0.7, 0.5, 1.0), specular=0.3),
            b.add_material(color=(0.5, 0.55, 0.8, 1.0), specular=0.3),
        ]
        mirror = b.add_material(color=(0.95, 0.95, 0.95, 1.0),
                                reflection=0.8, specular=0.9)
        half = 0.5
        for i in range(n):
            for j in range(n):
                h = 0.25 + 0.5 * (
                    np.sin(i * 0.9) * np.cos(j * 1.1) * 0.5 + 0.5
                ) + 0.35 * ((i + j) % 3 == 0)
                v, f = _box_mesh(
                    ((i - n // 2) * 1.0, h / 2.0 - 1.0,
                     (j - n // 2) * 1.0),
                    half, height=h / 2.0,
                )
                b.add_mesh(v, f, palette[(i * n + j) % 3])
        b.add_sphere((0.0, 1.0, 0.0), 0.45, mirror)
        self.default_light(position=(6.0, 10.0, -8.0), intensity=1.2)


@register_scene("xmas")
class XmasScene(DemoScene):
    """Christmas tree: stacked cone tiers from tapering cylinder rings,
    glass ornaments, emissive star (reference: XmasScene.cpp)."""

    default_camera = dict(position=(0.0, 1.0, -6.5), fov=0.9,
                          angles=(0.08, 0.0, 0.0))

    def do_initialize(self):
        b = self.builder
        self.add_ground(y=-1.4, extent=10.0, checker=False)
        needles = b.add_material(color=(0.1, 0.45, 0.15, 1.0),
                                 specular=0.2)
        trunk = b.add_material(color=(0.4, 0.25, 0.12, 1.0))
        star = b.add_material(color=(1.0, 0.9, 0.4, 1.0), emission=1.5)
        b.add_cylinder((0.0, -1.4, 0.0), (0.0, -0.4, 0.0), 0.18, trunk)
        # Tiers: wide-to-narrow stacks of short cylinders approximate
        # the cone silhouette.
        y = -0.5
        for tier in range(4):
            r0 = 1.5 - 0.3 * tier
            for s in range(4):
                r = r0 * (1.0 - 0.2 * s)
                b.add_cylinder((0.0, y, 0.0), (0.0, y + 0.22, 0.0), r,
                               needles)
                y += 0.22
            y -= 0.35
        b.add_sphere((0.0, y + 0.45, 0.0), 0.22, star)
        colors = [(0.9, 0.2, 0.2), (0.2, 0.4, 0.9), (0.95, 0.8, 0.2)]
        for k in range(12):
            ang = 2 * np.pi * k / 12.0
            tier = k % 4
            r0 = 1.45 - 0.3 * tier
            yk = -0.35 + 0.53 * tier
            mat = b.add_material(color=colors[k % 3] + (1.0,),
                                 specular=0.9, specular_power=60.0,
                                 reflection=0.25)
            b.add_sphere((r0 * np.cos(ang), yk, r0 * np.sin(ang)),
                         0.14, mat)
        self.default_light(position=(4.0, 8.0, -6.0), intensity=1.0)
        b.add_light((0.0, y + 0.45, 0.0),
                    color=(1.0, 0.95, 0.7, 1.0), intensity=0.5)


@register_scene("perpetual")
class PerpetualMotionScene(DemoScene):
    """Newton's cradle: five mirror spheres on cylinder wires; the end
    spheres swing per frame (reference: PerpetualMotionScene.cpp —
    do_animate drives the phase)."""

    default_camera = dict(position=(0.0, 0.4, -5.5), fov=0.9)

    n_balls = 5

    def _build(self, phase: float):
        b = st.SceneBuilder()
        frame_mat = b.add_material(color=(0.6, 0.6, 0.65, 1.0),
                                   specular=0.7)
        chrome = b.add_material(color=(0.95, 0.95, 0.95, 1.0),
                                reflection=0.7, specular=0.9,
                                specular_power=80.0)
        floor = b.add_material(
            color=(0.85, 0.85, 0.85, 1.0),
            procedural=ProceduralKind.CHECKER, procedural_scale=8.0,
        )
        b.add_plane(PlaneAxis.XZ, (0.0, -1.6, 0.0), (8.0, 8.0), floor)
        top_y, r, sp = 1.4, 0.32, 0.66
        b.add_cylinder((-2.2, top_y, 0.0), (2.2, top_y, 0.0), 0.05,
                       frame_mat)
        swing = np.sin(phase)
        for i in range(self.n_balls):
            x0 = (i - self.n_balls // 2) * sp
            ang = 0.0
            if i == 0 and swing < 0.0:
                ang = 0.9 * swing
            elif i == self.n_balls - 1 and swing > 0.0:
                ang = 0.9 * swing
            l_len = top_y - (-0.2)
            x = x0 + l_len * np.sin(ang)
            y = top_y - l_len * np.cos(ang)
            b.add_cylinder((x0, top_y, 0.0), (x, y, 0.0), 0.02,
                           frame_mat)
            b.add_sphere((x, y, 0.0), r, chrome)
        b.add_light((3.0, 6.0, -5.0), intensity=1.2)
        return b.build()

    def do_initialize(self):
        self._frame0 = self._build(0.0)

    @property
    def scene(self):
        return self._frame0

    def do_animate(self, frame: int):
        return self._build(frame * 0.5), self.camera


@register_scene("year")
class YearScene(DemoScene):
    """Block-letter year digits built from cube meshes over a mirror
    floor (reference: Year2013.cpp)."""

    default_camera = dict(position=(0.0, 0.6, -7.0), fov=0.9)

    # 3x5 digit bitmaps.
    DIGITS = {
        "0": ["111", "101", "101", "101", "111"],
        "2": ["111", "001", "111", "100", "111"],
        "6": ["111", "100", "111", "101", "111"],
    }

    def do_initialize(self, text: str = "2026"):
        b = self.builder
        floor = b.add_material(color=(0.9, 0.9, 0.9, 1.0),
                               reflection=0.4, specular=0.6)
        b.add_plane(PlaneAxis.XZ, (0.0, -1.3, 0.0), (9.0, 6.0), floor)
        s = 0.42
        x0 = -0.5 * (len(text) * 4 - 1) * s
        for ci, ch in enumerate(text):
            rows = self.DIGITS.get(ch)
            if rows is None:
                continue
            mat = b.add_material(
                color=tuple(self.rng.uniform(0.4, 0.95, 3)) + (1.0,),
                specular=0.5,
            )
            for r_i, row in enumerate(rows):
                for c_i, bit in enumerate(row):
                    if bit == "1":
                        v, f = _box_mesh(
                            (x0 + (ci * 4 + c_i) * s,
                             (4 - r_i) * s - 1.0, 0.0),
                            s * 0.48,
                        )
                        b.add_mesh(v, f, mat)
        self.default_light(position=(3.0, 7.0, -6.0), intensity=1.2)


@register_scene("carpet")
class MagicCarpetScene(DemoScene):
    """Undulating textured sheet floating over a canyon — the magic
    carpet primitive family (reference: ptMagicCarpet; here a rippled
    height mesh re-morphed per frame)."""

    default_camera = dict(position=(0.0, 1.6, -6.0), fov=0.9,
                          angles=(0.25, 0.0, 0.0))

    def _build(self, phase: float):
        b = st.SceneBuilder()
        carpet = b.add_material(
            color=(0.7, 0.25, 0.3, 1.0),
            procedural=ProceduralKind.JULIA, procedural_scale=3.0,
            specular=0.3,
        )
        sand = b.add_material(color=(0.75, 0.65, 0.45, 1.0))

        def ripple(x, z):
            return (
                0.25 * np.sin(2.0 * x + 2.5 * phase)
                * np.cos(1.5 * z + 1.7 * phase)
            )

        v, f = _height_mesh(14, 2.2, -2.2, ripple)
        v = v[:, [0, 1, 2]].copy()
        v[:, 2] += 2.2  # recentre ahead of the camera
        b.add_mesh(v, f, carpet)

        def dunes(x, z):
            return (
                0.7 * np.sin(x * 0.7) * np.cos(z * 0.6) - 2.6
            )

        dv, df = _height_mesh(20, 8.0, -8.0, dunes)
        dv[:, 2] += 8.0
        b.add_mesh(dv, df, sand)
        b.add_light((4.0, 8.0, -5.0), intensity=1.2)
        return b.build()

    def do_initialize(self):
        self._frame0 = self._build(0.0)

    @property
    def scene(self):
        return self._frame0

    def do_animate(self, frame: int):
        return self._build(frame * 0.3), self.camera


@register_scene("knot")
class TrefoilKnotScene(DemoScene):
    """Trefoil knot swept from sphere-jointed cylinder segments — a
    cylinder-pool stress scene (reference: the gallery's curve/knot
    demos)."""

    default_camera = dict(position=(0.0, 0.5, -6.0), fov=0.9)

    def do_initialize(self, n: int = 96):
        b = self.builder
        metal = b.add_material(color=(0.85, 0.7, 0.3, 1.0),
                               specular=0.9, specular_power=70.0,
                               reflection=0.35)
        self.add_ground(y=-2.2, extent=10.0)
        ts = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        pts = np.stack(
            [
                np.sin(ts) + 2.0 * np.sin(2 * ts),
                np.cos(ts) - 2.0 * np.cos(2 * ts),
                -np.sin(3 * ts),
            ],
            -1,
        ) * 0.7
        r = 0.16
        for i in range(n):
            p0 = pts[i]
            p1 = pts[(i + 1) % n]
            b.add_cylinder(tuple(p0), tuple(p1), r, metal)
            b.add_sphere(tuple(p0), r, metal)
        self.default_light(position=(4.0, 7.0, -6.0), intensity=1.2)


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
