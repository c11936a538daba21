"""Analytic synthetic RGB-D scene: exact-SDF room, sphere-traced renders.

Self-contained ground-truth generator for tests and the quality
benchmark (this environment has no network access to real Replica/TUM
data; the reference repo assumes pre-downloaded datasets). The scene is
a closed textured room with three textured objects, rendered by sphere
tracing the exact SDF — so ground-truth depth, poses, and the GT mesh
(marching cubes over ``AnalyticScene.sdf``) are all analytically
consistent, which lets loader/eval/benchmark tests assert tight error
bounds instead of smoke-checking shapes.

``write_replica_format`` serializes a rendered trajectory in the Replica
on-disk layout (results/frame*.jpg + results/depth*.png + traj.txt,
reference datasets/dataset.py:188-267), so the standard ReplicaDataset
loader and the full CLI path run on synthetic scenes unchanged.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..ops.rays import get_camera_rays

_ROOM_HALF = 2.0  # wall positions: |x|,|y|,|z| = 2


class AnalyticScene:
    """Closed room (walls at +-2) containing a sphere, a rounded box and
    a capped cylinder. ``sdf`` is an exact signed distance (positive in
    free space), which sphere tracing and SDF-supervised losses rely on."""

    # Metric AABB enclosing all surfaces (used to build GT-mesh grids).
    bound = np.array([[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]], np.float32)

    sphere_c = np.array([0.7, -1.35, 0.55], np.float32)
    sphere_r = 0.6
    box_c = np.array([-1.1, -1.5, -0.6], np.float32)
    box_half = np.array([0.45, 0.5, 0.45], np.float32)
    box_round = 0.04
    cyl_c = np.array([0.9, -1.3, -1.0], np.float32)
    cyl_r = 0.35
    cyl_h = 0.7

    def _parts(self, p: np.ndarray, xp=np) -> Tuple[np.ndarray, ...]:
        """Component SDFs at p [..., 3] -> (room, sphere, box, cylinder).

        ``xp`` is the array module (numpy by default; pass jax.numpy to
        trace the same math on device — every scene method is
        module-generic so the device renderer never duplicates it)."""
        room = _ROOM_HALF - xp.abs(p).max(axis=-1)

        sph = xp.linalg.norm(p - self.sphere_c, axis=-1) - self.sphere_r

        q = xp.abs(p - self.box_c) - (self.box_half - self.box_round)
        box = (xp.linalg.norm(xp.maximum(q, 0.0), axis=-1)
               + xp.minimum(q.max(axis=-1), 0.0) - self.box_round)

        pc = p - self.cyl_c
        dxz = xp.sqrt(pc[..., 0] ** 2 + pc[..., 2] ** 2) - self.cyl_r
        dy = xp.abs(pc[..., 1]) - self.cyl_h
        cyl = (xp.minimum(xp.maximum(dxz, dy), 0.0)
               + xp.sqrt(xp.maximum(dxz, 0.0) ** 2
                         + xp.maximum(dy, 0.0) ** 2))
        return room, sph, box, cyl

    def sdf(self, p: np.ndarray, xp=np) -> np.ndarray:
        """Exact SDF at p [..., 3]: positive in free space."""
        room, sph, box, cyl = self._parts(xp.asarray(p, np.float32), xp)
        return xp.minimum(xp.minimum(room, sph), xp.minimum(box, cyl))

    def normal(self, p: np.ndarray, eps: float = 1e-3, xp=np) -> np.ndarray:
        """Finite-difference SDF gradient, normalized."""
        p = xp.asarray(p, np.float32)
        n = xp.stack(
            [self.sdf(p + e, xp) - self.sdf(p - e, xp)
             for e in (np.array([eps, 0, 0]), np.array([0, eps, 0]),
                       np.array([0, 0, eps]))], axis=-1)
        return n / xp.maximum(xp.linalg.norm(n, axis=-1, keepdims=True),
                              1e-12)

    def albedo(self, p: np.ndarray, xp=np) -> np.ndarray:
        """Textured per-component albedo [..., 3] in [0, 1]. High-frequency
        texture everywhere is what makes photometric tracking well-posed."""
        p = xp.asarray(p, np.float32)
        room, sph, box, cyl = self._parts(p, xp)
        which = xp.argmin(xp.stack([room, sph, box, cyl], axis=-1), axis=-1)

        # Walls: per-face hue (global orientation cue) x an APERIODIC
        # mix of incommensurate sinusoids. A periodic pattern (e.g. a
        # checkerboard) on a large flat wall makes photometric tracking
        # translation-ambiguous — shifting by one period is a local
        # minimum — and measurably caused lattice-aliased pose drift.
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        tex = (0.5 + 0.26 * xp.sin(4.7 * px + 1.3) * xp.sin(3.9 * py + 0.7)
               + 0.16 * xp.sin(2.9 * pz + 1.1 * px)
               + 0.10 * xp.sin(6.53 * (px + py + pz))
               # fine-scale detail (~25 cm): a bare wall filling the view
               # must still give the tracker strong image gradients
               + 0.08 * xp.sin(23.7 * px + 17.3 * pz + 5.1 * py)
               + 0.06 * xp.sin(12.9 * py + 19.1 * pz + 2.0))
        tex = xp.clip(tex, 0.05, 1.0)[..., None]
        face = xp.argmax(xp.abs(p), axis=-1)
        neg = xp.take_along_axis(p, face[..., None], -1)[..., 0] < 0
        hues = xp.asarray([[0.85, 0.50, 0.45], [0.50, 0.75, 0.55],
                           [0.80, 0.80, 0.58], [0.55, 0.55, 0.62],
                           [0.48, 0.58, 0.80], [0.75, 0.58, 0.75]])
        wall = hues[face * 2 + neg] * (0.40 + 0.60 * tex)
        bands = 0.5 + 0.5 * xp.sin(12.0 * p[..., 1])
        sphere = xp.stack([0.75 + 0.2 * bands, 0.25 + 0.2 * bands,
                           0.20 + 0.1 * bands], axis=-1)
        stripes = 0.5 + 0.5 * xp.sin(9.0 * (p[..., 0] + p[..., 2]))
        boxc = xp.stack([0.20 + 0.15 * stripes, 0.65 + 0.25 * stripes,
                         0.25 + 0.1 * stripes], axis=-1)
        ang = xp.arctan2(p[..., 2] - self.cyl_c[2], p[..., 0] - self.cyl_c[0])
        spin = 0.5 + 0.5 * xp.sin(6.0 * ang)
        cylc = xp.stack([0.20 + 0.1 * spin, 0.30 + 0.2 * spin,
                         0.70 + 0.25 * spin], axis=-1)

        out = xp.select([which[..., None] == 0, which[..., None] == 1,
                         which[..., None] == 2, which[..., None] == 3],
                        [wall, sphere, boxc, cylc])
        return out.astype(np.float32)

    def shade(self, p: np.ndarray, xp=np) -> np.ndarray:
        """Lambert shading with a fixed light; rgb [..., 3] in [0, 1]."""
        light = np.array([0.45, 0.80, 0.35], np.float32)
        light = light / np.linalg.norm(light)
        lam = xp.maximum((self.normal(p, xp=xp) * light).sum(-1), 0.0)
        rgb = self.albedo(p, xp) * (0.55 + 0.45 * lam)[..., None]
        return xp.clip(rgb, 0.0, 1.0).astype(np.float32)


def _box_interior(p: np.ndarray, c: np.ndarray, half: np.ndarray,
                  xp=np) -> np.ndarray:
    """Signed distance of an axis-aligned box INTERIOR (positive inside,
    exact inside — the free-space convention AnalyticScene.room uses)."""
    return (half - xp.abs(p - c)).min(axis=-1)


class AnalyticApartment(AnalyticScene):
    """ScanNet-class scene: TWO rooms joined by a doorway, six textured
    objects. Free space is the union of the two room interiors and the
    door opening (max of interior SDFs: a conservative-but-exact-zero-set
    distance bound, which is all sphere tracing and marching cubes
    need); the walls between/around are solid. Apartment span is 8.3 m
    along x — 2x the single room — so trajectories must traverse a
    doorway bottleneck and the map must hold two visually distinct
    rooms, the regime the reference's ScanNet benchmark stresses
    (multi-room apartment scans, evaluation/benchmark/scannet).

    ``normal``/``shade`` are inherited (they only consume sdf/albedo)."""

    bound = np.array([[-4.3, 4.3], [-2.1, 2.1], [-2.7, 2.7]], np.float32)

    room_a = np.array([-2.15, 0.0, 0.0], np.float32)
    room_b = np.array([2.15, 0.0, 0.0], np.float32)
    room_half = np.array([2.0, 2.0, 2.5], np.float32)
    door_c = np.array([0.0, -0.6, 0.7], np.float32)
    door_half = np.array([0.6, 1.35, 0.6], np.float32)

    # Room A furniture (the single-room trio, moved into room A).
    sphere_c = np.array([-2.8, -1.35, 0.55], np.float32)
    sphere_r = 0.6
    box_c = np.array([-3.2, -1.5, -1.2], np.float32)
    box_half = np.array([0.45, 0.5, 0.45], np.float32)
    box_round = 0.04
    cyl_c = np.array([-1.2, -1.3, -1.6], np.float32)
    cyl_r = 0.35
    cyl_h = 0.7
    # Room B furniture.
    torus_c = np.array([2.6, -1.55, 1.2], np.float32)
    torus_R = 0.55
    torus_r = 0.22
    ward_c = np.array([3.55, -1.0, -1.8], np.float32)
    ward_half = np.array([0.4, 1.0, 0.35], np.float32)
    sph2_c = np.array([1.2, -1.55, -1.7], np.float32)
    sph2_r = 0.4

    def _parts(self, p: np.ndarray, xp=np) -> Tuple[np.ndarray, ...]:
        walls = xp.maximum(
            xp.maximum(_box_interior(p, self.room_a, self.room_half, xp),
                       _box_interior(p, self.room_b, self.room_half, xp)),
            _box_interior(p, self.door_c, self.door_half, xp))

        sph = xp.linalg.norm(p - self.sphere_c, axis=-1) - self.sphere_r

        q = xp.abs(p - self.box_c) - (self.box_half - self.box_round)
        box = (xp.linalg.norm(xp.maximum(q, 0.0), axis=-1)
               + xp.minimum(q.max(axis=-1), 0.0) - self.box_round)

        pc = p - self.cyl_c
        dxz = xp.sqrt(pc[..., 0] ** 2 + pc[..., 2] ** 2) - self.cyl_r
        dy = xp.abs(pc[..., 1]) - self.cyl_h
        cyl = (xp.minimum(xp.maximum(dxz, dy), 0.0)
               + xp.sqrt(xp.maximum(dxz, 0.0) ** 2
                         + xp.maximum(dy, 0.0) ** 2))

        pt = p - self.torus_c
        ring = xp.sqrt(pt[..., 0] ** 2 + pt[..., 2] ** 2) - self.torus_R
        torus = xp.sqrt(ring ** 2 + pt[..., 1] ** 2) - self.torus_r

        qw = xp.abs(p - self.ward_c) - (self.ward_half - self.box_round)
        ward = (xp.linalg.norm(xp.maximum(qw, 0.0), axis=-1)
                + xp.minimum(qw.max(axis=-1), 0.0) - self.box_round)

        sph2 = xp.linalg.norm(p - self.sph2_c, axis=-1) - self.sph2_r
        return walls, sph, box, cyl, torus, ward, sph2

    def sdf(self, p: np.ndarray, xp=np) -> np.ndarray:
        parts = self._parts(xp.asarray(p, np.float32), xp)
        out = parts[0]
        for d in parts[1:]:
            out = xp.minimum(out, d)
        return out

    def albedo(self, p: np.ndarray, xp=np) -> np.ndarray:
        p = xp.asarray(p, np.float32)
        parts = self._parts(p, xp)
        which = xp.argmin(xp.stack(parts, axis=-1), axis=-1)

        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        tex = (0.5 + 0.26 * xp.sin(4.7 * px + 1.3) * xp.sin(3.9 * py + 0.7)
               + 0.16 * xp.sin(2.9 * pz + 1.1 * px)
               + 0.10 * xp.sin(6.53 * (px + py + pz))
               + 0.08 * xp.sin(23.7 * px + 17.3 * pz + 5.1 * py)
               + 0.06 * xp.sin(12.9 * py + 19.1 * pz + 2.0))
        tex = xp.clip(tex, 0.05, 1.0)[..., None]
        # Face hue relative to the nearer room's center (normalized by
        # the half-size so floor/ceiling/side walls classify correctly),
        # with room B's palette rotated — global which-room cue.
        in_b = (px > 0.0)
        rc = xp.where(in_b[..., None], self.room_b, self.room_a)
        rel = (p - rc) / self.room_half
        face = xp.argmax(xp.abs(rel), axis=-1)
        neg = xp.take_along_axis(rel, face[..., None], -1)[..., 0] < 0
        hues = xp.asarray([[0.85, 0.50, 0.45], [0.50, 0.75, 0.55],
                           [0.80, 0.80, 0.58], [0.55, 0.55, 0.62],
                           [0.48, 0.58, 0.80], [0.75, 0.58, 0.75]])
        idx = (face * 2 + neg + 3 * in_b) % 6
        wall = hues[idx] * (0.40 + 0.60 * tex)

        bands = 0.5 + 0.5 * xp.sin(12.0 * py)
        sphere = xp.stack([0.75 + 0.2 * bands, 0.25 + 0.2 * bands,
                           0.20 + 0.1 * bands], axis=-1)
        stripes = 0.5 + 0.5 * xp.sin(9.0 * (px + pz))
        boxc = xp.stack([0.20 + 0.15 * stripes, 0.65 + 0.25 * stripes,
                         0.25 + 0.1 * stripes], axis=-1)
        ang = xp.arctan2(pz - self.cyl_c[2], px - self.cyl_c[0])
        spin = 0.5 + 0.5 * xp.sin(6.0 * ang)
        cylc = xp.stack([0.20 + 0.1 * spin, 0.30 + 0.2 * spin,
                         0.70 + 0.25 * spin], axis=-1)
        angt = xp.arctan2(pz - self.torus_c[2], px - self.torus_c[0])
        tspin = 0.5 + 0.5 * xp.sin(8.0 * angt + 4.0 * py)
        torc = xp.stack([0.70 + 0.2 * tspin, 0.55 + 0.15 * tspin,
                         0.20 + 0.1 * tspin], axis=-1)
        wstripes = 0.5 + 0.5 * xp.sin(11.0 * py + 5.0 * pz)
        wardc = xp.stack([0.45 + 0.2 * wstripes, 0.30 + 0.1 * wstripes,
                          0.15 + 0.1 * wstripes], axis=-1)
        checks = 0.5 + 0.5 * xp.sin(10.0 * px) * xp.sin(10.0 * py)
        sph2c = xp.stack([0.25 + 0.1 * checks, 0.60 + 0.2 * checks,
                          0.60 + 0.25 * checks], axis=-1)

        w = which[..., None]
        out = xp.select([w == 0, w == 1, w == 2, w == 3, w == 4, w == 5,
                         w == 6],
                        [wall, sphere, boxc, cylc, torc, wardc, sph2c])
        return out.astype(np.float32)


class AnalyticThinScene(AnalyticScene):
    """Thin-geometry stress scene: the analog of the reference's worst
    SyntheticRGBD case ("thin geometry", evaluation/benchmark/rgbd/
    README.md — Co-SLAM's own depth-L1 there is 4.66 cm). The room holds
    only centimeter-scale structures: two ~3.5 cm plates (one standing,
    one floating shelf), a 3 cm rod, and a table whose top and legs are
    all thin. Thin slabs are where TSDF-style SDF supervision erodes
    surfaces (opposite-sign observations a few cm apart) and where
    marching cubes needs the truncation-validity rules to not seal
    sheets shut.

    _parts keeps the base class's 4-slot layout (room, A, B, C) so the
    inherited textured albedo applies unchanged."""

    rod_c = np.array([0.55, -1.30, -0.90], np.float32)
    rod_r = 0.03
    rod_h = 0.70

    def _parts(self, p: np.ndarray, xp=np) -> Tuple[np.ndarray, ...]:
        room = _ROOM_HALF - xp.abs(p).max(axis=-1)

        def sd_box(c, half):
            q = xp.abs(p - xp.asarray(c, np.float32)) \
                - xp.asarray(half, np.float32)
            return (xp.linalg.norm(xp.maximum(q, 0.0), axis=-1)
                    + xp.minimum(q.max(axis=-1), 0.0))

        # Standing plate + floating shelf (one thin axis each).
        plates = xp.minimum(
            sd_box([-0.70, -1.45, 0.65], [0.018, 0.55, 0.40]),
            sd_box([0.75, -0.90, 0.75], [0.35, 0.016, 0.30]))

        # Vertical rod (capped thin cylinder).
        pc = p - self.rod_c
        dxz = xp.sqrt(pc[..., 0] ** 2 + pc[..., 2] ** 2) - self.rod_r
        dy = xp.abs(pc[..., 1]) - self.rod_h
        rod = (xp.minimum(xp.maximum(dxz, dy), 0.0)
               + xp.sqrt(xp.maximum(dxz, 0.0) ** 2
                         + xp.maximum(dy, 0.0) ** 2))

        # Table: thin top + 4 thin legs.
        table = sd_box([-0.85, -1.05, -0.70], [0.40, 0.018, 0.30])
        for sx in (-1, 1):
            for sz in (-1, 1):
                table = xp.minimum(table, sd_box(
                    [-0.85 + 0.34 * sx, -1.50, -0.70 + 0.24 * sz],
                    [0.022, 0.43, 0.022]))
        return room, plates, rod, table


class AnalyticPlainScene(AnalyticScene):
    """Texture-poor variant: identical geometry to AnalyticScene but a
    near-uniform matte albedo (~5% contrast, low-frequency only). This
    is the photometric-degenerate regime — tracking must lean on the
    depth/SDF terms because image gradients are weak, the failure mode
    texture-rich synthetic scenes can hide (VERDICT r2 Next #6)."""

    def albedo(self, p: np.ndarray, xp=np) -> np.ndarray:
        p = xp.asarray(p, np.float32)
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        v = (0.55 + 0.035 * xp.sin(1.7 * px + 0.3) * xp.sin(1.3 * py)
             + 0.025 * xp.sin(1.1 * pz + 0.5))
        out = xp.stack([v, v * 0.97, v * 0.94], axis=-1)
        return xp.clip(out, 0.0, 1.0).astype(np.float32)


class AnalyticRoom2(AnalyticScene):
    """Second room variant (VERDICT r3 #9): same construction, different
    furniture arrangement, sizes, and palette — breadth for the averaged
    table the way the reference averages 8 distinct Replica rooms."""

    sphere_c = np.array([-0.9, -1.25, 0.9], np.float32)
    sphere_r = 0.75
    box_c = np.array([1.2, -1.45, 0.7], np.float32)
    box_half = np.array([0.55, 0.55, 0.35], np.float32)
    box_round = 0.06
    cyl_c = np.array([-0.6, -1.35, -1.2], np.float32)
    cyl_r = 0.45
    cyl_h = 0.65

    def albedo(self, p: np.ndarray, xp=np) -> np.ndarray:
        base = super().albedo(p, xp=xp)
        # Rotate the palette so the two rooms are photometrically distinct.
        return base[..., ::-1]


class AnalyticCorridor(AnalyticScene):
    """Textureless corridor (VERDICT r3 #9): a narrow hallway walked
    end-to-end while looking forward — the classic degenerate case where
    the view-filling end wall carries almost no texture and the forward
    translation is weakly observable photometrically. Two door-jamb
    pillars and a ceiling beam provide the only mid-field geometry.
    Pair with make_corridor_trajectory."""

    bound = np.array([[-2.2, 2.2], [-1.2, 1.2], [-0.95, 0.95]], np.float32)

    _room_half = np.array([2.1, 1.1, 0.85], np.float32)
    _pil1_c = np.array([-0.7, 0.0, 0.62], np.float32)
    _pil2_c = np.array([0.8, 0.0, -0.62], np.float32)
    _pil_half = np.array([0.12, 1.1, 0.22], np.float32)
    _beam_c = np.array([0.1, 1.0, 0.0], np.float32)
    _beam_half = np.array([0.10, 0.12, 0.85], np.float32)

    def _parts(self, p: np.ndarray, xp=np):
        p = xp.asarray(p, np.float32)

        def sd_box(c, half):
            q = xp.abs(p - c) - half
            outside = xp.linalg.norm(xp.maximum(q, 0.0), axis=-1)
            inside = xp.minimum(xp.max(q, axis=-1), 0.0)
            return outside + inside

        room = _box_interior(p, np.zeros(3, np.float32), self._room_half,
                             xp=xp)
        pil1 = sd_box(self._pil1_c, self._pil_half)
        pil2 = sd_box(self._pil2_c, self._pil_half)
        beam = sd_box(self._beam_c, self._beam_half)
        return room, pil1, pil2, beam

    def albedo(self, p: np.ndarray, xp=np) -> np.ndarray:
        # Near-uniform matte paint everywhere (plain-scene contrast).
        p = xp.asarray(p, np.float32)
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        v = (0.58 + 0.03 * xp.sin(1.9 * px + 0.7) * xp.sin(1.5 * pz)
             + 0.02 * xp.sin(1.2 * py + 0.2))
        out = xp.stack([v * 0.96, v, v * 0.93], axis=-1)
        return xp.clip(out, 0.0, 1.0).astype(np.float32)


def render_frame(scene: AnalyticScene, c2w: np.ndarray, H: int, W: int,
                 fx: float, fy: float, cx: float, cy: float,
                 max_steps: int = 96, far: float = 12.0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Sphere-trace one frame -> (rgb [H,W,3] in [0,1], depth [H,W]).

    Depth is the OpenGL z-depth (the ray parameter t of p = o + d*t with
    the unnormalized d of ``get_camera_rays``, whose z component is -1),
    matching what the dataset loaders hand the SLAM loop.
    """
    c2w = np.asarray(c2w, np.float32)
    dirs = get_camera_rays(H, W, fx, fy, cx, cy).reshape(-1, 3)
    d = (dirs @ c2w[:3, :3].T).astype(np.float32)
    o = c2w[:3, 3].astype(np.float32)
    dn = np.linalg.norm(d, axis=-1)

    n = d.shape[0]
    t = np.zeros(n, np.float32)
    active = np.arange(n)
    for _ in range(max_steps):
        p = o + d[active] * t[active, None]
        s = scene.sdf(p)
        t[active] += 0.95 * s / dn[active]
        keep = (np.abs(s) > 1e-4) & (t[active] < far)
        active = active[keep]
        if active.size == 0:
            break
    # Undamped polish: SDF is exact, two Newton steps land on the surface.
    for _ in range(2):
        p = o + d * t[:, None]
        t += scene.sdf(p) / dn
    t = np.clip(t, 0.0, far)
    rgb = scene.shade(o + d * t[:, None]).reshape(H, W, 3)
    return rgb, t.reshape(H, W).astype(np.float32)


class DeviceRenderer:
    """Sphere tracer jitted on the JAX default device, same contract as
    :func:`render_frame` (rgb f32 [H,W,3] in [0,1], z-depth f32 [H,W]).

    The scene methods are array-module-generic (``xp=jnp``), so this
    traces the exact same math; results agree with the numpy tracer to
    float tolerance (both Newton-polish on an exact SDF). One compiled
    program per (scene, camera) pair, reused across the whole
    trajectory. 480x640 costs seconds/frame in single-core numpy but
    ~ms on an accelerator — long protocol sequences (1000-2000 frames)
    become encode-bound instead of render-bound."""

    def __init__(self, scene: AnalyticScene, H: int, W: int, fx: float,
                 fy: float, cx: float, cy: float, max_steps: int = 96,
                 far: float = 12.0):
        import jax
        import jax.numpy as jnp

        n = H * W
        dirs_dev = jnp.asarray(
            get_camera_rays(H, W, fx, fy, cx, cy).reshape(-1, 3))
        dn = jnp.linalg.norm(dirs_dev, axis=-1)

        def render(c2w):
            d = dirs_dev @ c2w[:3, :3].T
            o = c2w[:3, 3]

            def body(_, t):
                p = o + d * t[:, None]
                s = scene.sdf(p, xp=jnp)
                adv = (jnp.abs(s) > 1e-4) & (t < far)
                return jnp.where(adv, t + 0.95 * s / dn, t)

            t = jax.lax.fori_loop(0, max_steps, body,
                                  jnp.zeros(n, jnp.float32))
            for _ in range(2):  # undamped Newton polish (exact SDF)
                p = o + d * t[:, None]
                t = t + scene.sdf(p, xp=jnp) / dn
            t = jnp.clip(t, 0.0, far)
            rgb = scene.shade(o + d * t[:, None], xp=jnp)
            return rgb.reshape(H, W, 3), t.reshape(H, W)

        self._render = jax.jit(render)
        self.H, self.W = H, W

    def __call__(self, c2w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        rgb, depth = self._render(jnp.asarray(np.asarray(c2w, np.float32)))
        return np.asarray(rgb), np.asarray(depth)


# Device rendering pays a one-time XLA compile (minutes over the
# tunneled dev link when the persistent cache is cold) and wins ~1.2 s
# per 480x640 frame; below this much total pixel-work the numpy tracer
# is cheaper even against a cold cache. 40M = ~130 frames at 480x640.
_DEVICE_RENDER_MIN_PIXEL_FRAMES = 40_000_000


def make_renderer(scene: AnalyticScene, H: int, W: int, fx: float,
                  fy: float, cx: float, cy: float,
                  n_frames: Optional[int] = None):
    """:func:`render_frame` bound to (scene, camera), device-accelerated
    when a non-CPU JAX backend is available AND the job is big enough
    to amortize the compile (``n_frames`` hint; None = assume big).
    COSLAM_SYNTH_DEVICE_RENDER=0 forces the numpy tracer (the CPU
    backend always uses it — at test sizes the compile costs more than
    it saves, and the numpy path keeps resumable rendering bitwise
    stable)."""
    big = (n_frames is None
           or n_frames * H * W >= _DEVICE_RENDER_MIN_PIXEL_FRAMES)
    if big and os.environ.get("COSLAM_SYNTH_DEVICE_RENDER", "1") != "0":
        try:
            import jax

            if jax.default_backend() != "cpu":
                return DeviceRenderer(scene, H, W, fx, fy, cx, cy)
        except Exception:
            pass
    return lambda c2w: render_frame(scene, c2w, H, W, fx, fy, cx, cy)


# ---------------------------------------------------------------------------
# Trajectories
# ---------------------------------------------------------------------------


def _look_at(eye: np.ndarray, target: np.ndarray,
             up=np.array([0.0, 1.0, 0.0])) -> np.ndarray:
    """OpenGL c2w: camera -z looks from eye toward target."""
    z = eye - target
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def make_trajectory(n: int, orbit_fraction: float = 1.0, radius: float = 1.1,
                    height: float = 0.35) -> np.ndarray:
    """[n, 4, 4] orbit inside the room, looking at the object cluster.
    ``orbit_fraction`` scales the total swept angle (0.02 -> a short,
    easy-to-track arc)."""
    poses = []
    target = np.array([0.0, -0.8, 0.0])
    for i in range(n):
        th = 2.0 * np.pi * orbit_fraction * i / max(n, 1) + 0.7
        eye = np.array([radius * np.cos(th),
                        height + 0.08 * np.sin(2 * th),
                        radius * np.sin(th)])
        poses.append(_look_at(eye, target))
    return np.stack(poses).astype(np.float32)


def make_scan_trajectory(n: int, deg_per_frame: float = 1.5) -> np.ndarray:
    """[n, 4, 4] room-coverage scan: the camera drifts on a slow inner
    orbit while the view direction sweeps the walls with a pitch
    oscillation. The angular velocity is CONSTANT (``deg_per_frame``,
    default 1.5 deg — within what tracking.iter Adam steps at lr_rot
    ~0.004 can correct per frame on top of the const-speed prediction;
    2.5 deg/frame measurably accumulates unrecoverable drift), so longer
    sequences sweep more of the room instead of spinning faster; ~300
    frames cover most of it (the benchmark protocol's operating point)."""
    # Inward-looking orbit: the camera circles the room looking across it,
    # so the textured object cluster and the far wall share every view —
    # translation parallax then disambiguates the rotation, unlike an
    # outward wall-sweep where a lone flat wall fills the frame (measured:
    # outward sweeps drift 10x worse at the same angular rate). The
    # look-at point wanders slowly to spread coverage over the wall band.
    poses = []
    for i in range(n):
        th = np.deg2rad(deg_per_frame) * i
        eye = np.array([1.15 * np.cos(th),
                        0.25 + 0.25 * np.sin(0.9 * th + 0.3),
                        1.15 * np.sin(th)])
        target = np.array([0.45 * np.cos(0.63 * th + 2.0),
                           -0.75 + 0.55 * np.sin(0.41 * th),
                           0.45 * np.sin(0.63 * th + 2.0)])
        poses.append(_look_at(eye, target))
    return np.stack(poses).astype(np.float32)


def make_corridor_trajectory(n: int, seed: int = 0) -> np.ndarray:
    """[n, 4, 4] corridor walk for AnalyticCorridor: the camera advances
    along +x looking mostly forward (the degenerate axis), with gentle
    seeded lateral sway and gaze wander so side walls provide parallax.
    About 3 m of travel regardless of n (longer runs move slower, like
    the scan trajectory's constant coverage)."""
    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi, 3)
    poses = []
    for i in range(n):
        u = i / max(n - 1, 1)
        x = -1.5 + 3.0 * u
        eye = np.array([
            x,
            0.1 + 0.08 * np.sin(2.1 * np.pi * u + phase[0]),
            0.18 * np.sin(1.7 * np.pi * u + phase[1])])
        target = np.array([
            x + 1.2,
            0.05 * np.sin(2.9 * np.pi * u + phase[2]),
            0.35 * np.sin(2.3 * np.pi * u + phase[1] + 1.1)])
        poses.append(_look_at(eye, target))
    return np.stack(poses).astype(np.float32)


def make_handheld_trajectory(n: int, seed: int = 0,
                             deg_per_frame: float = 1.0) -> np.ndarray:
    """[n, 4, 4] TUM-style handheld trajectory: a desk-orbit base path
    with hand tremor and jerky attention shifts.

    The TUM RGB-D sequences (fr1_desk etc.) are hard to track because
    the camera is hand-held: mean angular velocity ~23 deg/s (~0.8
    deg/frame at 30 Hz) with jerk spikes, positional tremor, and roll.
    This trajectory reproduces those statistics on the analytic room:
    a slow inward orbit (the fr1_desk "around the desk" motion) plus
    band-limited jitter on eye, look-at, and roll from incommensurate
    sinusoids and a seeded random walk. Angular steps average ~1
    deg/frame with peaks ~2.5x the mean — beyond the const-speed
    prediction, so tracking has to do real work every frame."""
    rng = np.random.default_rng(seed)
    # Band-limited random walk: integrate white noise, then smooth with
    # a short box filter — energy concentrated at a few Hz, like tremor.
    def tremor(scale: float, smooth: int = 5) -> np.ndarray:
        w = np.cumsum(rng.normal(size=(n + smooth, 3)), axis=0)
        w = np.stack([np.convolve(w[:, k], np.ones(smooth) / smooth,
                                  mode="valid") for k in range(3)], -1)
        w = w[:n] - w[:n].mean(axis=0)
        return (scale * w / max(np.abs(w).max(), 1e-9)).astype(np.float32)

    eye_j = tremor(0.035)          # ~cm-scale positional tremor
    tgt_j = tremor(0.11, smooth=3) # jerky attention shifts (rotation)
    roll_j = tremor(0.06, smooth=4)[:, 0]  # radians of roll wobble

    poses = []
    for i in range(n):
        th = np.deg2rad(deg_per_frame) * i
        eye = np.array([1.2 * np.cos(th),
                        0.30 + 0.18 * np.sin(0.83 * th + 0.4),
                        1.2 * np.sin(th)]) + eye_j[i]
        target = np.array([0.4 * np.cos(0.57 * th + 2.1),
                           -0.8 + 0.45 * np.sin(0.37 * th),
                           0.4 * np.sin(0.57 * th + 2.1)]) + tgt_j[i]
        up = np.array([np.sin(roll_j[i]), np.cos(roll_j[i]), 0.0])
        poses.append(_look_at(eye, target, up=up))
    return np.stack(poses).astype(np.float32)


def make_walkthrough_trajectory(n: int, seed: int = 0) -> np.ndarray:
    """[n, 4, 4] ScanNet-style apartment walkthrough for
    :class:`AnalyticApartment`: orbit room A, traverse the doorway,
    orbit room B — with handheld tremor throughout.

    The doorway transit is the hard part this protocol exists for: the
    camera sees a narrow opening with little parallax, then enters a
    room it has never mapped (the reference's ScanNet sequences are
    multi-room apartment scans with exactly this structure and its ATE
    there is 4-12 cm vs <1 cm on Replica). Phases are joined with a
    smoothing filter so velocities stay continuous, and the path is
    asserted to stay in free space by the tests."""
    rng = np.random.default_rng(seed)

    # Constant handheld rates; COVERAGE scales with n (a 60-frame clip
    # is a partial room-A orbit; the door transit and room B need
    # n >= 160 — full two-room coverage needs ~800 frames, matching the
    # multi-thousand-frame real ScanNet scans).
    orbit_rate = np.deg2rad(1.2)            # rad/frame
    if n < 160:
        n_a, n_t, n_b = n, 0, 0
    else:
        n_t = 63                            # 2.5 m at ~4 cm/frame
        n_a = (n - n_t) // 2
        n_b = n - n_t - n_a
    a_c = AnalyticApartment.room_a
    b_c = AnalyticApartment.room_b

    door = AnalyticApartment.door_c
    p0 = np.array([-1.25, 0.05, door[2]], np.float32)  # transit endpoints
    p1 = np.array([1.25, 0.05, door[2]], np.float32)

    def yaw_pitch(d):
        d = d / max(np.linalg.norm(d), 1e-9)
        return (float(np.arctan2(d[2], d[0])),
                float(np.arcsin(np.clip(d[1], -1.0, 1.0))))

    def gaze_schedule(d_from, d_to):
        """Fixed yaw/pitch turn schedule between two view directions.
        Computed ONCE per phase (not per frame): re-deriving the turn
        from a wandering from-target flips the rotation plane near
        180-degree turns and whips the camera."""
        y0, p0_ = yaw_pitch(d_from)
        y1, p1_ = yaw_pitch(d_to)
        dyaw = (y1 - y0 + np.pi) % (2 * np.pi) - np.pi
        return lambda t: np.array(
            [np.cos(p0_ + t * (p1_ - p0_)) * np.cos(y0 + t * dyaw),
             np.sin(p0_ + t * (p1_ - p0_)),
             np.cos(p0_ + t * (p1_ - p0_)) * np.sin(y0 + t * dyaw)],
            np.float32)

    eyes, tgts = [], []
    # Phase A: inward orbit of room A, parameterized to END exactly at
    # the transit start p0; the look-at ramps from room-center wander to
    # the door over the last third so the 180-degree turn is gradual.
    ahead_vec = np.array([1.5, -0.3, 0.0], np.float32)

    rel0 = p0 - a_c
    th_end = float(np.arctan2(rel0[2], rel0[0]))
    r_a = float(np.hypot(rel0[0], rel0[2]))
    ang_a = min(2.6 * np.pi, orbit_rate * n_a)

    def eye_wander_a(u):
        th = th_end + ang_a * (u - 1.0)
        h = p0[1] + (0.2 + 0.15 * np.sin(0.7 * th)) * (1 - u)
        eye = np.array([a_c[0] + r_a * np.cos(th), h,
                        a_c[2] + r_a * np.sin(th)], np.float32)
        wander = a_c + np.array([0.35 * np.cos(0.57 * th + 2.0), -0.9,
                                 0.35 * np.sin(0.57 * th + 2.0)],
                                np.float32)
        return eye, wander

    # Door turn needs >= ~50 frames to stay at handheld rates; clips
    # with no transit (n_t == 0) never turn toward the door.
    turn_a = min(max(45, int(0.33 * n_a)), max(n_a - 1, 1))
    u_turn = 1.0 - turn_a / max(n_a - 1, 1) if n_t else 2.0
    e_t, w_t = eye_wander_a(u_turn)
    sched_a = gaze_schedule(w_t - e_t, ahead_vec)
    for i in range(n_a):
        u = i / max(n_a - 1, 1)
        eye, wander = eye_wander_a(u)
        eyes.append(eye)
        if u <= u_turn:
            tgts.append(wander)
        else:  # turn toward the door over the final stretch
            s = (u - u_turn) / (1.0 - u_turn)
            s = s * s * (3 - 2 * s)
            tgts.append(eye + 1.5 * sched_a(s))
    # Phase T: straight transit through the door center, looking ahead.
    for i in range(n_t):
        s = i / max(n_t - 1, 1)
        s = s * s * (3 - 2 * s)  # smoothstep: ease in/out of the door
        e = p0 + (p1 - p0) * s
        eyes.append(e)
        tgts.append(e + ahead_vec)  # look ahead +x
    # Phase B: inward orbit of room B starting at the transit end p1;
    # gaze turns from look-ahead to room-center wander over the first
    # third.
    rel1 = p1 - b_c
    th0 = float(np.arctan2(rel1[2], rel1[0]))
    r_b = float(np.hypot(rel1[0], rel1[2]))
    ang_b = min(2.6 * np.pi, orbit_rate * n_b)

    def eye_wander_b(u):
        th = th0 + ang_b * u
        h = p1[1] + (0.2 + 0.15 * np.sin(0.7 * th + 1.0)) * u
        eye = np.array([b_c[0] + r_b * np.cos(th), h,
                        b_c[2] + r_b * np.sin(th)], np.float32)
        wander = b_c + np.array([0.35 * np.cos(0.57 * th + 0.5), -0.9,
                                 0.35 * np.sin(0.57 * th + 0.5)],
                                np.float32)
        return eye, wander

    turn_b = min(max(45, int(0.33 * n_b)), max(n_b - 1, 1))
    u_turn_b = turn_b / max(n_b - 1, 1)
    e_t, w_t = eye_wander_b(u_turn_b)
    sched_b = gaze_schedule(ahead_vec, w_t - e_t)
    for i in range(n_b):
        u = i / max(n_b - 1, 1)
        eye, wander = eye_wander_b(u)
        eyes.append(eye)
        if u >= u_turn_b:
            tgts.append(wander)
        else:
            s = u / u_turn_b
            s = s * s * (3 - 2 * s)
            tgts.append(eye + 1.5 * sched_b(s))

    eyes = np.asarray(eyes, np.float32)
    tgts = np.asarray(tgts, np.float32)
    # Join phases smoothly: box-filter each coordinate (edge-padded).
    k = max(min(n // 40, 15), 1)
    if k > 1:
        pad = k // 2
        for arr in (eyes, tgts):
            ext = np.concatenate([np.repeat(arr[:1], pad, 0), arr,
                                  np.repeat(arr[-1:], pad, 0)])
            for c in range(3):
                arr[:, c] = np.convolve(ext[:, c], np.ones(k) / k,
                                        mode="valid")[:n]

    # Handheld tremor (same statistics machinery as the TUM protocol).
    def tremor(scale: float, smooth: int = 5) -> np.ndarray:
        w = np.cumsum(rng.normal(size=(n + smooth, 3)), axis=0)
        w = np.stack([np.convolve(w[:, c], np.ones(smooth) / smooth,
                                  mode="valid") for c in range(3)], -1)
        w = w[:n] - w[:n].mean(axis=0)
        return (scale * w / max(np.abs(w).max(), 1e-9)).astype(np.float32)

    eyes = eyes + tremor(0.03)
    tgts = tgts + tremor(0.09, smooth=3)
    roll = tremor(0.05, smooth=4)[:, 0]
    poses = []
    for e, t, r in zip(eyes, tgts, roll):
        up = np.array([np.sin(r), np.cos(r), 0.0])
        poses.append(_look_at(e, t, up=up))
    return np.stack(poses).astype(np.float32)


def add_kinect_noise(depth: np.ndarray, rng: np.random.Generator,
                     sigma0: float = 0.0012, sigma_quad: float = 0.0019,
                     hole_grad: float = 0.05,
                     speckle_frac: float = 0.015) -> np.ndarray:
    """Kinect-like sensor corruption of an exact depth map [H, W] (m).

    Three effects, matching the structured-light error model
    (Khoshelham & Elberink 2012) that the TUM RGB-D sensor exhibits:
    axial Gaussian noise with quadratic-in-z sigma; dropout at depth
    discontinuities / grazing surfaces (screen-space depth-gradient
    threshold — where the projected pattern decorrelates); and random
    speckle dropout blobs (low-frequency thresholded noise field).
    ``hole_grad`` is meters-per-pixel at a 640-wide image and is scaled
    by the actual width, so the hole geometry is resolution-invariant
    (per-pixel gradients grow as 1/W for a fixed field of view).
    Invalid pixels get depth 0.0 — the TUM loader convention, which the
    SLAM loop's valid-depth masks and ``rgb_missing`` weighting handle
    (reference model/scene_rep.py:319-321)."""
    z = depth.astype(np.float32)
    sigma = sigma0 + sigma_quad * np.square(np.maximum(z - 0.4, 0.0))
    noisy = z + rng.normal(size=z.shape).astype(np.float32) * sigma

    gy, gx = np.gradient(z)
    holes = np.hypot(gx, gy) > hole_grad * (640.0 / z.shape[1])

    h8, w8 = max(z.shape[0] // 24, 2), max(z.shape[1] // 24, 2)
    field = rng.normal(size=(h8, w8)).astype(np.float32)
    import cv2

    field = cv2.resize(field, (z.shape[1], z.shape[0]),
                       interpolation=cv2.INTER_CUBIC)
    holes |= field > np.quantile(field, 1.0 - speckle_frac)

    noisy[holes] = 0.0
    return np.maximum(noisy, 0.0)


def interpolate_pose(p0: np.ndarray, p1: np.ndarray,
                     u: float) -> np.ndarray:
    """Pose interpolation between two c2w poses: the relative delta
    ``p1 @ inv(p0)`` is scaled by ``u`` as axis-angle rotation plus
    LINEARLY scaled translation (the same approximation
    :func:`~coslam_tpu.runtime.tracking.predict_current_pose` uses for
    velocity rescaling — not the exact SE(3) screw geodesic, whose
    V-matrix couples rotation into translation; endpoints are exact and
    the deviation is O(angle^2) for the sub-frame deltas used here).
    u=0 -> p0, u=1 -> p1; u outside [0,1] extrapolates."""
    from scipy.spatial.transform import Rotation

    p0 = np.asarray(p0, np.float64)
    delta = np.asarray(p1, np.float64) @ np.linalg.inv(p0)
    rotvec = Rotation.from_matrix(delta[:3, :3]).as_rotvec()
    out = np.eye(4)
    out[:3, :3] = Rotation.from_rotvec(u * rotvec).as_matrix()
    out[:3, 3] = u * delta[:3, 3]
    return (out @ p0).astype(np.float32)


def make_blur_renderer(render, poses: np.ndarray, shutter: float,
                       taps: int = 5):
    """Wrap a bound ``render(c2w) -> (rgb, depth)`` with camera motion
    blur: frame i's RGB becomes the average of ``taps`` renders at poses
    screw-interpolated across a shutter window of ``shutter`` frame
    intervals centered on pose i (offsets toward pose i-1 / i+1, clamped
    at sequence ends). Models the rolling exposure of a handheld RGB
    camera — the real-sensor failure mode the TUM fr1 captures exhibit
    (fast motion + 30 Hz shutter) that the sharp sphere tracer cannot.

    Depth keeps the CENTER tap only: RGB-D depth comes from a separate
    short-pulse IR exposure (ToF / structured light) whose failure modes
    are modeled by :func:`add_kinect_noise`, not by photometric blur.

    Returns ``render2(i) -> (rgb, depth)`` indexed by frame number."""
    n = len(poses)
    offsets = np.linspace(-0.5, 0.5, max(int(taps), 2)) * float(shutter)

    def render2(i: int):
        center_rgb, depth = render(poses[i])
        acc = np.zeros_like(center_rgb)
        for u in offsets:
            j = (min(i + 1, n - 1)) if u >= 0 else (max(i - 1, 0))
            if u == 0.0 or j == i:
                # The tap pose IS the center pose (u=0 tap of odd tap
                # counts, or a clamped sequence end) — reuse the sharp
                # center render instead of ray-tracing it again.
                acc += center_rgb
                continue
            acc += render(interpolate_pose(poses[i], poses[j], abs(u)))[0]
        return acc / len(offsets), depth

    return render2


def write_tum_format(datadir: str, scene: AnalyticScene, poses: np.ndarray,
                     H: int, W: int, fx: float, fy: float, cx: float,
                     cy: float, png_depth_scale: float = 5000.0,
                     fps: float = 30.0, depth_noise: bool = True,
                     seed: int = 0, motion_blur: float = 0.0,
                     blur_taps: int = 5) -> None:
    """Render ``poses`` and write the TUM RGB-D on-disk layout:
    rgb/<t>.png + depth/<t>.png + rgb.txt / depth.txt / groundtruth.txt
    (reference datasets/dataset.py:601-786). Exercises the real TUM
    loader end-to-end: timestamps carry per-stream jitter (rgb/depth
    offset ~8 ms) so the loader's association step does real matching,
    and groundtruth.txt stores quaternion+translation rows in the
    OpenCV convention the loader converts back from.

    ``depth_noise`` applies :func:`add_kinect_noise` at write time with
    a per-frame seed, so rendering stays deterministic and resumable.
    ``motion_blur`` > 0 renders each RGB frame through
    :func:`make_blur_renderer` with that shutter fraction (depth stays
    the sharp center tap) — the handheld fast-motion failure mode."""
    # Default keeps the legacy stamp so existing render caches stay
    # valid; any non-default noise/blur parameter re-renders.
    extra = (None if (depth_noise and seed == 0 and not motion_blur)
             else ("noise", depth_noise, seed)
             + (("blur", motion_blur, blur_taps) if motion_blur else ()))
    _fresh_render_dir(datadir, poses, H, W, extra=extra)
    import cv2
    from scipy.spatial.transform import Rotation

    rng_t = np.random.default_rng(seed + 977)
    os.makedirs(os.path.join(datadir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(datadir, "depth"), exist_ok=True)
    render = make_renderer(scene, H, W, fx, fy, cx, cy,
                            n_frames=len(poses))
    blurred = (make_blur_renderer(render, poses, motion_blur, blur_taps)
               if motion_blur > 0 else None)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i, c2w in enumerate(poses):
        t_rgb = i / fps + abs(float(rng_t.normal()) * 1e-3)
        t_depth = t_rgb + 0.008 + float(rng_t.normal()) * 2e-3
        t_gt = t_rgb + float(rng_t.normal()) * 1e-3
        rgb_rel = f"rgb/{t_rgb:.6f}.png"
        depth_rel = f"depth/{t_depth:.6f}.png"
        rgb_path = os.path.join(datadir, rgb_rel)
        depth_path = os.path.join(datadir, depth_rel)
        if not (os.path.exists(rgb_path) and os.path.exists(depth_path)):
            rgb, depth = blurred(i) if blurred is not None else render(c2w)
            if depth_noise:
                depth = add_kinect_noise(
                    depth, np.random.default_rng(seed * 100003 + i))
            bgr = cv2.cvtColor((rgb * 255).astype(np.uint8),
                               cv2.COLOR_RGB2BGR)
            cv2.imwrite(rgb_path, bgr)
            d16 = np.clip(depth * png_depth_scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(depth_path, d16)
        rgb_lines.append(f"{t_rgb:.6f} {rgb_rel}")
        depth_lines.append(f"{t_depth:.6f} {depth_rel}")
        # The loader flips y/z columns to OpenGL after the quaternion
        # conversion (_opengl); store the OpenCV-convention pose.
        cv = np.array(c2w, np.float64)
        cv[:3, 1] *= -1
        cv[:3, 2] *= -1
        q = Rotation.from_matrix(cv[:3, :3]).as_quat()  # x y z w
        t = cv[:3, 3]
        gt_lines.append(f"{t_gt:.6f} " + " ".join(
            f"{v:.6f}" for v in (*t, *q)))
    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)):
        with open(os.path.join(datadir, name), "w") as f:
            f.write(f"# synthetic TUM-format sequence\n"
                    + "\n".join(lines) + "\n")


def write_scannet_format(datadir: str, scene: AnalyticScene,
                         poses: np.ndarray, H: int, W: int, fx: float,
                         fy: float, cx: float, cy: float,
                         png_depth_scale: float = 1000.0,
                         depth_noise: bool = True, seed: int = 0) -> None:
    """Render ``poses`` and write the ScanNet on-disk layout:
    color/<i>.jpg + depth/<i>.png (mm) + pose/<i>.txt (4x4 OpenCV
    matrices, reference datasets/dataset.py:268-369). Exercises the real
    ScanNet loader end-to-end (numeric-filename sort, per-frame pose
    files, crop_edge intrinsics adjustment). The ScanNet sensor
    (Structure, structured light like the Kinect) gets the same noise
    model as the TUM writer; rendering is resumable like the others."""
    _fresh_render_dir(datadir, poses, H, W,
                      extra=(None if (depth_noise and seed == 0)
                             else ("noise", depth_noise, seed)))
    import cv2

    os.makedirs(os.path.join(datadir, "color"), exist_ok=True)
    os.makedirs(os.path.join(datadir, "depth"), exist_ok=True)
    os.makedirs(os.path.join(datadir, "pose"), exist_ok=True)
    render = make_renderer(scene, H, W, fx, fy, cx, cy,
                            n_frames=len(poses))
    for i, c2w in enumerate(poses):
        rgb_path = os.path.join(datadir, "color", f"{i}.jpg")
        depth_path = os.path.join(datadir, "depth", f"{i}.png")
        if not (os.path.exists(rgb_path) and os.path.exists(depth_path)):
            rgb, depth = render(c2w)
            if depth_noise:
                depth = add_kinect_noise(
                    depth, np.random.default_rng(seed * 100003 + i))
            bgr = cv2.cvtColor((rgb * 255).astype(np.uint8),
                               cv2.COLOR_RGB2BGR)
            cv2.imwrite(rgb_path, bgr, [cv2.IMWRITE_JPEG_QUALITY, 97])
            d16 = np.clip(depth * png_depth_scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(depth_path, d16)
        # The loader flips y/z columns to OpenGL; store OpenCV.
        cv_pose = np.array(c2w, np.float64)
        cv_pose[:3, 1] *= -1
        cv_pose[:3, 2] *= -1
        np.savetxt(os.path.join(datadir, "pose", f"{i}.txt"), cv_pose)


def write_rgbd_format(datadir: str, scene: AnalyticScene,
                      poses: np.ndarray, H: int, W: int, fx: float,
                      fy: float, cx: float, cy: float,
                      png_depth_scale: float = 1000.0,
                      depth_noise: bool = True, seed: int = 0,
                      invalid: Sequence[int] = ()) -> None:
    """Render ``poses`` and write the NeuralRGBD (SyntheticRGBD) on-disk
    layout: images/img####.png + depth_filtered/depth####.png (mm) +
    poses.txt with FOUR text lines per 4x4 matrix (reference
    datasets/dataset.py:486-599). Poses are stored in OpenGL convention
    as-is (the loader applies no column flips). Frame indices in
    ``invalid`` get an all-nan pose block — the NeuralRGBD exporter
    marks untracked frames this way and the loader must drop them
    (dataset.py:529-533); their images are still written, keeping file
    and pose indices aligned. NeuralRGBD's depth_filtered stream is a
    denoised SIMULATED noisy depth, so the Kinect noise model applies
    (without dropout holes: the filtered stream has none; the
    SyntheticRGBD baseline depth-L1 of 3.02 cm reflects this residual
    noise). Resumable like the other writers."""
    # Noise parameters join the cache stamp (default keeps the legacy
    # stamp): the scan trajectory is seed-independent, so without this a
    # reseeded noise stream could silently reuse stale renders.
    _fresh_render_dir(datadir, poses, H, W,
                      extra=(None if (depth_noise and seed == 0)
                             else ("noise", depth_noise, seed)))
    import cv2

    invalid = set(int(i) for i in invalid)
    os.makedirs(os.path.join(datadir, "images"), exist_ok=True)
    os.makedirs(os.path.join(datadir, "depth_filtered"), exist_ok=True)
    render = make_renderer(scene, H, W, fx, fy, cx, cy,
                            n_frames=len(poses))
    lines = []
    for i, c2w in enumerate(poses):
        rgb_path = os.path.join(datadir, "images", f"img{i:04d}.png")
        depth_path = os.path.join(datadir, "depth_filtered",
                                  f"depth{i:04d}.png")
        if not (os.path.exists(rgb_path) and os.path.exists(depth_path)):
            rgb, depth = render(c2w)
            if depth_noise:
                depth = add_kinect_noise(
                    depth, np.random.default_rng(seed * 100003 + i),
                    hole_grad=np.inf, speckle_frac=0.0)
            bgr = cv2.cvtColor((rgb * 255).astype(np.uint8),
                               cv2.COLOR_RGB2BGR)
            cv2.imwrite(rgb_path, bgr)
            d16 = np.clip(depth * png_depth_scale, 0, 65535).astype(np.uint16)
            cv2.imwrite(depth_path, d16)
        if i in invalid:
            lines.extend(["nan nan nan nan"] * 4)
        else:
            for row in np.asarray(c2w, np.float64):
                lines.append(" ".join(f"{v:.10f}" for v in row))
    with open(os.path.join(datadir, "poses.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# Serialization + config
# ---------------------------------------------------------------------------


def _fresh_render_dir(datadir: str, poses: np.ndarray, H: int,
                      W: int, extra=None) -> None:
    """Resumable-render cache guard. Cached frames are only valid for
    the SAME trajectory and resolution — e.g. make_walkthrough_trajectory
    is NOT prefix-stable in n, so reusing a 300-frame cache for an
    800-frame run would silently pair stale images with new poses. A
    stamp of (poses, H, W[, extra render params]) invalidates the
    directory on mismatch."""
    import hashlib
    import shutil

    h = hashlib.sha1()
    h.update(np.asarray(poses, np.float64).tobytes())
    h.update(np.asarray([H, W], np.int64).tobytes())
    if extra is not None:
        h.update(repr(extra).encode())
    want = h.hexdigest()
    stamp = os.path.join(datadir, ".render_stamp")
    if os.path.isdir(datadir):
        have = (open(stamp).read().strip() if os.path.exists(stamp)
                else None)
        if have != want:
            shutil.rmtree(datadir)
    os.makedirs(datadir, exist_ok=True)
    with open(stamp, "w") as f:
        f.write(want)


def dataset_content_hash(datadir: str, sample_every: int = 7) -> str:
    """Content fingerprint of a rendered dataset directory: sha1 over
    the sorted file list, every file's size, and the full bytes of every
    ``sample_every``-th file. Stamped into quality-result JSONs so a
    reported metric is tied to the exact pixels it was measured on
    (VERDICT r3 #1a — a stale render cache silently invalidated an r2
    artifact)."""
    import hashlib

    h = hashlib.sha1()
    entries = []
    for root, _, files in os.walk(datadir):
        for f in files:
            entries.append(os.path.join(root, f))
    for i, path in enumerate(sorted(entries)):
        rel = os.path.relpath(path, datadir)
        h.update(rel.encode())
        h.update(str(os.path.getsize(path)).encode())
        if i % sample_every == 0:
            with open(path, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


def exposure_drift_walk(n: int, drift: float, seed: int = 0) -> np.ndarray:
    """Per-frame exposure parameters [n, 4] (3 gains + offset) following
    a random walk: log-gains and offset integrate N(0, drift) /
    N(0, drift/10) steps. Models auto-exposure/white-balance drift in
    real captures (the reference's PerFrameAlignment was written for
    exactly this and never finished, optimization/frame_align.py)."""
    rng = np.random.default_rng(seed)
    log_gain = np.cumsum(rng.normal(0.0, drift, (n, 3)), axis=0)
    offset = np.cumsum(rng.normal(0.0, drift * 0.1, (n, 1)), axis=0)
    return np.concatenate([np.exp(log_gain), offset],
                          axis=1).astype(np.float32)


def write_replica_format(datadir: str, scene: AnalyticScene,
                         poses: np.ndarray, H: int, W: int, fx: float,
                         fy: float, cx: float, cy: float,
                         png_depth_scale: float = 6553.5,
                         exposure_drift: float = 0.0,
                         exposure_seed: int = 0) -> None:
    """Render ``poses`` and write the Replica on-disk layout
    (results/frame%06d.jpg + results/depth%06d.png + traj.txt).

    exposure_drift > 0 applies a per-frame gain/offset random walk to
    the rendered RGB (depth untouched) — the adversarial protocol behind
    the training.frame_align robustness feature."""
    import cv2

    # extra=None when undrifted: keeps existing render caches' stamps
    # valid (the default path hashes exactly what it always hashed).
    _fresh_render_dir(datadir, poses, H, W,
                      extra=((exposure_drift, exposure_seed)
                             if exposure_drift > 0 else None))

    results = os.path.join(datadir, "results")
    os.makedirs(results, exist_ok=True)
    render = make_renderer(scene, H, W, fx, fy, cx, cy,
                            n_frames=len(poses))
    expo = (exposure_drift_walk(len(poses), exposure_drift, exposure_seed)
            if exposure_drift > 0 else None)
    lines = []
    for i, c2w in enumerate(poses):
        rgb_path = os.path.join(results, f"frame{i:06d}.jpg")
        if (os.path.exists(rgb_path) and os.path.exists(
                os.path.join(results, f"depth{i:06d}.png"))):
            # Resumable rendering: long sequences are expensive to
            # re-render; existing frames are deterministic (same scene,
            # pose, intrinsics), so keep them and only fill gaps.
            file_pose = np.array(c2w, np.float64)
            file_pose[:3, 1] *= -1
            file_pose[:3, 2] *= -1
            lines.append(" ".join(f"{v:.10f}"
                                  for v in file_pose.reshape(-1)))
            continue
        rgb, depth = render(c2w)
        if expo is not None:
            rgb = np.clip(rgb * expo[i, :3] + expo[i, 3], 0.0, 1.0)
        bgr = cv2.cvtColor((rgb * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
        cv2.imwrite(os.path.join(results, f"frame{i:06d}.jpg"), bgr,
                    [cv2.IMWRITE_JPEG_QUALITY, 97])
        d16 = np.clip(depth * png_depth_scale, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(results, f"depth{i:06d}.png"), d16)
        # The loader flips y/z columns back to OpenGL; pre-flip on write.
        file_pose = np.array(c2w, np.float64)
        file_pose[:3, 1] *= -1
        file_pose[:3, 2] *= -1
        lines.append(" ".join(f"{v:.10f}" for v in file_pose.reshape(-1)))
    with open(os.path.join(datadir, "traj.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def make_synthetic_config(datadir: str, output: str, H: int = 40,
                          W: int = 52, n_frames: int = 8,
                          exp_name: str = "synth") -> Dict:
    """Full Co-SLAM config for the analytic scene (same schema as
    configs/Replica/replica.yaml, sized for small images and CPU tests)."""
    return _base_synth_config(datadir, output, H, W, n_frames, exp_name)


def make_tum_synthetic_config(datadir: str, output: str, H: int = 480,
                              W: int = 640, n_frames: int = 500,
                              exp_name: str = "synth_tum",
                              tuned: bool = True) -> Dict:
    """TUM-recipe config for the TUM-format synthetic handheld protocol.

    Starts from the analytic-room schema and applies the reference's TUM
    training recipe (configs/Tum/tum.yaml, reference evaluation TUM
    protocol): 20-iteration BA over 2048 rays, first_iters 1000,
    rgb_weight 1 / sdf_weight 5000 / trunc 0.05, lr_rot/lr_trans 0.01
    tracking over 1024 rays, range_d 0.25 with n_range_d 21. With
    ``tuned`` (default) the sampling stack is the TPU-tuned operating
    point shipped as configs/Tum/fr1_desk_vm.yaml: TensoVM encoding and
    the importance stage replaced by a 32-sample uniform stratum
    (n_importance 0) — see README "TUM protocol". With ``tuned=False``
    it is the reference recipe verbatim (HashGrid, 64 uniform + 128
    importance samples) for head-to-head runs."""
    cfg = _base_synth_config(datadir, output, H, W, n_frames, exp_name)
    cfg["dataset"] = "tum"
    cfg["cam"].update(png_depth_scale=5000.0, depth_trunc=8.0)
    cfg["mapping"].update(sample=2048, iters=20, first_iters=1000,
                          min_pixels_cur=100)
    cfg["tracking"].update(iter=10, sample=1024, lr_rot=0.01,
                           lr_trans=0.01, ignore_edge_W=20,
                           ignore_edge_H=20, best=False)
    cfg["training"].update(rgb_weight=1.0, depth_weight=0.1,
                           sdf_weight=5000, fs_weight=10,
                           smooth_weight=1e-8, smooth_pts=64,
                           smooth_vox=0.04, smooth_margin=0.0,
                           range_d=0.25, n_range_d=21, trunc=0.05,
                           rgb_missing=1.0)
    cfg["grid"].update(hash_size=16, voxel_color=0.04, voxel_sdf=0.02)
    if tuned:
        cfg["grid"].update(enc="TensoVM", triplane_levels=3)
        cfg["training"].update(n_samples_d=32, n_importance=0)
    else:
        cfg["training"].update(n_samples_d=64, n_importance=128)
    return cfg


def make_scannet_synthetic_config(datadir: str, output: str, H: int = 480,
                                  W: int = 640, n_frames: int = 1000,
                                  exp_name: str = "synth_scannet",
                                  tuned: bool = True) -> Dict:
    """ScanNet-recipe config for the apartment walkthrough protocol
    (:class:`AnalyticApartment` + :func:`make_walkthrough_trajectory`).

    Applies the reference's ScanNet training recipe
    (configs/ScanNet/scannet.yaml): 2048-ray 10-it BA with optim_cur
    off, rgb_weight 5 / sdf_weight 1000 / trunc 0.1, smooth_weight 1e-3
    over 0.1 m voxels, quat pose tangents, crop_edge 10, mm depth PNGs —
    with bounds covering the 8.6 m apartment. With ``tuned`` (default)
    the encoder/sampling stack is the TPU operating point
    (configs/ScanNet/scene0000_vm.yaml): TensoVM and a 32-sample uniform
    stratum instead of the reference's 96 (same range-d concentration
    argument as the TUM point — see README "TUM protocol").
    ``tuned=False`` is the reference recipe verbatim (HashGrid
    hash_size 19, n_samples_d 96)."""
    cfg = _base_synth_config(datadir, output, H, W, n_frames, exp_name)
    cfg["dataset"] = "scannet"
    cfg["cam"].update(png_depth_scale=1000.0, crop_edge=10,
                      depth_trunc=8.0, far=8)
    b = AnalyticApartment.bound
    cfg["mapping"].update(
        sample=2048, iters=10, first_iters=500, optim_cur=False,
        min_pixels_cur=20,
        bound=[[float(lo - 0.3), float(hi + 0.3)] for lo, hi in b],
        marching_cubes_bound=[[float(lo), float(hi)] for lo, hi in b])
    cfg["tracking"].update(iter=10, sample=1024, lr_rot=0.001,
                           lr_trans=0.001, ignore_edge_W=20,
                           ignore_edge_H=20, best=True)
    cfg["training"].update(rgb_weight=5.0, depth_weight=0.1,
                           sdf_weight=1000, fs_weight=10,
                           smooth_weight=0.001, smooth_pts=64,
                           smooth_vox=0.1, smooth_margin=0.05,
                           range_d=0.25, n_range_d=21, trunc=0.1,
                           rot_rep="quat", rgb_missing=0.0)
    cfg["grid"].update(hash_size=19, voxel_color=0.08, voxel_sdf=0.04)
    if tuned:
        cfg["grid"].update(enc="TensoVM", triplane_levels=3)
        cfg["training"].update(n_samples_d=32)
        # Doubled tracking iterations (the reference's own ScanNet
        # remedy — its dagger rows) as part of the TPU operating point:
        # tracking is ~19 ms/frame here (4x the reference's budget), so
        # spending the headroom on robustness is free. Measured: the
        # 800-frame walkthrough's steep look-down corner sweep (frames
        # ~160-220) loses tracking at iter=10 (ATE 114 cm) and tracks
        # through at iter=20 (ATE 3.4 cm).
        cfg["tracking"].update(iter=20)
    else:
        cfg["training"].update(n_samples_d=96)
    return cfg


def make_rgbd_synthetic_config(datadir: str, output: str, H: int = 480,
                               W: int = 640, n_frames: int = 300,
                               exp_name: str = "synth_rgbd",
                               tuned: bool = True) -> Dict:
    """SyntheticRGBD-recipe config for the NeuralRGBD-format protocol
    (:class:`AnalyticScene` + :func:`make_scan_trajectory` +
    :func:`write_rgbd_format`).

    Applies the reference's SyntheticRGBD training recipe
    (configs/Synthetic/synthetic.yaml): 2048-ray 10-it BA with optim_cur
    on, lr_embed 0.001 (10x lower than Replica's), first_iters 200,
    voxel_sdf 0.01, smooth_weight 1e-5 over 0.1 m voxels, 32+11 samples
    with range_d 0.1, axis-angle pose tangents, rgb_missing 0.05 (the
    simulated sensor's invalid-depth pixels still carry color). With
    ``tuned`` (default) the encoder/sampling stack is the flagship TPU
    operating point (TensoVM 3-level pyramid, 16-sample stratum —
    configs/Replica/room0_vm.yaml rationale; the scene scale and sensor
    match the Replica class). ``tuned=False`` is the reference recipe
    verbatim (HashGrid hash_size 16)."""
    cfg = _base_synth_config(datadir, output, H, W, n_frames, exp_name)
    cfg["dataset"] = "synthetic"
    cfg["cam"].update(png_depth_scale=1000.0, depth_trunc=8.0, far=5)
    cfg["mapping"].update(sample=2048, iters=10, first_iters=200,
                          lr_embed=0.001, optim_cur=True,
                          min_pixels_cur=100)
    cfg["tracking"].update(iter=10, sample=1024, lr_rot=0.001,
                           lr_trans=0.001, ignore_edge_W=20,
                           ignore_edge_H=20, best=True)
    cfg["training"].update(rgb_weight=5.0, depth_weight=0.1,
                           sdf_weight=1000, fs_weight=10,
                           smooth_weight=1e-5, smooth_pts=32,
                           smooth_vox=0.1, smooth_margin=0.05,
                           range_d=0.1, n_range_d=11, trunc=0.1,
                           rot_rep="axis_angle", rgb_missing=0.05)
    cfg["grid"].update(hash_size=16, voxel_color=0.08, voxel_sdf=0.01)
    if tuned:
        cfg["grid"].update(enc="TensoVM", triplane_levels=3)
        cfg["training"].update(n_samples_d=16)
    else:
        cfg["training"].update(n_samples_d=32)
    return cfg


def _base_synth_config(datadir: str, output: str, H: int, W: int,
                       n_frames: int, exp_name: str) -> Dict:
    fx = 0.8 * W
    return {
        "dataset": "replica",
        "data": {"datadir": datadir, "output": output, "exp_name": exp_name,
                 "trainskip": 1, "downsample": 1, "sc_factor": 1,
                 "translation": 0, "num_workers": 0, "n_frames": n_frames},
        "cam": {"H": H, "W": W, "fx": fx, "fy": fx, "cx": (W - 1) / 2.0,
                "cy": (H - 1) / 2.0, "png_depth_scale": 6553.5,
                "crop_edge": 0, "near": 0, "far": 8, "depth_trunc": 100.0},
        "mapping": {
            "sample": 512, "first_mesh": False, "iters": 10,
            "cur_frame_iters": 0, "lr_embed": 0.01, "lr_decoder": 0.01,
            "lr_rot": 0.001, "lr_trans": 0.001, "keyframe_every": 5,
            "map_every": 5, "n_pixels": 0.05, "first_iters": 200,
            "optim_cur": True, "min_pixels_cur": 20, "map_accum_step": 1,
            "pose_accum_step": 5, "map_wait_step": 0, "filter_depth": False,
            "bound": [[-2.5, 2.5], [-2.5, 2.5], [-2.5, 2.5]],
            "marching_cubes_bound": [[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]],
        },
        "tracking": {
            "iter": 10, "sample": 512, "pc_samples": 1024,
            "lr_rot": 0.001, "lr_trans": 0.001, "ignore_edge_W": 4,
            "ignore_edge_H": 4, "iter_point": 0, "wait_iters": 100,
            "const_speed": True, "best": True,
            # Shipped default since r5: the Huber photometric tracking
            # kernel collapses run-to-run ATE spread (room 20%->2.5%,
            # room2 37%->12.4% at unchanged means — BENCH_QUALITY_MULTI)
            # and improves drifted-exposure ATE 17% (FRAME_ALIGN_AB).
            # robust_delta=0 recovers the reference's plain MSE
            # (model/scene_rep.py:319-326).
            "robust_delta": 0.1,
        },
        "grid": {"enc": "HashGrid", "tcnn_encoding": True, "hash_size": 13,
                 "voxel_color": 0.08, "voxel_sdf": 0.04, "oneGrid": True},
        "pos": {"enc": "OneBlob", "n_bins": 16},
        "decoder": {"geo_feat_dim": 15, "hidden_dim": 32, "num_layers": 2,
                    "num_layers_color": 2, "hidden_dim_color": 32,
                    "tcnn_network": False},
        "training": {
            "rgb_weight": 5.0, "depth_weight": 0.1, "sdf_weight": 1000,
            "fs_weight": 10, "eikonal_weight": 0, "smooth_weight": 1e-6,
            "smooth_pts": 8, "smooth_vox": 0.1, "smooth_margin": 0.05,
            "n_samples_d": 32, "range_d": 0.1, "n_range_d": 11,
            "n_importance": 0, "perturb": 1, "white_bkgd": False,
            "trunc": 0.08, "rot_rep": "axis_angle", "rgb_missing": 0.05,
        },
        "mesh": {"resolution": 128, "render_color": False, "vis": 0,
                 "voxel_eval": 0.08, "voxel_final": 0.08,
                 "visualisation": False},
    }
