"""Software ray-tracing backend with a SAPIEN-compatible API surface.

This image cannot install the ``sapien`` pip package (C++ engine), so the
datagen render loop (``datagen/data_gen.py:render_scene``, mirroring
reference ``datagen/data_gen.py:35-83`` + ``data_utils.py:117-242``) would
otherwise never execute.  This module implements the exact API slice that
loop uses — Engine/SapienRenderer/Scene/URDF loader/camera with
Color/Segmentation/Position textures — on top of a vectorized numpy ray
tracer over URDF box geometry:

  * URDF parsing: links with <visual><geometry><box>/<material><color>,
    revolute/fixed joints with <origin xyz rpy> and <axis>; kinematic
    chain pose composition with per-joint qpos.
  * Rendering: oriented-box slab tests per link, nearest hit wins; flat
    face normals; Lambertian shading from the scene's ambient +
    directional lights; per-face procedural checker texture (modulates the
    link color) so images carry high-frequency detail like real renders.
  * Buffers match SAPIEN semantics where the loop relies on them:
    "Color" float (h, w, 4) in [0, 1]; "Segmentation" uint32 (h, w, 4)
    with the actor/link id in channel 1 (0 = background); "Position"
    float (h, w, 4) camera-frame coordinates with z NEGATIVE forward
    (``depth_to_uint16`` stores -z * 1000).

The camera uses the same OpenGL-style convention as ``look_at_c2w`` and
``aon_tpu/core/rays.py`` (x right, y up, -z forward), so poses flow from
``sample_sphere_points``/``look_at_c2w`` through rendering to
transforms.json with no conversions.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


# ----------------------------------------------------------------- pose math


def _rpy_to_mat(rpy) -> np.ndarray:
    r, p, y = rpy
    cr, sr = math.cos(r), math.sin(r)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(y), math.sin(y)
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return rz @ ry @ rx  # URDF fixed-axis rpy = Rz(y) Ry(p) Rx(r)


def _axis_angle(axis, angle) -> np.ndarray:
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    x, yy, z = a
    c, s = math.cos(angle), math.sin(angle)
    C = 1 - c
    return np.array(
        [
            [x * x * C + c, x * yy * C - z * s, x * z * C + yy * s],
            [yy * x * C + z * s, yy * yy * C + c, yy * z * C - x * s],
            [z * x * C - yy * s, z * yy * C + x * s, z * z * C + c],
        ]
    )


def _tf(rot: np.ndarray, pos) -> np.ndarray:
    t = np.eye(4)
    t[:3, :3] = rot
    t[:3, 3] = pos
    return t


def _origin_tf(el: Optional[ET.Element]) -> np.ndarray:
    if el is None:
        return np.eye(4)
    xyz = [float(v) for v in el.get("xyz", "0 0 0").split()]
    rpy = [float(v) for v in el.get("rpy", "0 0 0").split()]
    return _tf(_rpy_to_mat(rpy), xyz)


class Pose:
    """sapien.Pose stand-in holding a 4x4 transform."""

    def __init__(self, mat: Optional[np.ndarray] = None):
        self.mat = np.eye(4) if mat is None else np.asarray(mat, np.float64)

    @staticmethod
    def from_transformation_matrix(mat) -> "Pose":
        return Pose(np.asarray(mat, np.float64))


# -------------------------------------------------------------------- URDF


@dataclass
class _Box:
    half: np.ndarray  # (3,) half-sizes
    local: np.ndarray  # (4, 4) visual origin in link frame
    color: np.ndarray  # (3,) base color
    link_idx: int = 0
    world: np.ndarray = field(default_factory=lambda: np.eye(4))


@dataclass
class _Joint:
    jtype: str
    origin: np.ndarray
    axis: np.ndarray
    parent: str
    child: str


class KinematicArticulation:
    """Loaded URDF: box visuals + revolute joints, forward kinematics."""

    def __init__(self, urdf_path: str):
        root = ET.parse(urdf_path).getroot()
        self._boxes: List[_Box] = []
        self._link_boxes: Dict[str, List[_Box]] = {}
        link_names = []
        for link in root.findall("link"):
            name = link.get("name")
            link_names.append(name)
            self._link_boxes[name] = []
            for vis in link.findall("visual"):
                geom = vis.find("geometry/box")
                if geom is None:
                    continue
                size = np.array([float(v) for v in geom.get("size").split()])
                color = np.array([0.7, 0.7, 0.7])
                cel = vis.find("material/color")
                if cel is not None:
                    color = np.array(
                        [float(v) for v in cel.get("rgba", "0.7 0.7 0.7 1").split()][:3]
                    )
                box = _Box(half=size / 2.0, local=_origin_tf(vis.find("origin")), color=color)
                self._link_boxes[name].append(box)
                self._boxes.append(box)

        self._joints: List[_Joint] = []
        for j in root.findall("joint"):
            axis_el = j.find("axis")
            axis = (
                np.array([float(v) for v in axis_el.get("xyz").split()])
                if axis_el is not None
                else np.array([1.0, 0.0, 0.0])
            )
            self._joints.append(
                _Joint(
                    jtype=j.get("type", "fixed"),
                    origin=_origin_tf(j.find("origin")),
                    axis=axis,
                    parent=j.find("parent").get("link"),
                    child=j.find("child").get("link"),
                )
            )
        self._movable = [j for j in self._joints if j.jtype in ("revolute", "continuous")]
        children = {j.child for j in self._joints}
        roots = [n for n in link_names if n not in children]
        self._root = roots[0] if roots else link_names[0]
        # stable link index for segmentation ids (root = 1, ...)
        self._link_idx = {n: i + 1 for i, n in enumerate(link_names)}
        for n, boxes in self._link_boxes.items():
            for b in boxes:
                b.link_idx = self._link_idx[n]
        self.dof = len(self._movable)
        self._qpos = np.zeros(self.dof)
        self._update_fk()

    def set_qpos(self, qpos) -> None:
        qpos = np.asarray(qpos, np.float64).reshape(-1)
        assert qpos.shape[0] == self.dof, (qpos.shape, self.dof)
        self._qpos = qpos
        self._update_fk()

    def get_qpos(self) -> np.ndarray:
        return self._qpos.copy()

    def _update_fk(self) -> None:
        poses: Dict[str, np.ndarray] = {self._root: np.eye(4)}
        qmap = {id(j): self._qpos[i] for i, j in enumerate(self._movable)}
        remaining = list(self._joints)
        while remaining:
            progressed = False
            for j in list(remaining):
                if j.parent in poses:
                    motion = np.eye(4)
                    if j.jtype in ("revolute", "continuous"):
                        motion = _tf(_axis_angle(j.axis, qmap[id(j)]), [0, 0, 0])
                    poses[j.child] = poses[j.parent] @ j.origin @ motion
                    remaining.remove(j)
                    progressed = True
            if not progressed:  # disconnected joint — anchor at identity
                j = remaining.pop(0)
                poses[j.child] = np.eye(4)
        for name, boxes in self._link_boxes.items():
            link_pose = poses.get(name, np.eye(4))
            for b in boxes:
                b.world = link_pose @ b.local

    @property
    def boxes(self) -> List[_Box]:
        return self._boxes


class _URDFLoader:
    def __init__(self, scene: "Scene"):
        self._scene = scene
        self.fix_root_link = True

    def load_kinematic(self, path: str) -> KinematicArticulation:
        asset = KinematicArticulation(path)
        self._scene._articulations.append(asset)
        return asset


# ----------------------------------------------------------------- renderer


def _checker(u: np.ndarray, v: np.ndarray, period: float = 0.08) -> np.ndarray:
    """Procedural per-face checker in [0.55, 1.0] — high-frequency texture."""
    c = (np.floor(u / period) + np.floor(v / period)) % 2.0
    return 0.55 + 0.45 * c


class Camera:
    def __init__(self, scene: "Scene", name: str, width: int, height: int,
                 fovy: float, near: float, far: float):
        self._scene = scene
        self.name = name
        self.width, self.height = width, height
        self.fovy, self.near, self.far = fovy, near, far
        self.fy = 0.5 * height / math.tan(0.5 * fovy)
        self.fx = self.fy
        self._pose = Pose()
        self._bufs: Dict[str, np.ndarray] = {}

    def set_pose(self, pose: Pose) -> None:
        self._pose = pose

    def take_picture(self) -> None:
        self._bufs = self._scene._render(self)

    def get_float_texture(self, name: str) -> np.ndarray:
        return self._bufs[name]

    def get_uint32_texture(self, name: str) -> np.ndarray:
        return self._bufs[name]


class Scene:
    def __init__(self):
        self._articulations: List[KinematicArticulation] = []
        self._ambient = np.array([0.3, 0.3, 0.3])
        self._dir_lights: List = []  # (direction, color)

    # --- API slice used by datagen/data_gen.py ---
    def set_timestep(self, dt: float) -> None:
        pass

    def set_ambient_light(self, rgb) -> None:
        self._ambient = np.asarray(rgb, np.float64)

    def add_directional_light(self, direction, color) -> None:
        d = np.asarray(direction, np.float64)
        self._dir_lights.append((d / np.linalg.norm(d), np.asarray(color, np.float64)))

    def create_urdf_loader(self) -> _URDFLoader:
        return _URDFLoader(self)

    def add_camera(self, name, width, height, fovy, near, far) -> Camera:
        return Camera(self, name, width, height, fovy, near, far)

    def step(self) -> None:
        pass

    def update_render(self) -> None:
        pass

    # --- ray tracer ---
    def _render(self, cam: Camera) -> Dict[str, np.ndarray]:
        h, w = cam.height, cam.width
        c2w = cam._pose.mat
        i, j = np.meshgrid(np.arange(w), np.arange(h))
        # same no-half-pixel pinhole convention as core/rays.py
        dirs_cam = np.stack(
            [
                (i - w / 2.0) / cam.fx,
                -(j - h / 2.0) / cam.fy,
                -np.ones_like(i, np.float64),
            ],
            axis=-1,
        ).reshape(-1, 3)
        rd = dirs_cam @ c2w[:3, :3].T
        rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
        ro = np.broadcast_to(c2w[:3, 3], rd.shape)

        n = rd.shape[0]
        best_t = np.full(n, np.inf)
        best_link = np.zeros(n, np.int64)
        best_rgb = np.zeros((n, 3))
        best_pt = np.zeros((n, 3))

        boxes = [b for art in self._articulations for b in art.boxes]
        for box in boxes:
            w2b = np.linalg.inv(box.world)
            o = ro @ w2b[:3, :3].T + w2b[:3, 3]
            d = rd @ w2b[:3, :3].T
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = 1.0 / d
                t0 = (-box.half - o) * inv
                t1 = (box.half - o) * inv
            tn = np.nanmax(np.minimum(t0, t1), axis=-1)
            tf = np.nanmin(np.maximum(t0, t1), axis=-1)
            hit = (tf >= np.maximum(tn, cam.near)) & (tn < best_t) & (tn > cam.near)
            if not hit.any():
                continue
            t_hit = tn[hit]
            p_local = o[hit] + t_hit[:, None] * d[hit]
            # face: axis where |p| ~ half-size
            rel = np.abs(np.abs(p_local) - box.half)
            face_ax = np.argmin(rel, axis=-1)
            normal_local = np.zeros_like(p_local)
            rows = np.arange(p_local.shape[0])
            normal_local[rows, face_ax] = np.sign(p_local[rows, face_ax])
            normal_w = normal_local @ box.world[:3, :3].T
            # per-face uv from the two non-normal axes
            uvw = p_local + box.half  # in [0, 2*half]
            uv_axes = np.stack([(face_ax + 1) % 3, (face_ax + 2) % 3], axis=-1)
            u = uvw[rows, uv_axes[:, 0]]
            v = uvw[rows, uv_axes[:, 1]]
            tex = _checker(u, v)[:, None]

            shade = np.broadcast_to(self._ambient, normal_w.shape).copy()
            for ldir, lcol in self._dir_lights:
                lam = np.maximum(0.0, -(normal_w @ ldir))
                shade = shade + lam[:, None] * lcol
            rgb = np.clip(box.color * tex * shade, 0.0, 1.0)

            best_t[hit] = t_hit
            best_link[hit] = box.link_idx
            best_rgb[hit] = rgb
            best_pt[hit] = p_local @ box.world[:3, :3].T + box.world[:3, 3]

        hit_any = np.isfinite(best_t)
        color = np.zeros((n, 4), np.float32)
        color[:, 3] = 1.0
        color[hit_any, :3] = best_rgb[hit_any].astype(np.float32)

        seg = np.zeros((n, 4), np.uint32)
        seg[:, 1] = best_link.astype(np.uint32)

        # camera-frame position (z negative forward), background z = 0
        w2c = np.linalg.inv(c2w)
        pos_cam = best_pt @ w2c[:3, :3].T + w2c[:3, 3]
        position = np.zeros((n, 4), np.float32)
        position[hit_any, :3] = pos_cam[hit_any].astype(np.float32)

        return {
            "Color": color.reshape(h, w, 4),
            "Segmentation": seg.reshape(h, w, 4),
            "Position": position.reshape(h, w, 4),
        }


class SapienRenderer:
    def __init__(self, offscreen_only: bool = True):
        pass


class Engine:
    def __init__(self):
        self._renderer: Optional[SapienRenderer] = None

    def set_renderer(self, renderer: SapienRenderer) -> None:
        self._renderer = renderer

    def create_scene(self) -> Scene:
        return Scene()
