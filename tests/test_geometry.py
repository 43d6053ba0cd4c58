"""Geometry extraction (scripts/extract_geometry.py) — mesh/ply math.

The reference's geometry tooling stops at viewing mesh FILES
(visualize_nerf/vis_voxel_grid.py); extraction from a trained field is new
surface, so the invariants are tested here: boundary-face meshes must be
closed and consistently oriented, and the auto threshold must follow the
alpha>0.5 crossing rule.
"""

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "extract_geometry", os.path.join(REPO, "scripts", "extract_geometry.py")
)
_geo = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_geo)


def _directed_edges(tris):
    edges = []
    for a, b, c in tris:
        edges += [(a, b), (b, c), (c, a)]
    return edges


def test_single_voxel_mesh_is_a_closed_cube():
    occ = np.zeros((3, 3, 3), dtype=bool)
    occ[1, 1, 1] = True
    verts, tris = _geo.boundary_mesh(occ, lo=np.zeros(3), voxel=1.0)
    assert len(verts) == 8
    assert len(tris) == 12
    # closed, consistently oriented 2-manifold: every directed edge appears
    # exactly once (so every undirected edge is shared by exactly 2 faces
    # with opposite winding)
    edges = _directed_edges(tris)
    assert len(edges) == len(set(edges))
    assert set((b, a) for a, b in edges) == set(edges)
    # the cube spans voxel [1,2]^3
    assert np.allclose(verts.min(axis=0), 1.0)
    assert np.allclose(verts.max(axis=0), 2.0)


def test_two_voxel_block_merges_the_shared_face():
    occ = np.zeros((4, 3, 3), dtype=bool)
    occ[1, 1, 1] = True
    occ[2, 1, 1] = True
    verts, tris = _geo.boundary_mesh(occ, lo=np.zeros(3), voxel=1.0)
    # 2x1x1 block: 10 boundary quads (12 faces - 2 interior), 12 corners
    assert len(verts) == 12
    assert len(tris) == 20
    edges = _directed_edges(tris)
    assert len(edges) == len(set(edges))
    assert set((b, a) for a, b in edges) == set(edges)


def test_outward_orientation_of_a_single_cube():
    occ = np.zeros((3, 3, 3), dtype=bool)
    occ[1, 1, 1] = True
    verts, tris = _geo.boundary_mesh(occ, lo=np.zeros(3), voxel=1.0)
    center = verts.mean(axis=0)
    for a, b, c in tris:
        n = np.cross(verts[b] - verts[a], verts[c] - verts[a])
        face_center = (verts[a] + verts[b] + verts[c]) / 3.0
        assert np.dot(n, face_center - center) > 0  # normals point outward


def test_write_ply_roundtrip(tmp_path):
    pts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
    colors = np.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.25]])
    path = tmp_path / "p.ply"
    _geo.write_ply(str(path), pts, colors)
    lines = path.read_text().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex {len(pts)}" in lines
    body = lines[lines.index("end_header") + 1 :]
    assert len(body) == 2
    x, y, z, r, g, b = body[0].split()
    assert np.allclose([float(x), float(y), float(z)], pts[0])
    assert (int(r), int(g), int(b)) == (255, 0, 127)


def test_auto_threshold_is_alpha_half_crossing():
    # sigma * 4*voxel = ln 2  <=>  1 - exp(-sigma * 4*voxel) = 0.5
    voxel = 0.04
    thr = np.log(2.0) / (4.0 * voxel)
    assert np.isclose(1.0 - np.exp(-thr * 4.0 * voxel), 0.5)
