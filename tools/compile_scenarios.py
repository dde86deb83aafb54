"""Compile panda-gym benchmark scenario assets into flat obstacle tables.

The reference loads each scenario as URDF bodies through PyBullet's C++
parser at env-construction time (ReachAO.setup_benchmark_scenario,
reach_ao.py:292-306, via PyBullet.load_scenario pybullet.py:527-532).  A
TPU-native engine wants static arrays instead, so this offline tool walks a
scenario directory tree (<name>/<name>.json manifest + urdf/ + meshes/) and
emits one JSON with a world-frame axis-aligned box list per scenario:

    {"library": {"boxes": [[cx,cy,cz,hx,hy,hz], ...]}, ...}

Boxes come from URDF <collision> geometries: <box> directly; <mesh> via the
AABB of its (scaled, origin-transformed) OBJ vertices.  Link placement
composes the fixed-joint origin chain, standard URDF semantics.  The meshes
in these assets are almost all 8-vertex cuboids, so the AABB decomposition
is near-exact (multi-link scenes are already one box per board/panel).

Usage:
    python tools/compile_scenarios.py SRC_DIR OUT_JSON
(default: /root/reference/panda_gym/assets/scenarios ->
 panda_gym_tpu/assets/scenarios_compiled.json)
"""
from __future__ import annotations

import json
import math
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np


def rpy_matrix(rpy):
    r, p, y = rpy
    cr, sr = math.cos(r), math.sin(r)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(y), math.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def parse_origin(el):
    if el is None:
        return np.zeros(3), np.eye(3)
    xyz = np.array([float(v) for v in el.get("xyz", "0 0 0").split()])
    rpy = [float(v) for v in el.get("rpy", "0 0 0").split()]
    return xyz, rpy_matrix(rpy)


def load_obj_vertices(path):
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(v) for v in line.split()[1:4]])
    return np.asarray(verts)


def pointsets_from_urdf(urdf_path, base_position, global_scaling=1.0):
    """World-frame collision point clouds, one per <collision> geometry.

    PyBullet loadURDF semantics: globalScaling multiplies joint origins,
    collision origins, and geometry dimensions, but NOT basePosition
    (pybullet.py:518-525 passes the manifest's globalScaling straight to
    loadURDF)."""
    tree = ET.parse(urdf_path)
    robot = tree.getroot()
    urdf_dir = os.path.dirname(urdf_path)
    gs = float(global_scaling)

    # link frame poses from fixed-joint chain (parent assumed at identity /
    # chained), flat scenes: parent almost always "world"/base link.
    link_pose = {}
    links = {l.get("name"): l for l in robot.findall("link")}
    # initialise all links at identity; joints then place children
    for name in links:
        link_pose[name] = (np.zeros(3), np.eye(3))
    joints = robot.findall("joint")
    # iterate a few times to handle chains in arbitrary order
    for _ in range(4):
        for j in joints:
            parent = j.find("parent").get("link")
            child = j.find("child").get("link")
            oxyz, oR = parse_origin(j.find("origin"))
            pp, pR = link_pose.get(parent, (np.zeros(3), np.eye(3)))
            link_pose[child] = (pp + pR @ (gs * oxyz), pR @ oR)

    out = []
    for name, link in links.items():
        lp, lR = link_pose[name]
        for col in link.findall("collision"):
            oxyz, oR = parse_origin(col.find("origin"))
            gp = lp + lR @ (gs * oxyz)
            gR = lR @ oR
            geom = col.find("geometry")
            if geom is None:
                continue
            box = geom.find("box")
            mesh = geom.find("mesh")
            cyl = geom.find("cylinder")
            if box is not None:
                size = gs * np.array([float(v) for v in box.get("size").split()])
                corners = np.array([[sx, sy, sz] for sx in (-1, 1)
                                    for sy in (-1, 1) for sz in (-1, 1)])
                pts = gp + (corners * size / 2) @ gR.T
            elif mesh is not None:
                fn = mesh.get("filename")
                scale = np.array([float(v) for v in
                                  mesh.get("scale", "1 1 1").split()])
                mesh_path = os.path.normpath(os.path.join(urdf_dir, fn))
                if not os.path.exists(mesh_path):
                    print(f"  !! missing mesh {mesh_path}")
                    continue
                verts = load_obj_vertices(mesh_path) * scale * gs
                pts = gp + verts @ gR.T
            elif cyl is not None:
                r = gs * float(cyl.get("radius"))
                l = gs * float(cyl.get("length"))
                corners = np.array([[sx, sy, sz] for sx in (-1, 1)
                                    for sy in (-1, 1) for sz in (-1, 1)])
                pts = gp + (corners * np.array([r, r, l / 2])) @ gR.T
            else:
                continue
            out.append(pts + np.asarray(base_position))
    return out


def boxes_from_urdf(urdf_path, base_position, global_scaling=1.0):
    """World AABB per collision geometry: [cx, cy, cz, hx, hy, hz]."""
    out = []
    for pts in pointsets_from_urdf(urdf_path, base_position, global_scaling):
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        center = (lo + hi) / 2
        half = (hi - lo) / 2
        out.append([*np.round(center, 5).tolist(), *np.round(half, 5).tolist()])
    return out


def aabb_deviation(pts) -> float:
    """Max phantom-collision distance of the AABB vs the source geometry:
    how far an AABB corner sticks out of the convex hull of the collision
    points.  Exactly 0 when the geometry already is an axis-aligned box
    (every AABB corner coincides with a source vertex) — the common case
    here, where the scenario meshes are 8-vertex cuboids (VERDICT r2 #9:
    a rotated collision origin would inflate the AABB; this quantifies it).
    """
    pts = np.asarray(pts, dtype=np.float64)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
    # fast path: every AABB corner is (numerically) a source point
    d2near = ((corners[:, None, :] - pts[None, :, :]) ** 2).sum(-1).min(1)
    if float(d2near.max()) < 1e-10:
        return 0.0
    # general: Euclidean distance from each corner to the convex hull,
    # via projection onto the hull's halfspace intersection (scipy)
    from scipy.optimize import minimize
    from scipy.spatial import ConvexHull
    try:
        hull = ConvexHull(pts)
    except Exception:  # degenerate (planar) clouds: fall back to the bound
        return float(np.sqrt(d2near.max()))
    A, b = hull.equations[:, :3], -hull.equations[:, 3]
    worst = 0.0
    for cpt in corners:
        if (A @ cpt <= b + 1e-9).all():
            continue  # corner inside the hull
        res = minimize(lambda x: ((x - cpt) ** 2).sum(), x0=pts.mean(0),
                       constraints=[{"type": "ineq",
                                     "fun": lambda x: b - A @ x}])
        worst = max(worst, float(np.linalg.norm(res.x - cpt)))
    return worst


def compile_scenario(scenario_dir):
    name = os.path.basename(scenario_dir)
    manifest = os.path.join(scenario_dir, f"{name}.json")
    if not os.path.exists(manifest):
        return None
    with open(manifest) as f:
        bodies = json.load(f)
    boxes = []
    for body_name, spec in bodies.items():
        urdf = os.path.join(scenario_dir, "urdf", spec["fileName"])
        base = spec.get("basePosition", [0, 0, 0])
        gs = float(spec.get("globalScaling", 1.0))
        if not os.path.exists(urdf):
            print(f"  !! missing urdf {urdf}")
            continue
        boxes.extend(boxes_from_urdf(urdf, base, global_scaling=gs))
    return boxes


def scenario_pointsets(scenario_dir):
    """World-frame collision point clouds for every body of a scenario
    (None if the dir has no manifest) — the raw geometry the compiled AABB
    table approximates; consumed by aabb_deviation."""
    name = os.path.basename(scenario_dir)
    manifest = os.path.join(scenario_dir, f"{name}.json")
    if not os.path.exists(manifest):
        return None
    with open(manifest) as f:
        bodies = json.load(f)
    sets = []
    for body_name, spec in bodies.items():
        urdf = os.path.join(scenario_dir, "urdf", spec["fileName"])
        if not os.path.exists(urdf):
            continue
        sets.extend(pointsets_from_urdf(
            urdf, spec.get("basePosition", [0, 0, 0]),
            float(spec.get("globalScaling", 1.0))))
    return sets


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/panda_gym/assets/scenarios"
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(__file__), "..", "panda_gym_tpu",
                     "assets", "scenarios_compiled.json")
    result = {}
    for name in sorted(os.listdir(src)):
        d = os.path.join(src, name)
        if not os.path.isdir(d):
            continue
        boxes = compile_scenario(d)
        if boxes is None:
            print(f"{name}: no manifest, skipped")
            continue
        print(f"{name}: {len(boxes)} boxes")
        result[name] = {"boxes": boxes}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({
            "_provenance": "compiled by tools/compile_scenarios.py from the "
                           "panda-gym scenario URDF/OBJ assets (box-AABB "
                           "decomposition per collision geometry)",
            "scenarios": result,
        }, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
