"""Bullet-equivalent per-link inertia tables from a URDF.

PyBullet's loadURDF IGNORES the URDF <inertia> tensor unless the
URDF_USE_INERTIA_FROM_FILE flag is passed (the reference never passes it:
pybullet.py:518-525 loadURDF forwards no flags).  Bullet instead derives the
local inertia diagonal from the link's *collision shape*:

  * btCompoundShape::calculateLocalInertia (any link whose collisions have
    an origin offset or several blocks — every link of the custom Panda
    URDF): the box-inertia formula over the compound's AABB EXTENTS, with
    the AABB-center offset ignored (Bullet source: "approximation: take
    the inertia from the aabb for now").
  * btPolyhedralConvexShape::calculateLocalInertia (single mesh collision,
    the stock franka_panda/panda.urdf): same box formula over the convex
    hull's AABB, margin-inflated (pybullet's gUrdfDefaultCollisionMargin
    = 0.001).

The resulting diagonal is attached at the URDF inertial origin (CoM), axes
aligned with the inertial frame (rpy = 0 everywhere in both Panda URDFs).

This tool reproduces that computation so the TPU engine's ChainModel runs
the same mass distribution PyBullet actually simulated — the custom URDF's
literal <inertia ixx="0.1" .../> placeholders are ~10-100x too large for
distal links and would make the wrist ~8x too heavy (the reference's golden
link-velocity values, test/pybullet_test.py:156-187, pin this down: the
measured 2.969 rad/s after one capped motor step implies a subtree inertia
of 0.067 kg m^2, not the 0.5+ the placeholder tensors give).

Run:  python tools/bullet_inertia.py <urdf-path>
Prints a python dict: link name -> (ixx, iyy, izz).
"""
from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

# pybullet's gUrdfDefaultCollisionMargin (b3/SharedMemory defaults)
URDF_COLLISION_MARGIN = 0.001


def _rpy_to_mat(rpy):
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    Ry = np.array([[cp, 0, sp], [0, 1.0, 0], [-sp, 0, cp]])
    Rx = np.array([[1.0, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _parse_floats(s, default):
    if s is None:
        return np.asarray(default, dtype=np.float64)
    return np.asarray([float(x) for x in s.split()], dtype=np.float64)


def _obj_vertices(path):
    vs = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                vs.append([float(x) for x in line.split()[1:4]])
    return np.asarray(vs, dtype=np.float64)


def _shape_aabb(geom, urdf_dir, scale=1.0):
    """(center, half_extents) of one collision geometry in its own frame,
    as Bullet's getAabb reports it (box-conservative for cylinders)."""
    m = URDF_COLLISION_MARGIN
    cyl = geom.find("cylinder")
    if cyl is not None:
        r = float(cyl.get("radius"))
        h = float(cyl.get("length")) / 2.0
        return np.zeros(3), np.array([r, r, h])
    sph = geom.find("sphere")
    if sph is not None:
        r = float(sph.get("radius"))
        return np.zeros(3), np.full(3, r)
    box = geom.find("box")
    if box is not None:
        he = _parse_floats(box.get("size"), (0, 0, 0)) / 2.0
        return np.zeros(3), he
    mesh = geom.find("mesh")
    if mesh is not None:
        fn = mesh.get("filename").replace("package://", "")
        v = _obj_vertices(os.path.join(urdf_dir, fn)) * scale
        lo, hi = v.min(0) - m, v.max(0) + m
        return (lo + hi) / 2.0, (hi - lo) / 2.0
    raise ValueError("unsupported collision geometry")


def link_inertia_diagonals(urdf_path):
    """Per-link Bullet-equivalent (ixx, iyy, izz) about the URDF CoM."""
    urdf_dir = os.path.dirname(os.path.abspath(urdf_path))
    root = ET.parse(urdf_path).getroot()
    out = {}
    for link in root.findall("link"):
        name = link.get("name")
        inertial = link.find("inertial")
        mass = 0.0
        if inertial is not None and inertial.find("mass") is not None:
            mass = float(inertial.find("mass").get("value"))
        cols = link.findall("collision")
        if mass == 0.0 or not cols:
            continue
        mins, maxs = [], []
        for c in cols:
            o = c.find("origin")
            off = _parse_floats(None if o is None else o.get("xyz"), (0, 0, 0))
            R = _rpy_to_mat(_parse_floats(None if o is None else o.get("rpy"),
                                          (0, 0, 0)))
            ctr, he = _shape_aabb(c.find("geometry"), urdf_dir)
            # Bullet AABB of a rotated box: |R| @ he around the moved center
            wc = R @ ctr + off
            whe = np.abs(R) @ he
            mins.append(wc - whe)
            maxs.append(wc + whe)
        ext = np.max(maxs, axis=0) - np.min(mins, axis=0)
        # box-inertia over the extents; AABB-center offset ignored (Bullet)
        lx, ly, lz = ext
        out[name] = (mass / 12.0 * (ly * ly + lz * lz),
                     mass / 12.0 * (lx * lx + lz * lz),
                     mass / 12.0 * (lx * lx + ly * ly))
    return out


if __name__ == "__main__":
    path = sys.argv[1]
    table = link_inertia_diagonals(path)
    print("{")
    for k, v in table.items():
        print(f'    "{k}": ({v[0]:.6f}, {v[1]:.6f}, {v[2]:.6f}),')
    print("}")
