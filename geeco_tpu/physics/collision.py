"""Narrowphase collision: fixed-size contact set from static pair lists.

The pair list is enumerated at model-compile time (core/mjcf.py col_pairs) —
the TPU-native replacement for a runtime broadphase: every candidate pair is
evaluated every step with vectorized type-grouped kernels, and activation is
a mask (dist < 0).  All shapes are static; `vmap` batches over envs.

Contact conventions:
  * `normal` points from geom1 toward geom2 (positive force separates).
  * `dist` is the signed gap (negative = penetrating).
  * Each pair emits a fixed number of candidate points (masked when inactive):
      plane-box 8, plane-capsule 2, capsule-box 3, box-box 8, others 1.

Supported type pairs cover every geom combination in the GEECO scenes
(boxes/planes everywhere; spheres/capsules/ellipsoids in the clutter scenes,
reference: assets/gym/envs/geeco-pad2-cube2-clutter12.xml:71-140).  Mesh
task objects collide via their padded convex hulls built at compile time
(core/mjcf.py build_hull; plane/sphere/capsule/box/hull-vs-hull kernels
below, with face + edge-edge SAT axes for box/hull pairs).  Ellipsoids use
a min-radius bounding sphere refined to the exact support radius along the
contact normal (`_ellipsoid_support_fix`; plane contact is exact).
Cylinders are exact against planes (`plane_cylinder`) and treated as
capsules elsewhere.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as gm
from ..core.model import (BOX, CAPSULE, CYLINDER, ELLIPSOID, Kin, MESH, Model,
                          PLANE, SPHERE)

# points emitted per (type1, type2) pair kernel
_POINTS = {
    (PLANE, SPHERE): 1, (PLANE, CAPSULE): 2, (PLANE, ELLIPSOID): 1,
    (PLANE, CYLINDER): 4, (PLANE, BOX): 8,
    (SPHERE, SPHERE): 1, (SPHERE, CAPSULE): 1, (SPHERE, ELLIPSOID): 1,
    (SPHERE, BOX): 1, (SPHERE, CYLINDER): 1,
    (CAPSULE, CAPSULE): 1, (CAPSULE, ELLIPSOID): 1, (CAPSULE, BOX): 3,
    (CAPSULE, CYLINDER): 1, (CYLINDER, BOX): 3, (CYLINDER, CYLINDER): 1,
    (CYLINDER, ELLIPSOID): 1,
    (ELLIPSOID, ELLIPSOID): 1, (ELLIPSOID, BOX): 1,
    (BOX, BOX): 8,
    # mesh (convex hull) narrowphase
    (PLANE, MESH): 4, (SPHERE, MESH): 1, (ELLIPSOID, MESH): 1,
    (CAPSULE, MESH): 3, (CYLINDER, MESH): 3, (BOX, MESH): 6,
    (MESH, MESH): 6,
}


class Contacts(NamedTuple):
  pos: jax.Array      # [ncon, 3]
  normal: jax.Array   # [ncon, 3] from geom1 -> geom2
  dist: jax.Array     # [ncon]
  # static row metadata (numpy, identical across envs)
  geom1: np.ndarray   # [ncon] int
  geom2: np.ndarray   # [ncon] int


def ncon_max(model: Model) -> int:
  total = 0
  for (t1, t2), pairs in model.col_pairs:
    total += _POINTS[(t1, t2)] * len(pairs)
  return total


# ---------------------------------------------------------------------------
# primitive helpers
# ---------------------------------------------------------------------------

_CORNERS = jnp.asarray(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    jnp.float32)  # [8, 3]


def _sphere_radius(gtype: int, size):
  if gtype == ELLIPSOID:
    return jnp.min(size)
  return size[0]


def _capsule_segment(pos, quat, size):
  """World-space endpoints of capsule/cylinder axis segment."""
  axis = gm.quat_rotate(quat, jnp.array([0.0, 0.0, 1.0]))
  return pos - size[1] * axis, pos + size[1] * axis


def _closest_on_segment(a, b, p):
  ab = b - a
  t = jnp.clip(jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12),
               0.0, 1.0)
  return a + t * ab


def _closest_segment_segment(p1, q1, p2, q2):
  """Closest points between segments (Ericson, branch-free)."""
  d1, d2 = q1 - p1, q2 - p2
  r = p1 - p2
  a = jnp.dot(d1, d1)
  e = jnp.dot(d2, d2)
  f = jnp.dot(d2, r)
  c = jnp.dot(d1, r)
  b = jnp.dot(d1, d2)
  denom = a * e - b * b
  s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(
      denom, 1e-12), 0.0, 1.0), 0.0)
  t = (b * s + f) / jnp.maximum(e, 1e-12)
  t_cl = jnp.clip(t, 0.0, 1.0)
  s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
  return p1 + s * d1, p2 + t_cl * d2


# ---------------------------------------------------------------------------
# pair kernels: (pos1, quat1, size1, pos2, quat2, size2) -> (pos, n, dist)
# each returns arrays with leading axis = points-per-pair
# ---------------------------------------------------------------------------


def _plane_frame(pos, quat):
  n = gm.quat_rotate(quat, jnp.array([0.0, 0.0, 1.0]))
  return pos, n


def plane_sphere(p1, q1, s1, p2, q2, s2, t2):
  pp, n = _plane_frame(p1, q1)
  r = _sphere_radius(t2, s2)
  d = jnp.dot(p2 - pp, n) - r
  pos = p2 - (r + 0.5 * d) * n
  return pos[None], n[None], d[None]


def plane_ellipsoid(p1, q1, s1, p2, q2, s2):
  pp, n = _plane_frame(p1, q1)
  R2 = gm.quat_to_mat(q2)
  # support of ellipsoid along -n
  nl = R2.T @ n
  denom = jnp.linalg.norm(s2 * nl) + 1e-12
  sup_local = -(s2 * s2 * nl) / denom
  sup = p2 + R2 @ sup_local
  d = jnp.dot(sup - pp, n)
  return sup[None], n[None], d[None]


def plane_capsule(p1, q1, s1, p2, q2, s2):
  pp, n = _plane_frame(p1, q1)
  a, b = _capsule_segment(p2, q2, s2)
  r = s2[0]
  da = jnp.dot(a - pp, n) - r
  db = jnp.dot(b - pp, n) - r
  pa = a - (r + 0.5 * da) * n
  pb = b - (r + 0.5 * db) * n
  return jnp.stack([pa, pb]), jnp.stack([n, n]), jnp.stack([da, db])


def plane_cylinder(p1, q1, s1, p2, q2, s2):
  """Exact cylinder support vs plane (the capsule approximation floats a
  standing cylinder by its radius).  4 candidate points: a rim tripod on
  the deeper end (stable face rest) plus the matching rim point on the
  other end (line rest when lying)."""
  pp, n = _plane_frame(p1, q1)
  axis = gm.quat_rotate(q2, jnp.array([0.0, 0.0, 1.0]))
  r, h = s2[0], s2[1]
  ca = jnp.dot(axis, n)
  # radial direction toward the plane, orthogonal to the axis
  _, rad = gm.norm_safe(-(n - ca * axis))
  end_deep = p2 - jnp.sign(ca) * h * axis
  end_far = p2 + jnp.sign(ca) * h * axis
  # rim tripod on the deep end: rad rotated 0 / +120 / -120 deg about axis
  c120, s120 = -0.5, jnp.sqrt(3.0) / 2
  t1v = rad * c120 + jnp.cross(axis, rad) * s120
  t2v = rad * c120 - jnp.cross(axis, rad) * s120
  pts = jnp.stack([end_deep + r * rad, end_far + r * rad,
                   end_deep + r * t1v, end_deep + r * t2v])
  d = (pts - pp) @ n
  return pts, jnp.broadcast_to(n, (4, 3)), d


def plane_box(p1, q1, s1, p2, q2, s2):
  pp, n = _plane_frame(p1, q1)
  corners = p2 + (_CORNERS * s2) @ gm.quat_to_mat(q2).T
  d = (corners - pp) @ n
  normals = jnp.broadcast_to(n, (8, 3))
  return corners, normals, d


def sphere_sphere(p1, q1, s1, p2, q2, s2, t1=SPHERE, t2=SPHERE):
  r1, r2 = _sphere_radius(t1, s1), _sphere_radius(t2, s2)
  dvec = p2 - p1
  dist, n = gm.norm_safe(dvec)
  d = dist - r1 - r2
  pos = p1 + n * (r1 + 0.5 * d)
  return pos[None], n[None], d[None]


def sphere_capsule(p1, q1, s1, p2, q2, s2, t1=SPHERE):
  r1 = _sphere_radius(t1, s1)
  a, b = _capsule_segment(p2, q2, s2)
  c = _closest_on_segment(a, b, p1)
  dvec = c - p1
  dist, n = gm.norm_safe(dvec)
  d = dist - r1 - s2[0]
  pos = p1 + n * (r1 + 0.5 * d)
  return pos[None], n[None], d[None]


def capsule_capsule(p1, q1, s1, p2, q2, s2):
  a1, b1 = _capsule_segment(p1, q1, s1)
  a2, b2 = _capsule_segment(p2, q2, s2)
  c1, c2 = _closest_segment_segment(a1, b1, a2, b2)
  dvec = c2 - c1
  dist, n = gm.norm_safe(dvec)
  d = dist - s1[0] - s2[0]
  pos = c1 + n * (s1[0] + 0.5 * d)
  return pos[None], n[None], d[None]


def _sphere_box_one(center, r, pbox, qbox, sbox):
  Rb = gm.quat_to_mat(qbox)
  local = Rb.T @ (center - pbox)
  clamped = jnp.clip(local, -sbox, sbox)
  delta = local - clamped
  dist_out = jnp.linalg.norm(delta)
  outside = dist_out > 1e-9
  # outside: normal from surface point to center
  n_out = delta / jnp.maximum(dist_out, 1e-9)
  # inside: push along axis of least depth
  depth_ax = sbox - jnp.abs(local)
  ax = jnp.argmin(depth_ax)
  sign = jnp.sign(local[ax] + 1e-12)
  n_in = jnp.zeros(3).at[ax].set(sign)
  d = jnp.where(outside, dist_out - r, -(depth_ax[ax] + r))
  n_local = jnp.where(outside, n_out, n_in)
  n_world = Rb @ n_local
  surf = pbox + Rb @ jnp.clip(local - n_local * 1e9, -sbox, sbox)  # unused
  pos = center - n_world * (r + 0.5 * d)
  # normal convention: from box toward sphere is +n_world; caller flips
  return pos, n_world, d


def sphere_box(p1, q1, s1, p2, q2, s2, t1=SPHERE):
  r1 = _sphere_radius(t1, s1)
  pos, n_box2sph, d = _sphere_box_one(p1, r1, p2, q2, s2)
  # normal must point geom1(sphere) -> geom2(box)
  return pos[None], (-n_box2sph)[None], d[None]


def capsule_box(p1, q1, s1, p2, q2, s2):
  a, b = _capsule_segment(p1, q1, s1)
  r = s1[0]
  pts = jnp.stack([a, 0.5 * (a + b), b])
  pos, n, d = jax.vmap(lambda c: _sphere_box_one(c, r, p2, q2, s2))(pts)
  return pos, -n, d


# ---------------------------------------------------------------------------
# convex-hull kernels (mesh narrowphase)
#
# Hulls are padded (vert [HV,3] + vmask, face [HF,4] half-spaces n·x <= off
# + fmask) in the geom frame (core/mjcf.py build_hull).  phi(x) =
# max_f (n_f·x - off_f) is the exact signed distance inside and a lower
# bound outside — sufficient for contact generation at the shallow
# penetrations the soft-constraint solver operates at.  Contacts are
# vertex-vs-face both ways (edge-edge pairs are approximated by the
# nearest vertex candidates; the reference mesh tasks rest mesh objects
# on/around each other where vertex-face dominates).
# ---------------------------------------------------------------------------


def _hull_phi_normal(pt_local, hf, hfm):
  """Signed distance proxy and outward face normal at a local point."""
  d = hf[:, :3] @ pt_local - hf[:, 3]
  d = jnp.where(hfm > 0.5, d, -1e9)
  i = jnp.argmax(d)
  return d[i], hf[i, :3]


def plane_hull(p1, q1, s1, p2, q2, hv2, hvm2):
  """Plane (geom1) vs hull (geom2): 4 deepest vertices."""
  pp, n = _plane_frame(p1, q1)
  w = p2 + hv2 @ gm.quat_to_mat(q2).T            # [HV, 3] world verts
  d = (w - pp) @ n
  d = jnp.where(hvm2 > 0.5, d, 1e9)
  neg, idx = jax.lax.top_k(-d, 4)
  return w[idx], jnp.broadcast_to(n, (4, 3)), -neg


def _sphere_hull_one(center, r, p2, q2, hf2, hfm2):
  """Sphere-ish point (radius r) vs hull; returns (pos, n12, d)."""
  R2 = gm.quat_to_mat(q2)
  local = R2.T @ (center - p2)
  phi, nloc = _hull_phi_normal(local, hf2, hfm2)
  n_out = R2 @ nloc                              # hull -> sphere direction
  d = phi - r
  pos = center - n_out * (r + 0.5 * d)
  return pos, -n_out, d                          # normal geom1 -> geom2


def sphere_hull(p1, q1, s1, p2, q2, hf2, hfm2, t1=SPHERE):
  r = _sphere_radius(t1, s1)
  pos, n, d = _sphere_hull_one(p1, r, p2, q2, hf2, hfm2)
  return pos[None], n[None], d[None]


def capsule_hull(p1, q1, s1, p2, q2, hf2, hfm2):
  a, b = _capsule_segment(p1, q1, s1)
  pts = jnp.stack([a, 0.5 * (a + b), b])
  return jax.vmap(
      lambda c: _sphere_hull_one(c, s1[0], p2, q2, hf2, hfm2))(pts)


def hull_hull(p1, q1, hv1, hvm1, hf1, hfm1, he1, hem1,
              p2, q2, hv2, hvm2, hf2, hfm2, he2, hem2, npts: int = 6):
  """Hull vs hull: face + edge-edge SAT, deepest-vertex manifold.

  Separating axes are the face normals of both hulls plus the cross
  products of their unique edge directions (he*/hem*, precomputed at model
  compile — core/mjcf.py hull_edge_dirs).  When a face axis wins, the
  manifold is the npts deepest vertices of the other hull along it; when
  an edge-edge axis wins, the single closest-point contact between the two
  supporting edges is emitted (reference scenes hit this when mesh objects
  cross at an angle, e.g. the nut sliding over the cone rim).
  """
  R1 = gm.quat_to_mat(q1)
  R2 = gm.quat_to_mat(q2)
  w1 = p1 + hv1 @ R1.T                           # [HV, 3]
  w2 = p2 + hv2 @ R2.T

  big = 1e9
  # --- axes from A's faces (outward of A; candidate verts are B's)
  nA = hf1[:, :3] @ R1.T                         # [F1, 3] world
  supA = hf1[:, 3] + nA @ p1                     # support plane value
  projA = w2 @ nA.T                              # [HV2, F1]
  projA = jnp.where(hvm2[:, None] > 0.5, projA, big)
  sepA = jnp.min(projA, axis=0) - supA           # [F1]
  sepA = jnp.where(hfm1 > 0.5, sepA, -big)

  # --- axes from B's faces (outward of B; candidate verts are A's)
  nB = hf2[:, :3] @ R2.T                         # [F2, 3]
  supB = hf2[:, 3] + nB @ p2
  projB = w1 @ nB.T                              # [HV1, F2]
  projB = jnp.where(hvm1[:, None] > 0.5, projB, big)
  sepB = jnp.min(projB, axis=0) - supB           # [F2]
  sepB = jnp.where(hfm2 > 0.5, sepB, -big)

  # --- edge-edge cross axes
  e1w = he1 @ R1.T                               # [E1, 3] world
  e2w = he2 @ R2.T                               # [E2, 3]
  E2 = e2w.shape[0]
  cr = jnp.cross(e1w[:, None, :], e2w[None, :, :]).reshape(-1, 3)
  nrm = jnp.linalg.norm(cr, axis=-1)
  ok = ((hem1[:, None] * hem2[None, :]).reshape(-1) > 0.5) & (nrm > 1e-6)
  ax = cr / jnp.maximum(nrm, 1e-6)[:, None]      # [A, 3]
  sgn = jnp.where(ax @ (p2 - p1) < 0, -1.0, 1.0)
  ax = ax * sgn[:, None]                         # oriented hull1 -> hull2
  prE1 = jnp.where(hvm1[:, None] > 0.5, w1 @ ax.T, -big)  # [HV1, A]
  prE2 = jnp.where(hvm2[:, None] > 0.5, w2 @ ax.T, big)   # [HV2, A]
  sepE = jnp.min(prE2, axis=0) - jnp.max(prE1, axis=0)    # [A]
  sepE = jnp.where(ok, sepE, -big)

  F1 = sepA.shape[0]
  F12 = F1 + sepB.shape[0]
  sep = jnp.concatenate([sepA, sepB, sepE])
  best = jnp.argmax(sep)
  is_ee = best >= F12
  from_a = best < F1
  iA = jnp.clip(best, 0, F1 - 1)
  iB = jnp.clip(best - F1, 0, sepB.shape[0] - 1)
  iE = jnp.clip(best - F12, 0, sepE.shape[0] - 1)

  # per-vertex depth along the best axis, with a lateral gate: the
  # candidate must lie (loosely) inside the other hull's remaining
  # half-spaces, else a long body's far corners would fake contacts
  lat_tol = 0.03
  colsA = jax.lax.broadcasted_iota(jnp.int32, projA.shape, 1)
  latA = jnp.max(jnp.where((colsA == iA) | (hfm1[None, :] < 0.5),
                           -big, projA - supA[None, :]), axis=1)
  dA = jnp.where(latA < lat_tol, projA[:, iA] - supA[iA], big)
  colsB = jax.lax.broadcasted_iota(jnp.int32, projB.shape, 1)
  latB = jnp.max(jnp.where((colsB == iB) | (hfm2[None, :] < 0.5),
                           -big, projB - supB[None, :]), axis=1)
  dB = jnp.where(latB < lat_tol, projB[:, iB] - supB[iB], big)
  dd = jnp.where(from_a, dA, dB)                 # [HV] (HV1 == HV2)
  pos = jnp.where(from_a, w2, w1)
  n12 = jnp.where(from_a, nA[iA], -nB[iB])       # geom1 -> geom2

  neg, idx = jax.lax.top_k(-dd, npts)
  d_out = -neg
  n_out = jnp.broadcast_to(n12, (npts, 3))
  pos_out = pos[idx] - n_out * 0.5 * d_out[:, None]  # midpoint of overlap

  # --- edge-edge winner: one contact at the closest point between the two
  # supporting edges (lines through the support vertices along the winning
  # directions); rows 1.. are deactivated.
  d1 = e1w[iE // E2]
  d2 = e2w[iE % E2]
  v1 = w1[jnp.argmax(prE1[:, iE])]
  v2 = w2[jnp.argmin(prE2[:, iE])]
  r12 = v2 - v1
  b = d1 @ d2
  den = 1.0 - b * b
  safe = jnp.abs(den) > 1e-9
  t = jnp.where(safe, (r12 @ d1 - b * (r12 @ d2)) /
                jnp.where(safe, den, 1.0), 0.0)
  s = jnp.where(safe, (b * (r12 @ d1) - r12 @ d2) /
                jnp.where(safe, den, 1.0), 0.0)
  pos_ee = 0.5 * (v1 + t * d1 + v2 + s * d2)
  d_ee = jnp.concatenate([sepE[iE][None], jnp.full((npts - 1,), big)])
  d_out = jnp.where(is_ee, d_ee, d_out)
  n_out = jnp.where(is_ee, jnp.broadcast_to(ax[iE], (npts, 3)), n_out)
  pos_out = jnp.where(is_ee, jnp.broadcast_to(pos_ee, (npts, 3)), pos_out)
  return pos_out, n_out, d_out


_BOX_FACES = np.concatenate([np.eye(3), -np.eye(3)]).astype(np.float32)


def _box_as_hull(s, vmax: int):
  """Box half-size -> hull arrays padded to vmax verts (8 real, 6 faces,
  3 edge directions).

  Vertex padding matches the mesh hull vertex budget because hull_hull
  selects candidate positions with a vertex-aligned where(from_a, w2, w1).
  """
  hv = jnp.zeros((vmax, 3)).at[:8].set(_CORNERS * s)
  hvm = jnp.zeros(vmax).at[:8].set(1.0)
  off = jnp.concatenate([s, s])
  hf = jnp.concatenate([jnp.asarray(_BOX_FACES), off[:, None]], axis=1)
  hfm = jnp.ones(6)
  he = jnp.eye(3)
  hem = jnp.ones(3)
  return hv, hvm, hf, hfm, he, hem


def box_hull(p1, q1, s1, p2, q2, hv2, hvm2, hf2, hfm2, he2, hem2):
  bv, bvm, bf, bfm, be, bem = _box_as_hull(s1, hv2.shape[0])
  return hull_hull(p1, q1, bv, bvm, bf, bfm, be, bem,
                   p2, q2, hv2, hvm2, hf2, hfm2, he2, hem2, npts=6)


def box_box(p1, q1, s1, p2, q2, s2):
  """SAT + corner-candidate manifold, up to 8 points."""
  R1 = gm.quat_to_mat(q1)
  R2 = gm.quat_to_mat(q2)
  dvec = p2 - p1

  # 15 candidate axes
  axes = [R1[:, i] for i in range(3)] + [R2[:, i] for i in range(3)]
  for i in range(3):
    for j in range(3):
      cr = jnp.cross(R1[:, i], R2[:, j])
      nrm = jnp.linalg.norm(cr)
      # degenerate (parallel edges): substitute face axis so SAT unaffected
      axes.append(jnp.where(nrm > 1e-6, cr / jnp.maximum(nrm, 1e-6),
                            R1[:, 0]))
  A = jnp.stack(axes)  # [15, 3]

  ext1 = jnp.abs(A @ R1) @ s1  # [15] support extent of box1 per axis
  ext2 = jnp.abs(A @ R2) @ s2
  proj = A @ dvec
  sep = jnp.abs(proj) - ext1 - ext2  # separation per axis (neg = overlap)

  best = jnp.argmax(sep)
  sep_max = sep[best]
  n = A[best] * jnp.sign(proj[best] + 1e-12)  # oriented box1 -> box2

  # candidate contacts: corners of each box beyond the other's support plane
  c1 = p1 + (_CORNERS * s1) @ R1.T  # [8, 3]
  c2 = p2 + (_CORNERS * s2) @ R2.T
  # plane through A's support face along n: x·n = p1·n + ext1(n)
  ext1n = jnp.abs(n @ R1) @ s1
  ext2n = jnp.abs(n @ R2) @ s2
  d_c2 = (c2 - p1) @ n - ext1n            # B corners beyond A's face (neg)
  d_c1 = (p2 @ n - ext2n) - c1 @ n        # A corners beyond B's face (neg)

  cand_pos = jnp.concatenate([c2, c1], axis=0)        # [16, 3]
  cand_d = jnp.concatenate([d_c2, d_c1], axis=0)      # [16]
  # lateral pruning: candidate must lie (loosely) inside the other box
  tol = 1.5
  l2 = jnp.abs((c2 - p1) @ R1) - tol * s1             # in box1 frame
  inside2 = jnp.max(l2, axis=-1) < 0.05
  l1 = jnp.abs((c1 - p2) @ R2) - tol * s2
  inside1 = jnp.max(l1, axis=-1) < 0.05
  lateral_ok = jnp.concatenate([inside2, inside1])
  cand_d = jnp.where(lateral_ok, cand_d, 1.0)

  # separated -> deactivate all
  cand_d = jnp.where(sep_max < 0, cand_d, jnp.maximum(cand_d, 1.0))
  # keep 8 deepest
  neg_d, idx = jax.lax.top_k(-cand_d, 8)
  pos8 = cand_pos[idx]
  d8 = -neg_d
  n8 = jnp.broadcast_to(n, (8, 3))

  # edge-edge winner (axes 6..14): no corner lies near the contact, so the
  # corner-candidate manifold above is empty there — emit the closest-point
  # contact between the two supporting edges instead
  is_ee = best >= 6
  ei = jnp.maximum(best - 6, 0)
  i1, i2 = ei // 3, ei % 3
  d1 = jnp.take(R1, i1, axis=1)
  d2 = jnp.take(R2, i2, axis=1)
  ar = jnp.arange(3)
  sgn1 = jnp.where(ar == i1, 0.0, jnp.sign(n @ R1))
  sgn2 = jnp.where(ar == i2, 0.0, jnp.sign(-(n @ R2)))
  v1 = p1 + R1 @ (sgn1 * s1)   # a point on box1's supporting edge
  v2 = p2 + R2 @ (sgn2 * s2)
  r12 = v2 - v1
  bb = d1 @ d2
  den = 1.0 - bb * bb
  safe = jnp.abs(den) > 1e-9
  t = jnp.where(safe, (r12 @ d1 - bb * (r12 @ d2)) /
                jnp.where(safe, den, 1.0), 0.0)
  s = jnp.where(safe, (bb * (r12 @ d1) - r12 @ d2) /
                jnp.where(safe, den, 1.0), 0.0)
  pos_ee = 0.5 * (v1 + t * d1 + v2 + s * d2)
  d_ee = jnp.concatenate([sep_max[None], jnp.ones(7)])
  d8 = jnp.where(is_ee, d_ee, d8)
  pos8 = jnp.where(is_ee, jnp.broadcast_to(pos_ee, (8, 3)), pos8)
  return pos8, n8, d8


def _ellipsoid_support_fix(q, s, n_pts, d_pts):
  """Bounding-sphere -> support-radius correction along the contact normal.

  The generic kernels treat an ellipsoid as its min-radius bounding
  sphere; the true surface extends to h(n) = |diag(s) n| along the contact
  normal (exact for face/plane-like contacts, first-order for
  curved-curved).  h is even in n, so normal orientation is irrelevant.
  """
  l = jax.vmap(lambda v: gm.quat_rotate_inv(q, v))(n_pts)
  r_eff = jnp.sqrt(jnp.sum((s * l) ** 2, axis=-1))
  return d_pts + jnp.min(s) - r_eff


# dispatcher: (t1, t2) -> kernel(p1,q1,s1,p2,q2,s2)
def _kernel(t1: int, t2: int):
  t1c = CAPSULE if t1 == CYLINDER else t1
  t2c = CAPSULE if t2 == CYLINDER else t2
  if t1c == PLANE:
    if t2c == SPHERE:
      return lambda *a: plane_sphere(*a, t2=t2)
    if t2 == CYLINDER:
      return plane_cylinder
    if t2c == CAPSULE:
      return plane_capsule
    if t2c == ELLIPSOID:
      return plane_ellipsoid
    if t2c == BOX:
      return plane_box
  if t1c == SPHERE or t1c == ELLIPSOID:
    if t2c in (SPHERE, ELLIPSOID):
      return lambda *a: sphere_sphere(*a, t1=t1, t2=t2)
    if t2c == CAPSULE:
      return lambda *a: sphere_capsule(*a, t1=t1)
    if t2c == BOX:
      return lambda *a: sphere_box(*a, t1=t1)
  if t1c == CAPSULE:
    if t2c == CAPSULE:
      return capsule_capsule
    if t2c == ELLIPSOID:
      # flip: sphere(ellipsoid)-capsule with negated normal
      def k(p1, q1, s1, p2, q2, s2):
        pos, n, d = sphere_capsule(p2, q2, s2, p1, q1, s1, t1=ELLIPSOID)
        return pos, -n, d
      return k
    if t2c == BOX:
      return capsule_box
  if t1c == BOX and t2c == BOX:
    return box_box
  raise NotImplementedError(f'collision kernel ({t1}, {t2})')


# ---------------------------------------------------------------------------
# top-level collide
# ---------------------------------------------------------------------------


def _hull_args(model: Model, geoms: np.ndarray):
  hid = np.asarray([model.geom_hullid[g] for g in geoms], np.int32)
  return (model.hull_vert[hid], model.hull_vmask[hid],
          model.hull_face[hid], model.hull_fmask[hid],
          model.hull_edge[hid], model.hull_emask[hid])


def collide(model: Model, kin: Kin) -> Contacts:
  """Evaluate all static pairs; returns fixed-size contact arrays."""
  all_pos, all_n, all_d = [], [], []
  geom1_rows, geom2_rows = [], []
  # one pose/size gather over ALL pairs, sliced per group below — per-group
  # gathers were ~6 unfusable ops x groups on the dispatch-bound substep
  G1 = np.concatenate([[p[0] for p in pairs]
                       for _, pairs in model.col_pairs]).astype(np.int32) \
      if model.col_pairs else np.zeros(0, np.int32)
  G2 = np.concatenate([[p[1] for p in pairs]
                       for _, pairs in model.col_pairs]).astype(np.int32) \
      if model.col_pairs else np.zeros(0, np.int32)
  P1a, Q1a, S1a = kin.geom_xpos[G1], kin.geom_xquat[G1], model.geom_size[G1]
  P2a, Q2a, S2a = kin.geom_xpos[G2], kin.geom_xquat[G2], model.geom_size[G2]
  off = 0
  for (t1, t2), pairs in model.col_pairs:
    npts = _POINTS[(t1, t2)]
    g1 = np.asarray([p[0] for p in pairs], np.int32)
    g2 = np.asarray([p[1] for p in pairs], np.int32)
    sl = slice(off, off + len(pairs))
    off += len(pairs)
    p1, q1, s1 = P1a[sl], Q1a[sl], S1a[sl]
    p2, q2, s2 = P2a[sl], Q2a[sl], S2a[sl]
    if t2 == MESH:
      hv2, hvm2, hf2, hfm2, he2, hem2 = _hull_args(model, g2)
      t1c = CAPSULE if t1 == CYLINDER else t1
      if t1 == MESH:
        hv1, hvm1, hf1, hfm1, he1, hem1 = _hull_args(model, g1)
        pos, n, d = jax.vmap(hull_hull)(p1, q1, hv1, hvm1, hf1, hfm1,
                                        he1, hem1,
                                        p2, q2, hv2, hvm2, hf2, hfm2,
                                        he2, hem2)
      elif t1c == PLANE:
        pos, n, d = jax.vmap(plane_hull)(p1, q1, s1, p2, q2, hv2, hvm2)
      elif t1c in (SPHERE, ELLIPSOID):
        pos, n, d = jax.vmap(
            lambda *a: sphere_hull(*a, t1=t1))(p1, q1, s1, p2, q2,
                                               hf2, hfm2)
      elif t1c == CAPSULE:
        pos, n, d = jax.vmap(capsule_hull)(p1, q1, s1, p2, q2, hf2, hfm2)
      elif t1c == BOX:
        pos, n, d = jax.vmap(box_hull)(p1, q1, s1, p2, q2,
                                       hv2, hvm2, hf2, hfm2, he2, hem2)
      else:
        raise NotImplementedError(f'mesh collision vs type {t1}')
    else:
      kern = _kernel(t1, t2)
      pos, n, d = jax.vmap(kern)(p1, q1, s1, p2, q2, s2)  # [P, npts, ...]
    # ellipsoids: upgrade the bounding-sphere distance to the exact
    # support radius along the contact normal (plane_ellipsoid is already
    # exact and keyed with t1 == PLANE)
    if ELLIPSOID in (t1, t2) and t1 != PLANE:
      if t1 == ELLIPSOID:
        d = jax.vmap(_ellipsoid_support_fix)(q1, s1, n, d)
      if t2 == ELLIPSOID:
        d = jax.vmap(_ellipsoid_support_fix)(q2, s2, n, d)
    all_pos.append(pos.reshape(-1, 3))
    all_n.append(n.reshape(-1, 3))
    all_d.append(d.reshape(-1))
    geom1_rows.append(np.repeat(g1, npts))
    geom2_rows.append(np.repeat(g2, npts))
  if not all_pos:
    return Contacts(pos=jnp.zeros((0, 3)), normal=jnp.zeros((0, 3)),
                    dist=jnp.zeros((0,)), geom1=np.zeros(0, np.int32),
                    geom2=np.zeros(0, np.int32))
  return Contacts(
      pos=jnp.concatenate(all_pos),
      normal=jnp.concatenate(all_n),
      dist=jnp.concatenate(all_d),
      geom1=np.concatenate(geom1_rows),
      geom2=np.concatenate(geom2_rows),
  )


def contact_params(model: Model) -> Tuple[np.ndarray, ...]:
  """Static per-contact-row combined material params.

  Returns (body1, body2, friction[ncon,3], solref[ncon,2], solimp[ncon,3],
  condim[ncon]) as numpy arrays aligned with collide() rows.
  MuJoCo equal-priority combination: friction = elementwise max,
  solref/solimp = mean, condim = max.
  """
  g_body = np.asarray(model.geom_bodyid)
  fric = np.asarray(model.geom_friction)
  solref = np.asarray(model.geom_solref)
  solimp = np.asarray(model.geom_solimp)
  condim = np.asarray(model.geom_condim)
  b1, b2, fr, sr, si, cd = [], [], [], [], [], []
  for (t1, t2), pairs in model.col_pairs:
    npts = _POINTS[(t1, t2)]
    for g1, g2 in pairs:
      for _ in range(npts):
        b1.append(g_body[g1])
        b2.append(g_body[g2])
        fr.append(np.maximum(fric[g1], fric[g2]))
        sr.append(0.5 * (solref[g1] + solref[g2]))
        si.append(0.5 * (solimp[g1] + solimp[g2]))
        cd.append(max(condim[g1], condim[g2]))
  if not b1:
    return (np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros((0, 3)), np.zeros((0, 2)), np.zeros((0, 3)),
            np.zeros(0, np.int32))
  return (np.asarray(b1, np.int32), np.asarray(b2, np.int32),
          np.asarray(fr, np.float32), np.asarray(sr, np.float32),
          np.asarray(si, np.float32), np.asarray(cd, np.int32))
