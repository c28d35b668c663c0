"""Tiled batched triangle rasterizer producing RGB(-D) observations on-device.

Pipeline per frame (vmap over envs):
  1. transform the compiled triangle soup by geom world poses (Kin)
  2. project to screen space (MuJoCo camera convention: looks along -z,
     y up, vertical fov = cam_fovy; reference camera external_camera_1,
     assets/gym/robots/fetch-gym.xml:124)
  3. two-level hierarchical binning: coarse 64x64-px tiles (top-K1 of all
     triangles) then fine 16x16 tiles (top-K of the coarse candidates) —
     the coarse stage keeps the expensive top_k sort off the full
     triangle soup for every fine tile
  4. per fine tile: z-buffered barycentric rasterization over its
     triangle list.  On TPU this is a Pallas kernel holding the z and
     packed-color buffers in VMEM across all K slots (one HBM pass);
     on CPU a chunked jnp scan with the same semantics (test suite path)
  5. flat Lambertian shading per triangle, gradient-sky background

TPU layout note: every intermediate is a "scalar plane" ([T], [tiles, K],
[K, tiles] ...) — never [..., 2] or [..., 3] point/color tuples.  XLA pads
the two minormost dimensions to the (8, 128) register tile, so a trailing
dim of 2 inflates memory and bandwidth 64x; keeping coordinates in
separate planes is what makes the gathers and binning run at full speed.

Output matches the reference's post-flip orientation (row 0 = top of image;
the reference flips mujoco-py's upside-down frames, pickplace.py:263-264).
RGB is uint8; depth is metric distance along the camera ray, with optional
OpenGL-style nonlinear normalization for parity with recorded buffers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as gm
from ..core.mjcf import Assets
from ..core.model import CAPSULE, Kin, Model
from .scene import RenderScene, build_render_scene


class Renderer(NamedTuple):
  model: Model
  scene: RenderScene
  width: int
  height: int
  cam_id: int
  tile: int
  tris_per_tile: int
  chunk: int
  znear: float
  zfar: float
  sky_rgb: Tuple[float, float, float]
  depth_gl: bool  # OpenGL-style nonlinear depth output
  cull: int       # backface culling: 0 off, +1/-1 keep that area sign
  coarse: int     # coarse tile size in fine tiles per side (0 = flat binning)
  coarse_k: int   # candidate capacity per coarse (64 px) region
  mid_k: int      # candidate capacity per mid (32 px) region
  backend: str    # 'pallas' | 'jnp' | 'auto'
  shadows: bool   # occlusion-tested shadows on static receivers
  shadow_caps: Tuple[int, ...]  # capsule occluder geom ids (arm proxies)
  rect_pixel_texels: bool  # full per-pixel texels on analytic rects
  #                          (False = cell-quantized, visually matching
  #                          the old tessellated path / existing datasets)

  # ------------------------------------------------------------------ api

  def render(self, kin: Kin, geom_rgba: Optional[jax.Array] = None,
             textures: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array]:
    """Render one env. Returns (rgb uint8 [H,W,3], depth f32 [H,W]).

    `textures` ([S, R, R, 3] f32) overrides the static texel colors of the
    scene's textured surfaces (see RenderScene.tri_texslot) — the
    TPU-native equivalent of the reference's TextureModder background
    randomization (scripts/gym_pickplace.py:663-668,860-867).
    """
    return _render(self, kin, geom_rgba, textures)


def build_renderer(model: Model, assets: Assets, width: int = 256,
                   height: int = 256, camera: str = 'external_camera_1',
                   tile: int = 16, tris_per_tile: int = 96, chunk: int = 8,
                   znear: float = 0.05, zfar: float = 10.0,
                   mesh_face_budget: int = 400, tex_grid: int = None,
                   depth_gl: bool = False, cull: int = -1,
                   coarse: int = 4, coarse_k: int = 512, mid_k: int = 192,
                   backend: str = 'auto', shadows: bool = True,
                   rect_pixel_texels: bool = False,
                   analytic_rects: bool = False) -> Renderer:
  # analytic_rects defaults OFF: the per-pixel background layer measured
  # 41 ms/frame at B=128 on TPU (the ~36 ms is six separate per-rect
  # occlusion passes + per-pixel grid indexing) vs 0.55 ms for the
  # tessellated path.  It stays available for small-resolution rendering
  # (immune to tile-budget overflow) until the per-env background cache +
  # single shared occlusion pass land (STATUS.md round-3 perf notes).
  scene_kwargs = {} if tex_grid is None else {'tex_grid': tex_grid}
  scene_kwargs['analytic_rects'] = analytic_rects
  scene = build_render_scene(model, assets, mesh_face_budget=mesh_face_budget,
                             **scene_kwargs)
  # sky color: mean of the builtin gradient skybox texture
  # (assets/gym/defaults/geeco-gym.xml:3)
  sky = (0.45, 0.86, 0.57)
  # arm-link capsule occluders: the invisible collision proxies emitted at
  # compile (core/mjcf.py arm-proxy block) double as shadow casters — the
  # reference's OpenGL shadow map includes the arm (castshadow light,
  # assets/gym/defaults/geeco-gym.xml)
  rgba = np.asarray(model.geom_rgba)
  caps = tuple(int(g) for g in range(model.ngeom)
               if model.geom_type[g] == CAPSULE and rgba[g, 3] < 0.01)
  return Renderer(model=model, scene=scene, width=width, height=height,
                  cam_id=model.cam(camera), tile=tile,
                  tris_per_tile=tris_per_tile, chunk=chunk, znear=znear,
                  zfar=zfar, sky_rgb=sky, depth_gl=depth_gl, cull=cull,
                  coarse=coarse, coarse_k=min(coarse_k, scene.tri.shape[0]),
                  mid_k=min(mid_k, coarse_k), backend=backend,
                  shadows=shadows, shadow_caps=caps,
                  rect_pixel_texels=rect_pixel_texels)


# ---------------------------------------------------------------------------
# stage 1+2: vertex transform, projection, shading -> per-triangle planes


class TriPlanes(NamedTuple):
  """Per-triangle screen-space scalar planes (all [T])."""
  x0: jax.Array
  y0: jax.Array
  x1: jax.Array
  y1: jax.Array
  x2: jax.Array
  y2: jax.Array
  iz0: jax.Array    # 1/depth at vertices
  iz1: jax.Array
  iz2: jax.Array
  valid: jax.Array  # bool
  colp: jax.Array   # packed shaded color r*65536 + g*256 + b (f32, exact)


def _camera(r: Renderer, kin: Kin):
  """Camera world pose: (position [3], rotation matrix, cols = axes)."""
  model = r.model
  cb = model.cam_bodyid[r.cam_id]
  cam_pos = kin.xpos[cb] + gm.quat_rotate(kin.xquat[cb],
                                          model.cam_pos[r.cam_id])
  cam_quat = gm.quat_mul(kin.xquat[cb], model.cam_quat[r.cam_id])
  return cam_pos, gm.quat_to_mat(cam_quat)


def _vertex_world(r: Renderer, kin: Kin) -> jax.Array:
  """Transform all scene vertices into world space [V, 3]."""
  scene = r.scene
  vg = jnp.asarray(scene.vert_geom)
  vert_local = jnp.asarray(scene.vert)
  return (kin.geom_xpos[vg] +
          jax.vmap(gm.quat_rotate)(kin.geom_xquat[vg], vert_local))


def _project_and_shade(r: Renderer, kin: Kin, rgba: jax.Array,
                       textures: Optional[jax.Array] = None,
                       cam=None, world=None) -> TriPlanes:
  model, scene = r.model, r.scene
  H, W = r.height, r.width

  # ---- camera pose
  cam_pos, Rc = _camera(r, kin) if cam is None else cam

  # ---- vertex transform
  if world is None:
    world = _vertex_world(r, kin)                 # [V, 3]

  pc = (world - cam_pos) @ Rc                   # camera coords [V, 3]
  depth_v = -pc[:, 2]                           # positive in front
  f = 1.0 / jnp.tan(jnp.deg2rad(model.cam_fovy[r.cam_id]) * 0.5)
  safe_d = jnp.maximum(depth_v, 1e-4)
  aspect = W / H
  u = (pc[:, 0] * f / (safe_d * aspect) * 0.5 + 0.5) * W
  v = (0.5 - pc[:, 1] * f / safe_d * 0.5) * H

  # ---- per-triangle planes
  tri = jnp.asarray(scene.tri)                  # [T, 3]
  tg = jnp.asarray(scene.tri_geom)              # [T]
  i0, i1, i2 = tri[:, 0], tri[:, 1], tri[:, 2]
  x0, y0 = u[i0], v[i0]
  x1, y1 = u[i1], v[i1]
  x2, y2 = u[i2], v[i2]
  d0, d1, d2 = depth_v[i0], depth_v[i1], depth_v[i2]
  w0, w1, w2 = world[i0], world[i1], world[i2]

  valid = (d0 > r.znear) & (d1 > r.znear) & (d2 > r.znear)
  valid &= rgba[tg, 3] > 0.5                   # per-env visibility
  area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
  valid &= jnp.abs(area) > 1e-8
  if r.cull:
    valid &= (area * r.cull) > 0

  # ---- flat shading per triangle
  n_w = jnp.cross(w1 - w0, w2 - w0)
  n_w = n_w / jnp.maximum(
      jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-9)
  # orient normals toward the camera (double-sided shading)
  centroid = (w0 + w1 + w2) / 3.0
  to_cam = cam_pos - centroid
  flip = jnp.sign(jnp.sum(n_w * to_cam, -1, keepdims=True) + 1e-12)
  n_w = n_w * flip
  if model.nlight:
    lp = model.light_pos[0]
    ld = model.light_dir[0]
    if model.light_directional[0]:
      l = -ld
      l = jnp.broadcast_to(l, centroid.shape)
    else:
      l = lp - centroid
      l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-9)
  else:
    l = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), centroid.shape)
  diff = jnp.maximum(jnp.einsum('ti,ti->t', n_w, l), 0.0)
  if (r.shadows and model.nlight and scene.shadow_recv.size and
      (scene.shadow_cast.size or r.shadow_caps)):
    # shadowed receivers lose the light's diffuse term (ambient remains),
    # matching the reference's castshadow point light
    # (assets/gym/defaults/geeco-gym.xml; OpenGL shadow map)
    diff = diff * (1.0 - _shadow_occlusion(r, kin, world))
  shade = jnp.clip(0.45 + 0.6 * diff, 0.0, 1.1)
  base_r, base_g, base_b = rgba[tg, 0], rgba[tg, 1], rgba[tg, 2]
  if scene.tex_default.shape[0]:
    # textured triangles read their texel from the slot's [R, R] grid;
    # `textures` overrides the static texel colors per render call
    # (background-video domain randomization)
    tex = scene.tex_default if textures is None else textures
    R2 = scene.tex_res * scene.tex_res
    flat = jnp.asarray(tex, jnp.float32).reshape(-1, 3)
    slot = jnp.asarray(scene.tri_texslot)
    idx = jnp.maximum(slot, 0) * R2 + jnp.asarray(scene.tri_texel)
    trgb = flat[idx]                                  # [T, 3]
    textured = slot >= 0
    base_r = jnp.where(textured, trgb[:, 0], base_r)
    base_g = jnp.where(textured, trgb[:, 1], base_g)
    base_b = jnp.where(textured, trgb[:, 2], base_b)
  cr = jnp.clip(base_r * shade * 255.0, 0.0, 255.0)
  cg = jnp.clip(base_g * shade * 255.0, 0.0, 255.0)
  cb_ = jnp.clip(base_b * shade * 255.0, 0.0, 255.0)
  colp = (jnp.floor(cr) * 65536.0 + jnp.floor(cg) * 256.0 +
          jnp.floor(cb_))                       # exact in f32 (< 2^24)

  iz0 = 1.0 / jnp.maximum(d0, 1e-6)
  iz1 = 1.0 / jnp.maximum(d1, 1e-6)
  iz2 = 1.0 / jnp.maximum(d2, 1e-6)
  return TriPlanes(x0, y0, x1, y1, x2, y2, iz0, iz1, iz2, valid, colp)


def _seg_seg_dist(p1: jax.Array, d1: jax.Array, pa: jax.Array,
                  pb: jax.Array) -> jax.Array:
  """Min distance between segments p1->p1+d1 ([P,3]) and pa->pb ([C,3]).

  Vectorized Ericson closest-point-of-two-segments; returns [P, C].
  """
  d2 = pb - pa                                     # [C, 3]
  rv = p1[:, None, :] - pa[None, :, :]             # [P, C, 3]
  a = jnp.sum(d1 * d1, -1)[:, None]                # [P, 1]
  e = jnp.sum(d2 * d2, -1)[None, :]                # [1, C]
  f = jnp.einsum('cj,pcj->pc', d2, rv)
  c = jnp.einsum('pj,pcj->pc', d1, rv)
  b = jnp.einsum('pj,cj->pc', d1, d2)
  denom = a * e - b * b
  s = jnp.clip(jnp.where(denom > 1e-12, b * f - c * e, 0.0) /
               jnp.where(denom > 1e-12, denom, 1.0), 0.0, 1.0)
  t = jnp.clip((b * s + f) / jnp.where(e > 1e-12, e, 1.0), 0.0, 1.0)
  s = jnp.clip((b * t - c) / jnp.where(a > 1e-12, a, 1.0), 0.0, 1.0)
  q1 = p1[:, None, :] + s[..., None] * d1[:, None, :]
  q2 = pa[None, :, :] + t[..., None] * d2[None, :, :]
  return jnp.linalg.norm(q1 - q2, axis=-1)


# casters per chunk of the Moller-Trumbore scan: bounds the [Pv, CC, 3]
# intermediates to ~1 MB/env so the vmapped batch render never materializes
# a multi-GB occlusion tensor
_SHADOW_CHUNK = 64


def _occlude_points(r: Renderer, kin: Kin, world: jax.Array,
                    P: jax.Array) -> jax.Array:
  """Light-visibility test for world points P [Pv, 3] -> occlusion [Pv].

  Tests against (a) free-body triangles (Moller-Trumbore, chunk-scanned
  over `world` vertices) and (b) the arm's capsule proxies
  (segment-segment distance).
  """
  model, scene = r.model, r.scene
  if model.light_directional[0]:
    d = jnp.broadcast_to(-model.light_dir[0] * 20.0, P.shape)
  else:
    d = model.light_pos[0] - P                     # [Pv, 3]
  eps = 1e-3
  occ = jnp.zeros(P.shape[0], jnp.float32)

  ct = np.asarray(scene.shadow_cast)
  if ct.size:
    CC = min(_SHADOW_CHUNK, ct.size)
    pad = (-ct.size) % CC
    # pad with copies of the first caster: occlusion is an OR, re-testing
    # a real triangle is harmless and keeps every chunk full
    ct = np.concatenate([ct, np.full(pad, ct[0], ct.dtype)])
    tri_c = jnp.asarray(np.asarray(scene.tri)[ct])  # [Ctp, 3]
    va = world[tri_c[:, 0]].reshape(-1, CC, 3)      # [n_chunks, CC, 3]
    vb = world[tri_c[:, 1]].reshape(-1, CC, 3)
    vc = world[tri_c[:, 2]].reshape(-1, CC, 3)

    def chunk(occ_acc, abc):
      A, B, C_ = abc
      e1 = B - A                                   # [CC, 3]
      e2 = C_ - A
      pv = jnp.cross(d[:, None, :], e2[None, :, :])  # [Pv, CC, 3]
      det = jnp.einsum('cj,pcj->pc', e1, pv)
      inv = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
      tv = P[:, None, :] - A[None, :, :]
      u = jnp.einsum('pcj,pcj->pc', tv, pv) * inv
      qv = jnp.cross(tv, e1[None, :, :])
      v = jnp.einsum('pj,pcj->pc', d, qv) * inv
      t = jnp.einsum('cj,pcj->pc', e2, qv) * inv
      hit = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0) &
             (u + v <= 1.0) & (t > eps) & (t < 1.0 - eps))
      return jnp.maximum(occ_acc, jnp.any(hit, 1).astype(jnp.float32)), None

    occ, _ = jax.lax.scan(chunk, occ, (va, vb, vc))

  if r.shadow_caps:
    gids = jnp.asarray(r.shadow_caps)
    gp = kin.geom_xpos[gids]                       # [Nc, 3]
    gq = kin.geom_xquat[gids]
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), gp.shape)
    ax = jax.vmap(gm.quat_rotate)(gq, z)
    hl = jnp.asarray(model.geom_size)[gids, 1][:, None]
    rad = jnp.asarray(model.geom_size)[gids, 0]
    dist = _seg_seg_dist(P, d, gp - ax * hl, gp + ax * hl)
    occ = jnp.maximum(occ, jnp.any(dist < rad[None, :], 1)
                      .astype(jnp.float32))
  return occ


def _shadow_occlusion(r: Renderer, kin: Kin, world: jax.Array) -> jax.Array:
  """Per-triangle shadow fraction [T] in [0, 1].

  Light visibility is tested once per unique receiver vertex
  (scene.shadow_pts), then averaged over each receiver triangle's 3
  vertices for soft edges.  Non-receiver triangles get 0.
  """
  scene = r.scene
  P = world[jnp.asarray(scene.shadow_pts)]         # [Pv, 3]
  occ = _occlude_points(r, kin, world, P)
  occ_tri = occ[jnp.asarray(scene.shadow_recv_pt)].mean(-1)   # [Rr]
  T = scene.tri.shape[0]
  return jnp.zeros(T, jnp.float32).at[jnp.asarray(scene.shadow_recv)
                                      ].set(occ_tri)


def _analytic_bg(r: Renderer, kin: Kin, rgba: jax.Array,
                 textures: Optional[jax.Array], cam, world):
  """Per-pixel ray-cast of the scene's analytic rects (planes, textured
  box tops): returns (depth [H,W] f32, colp [H,W] packed f32).

  Replaces their triangle tessellations entirely: exact edges, per-pixel
  texels, zero binning load, and — unlike the texel-quad path — immune to
  per-tile candidate-budget overflow (dense robot-mesh screen columns used
  to evict the wall/table quads behind them into sky holes).
  Where no rect is hit: depth = zfar, color = sky.
  """
  model, scene = r.model, r.scene
  H, W = r.height, r.width
  cam_pos, Rc = cam
  nrect = int(scene.rect_geom.shape[0])
  sky = jnp.full((H, W), _pack_sky(r.sky_rgb), jnp.float32)
  if nrect == 0:
    return jnp.full((H, W), r.zfar, jnp.float32), sky

  # unnormalized camera-frame pixel rays (a, b, -1): z-depth along the ray
  # equals the ray parameter s (exact inverse of the projection above)
  f = 1.0 / jnp.tan(jnp.deg2rad(model.cam_fovy[r.cam_id]) * 0.5)
  aspect = W / H
  a = ((2.0 * (jnp.arange(W) + 0.5) / W) - 1.0) * aspect / f   # [W]
  b = (1.0 - 2.0 * (jnp.arange(H) + 0.5) / H) / f              # [H]
  dirw = (a[None, :, None] * Rc[:, 0] + b[:, None, None] * Rc[:, 1]
          - Rc[:, 2])                                          # [H, W, 3]

  tex = None
  if scene.tex_default.shape[0]:
    tex = (jnp.asarray(scene.tex_default, jnp.float32) if textures is None
           else jnp.asarray(textures, jnp.float32))
  Rt = scene.tex_res

  best_depth = jnp.full((H, W), r.zfar, jnp.float32)
  best_colp = sky

  for k in range(nrect):
    g = int(scene.rect_geom[k])
    hx, hy = float(scene.rect_half[k, 0]), float(scene.rect_half[k, 1])
    off = jnp.asarray(scene.rect_off[k])
    Rg = gm.quat_to_mat(kin.geom_xquat[g])
    center = kin.geom_xpos[g] + Rg @ off
    U, V, N = Rg[:, 0], Rg[:, 1], Rg[:, 2]

    denom = dirw @ N                               # [H, W]
    safe = jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0)
    s = ((center - cam_pos) @ N) / safe            # [H, W] ray parameter
    rel = cam_pos - center
    lu = s * (dirw @ U) + rel @ U                  # [H, W] in-plane coords
    lv = s * (dirw @ V) + rel @ V
    inside = ((jnp.abs(denom) > 1e-9) & (s > r.znear) &
              (jnp.abs(lu) <= hx) & (jnp.abs(lv) <= hy) &
              (rgba[g, 3] > 0.5))  # per-env visibility, as the tri path

    # in-plane cell coordinates: by default texels and the point-light
    # query are quantized to the G x G cells the tessellated path used
    # (visual parity with datasets collected by that path); per-pixel
    # mode (rect_pixel_texels) samples the full texel grid instead
    G = int(scene.rect_grid[k])
    u01 = lu / hx * 0.5 + 0.5                      # [H, W] in [0, 1]
    v01 = lv / hy * 0.5 + 0.5
    if r.rect_pixel_texels:
      uq, vq = u01, v01
    else:
      ci = jnp.clip((u01 * G).astype(jnp.int32), 0, G - 1)
      cj = jnp.clip((v01 * G).astype(jnp.int32), 0, G - 1)
      uq = (ci.astype(jnp.float32) + 0.5) / G      # cell centers
      vq = (cj.astype(jnp.float32) + 0.5) / G

    slot = int(scene.rect_slot[k])
    if slot >= 0 and tex is not None:
      # texel mapping as scene._grid_quad: image row 0 = +y edge
      iu = jnp.clip((uq * Rt).astype(jnp.int32), 0, Rt - 1)
      iv = jnp.clip(((1.0 - vq) * Rt).astype(jnp.int32), 0, Rt - 1)
      base = tex[slot][iv, iu]                     # [H, W, 3]
    else:
      base = jnp.broadcast_to(rgba[g, :3], (H, W, 3))

    # flat shading, normal oriented toward the camera (matches the
    # triangle path's double-sided shading)
    n_o = N * jnp.sign(rel @ N + 1e-12)
    if model.nlight:
      if model.light_directional[0]:
        diff = jnp.maximum(jnp.dot(n_o, -model.light_dir[0]), 0.0)
        diff = jnp.broadcast_to(diff, (H, W))
      else:
        # light query at the (possibly cell-quantized) surface point
        q_pix = (center[None, None, :] +
                 ((uq * 2.0 - 1.0) * hx)[..., None] * U +
                 ((vq * 2.0 - 1.0) * hy)[..., None] * V)  # [H, W, 3]
        l = model.light_pos[0] - q_pix
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True),
                            1e-9)
        diff = jnp.maximum(l @ n_o, 0.0)
    else:
      diff = jnp.broadcast_to(jnp.maximum(n_o[2], 0.0), (H, W))

    if (r.shadows and model.nlight and bool(scene.rect_recv[k]) and
        (scene.shadow_cast.size or r.shadow_caps)):
      # light visibility on the rect's (G+1)^2 grid — the same sample
      # density the tessellated path tested at its texel-quad vertices —
      # bilinearly interpolated per pixel
      sg = G
      gl = np.linspace(-1.0, 1.0, sg + 1)
      gu, gv = np.meshgrid(gl * hx, gl * hy, indexing='ij')
      gu = jnp.asarray(gu.ravel()[:, None], jnp.float32)
      gv = jnp.asarray(gv.ravel()[:, None], jnp.float32)
      pts = center[None, :] + gu * U[None, :] + gv * V[None, :]
      occ = _occlude_points(r, kin, world, pts).reshape(sg + 1, sg + 1)
      fu = jnp.clip((lu / hx * 0.5 + 0.5) * sg, 0.0, sg - 1e-4)
      fv = jnp.clip((lv / hy * 0.5 + 0.5) * sg, 0.0, sg - 1e-4)
      iu0 = fu.astype(jnp.int32)
      iv0 = fv.astype(jnp.int32)
      o00 = occ[iu0, iv0]
      o10 = occ[iu0 + 1, iv0]
      o01 = occ[iu0, iv0 + 1]
      o11 = occ[iu0 + 1, iv0 + 1]
      if r.rect_pixel_texels:
        wu = fu - iu0
        wv = fv - iv0
        occ_pix = ((1 - wu) * (1 - wv) * o00 + wu * (1 - wv) * o10 +
                   (1 - wu) * wv * o01 + wu * wv * o11)
      else:
        # flat per-cell shadow (4-corner mean), matching the tessellated
        # path's per-triangle vertex-averaged shadows on existing datasets
        occ_pix = 0.25 * (o00 + o10 + o01 + o11)
      diff = diff * (1.0 - occ_pix)

    shade = jnp.clip(0.45 + 0.6 * diff, 0.0, 1.1)
    cr = jnp.clip(base[..., 0] * shade * 255.0, 0.0, 255.0)
    cg = jnp.clip(base[..., 1] * shade * 255.0, 0.0, 255.0)
    cb_ = jnp.clip(base[..., 2] * shade * 255.0, 0.0, 255.0)
    colp = (jnp.floor(cr) * 65536.0 + jnp.floor(cg) * 256.0 +
            jnp.floor(cb_))

    win = inside & (s < best_depth)
    best_depth = jnp.where(win, s, best_depth)
    best_colp = jnp.where(win, colp, best_colp)

  return best_depth, best_colp


def _pack_sky(sky_rgb) -> float:
  s = [int(np.clip(c * 255.0, 0, 255)) for c in sky_rgb]
  return float(s[0] * 65536 + s[1] * 256 + s[2])


def _unpack_col(colp: jax.Array) -> jax.Array:
  """Packed f32 color plane -> uint8 [..., 3]."""
  ci = colp.astype(jnp.int32)
  return jnp.stack([(ci // 65536) % 256, (ci // 256) % 256, ci % 256],
                   -1).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# stage 3: binning


def _bbox_planes(tp: TriPlanes):
  lox = jnp.minimum(jnp.minimum(tp.x0, tp.x1), tp.x2)
  hix = jnp.maximum(jnp.maximum(tp.x0, tp.x1), tp.x2)
  loy = jnp.minimum(jnp.minimum(tp.y0, tp.y1), tp.y2)
  hiy = jnp.maximum(jnp.maximum(tp.y0, tp.y1), tp.y2)
  return lox, loy, hix, hiy


def _bin_priority(tp: TriPlanes, tile: int) -> jax.Array:
  """Per-triangle binning priority for top-K candidate selection.

  Nearest-first (1/z of the nearest vertex), so on budget overflow the
  dropped triangles are the farthest — usually occluded — ones, PLUS a
  large constant for triangles whose screen bbox can cover a whole fine
  tile: big background quads (walls, floor) are few per tile but leaving
  one out punches a sky-colored hole through every pixel the small
  near-triangles don't cover.  (Round-1 order was static geom order,
  which silently dropped whichever geoms were declared last.)
  """
  izmax = jnp.maximum(jnp.maximum(tp.iz0, tp.iz1), tp.iz2)
  lox, loy, hix, hiy = _bbox_planes(tp)
  big = ((hix - lox) >= tile) & ((hiy - loy) >= tile)
  return izmax + 1e4 * big.astype(jnp.float32)


def _bin_flat(r: Renderer, tp: TriPlanes):
  """Single-level binning: top-K triangles per fine tile over all T."""
  H, W, TS = r.height, r.width, r.tile
  ty, tx = H // TS, W // TS
  n_tiles = ty * tx
  K = r.tris_per_tile
  lox, loy, hix, hiy = _bbox_planes(tp)
  tiles_x = (jnp.arange(tx) * TS)[None, :]      # [1, tx]
  tiles_y = (jnp.arange(ty) * TS)[None, :]
  ox = (lox[:, None] < tiles_x + TS) & (hix[:, None] >= tiles_x)   # [T, tx]
  oy = (loy[:, None] < tiles_y + TS) & (hiy[:, None] >= tiles_y)   # [T, ty]
  overlap = (oy[:, :, None] & ox[:, None, :] &
             tp.valid[:, None, None])           # [T, ty, tx]
  overlap = overlap.reshape(-1, n_tiles).T      # [tiles, T]
  prio = jnp.where(overlap, _bin_priority(tp, TS)[None, :], 0.0)
  top_prio, top_idx = jax.lax.top_k(prio, K)    # [tiles, K]
  return top_idx, top_prio > 0


def _gather_planes(planes, idx):
  """Row-gather a list of [N]-planes at [M] indices -> list of [M] planes.

  TPU gather cost is ~10 ns per *index* regardless of row width, so the
  planes are packed into [N, 8] tables and fetched with ceil(P/8)
  row-gathers — one index stream instead of P.
  """
  outs = []
  for base in range(0, len(planes), 8):
    group = planes[base:base + 8]
    tab = jnp.stack(group, axis=-1)              # [N, <=8]
    got = jnp.take(tab, idx, axis=0)             # [M, <=8]
    outs.extend(got[..., j] for j in range(len(group)))
  return outs


def _bin_pallas(r: Renderer, tp: TriPlanes):
  """Hierarchical binning for the TPU path.

  coarse 4x4-fine-tile regions: priority top-K1 over all T (indices only,
  then two packed row-gathers);  mid 2x2-fine-tile regions: overlap mask
  -> multi-operand sort carrying the local slot -> row-gather K2 slots.
  Returns 11 planes [K2, n_tiles] in *mid-major* fine-tile order
  (tile = mid * 4 + sub), with coords relative to each mid region origin,
  plus the ok plane.  No per-(tile, slot) scatter/gather ever runs at
  fine granularity — that cost (tiles*K indices) is what made a naive
  binning scheme slower than the rasterization itself.
  """
  H, W, TS = r.height, r.width, r.tile
  ty, tx = H // TS, W // TS
  CS = 4                                         # fine tiles per coarse side
  MS = 2                                         # fine tiles per mid side
  cty, ctx = ty // CS, tx // CS
  mty, mtx = ty // MS, tx // MS
  n_coarse = cty * ctx
  n_mid = mty * mtx
  K1 = r.coarse_k
  K2 = r.mid_k
  lox, loy, hix, hiy = _bbox_planes(tp)
  T = lox.shape[0]

  # ---- coarse overlap -> top-K1 candidate ids per coarse region
  CTS = TS * CS
  cx0 = (jnp.arange(ctx) * CTS)[None, :]
  cy0 = (jnp.arange(cty) * CTS)[None, :]
  ox = (lox[:, None] < cx0 + CTS) & (hix[:, None] >= cx0)   # [T, ctx]
  oy = (loy[:, None] < cy0 + CTS) & (hiy[:, None] >= cy0)   # [T, cty]
  overlap_c = (oy[:, :, None] & ox[:, None, :] & tp.valid[:, None, None])
  overlap_c = overlap_c.reshape(T, n_coarse).T  # [n_coarse, T]
  prio_c = jnp.where(overlap_c, _bin_priority(tp, TS)[None, :], 0.0)
  cprio, cidx = jax.lax.top_k(prio_c, K1)       # [n_coarse, K1]

  # ---- coarse attribute fetch (2 packed row-gathers over 8-wide tables)
  cplanes = _gather_planes(
      [tp.x0, tp.y0, tp.x1, tp.y1, tp.x2, tp.y2, tp.iz0, tp.iz1, tp.iz2,
       tp.colp], cidx.reshape(-1))
  cplanes = [p.reshape(n_coarse, K1) for p in cplanes]
  cx0p, cy0p, cx1p, cy1p, cx2p, cy2p = cplanes[:6]
  c_ok = (cprio > 0).astype(jnp.float32)

  # bbox of candidates, recomputed from the fetched coords
  clox = jnp.minimum(jnp.minimum(cx0p, cx1p), cx2p)   # [n_coarse, K1]
  chix = jnp.maximum(jnp.maximum(cx0p, cx1p), cx2p)
  cloy = jnp.minimum(jnp.minimum(cy0p, cy1p), cy2p)
  chiy = jnp.maximum(jnp.maximum(cy0p, cy1p), cy2p)

  # ---- mid regions: overlap of parent-coarse candidates.  The sort
  # carries all 11 attribute planes as payload operands — a 12-operand
  # sort is ~2x the cost of a 2-operand one but removes the per-slot
  # attribute gather entirely (TPU gathers cost ~10 ns per index).
  MTS = TS * MS
  mxi = (jnp.arange(n_mid) % mtx)
  myi = (jnp.arange(n_mid) // mtx)
  mx0 = (mxi * MTS).astype(jnp.float32)[:, None]      # [n_mid, 1]
  my0 = (myi * MTS).astype(jnp.float32)[:, None]
  R_ = CS // MS                                   # mid regions per coarse

  def rep(p):                                     # [n_coarse,K1]->[n_mid,K1]
    x = p.reshape(cty, ctx, K1)
    x = jnp.broadcast_to(x[:, None, :, None, :], (cty, R_, ctx, R_, K1))
    return x.reshape(n_mid, K1)

  ovm = ((rep(clox) < mx0 + MTS) & (rep(chix) >= mx0) &
         (rep(cloy) < my0 + MTS) & (rep(chiy) >= my0) &
         (rep(c_ok) > 0.5))                       # [n_mid, K1]
  prio_m = jnp.where(ovm, (K1 - jnp.arange(K1))[None, :], 0)
  sorted_ops = jax.lax.sort(
      tuple([-prio_m] + [rep(p) for p in cplanes]),
      dimension=-1, num_keys=1)
  m_ok = ((-sorted_ops[0][:, :K2]) > 0).astype(jnp.float32)
  mplanes = [p[:, :K2] for p in sorted_ops[1:]]   # [n_mid, K2] each
  # coords relative to the mid-region origin
  mplanes[0] = mplanes[0] - mx0
  mplanes[1] = mplanes[1] - my0
  mplanes[2] = mplanes[2] - mx0
  mplanes[3] = mplanes[3] - my0
  mplanes[4] = mplanes[4] - mx0
  mplanes[5] = mplanes[5] - my0
  mplanes.insert(9, m_ok)                         # x0..iz2, ok, colp

  # ---- expand to fine tiles: [K2, n_mid] -> [K2, n_tiles] mid-major
  out = [jnp.repeat(p.T, MS * MS, axis=1) for p in mplanes]
  return out


def _compose_midmajor(buf, ty, tx, TS, MS):
  """[npx, n_tiles(mid-major)] -> [H, W] image."""
  mty, mtx = ty // MS, tx // MS
  x = buf.T.reshape(mty, mtx, MS, MS, TS, TS)    # (my, mx, sy, sx, py, px)
  x = x.transpose(0, 2, 4, 1, 3, 5)
  return x.reshape(ty * TS, tx * TS)


# ---------------------------------------------------------------------------
# stage 4: per-tile rasterization


def _raster_jnp(r: Renderer, planes, n_tiles: int, npx: int):
  """Chunked z-buffer scan (CPU/testing path).

  planes: 11 arrays [tiles, K] (x0..y2 tile-relative, iz0..iz2, ok, colp).
  Returns (zbuf [tiles, px], colbuf packed f32 [tiles, px]).
  """
  x0, y0, x1, y1, x2, y2, iz0, iz1, iz2, ok, colp = planes
  TS = r.tile
  K = x0.shape[1]
  C = min(r.chunk, K)
  n_chunks = K // C
  pxl = (jnp.arange(npx) % TS).astype(jnp.float32) + 0.5   # [npx]
  pyl = (jnp.arange(npx) // TS).astype(jnp.float32) + 0.5
  init = (jnp.full((n_tiles, npx), jnp.inf),
          jnp.full((n_tiles, npx), _pack_sky(r.sky_rgb)))

  def chunk_step(carry, c_idx):
    zbuf, cbuf = carry
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c_idx * C, C, axis=1)
    X0, Y0, X1, Y1 = sl(x0)[..., None], sl(y0)[..., None], \
        sl(x1)[..., None], sl(y1)[..., None]
    X2, Y2 = sl(x2)[..., None], sl(y2)[..., None]
    IZ0, IZ1, IZ2 = sl(iz0)[..., None], sl(iz1)[..., None], \
        sl(iz2)[..., None]
    OK = sl(ok)[..., None] > 0.5
    COL = sl(colp)
    px = pxl[None, None, :]
    py = pyl[None, None, :]
    e0 = (X1 - X0) * (py - Y0) - (Y1 - Y0) * (px - X0)   # [tiles, C, px]
    e1 = (X2 - X1) * (py - Y1) - (Y2 - Y1) * (px - X1)
    e2 = (X0 - X2) * (py - Y2) - (Y0 - Y2) * (px - X2)
    area = (X1 - X0) * (Y2 - Y0) - (Y1 - Y0) * (X2 - X0)
    s = jnp.sign(area)
    inside = (e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0) & OK
    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
    inv_z = (e1 * IZ0 + e2 * IZ1 + e0 * IZ2) * inv_area
    z = 1.0 / jnp.maximum(inv_z, 1e-6)
    z = jnp.where(inside, z, jnp.inf)           # [tiles, C, px]

    zc = jnp.min(z, axis=1)                      # [tiles, px]
    sel = jnp.argmin(z, axis=1)
    cc = jnp.take_along_axis(COL, sel, axis=1)   # [tiles, px]
    closer = zc < zbuf
    zbuf = jnp.where(closer, zc, zbuf)
    cbuf = jnp.where(closer, cc, cbuf)
    return (zbuf, cbuf), None

  (zbuf, cbuf), _ = jax.lax.scan(chunk_step, init, jnp.arange(n_chunks))
  return zbuf, cbuf


def _coeff_planes(planes, tile: int, mid_sub: int):
  """11 vertex planes [K, n_tiles] -> 13 affine-coefficient planes.

  Each edge function and the interpolated inverse depth are affine in the
  pixel coordinates, e_i(p) = A_i*px + B_i*py + C_i, so the per-slot
  kernel work collapses to three fused multiply-adds per quantity.  This
  precompute runs as plain XLA ops on [K, n_tiles] arrays — npx (=tile^2)
  times smaller than the per-pixel kernel arrays — and folds in, once:
    * the area-sign normalization (inside test becomes e_i >= 0),
    * slot validity (invalid slots get C0 = -1e30, never inside),
    * the sub-tile pixel offset of each fine tile within its mid region
      (coords arrive relative to the MID origin; C += A*ox + B*oy moves
      them to the FINE tile origin so the kernel's pixel grid is the
      same [npx, 1] plane for every lane).
  Returns [A0,B0,C0, A1,B1,C1, A2,B2,C2, Az,Bz,Cz, colp].
  """
  x0, y0, x1, y1, x2, y2, iz0, iz1, iz2, ok, colp = planes
  K, n_tiles = x0.shape
  S = mid_sub
  # edge i: from vertex i to vertex (i+1)%3, e_i = A*px + B*py + C
  a0, b0 = y0 - y1, x1 - x0
  c0 = -a0 * x0 - b0 * y0
  a1, b1 = y1 - y2, x2 - x1
  c1 = -a1 * x1 - b1 * y1
  a2, b2 = y2 - y0, x0 - x2
  c2 = -a2 * x2 - b2 * y2
  area = b0 * (y2 - y0) + a0 * (x2 - x0)   # == e0(v2), signed 2*area
  s = jnp.sign(area)
  a0, b0, c0 = a0 * s, b0 * s, c0 * s
  a1, b1, c1 = a1 * s, b1 * s, c1 * s
  a2, b2, c2 = a2 * s, b2 * s, c2 * s
  inv_area = 1.0 / jnp.maximum(jnp.abs(area), 1e-9)
  az = (a1 * iz0 + a2 * iz1 + a0 * iz2) * inv_area
  bz = (b1 * iz0 + b2 * iz1 + b0 * iz2) * inv_area
  cz = (c1 * iz0 + c2 * iz1 + c0 * iz2) * inv_area
  c0 = jnp.where(ok > 0.5, c0, -1e30)
  # mid-relative -> fine-tile-relative (tile = mid * S^2 + sy * S + sx)
  sub = jnp.arange(n_tiles) % (S * S)
  ox = ((sub % S) * tile).astype(jnp.float32)[None, :]
  oy = ((sub // S) * tile).astype(jnp.float32)[None, :]
  c0 = c0 + a0 * ox + b0 * oy
  c1 = c1 + a1 * ox + b1 * oy
  c2 = c2 + a2 * ox + b2 * oy
  cz = cz + az * ox + bz * oy
  return [a0, b0, c0, a1, b1, c1, a2, b2, c2, az, bz, cz, colp]


def _raster_pallas_call(planes, tile: int, sky_packed: float,
                        tiles_per_block: int = 128, mid_sub: int = 1,
                        interpret: bool = False):
  """Pallas kernel: z-buffered rasterization with VMEM-resident buffers.

  planes: 11 arrays [K, n_tiles] f32 (x0, y0, x1, y1, x2, y2, iz0, iz1,
  iz2, ok, colp), coords relative to the MID region origin (see
  _bin_pallas); converted here to affine coefficients (_coeff_planes).
  Layout puts tiles in the lane dimension (128 tiles/block) and pixels in
  sublanes, so every per-slot step is a full-width [npx, 128] VPU op and
  no array has a small trailing dim for XLA to pad.  The z test runs in
  inverse-depth space (marching max) so the inner loop has no reciprocal.
  Returns (izbuf [npx, n_tiles] f32 inverse depth, 0 where no hit;
  colbuf [npx, n_tiles] f32 packed).
  """
  from jax.experimental import pallas as pl

  TS = tile
  npx = TS * TS
  K, n_tiles = planes[0].shape
  S = mid_sub
  # TB must divide n_tiles exactly (the grid is n_tiles // TB blocks; a
  # remainder would silently leave trailing tiles unrendered).  Since the
  # sub-tile offsets are folded into the coefficients, blocks need not
  # align to mid-region boundaries.
  TB = 0
  for cand in range(min(tiles_per_block, n_tiles), 0, -1):
    if n_tiles % cand == 0:
      TB = cand
      break

  def kernel(a0r, b0r, c0r, a1r, b1r, c1r, a2r, b2r, c2r, azr, bzr, czr,
             colr, z_ref, c_ref):
    # pixel-center coordinates within a tile: sublane p -> (px, py).
    # Identical for every lane — the sub-tile offsets were folded into
    # the C coefficients by _coeff_planes.
    lin = jax.lax.broadcasted_iota(jnp.int32, (npx, 1), 0)
    px = (lin % TS).astype(jnp.float32) + 0.5    # [npx, 1]
    py = (lin // TS).astype(jnp.float32) + 0.5

    def body(k, carry):
      izbuf, cbuf = carry
      e0 = a0r[k][None, :] * px + b0r[k][None, :] * py + c0r[k][None, :]
      e1 = a1r[k][None, :] * px + b1r[k][None, :] * py + c1r[k][None, :]
      e2 = a2r[k][None, :] * px + b2r[k][None, :] * py + c2r[k][None, :]
      izv = azr[k][None, :] * px + bzr[k][None, :] * py + czr[k][None, :]
      closer = ((jnp.minimum(jnp.minimum(e0, e1), e2) >= 0.0) &
                (izv > izbuf))
      izbuf = jnp.where(closer, izv, izbuf)
      cbuf = jnp.where(closer, colr[k][None, :], cbuf)
      return izbuf, cbuf

    izbuf0 = jnp.zeros((npx, TB), jnp.float32)
    cbuf0 = jnp.full((npx, TB), sky_packed, jnp.float32)
    izbuf, cbuf = jax.lax.fori_loop(0, K, body, (izbuf0, cbuf0))
    z_ref[:] = izbuf
    c_ref[:] = cbuf

  coeffs = _coeff_planes(planes, TS, S)
  grid = (n_tiles // TB,)
  in_spec = pl.BlockSpec((K, TB), lambda i: (0, i))
  out = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[in_spec] * 13,
      out_specs=[pl.BlockSpec((npx, TB), lambda i: (0, i)),
                 pl.BlockSpec((npx, TB), lambda i: (0, i))],
      out_shape=[jax.ShapeDtypeStruct((npx, n_tiles), jnp.float32),
                 jax.ShapeDtypeStruct((npx, n_tiles), jnp.float32)],
      interpret=interpret,
  )(*coeffs)
  return out[0], out[1]


# ---------------------------------------------------------------------------


def _render(r: Renderer, kin: Kin, geom_rgba: Optional[jax.Array],
            textures: Optional[jax.Array] = None):
  model = r.model
  H, W, TS = r.height, r.width, r.tile
  ty, tx = H // TS, W // TS
  n_tiles = ty * tx
  npx = TS * TS

  rgba = model.geom_rgba if geom_rgba is None else geom_rgba
  cam = _camera(r, kin)
  world = _vertex_world(r, kin)
  tp = _project_and_shade(r, kin, rgba, textures, cam=cam, world=world)

  backend = r.backend
  if backend == 'auto':
    backend = 'pallas' if jax.default_backend() == 'tpu' else 'jnp'
  if r.scene.tri.shape[0] == 0:
    # rect-only scene: the analytic layer is the whole image
    depth = jnp.full((H, W), jnp.inf, jnp.float32)
    cimg = jnp.zeros((H, W), jnp.float32)
  elif backend == 'pallas' and ty % 4 == 0 and tx % 4 == 0:
    MS = 2
    planes = _bin_pallas(r, tp)                  # [K2, n_tiles] mid-major
    # off-TPU an explicit backend='pallas' runs the same kernel in
    # interpret mode, so the real branch is drivable in CPU CI
    izbuf, cbuf = _raster_pallas_call(planes, TS, _pack_sky(r.sky_rgb),
                                      mid_sub=MS,
                                      interpret=jax.default_backend()
                                      != 'tpu')
    hit = izbuf > 0.0
    depth = _compose_midmajor(
        jnp.where(hit, 1.0 / jnp.maximum(izbuf, 1e-9), jnp.inf),
        ty, tx, TS, MS)
    cimg = _compose_midmajor(cbuf, ty, tx, TS, MS)
  else:
    top_idx, slot_ok = _bin_flat(r, tp)
    orx = ((jnp.arange(n_tiles) % tx) * TS).astype(jnp.float32)[:, None]
    ory = ((jnp.arange(n_tiles) // tx) * TS).astype(jnp.float32)[:, None]
    planes = [
        tp.x0[top_idx] - orx, tp.y0[top_idx] - ory,
        tp.x1[top_idx] - orx, tp.y1[top_idx] - ory,
        tp.x2[top_idx] - orx, tp.y2[top_idx] - ory,
        tp.iz0[top_idx], tp.iz1[top_idx], tp.iz2[top_idx],
        slot_ok.astype(jnp.float32), tp.colp[top_idx],
    ]
    zbuf, cbuf = _raster_jnp(r, planes, n_tiles, npx)
    hit = jnp.isfinite(zbuf)
    depth_tiles = jnp.where(hit, zbuf, jnp.inf)
    # unpack color only after the [H, W] reshape so no [tiles, npx, 3]
    # intermediate exists to lane-pad
    cimg = cbuf.reshape(ty, tx, TS, TS).transpose(0, 2, 1, 3).reshape(H, W)
    depth = depth_tiles.reshape(ty, tx, TS, TS).transpose(0, 2, 1, 3)
    depth = depth.reshape(H, W)

  # composite the analytic background layer (planes + textured box tops):
  # triangles win only where strictly nearer; rect-missed pixels carry the
  # sky color + zfar depth, preserving the previous sky semantics
  bg_depth, bg_colp = _analytic_bg(r, kin, rgba, textures, cam, world)
  tri_wins = depth < bg_depth
  cimg = jnp.where(tri_wins, cimg, bg_colp)
  depth = jnp.where(tri_wins, depth, bg_depth)
  rgb = _unpack_col(cimg)                        # [H, W, 3] uint8

  if r.depth_gl:
    zn, zf = r.znear, r.zfar
    depth = jnp.clip((zf / (zf - zn)) * (1.0 - zn / jnp.maximum(depth, zn)),
                     0.0, 1.0)

  return rgb, depth
