"""Tiled batched triangle rasterizer producing RGB(-D) observations on-device.

Pipeline per frame (pure jnp; vmap over envs):
  1. transform the compiled triangle soup by geom world poses (Kin)
  2. project to screen space (MuJoCo camera convention: looks along -z,
     y up, vertical fov = cam_fovy; reference camera external_camera_1,
     assets/gym/robots/fetch-gym.xml:124)
  3. bin triangle screen AABBs into pixel tiles (top-k per tile, static cap)
  4. per tile: z-buffered barycentric rasterization over its triangle list,
     scanned in chunks so live buffers stay tile-sized (VMEM-friendly;
     the structure maps 1:1 onto a future Pallas kernel)
  5. flat Lambertian shading per triangle, gradient-sky background

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
from ..core.model import Kin, Model
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

  # ------------------------------------------------------------------ api

  def render(self, kin: Kin, geom_rgba: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array]:
    """Render one env. Returns (rgb uint8 [H,W,3], depth f32 [H,W])."""
    return _render(self, kin, geom_rgba)


def build_renderer(model: Model, assets: Assets, width: int = 256,
                   height: int = 256, camera: str = 'external_camera_1',
                   tile: int = 16, tris_per_tile: int = 96, chunk: int = 8,
                   znear: float = 0.05, zfar: float = 10.0,
                   mesh_face_budget: int = 400,
                   depth_gl: bool = False, cull: int = -1) -> Renderer:
  scene = build_render_scene(model, assets, mesh_face_budget=mesh_face_budget)
  # sky color: mean of the builtin gradient skybox texture
  # (assets/gym/defaults/geeco-gym.xml:3)
  sky = (0.45, 0.86, 0.57)
  return Renderer(model=model, scene=scene, width=width, height=height,
                  cam_id=model.cam(camera), tile=tile,
                  tris_per_tile=tris_per_tile, chunk=chunk, znear=znear,
                  zfar=zfar, sky_rgb=sky, depth_gl=depth_gl, cull=cull)


# ---------------------------------------------------------------------------


def _render(r: Renderer, kin: Kin, geom_rgba: Optional[jax.Array]):
  model, scene = r.model, r.scene
  H, W, TS = r.height, r.width, r.tile
  ty, tx = H // TS, W // TS
  n_tiles = ty * tx
  K = r.tris_per_tile

  rgba = model.geom_rgba if geom_rgba is None else geom_rgba

  # ---- camera pose
  cb = model.cam_bodyid[r.cam_id]
  cam_pos = kin.xpos[cb] + gm.quat_rotate(kin.xquat[cb],
                                          model.cam_pos[r.cam_id])
  cam_quat = gm.quat_mul(kin.xquat[cb], model.cam_quat[r.cam_id])
  Rc = gm.quat_to_mat(cam_quat)  # columns = camera axes in world

  # ---- vertex transform
  vg = jnp.asarray(scene.vert_geom)
  vert_local = jnp.asarray(scene.vert)
  gpos = kin.geom_xpos[vg]
  gquat = kin.geom_xquat[vg]
  world = gpos + jax.vmap(gm.quat_rotate)(gquat, vert_local)  # [V, 3]

  pc = (world - cam_pos) @ Rc                   # camera coords [V, 3]
  depth_v = -pc[:, 2]                           # positive in front
  f = 1.0 / jnp.tan(jnp.deg2rad(model.cam_fovy[r.cam_id]) * 0.5)
  safe_d = jnp.maximum(depth_v, 1e-4)
  aspect = W / H
  u = (pc[:, 0] * f / (safe_d * aspect) * 0.5 + 0.5) * W
  v = (0.5 - pc[:, 1] * f / safe_d * 0.5) * H
  pix = jnp.stack([u, v], -1)                   # [V, 2]

  # ---- per-triangle data
  tri = jnp.asarray(scene.tri)                  # [T, 3]
  tg = jnp.asarray(scene.tri_geom)              # [T]
  p0, p1, p2 = pix[tri[:, 0]], pix[tri[:, 1]], pix[tri[:, 2]]
  d0, d1, d2 = depth_v[tri[:, 0]], depth_v[tri[:, 1]], depth_v[tri[:, 2]]
  w0, w1, w2 = world[tri[:, 0]], world[tri[:, 1]], world[tri[:, 2]]

  valid = (d0 > r.znear) & (d1 > r.znear) & (d2 > r.znear)
  valid &= rgba[tg, 3] > 0.5                   # per-env visibility
  area = ((p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) -
          (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0]))
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
  shade = jnp.clip(0.45 + 0.6 * diff, 0.0, 1.1)
  tri_rgb = rgba[tg, :3] * shade[:, None]       # [T, 3]

  # ---- tile binning
  lo = jnp.minimum(jnp.minimum(p0, p1), p2)     # [T, 2]
  hi = jnp.maximum(jnp.maximum(p0, p1), p2)
  tiles_x = (jnp.arange(tx) * TS)[None, :]      # [1, tx]
  tiles_y = (jnp.arange(ty) * TS)[None, :]
  ox = (lo[:, 0:1] < tiles_x + TS) & (hi[:, 0:1] >= tiles_x)   # [T, tx]
  oy = (lo[:, 1:2] < tiles_y + TS) & (hi[:, 1:2] >= tiles_y)   # [T, ty]
  overlap = (oy[:, :, None] & ox[:, None, :] &
             valid[:, None, None])              # [T, ty, tx]
  overlap = overlap.reshape(-1, n_tiles).T      # [tiles, T]
  T = tri.shape[0]
  prio = jnp.where(overlap, jnp.arange(T, 0, -1)[None, :], 0)
  top_prio, top_idx = jax.lax.top_k(prio, K)    # [tiles, K]
  slot_ok = top_prio > 0

  # ---- gather per-tile triangle attributes
  def g(x):
    return x[top_idx]
  tp0, tp1, tp2 = g(p0), g(p1), g(p2)           # [tiles, K, 2]
  tid0 = g(1.0 / jnp.maximum(d0, 1e-6))
  tid1 = g(1.0 / jnp.maximum(d1, 1e-6))
  tid2 = g(1.0 / jnp.maximum(d2, 1e-6))
  trgb = g(tri_rgb)                             # [tiles, K, 3]
  tok = slot_ok

  # ---- pixel centers per tile
  px_local = jnp.stack(jnp.meshgrid(jnp.arange(TS) + 0.5,
                                    jnp.arange(TS) + 0.5,
                                    indexing='xy'), -1).reshape(-1, 2)
  tile_origin = jnp.stack(
      jnp.meshgrid(jnp.arange(tx) * TS, jnp.arange(ty) * TS,
                   indexing='xy'), -1).reshape(-1, 2)  # [tiles, 2] (x, y)
  pix_c = tile_origin[:, None, :] + px_local[None, :, :]  # [tiles, px, 2]
  npx = TS * TS

  # ---- chunked z-buffer scan
  C = r.chunk
  n_chunks = K // C
  init = (jnp.full((n_tiles, npx), jnp.inf),
          jnp.zeros((n_tiles, npx, 3)))

  def chunk_step(carry, c_idx):
    zbuf, cbuf = carry
    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c_idx * C, C, axis=1)
    a, b_, c_ = sl(tp0), sl(tp1), sl(tp2)
    ia, ib, ic = sl(tid0), sl(tid1), sl(tid2)
    col = sl(trgb)
    ok = sl(tok)

    p = pix_c[:, None, :, :]
    A = a[:, :, None, :]
    B = b_[:, :, None, :]
    Cc = c_[:, :, None, :]
    e0 = ((B[..., 0] - A[..., 0]) * (p[..., 1] - A[..., 1]) -
          (B[..., 1] - A[..., 1]) * (p[..., 0] - A[..., 0]))
    e1 = ((Cc[..., 0] - B[..., 0]) * (p[..., 1] - B[..., 1]) -
          (Cc[..., 1] - B[..., 1]) * (p[..., 0] - B[..., 0]))
    e2 = ((A[..., 0] - Cc[..., 0]) * (p[..., 1] - Cc[..., 1]) -
          (A[..., 1] - Cc[..., 1]) * (p[..., 0] - Cc[..., 0]))
    tri_area = ((b_[..., 0] - a[..., 0]) * (c_[..., 1] - a[..., 1]) -
                (b_[..., 1] - a[..., 1]) * (c_[..., 0] - a[..., 0]))
    s = jnp.sign(tri_area)[:, :, None]
    inside = (e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0) & ok[:, :, None]
    inv_area = 1.0 / jnp.where(jnp.abs(tri_area) > 1e-9, tri_area, 1.0)
    l0 = e1 * inv_area[:, :, None]
    l1 = e2 * inv_area[:, :, None]
    l2 = e0 * inv_area[:, :, None]
    inv_z = l0 * ia[:, :, None] + l1 * ib[:, :, None] + l2 * ic[:, :, None]
    z = 1.0 / jnp.maximum(inv_z, 1e-6)
    z = jnp.where(inside, z, jnp.inf)

    # fold the C triangles of this chunk into the z/color buffers
    def fold(carry2, i):
      zb, cb = carry2
      zi = z[:, i, :]
      closer = zi < zb
      zb = jnp.where(closer, zi, zb)
      cb = jnp.where(closer[..., None], col[:, i, None, :].repeat(npx, 1),
                     cb)
      return (zb, cb), None

    (zbuf, cbuf), _ = jax.lax.scan(fold, (zbuf, cbuf), jnp.arange(C))
    return (zbuf, cbuf), None

  (zbuf, cbuf), _ = jax.lax.scan(chunk_step, init, jnp.arange(n_chunks))

  hit = jnp.isfinite(zbuf)
  sky = jnp.asarray(r.sky_rgb)
  rgb_tiles = jnp.where(hit[..., None], cbuf, sky)   # [tiles, px, 3]
  depth_tiles = jnp.where(hit, zbuf, r.zfar)

  # ---- reassemble tiles -> image
  rgb = rgb_tiles.reshape(ty, tx, TS, TS, 3).transpose(0, 2, 1, 3, 4)
  rgb = rgb.reshape(H, W, 3)
  depth = depth_tiles.reshape(ty, tx, TS, TS).transpose(0, 2, 1, 3)
  depth = depth.reshape(H, W)

  if r.depth_gl:
    zn, zf = r.znear, r.zfar
    depth = jnp.clip((zf / (zf - zn)) * (1.0 - zn / jnp.maximum(depth, zn)),
                     0.0, 1.0)

  rgb_u8 = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
  return rgb_u8, depth
