"""Rasterizer tests on the real pad2-cube2 scene."""

from tests.conftest import reference_xml
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.core.model import make_state, set_joint_qpos
from geeco_tpu.physics.step import build_stepper
from geeco_tpu.render.rasterizer import build_renderer


@pytest.fixture(scope='module')
def rendered():
  model, assets = mjcf.load_model(
      reference_xml('geeco-pad2-cube2.xml'))
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  qpos = state.qpos
  for name, val in (('robot0:slide0', 0.405), ('robot0:slide1', 0.48),
                    ('robot0:slide2', 0.0)):
    qpos = set_joint_qpos(model, qpos, name, val)
  for name, xy in (('object0:joint', (1.3, 0.6)),
                   ('object1:joint', (1.3, 0.9)),
                   ('goal0:joint', (1.45, 0.6)),
                   ('goal1:joint', (1.45, 0.9))):
    z = 0.3075 if name.startswith('object') else 0.296
    qpos = set_joint_qpos(model, qpos, name,
                          jnp.array([xy[0], xy[1], z, 1, 0, 0, 0]))
  state = state.replace(qpos=qpos)
  kin = st.fk(state)
  r = build_renderer(model, assets)
  # recolor the task objects like env reset does (pickplace.py:386-425)
  rgba = model.geom_rgba
  rgba = rgba.at[model.geom('object0')].set(jnp.array([1, 0, 0, 1.0]))
  rgba = rgba.at[model.geom('goal0')].set(jnp.array([0, 0, 1, 1.0]))
  rgb, depth = jax.jit(r.render)(kin, rgba)
  return model, r, np.asarray(rgb), np.asarray(depth), kin, rgba


def test_shapes_and_types(rendered):
  _, _, rgb, depth = rendered[:4]
  assert rgb.shape == (256, 256, 3) and rgb.dtype == np.uint8
  assert depth.shape == (256, 256) and np.isfinite(depth).all()


def test_sky_at_top(rendered):
  _, r, rgb, depth = rendered[:4]
  # top rows are sky (or far wall) — depth far, greenish-gray
  assert depth[0].min() > 1.0
  # some top-left pixels miss all geometry -> sky color
  sky = np.array(r.sky_rgb) * 255
  corner = rgb[0, 0]
  assert np.all(np.abs(corner.astype(int) - sky.astype(int)) < 60) or \
      depth[0, 0] < r.zfar  # wall hit is fine too


def test_scene_content_visible(rendered):
  _, _, rgb, depth = rendered[:4]
  # the image must not be a single flat color
  assert rgb.reshape(-1, 3).std(axis=0).mean() > 10
  # red object0 pixels exist (recolored at reset)
  red = (rgb[:, :, 0] > 150) & (rgb[:, :, 1] < 90) & (rgb[:, :, 2] < 90)
  assert red.sum() > 5, f'red cube not visible ({red.sum()} px)'
  # blue goal pad pixels exist
  blue = (rgb[:, :, 2] > 120) & (rgb[:, :, 0] < 90)
  assert blue.sum() > 5, f'blue pad not visible ({blue.sum()} px)'


def test_depth_orders_scene(rendered):
  _, _, rgb, depth = rendered[:4]
  # table region (lower half center) closer than top rows
  assert depth[200, 128] < depth[5, 128]


def test_visibility_mask(rendered):
  model, r, rgb, _ = rendered[:4]
  # hiding every object geom removes red pixels
  rgba = model.geom_rgba
  rgba = rgba.at[model.geom('object0')].set(jnp.array([1, 0, 0, 0.0]))
  st_kin_rgb, _ = jax.jit(r.render)(_kin_of(model), rgba)
  red = (np.asarray(st_kin_rgb)[:, :, 0] > 150) & \
      (np.asarray(st_kin_rgb)[:, :, 1] < 90)
  assert red.sum() <= 5


def _kin_of(model):
  from geeco_tpu.physics.step import build_stepper
  st = build_stepper(model)
  state = st.init_state(make_state(model))
  qpos = state.qpos
  for name, val in (('robot0:slide0', 0.405), ('robot0:slide1', 0.48),
                    ('robot0:slide2', 0.0)):
    qpos = set_joint_qpos(model, qpos, name, val)
  qpos = set_joint_qpos(model, qpos, 'object0:joint',
                        jnp.array([1.3, 0.6, 0.3075, 1, 0, 0, 0]))
  return st.fk(state.replace(qpos=qpos))


def test_shadow_sets_compiled(rendered):
  model, r = rendered[0], rendered[1]
  sc = r.scene
  # receivers = static-body tris, casters = free-body tris (the 4
  # objects); with analytic_rects=True the planes/table-top receivers
  # move to rect shadow grids instead (covered in test_render_golden)
  assert sc.shadow_recv.size > 100 and sc.shadow_cast.size >= 24
  assert sc.rect_geom.size == 0  # default scene keeps the tessellated path
  gb = np.asarray(model.geom_bodyid)
  cast_bodies = {model.body_name[gb[g]] for g in
                 np.asarray(sc.tri_geom)[sc.shadow_cast]}
  assert all(b.startswith(('object', 'goal')) for b in cast_bodies)
  # arm capsule proxies double as occluders
  assert len(r.shadow_caps) >= 3
  # dedup bought a real reduction over 3 points/tri
  assert sc.shadow_pts.size < 0.6 * 3 * sc.shadow_recv.size


def test_shadows_darken_not_brighten(rendered):
  model, r, rgb_on, _, kin, rgba = rendered
  off, _ = jax.jit(r._replace(shadows=False).render)(kin, rgba)
  on = rgb_on.astype(int)
  off = np.asarray(off).astype(int)
  diff = on - off
  # shadows only remove the diffuse term — never brighten
  assert (diff > 2).sum() == 0, f'{(diff > 2).sum()} brightened px'
  # a visible shadow region exists under/near the objects
  assert (diff.min(-1) < -8).sum() > 30, 'no shadow pixels'
  # sky rows untouched
  assert (on[0, :32] == off[0, :32]).all()


def test_pallas_kernel_matches_jnp_reference():
  """The affine-coefficient Pallas kernel (interpret mode on CPU) must
  match the chunked-jnp reference rasterizer on random triangle planes."""
  from geeco_tpu.render import rasterizer as rz

  TS, S, K, n_tiles = 8, 2, 16, 16
  rng = np.random.RandomState(0)
  MTS = TS * S
  # mid-relative vertex coords spanning the mid region and beyond
  coords = rng.uniform(-6.0, MTS + 6.0, size=(6, K, n_tiles)).astype(
      np.float32)
  x0, y0, x1, y1, x2, y2 = coords
  # avoid near-degenerate triangles (paths differ in |area|->0 guards)
  area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
  bad = np.abs(area) < 1.0
  x2 = np.where(bad, x2 + 4.0, x2)
  y2 = np.where(bad, y2 + 3.0, y2)
  depth = rng.uniform(0.5, 5.0, size=(3, K, n_tiles)).astype(np.float32)
  iz0, iz1, iz2 = (1.0 / depth[i] for i in range(3))
  ok = (rng.uniform(size=(K, n_tiles)) > 0.25).astype(np.float32)
  colp = rng.randint(0, 256 ** 3, size=(K, n_tiles)).astype(np.float32)
  sky = 123456.0

  planes = [jnp.asarray(p) for p in
            (x0, y0, x1, y1, x2, y2, iz0, iz1, iz2, ok, colp)]
  izbuf, cbuf = rz._raster_pallas_call(planes, TS, sky, mid_sub=S,
                                       interpret=True)
  izbuf, cbuf = np.asarray(izbuf), np.asarray(cbuf)

  # reference: shift coords to fine-tile origin and run the jnp scan path
  sub = np.arange(n_tiles) % (S * S)
  oxt = ((sub % S) * TS).astype(np.float32)[None, :]
  oyt = ((sub // S) * TS).astype(np.float32)[None, :]
  ref_planes = [jnp.asarray(p.T) for p in
                (x0 - oxt, y0 - oyt, x1 - oxt, y1 - oyt, x2 - oxt,
                 y2 - oyt, iz0, iz1, iz2, ok, colp)]
  r = rz.Renderer(model=None, scene=None, width=TS, height=TS, cam_id=0,
                  tile=TS, tris_per_tile=K, chunk=8, znear=0.05, zfar=10.0,
                  sky_rgb=(0, 0, 0), depth_gl=False, cull=0, coarse=0,
                  coarse_k=K, mid_k=K, backend='jnp', shadows=False,
                  shadow_caps=(), rect_pixel_texels=False)
  zbuf_ref, cbuf_ref = rz._raster_jnp(r, ref_planes, n_tiles, TS * TS)
  zbuf_ref = np.asarray(zbuf_ref).T              # -> [npx, n_tiles]
  cbuf_ref = np.where(np.isfinite(zbuf_ref),
                      np.asarray(cbuf_ref).T, sky)

  # allow ULP-level inside/outside flips on pixels that sit exactly on an
  # edge after the affine rearrangement
  mism = cbuf != cbuf_ref
  assert mism.mean() < 0.005, f'{mism.sum()} mismatched pixels'
  hit = (izbuf > 0) & np.isfinite(zbuf_ref) & ~mism
  assert hit.any()
  np.testing.assert_allclose(1.0 / izbuf[hit], zbuf_ref[hit],
                             rtol=1e-4, atol=1e-4)
