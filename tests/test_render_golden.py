"""Golden visual parity vs REAL MuJoCo geometry (round-2 verdict ask 6).

The build image has no OpenGL stack (no /dev/dri, EGL init fails, no
OSMesa), so the reference's actual rendered RGB frames
(src/geeco_gym/pickplace.py:260-264) cannot be reproduced here.  Instead
the fixtures store per-pixel ray-cast z-depth from ``mujoco.mj_ray`` at
the same camera (``external_camera_1``, fovy/pose from the vendored MJCF)
— real-MuJoCo ground truth for the camera model, every silhouette, and
all occlusion relationships (recorded by
scripts_dev/record_mujoco_raycast_fixture.py).  The debug ee-crosshair is
zeroed on both sides, matching what recorded policy frames contain
(reference pickplace.py:568-571; repo env rgba0).

Measured parity (2026-08-20, analytic-rect renderer): median depth error
exact (0 mm, all flat interior pixels), zero dropped-geometry (sky)
pixels on every scene/backend, mismatched pixels >2 cm: 2.6-3.4% jnp /
4.0-5.1% pallas (silhouette edge pixels plus decimated-hull mesh geoms),
foreground silhouette IoU 0.974-0.996 (lowest on nut-cone: decimated
convex hulls vs exact meshes).
"""

import os

from tests.conftest import reference_xml  # noqa: F401  (forces CPU platform)
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.core.model import State
from geeco_tpu.physics import kinematics as kin
from geeco_tpu.render.rasterizer import build_renderer

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'fixtures')
ENVDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'geeco_tpu', 'assets_gym', 'envs')

CASES = [  # (fixture tag, scene xml, renderer variants to run)
    ('pad2cube2', 'geeco-pad2-cube2.xml',
     ('jnp', 'pallas', 'jnp-analytic')),
    ('pushpad2cube2', 'geeco-push-pad2-cube2.xml', ('jnp',)),
    pytest.param('pad2cube2clutter4', 'geeco-pad2-cube2-clutter4.xml',
                 ('jnp',), marks=pytest.mark.slow),
    pytest.param('nutcone', 'geeco-nut-cone.xml', ('jnp',),
                 marks=pytest.mark.slow),
]


def _render_all(tag, xml, variant):
  golden = np.load(os.path.join(FIXDIR, f'mujoco_raycast_{tag}.npz'))
  m, assets = mjcf.load_model(os.path.join(ENVDIR, xml))
  H, W = int(golden['height']), int(golden['width'])
  backend, _, opt = variant.partition('-')
  r = build_renderer(m, assets, width=W, height=H, backend=backend,
                     analytic_rects=(opt == 'analytic'))
  for k in range(golden['qpos'].shape[0]):
    st = State(qpos=jnp.asarray(golden['qpos'][k]),
               qvel=jnp.zeros(m.nv), ctrl=jnp.zeros(9),
               mocap_pos=jnp.asarray(golden['mocap_pos'][k]),
               mocap_quat=jnp.asarray(golden['mocap_quat'][k]),
               time=jnp.asarray(0.0))
    _, depth = r.render(kin.fk(m, st))
    yield k, np.asarray(depth), golden['depth'][k]


@pytest.mark.parametrize('tag,xml,backends', CASES)
def test_depth_matches_mujoco_raycast(tag, xml, backends):
  for backend in backends:
    for k, d, g in _render_all(tag, xml, backend):
      err = np.abs(d - g)
      # no dropped geometry: every golden-hit pixel must be drawn
      miss = np.mean((d > 9.9) & (g > 0))
      assert miss < 1e-3, f'{backend} frame {k}: {miss:.4f} sky holes'
      # interior pixels are exact: camera model and flat-surface
      # geometry agree to float precision
      assert np.median(err) < 1e-3, \
          f'{backend} frame {k}: median {np.median(err)}'
      # silhouette edges + decimated mesh hulls bound the mismatch area
      frac2cm = np.mean(err > 0.02)
      assert frac2cm < 0.07, f'{backend} frame {k}: frac>2cm {frac2cm:.4f}'
      frac10cm = np.mean(err > 0.10)
      assert frac10cm < 0.05, \
          f'{backend} frame {k}: frac>10cm {frac10cm:.4f}'


@pytest.mark.parametrize('tag,xml,backends', CASES)
def test_silhouette_iou_vs_mujoco(tag, xml, backends):
  """Foreground silhouettes (anything nearer than the background walls)
  must overlap the MuJoCo ray-cast silhouette at high IoU."""
  for k, d, g in _render_all(tag, xml, 'jnp'):
    ours = d < 2.0
    mjs = g < 2.0
    iou = (ours & mjs).sum() / max((ours | mjs).sum(), 1)
    assert iou > 0.965, f'frame {k}: silhouette IoU {iou:.4f}'
