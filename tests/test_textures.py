"""Texture sampling + background-video domain randomization tests."""

import os

from tests.conftest import reference_xml
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.core import mjcf
from geeco_tpu.data.videos import VideoCycler, frame_to_texels
from geeco_tpu.envs.base import make_env
from geeco_tpu.render.scene import build_render_scene


@pytest.fixture(scope='module')
def env():
  e = make_env('pad2-cube2', frame_res=(128, 128))
  e.setup()
  return e


def test_scene_has_texture_slots(env):
  scene = env.renderer.scene
  assert scene.tex_default.shape[0] >= 5   # 3 walls + floor + table top
  names = [env.model.geom_name[int(g)] for g in scene.tex_slot_geom]
  assert 'wall_04' in names
  assert 'floor0' in names
  # textured tris reference valid slots/texels
  s = scene.tri_texslot
  assert (s < scene.tex_default.shape[0]).all()
  R = scene.tex_res
  assert (scene.tri_texel[s >= 0] < R * R).all()


def test_textured_render_differs_from_flat(env):
  """Texture sampling must produce spatial variation on the table top."""
  es = env.reset_random(jax.random.PRNGKey(0))
  rgb, _ = jax.jit(env.render)(es)
  rgb = np.asarray(rgb).astype(np.float32)
  # bottom half of the frame is dominated by the textured table/floor:
  # a flat-shaded render has near-zero variance per surface; texels vary
  region = rgb[64:112, 32:96]
  assert region.std(axis=(0, 1)).mean() > 5.0


def test_background_override_changes_wall_only(env):
  es = env.reset_random(jax.random.PRNGKey(0))
  scene = env.renderer.scene
  R = scene.tex_res
  base, _ = jax.jit(env.render)(es)
  red = jnp.zeros((R, R, 3)).at[..., 0].set(1.0)
  over, _ = jax.jit(lambda e, f: env.render(
      e, textures=env.background_textures(f)))(es, red)
  base, over = np.asarray(base, np.int32), np.asarray(over, np.int32)
  diff = np.abs(base - over).sum(-1)   # [128, 128]
  # the back wall (upper region behind the robot) changes...
  assert (diff[:20] > 30).mean() > 0.2
  # ...but the table-top region pixels are untouched
  assert diff[75:100, 30:100].max() == 0


def test_video_cycler_cycles(tmp_path):
  from PIL import Image
  d = tmp_path / 'frames'
  d.mkdir()
  for i, c in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
    Image.new('RGB', (32, 24), c).save(d / f'f{i}.png')
  cyc = VideoCycler(str(d))
  seen = [next(cyc)[0, 0].tolist() for _ in range(7)]  # cycles 3 frames
  assert seen[0] == [255, 0, 0] and seen[3] == [255, 0, 0]
  assert seen[1] == [0, 255, 0] and seen[5] == [0, 0, 255]
  tex = cyc.texel_steps(4, 16)
  assert tex.shape == (4, 16, 16, 3) and tex.dtype == np.float32
  assert 0.0 <= tex.min() and tex.max() <= 1.0


def test_tex_grid_zero_disables(env):
  m, a = mjcf.load_model(reference_xml('geeco-pad2-cube2.xml'))
  sc = build_render_scene(m, a, tex_grid=0)
  assert sc.tex_default.shape[0] == 0
  assert (sc.tri_texslot == -1).all()
