"""Video sink tests (GIF/PNG backends, batch tiling)."""

import os

import numpy as np
from PIL import Image

from geeco_tpu.render.video import VideoRecorder, tile_batch


def test_gif_backend(tmp_path):
  rec = VideoRecorder('test', str(tmp_path), backend='gif', fps=10)
  for i in range(12):
    rec.feed(np.full((32, 32, 3), i * 20, np.uint8))
  path = rec.finalize()
  assert path and os.path.exists(path)
  img = Image.open(path)
  n = 1
  try:
    while True:
      img.seek(img.tell() + 1)
      n += 1
  except EOFError:
    pass
  assert n == 12


def test_png_backend(tmp_path):
  rec = VideoRecorder('seq', str(tmp_path), backend='png')
  for i in range(3):
    rec.feed(np.zeros((8, 8, 3), np.uint8))
  path = rec.finalize()
  base = path.rsplit('.', 1)[0]
  assert len(os.listdir(base)) == 3


def test_tile_batch():
  g = tile_batch(np.zeros((5, 16, 16, 3), np.uint8))
  # 5 images -> 3 cols x 2 rows
  assert g.shape == (32, 48, 3)
  g1 = tile_batch(np.zeros((4, 8, 8, 3), np.uint8))
  assert g1.shape == (16, 16, 3)


def test_float_frames_and_batch_feed(tmp_path):
  rec = VideoRecorder('f', str(tmp_path), backend='gif')
  rec.feed(np.random.rand(4, 8, 8, 3))  # batched float frame
  path = rec.finalize()
  assert os.path.exists(path)
