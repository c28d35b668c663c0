"""Viewer smoke tests (playback mode; reference parity: the interactive
debug viewer of src/geeco_gym/pickplace.py:590-591, served as a local web
page instead of a GL window)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from geeco_tpu.run.viewer import EpisodeSource, make_handler


@pytest.fixture(scope='module')
def served_episode(tmp_path_factory):
  path = tmp_path_factory.mktemp('ep') / 'replay_buffer_0001.npz'
  rng = np.random.default_rng(0)
  np.savez(path,
           rgb=rng.integers(0, 255, (7, 16, 16, 3), dtype=np.uint8),
           cmd=rng.normal(size=(7, 4)).astype(np.float32),
           ctrl=rng.normal(size=(7, 2)).astype(np.float32),
           obj_qpos=rng.normal(size=(7, 7)).astype(np.float32),
           ts=np.arange(7, dtype=np.float32))
  src = EpisodeSource(str(path))
  server = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(src))
  t = threading.Thread(target=server.serve_forever, daemon=True)
  t.start()
  yield f'http://127.0.0.1:{server.server_address[1]}', src
  server.shutdown()


def test_meta_and_page(served_episode):
  url, src = served_episode
  meta = json.loads(urllib.request.urlopen(f'{url}/meta').read())
  assert meta['n_steps'] == 7 and not meta['live']
  assert len(meta['cmd']) == 7 and len(meta['cmd'][0]) == 4
  assert set(meta['scalars']) >= {'cmd', 'ctrl', 'obj_qpos', 'ts'}
  page = urllib.request.urlopen(f'{url}/').read().decode()
  assert 'geeco_tpu viewer' in page and '/live/step' in page


def test_frame_png_roundtrip(served_episode):
  url, src = served_episode
  from PIL import Image
  import io
  raw = urllib.request.urlopen(f'{url}/frame/3').read()
  im = np.asarray(Image.open(io.BytesIO(raw)))
  np.testing.assert_array_equal(im, src.rgb[3])
  # out-of-range indices clamp instead of erroring
  urllib.request.urlopen(f'{url}/frame/999').read()
