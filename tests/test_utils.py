"""Utility tests: runcmd logging, step timer, image grids."""

import argparse
import json
import os
import time

import numpy as np

from geeco_tpu.utils.plotting import create_image_grid
from geeco_tpu.utils.profiling import StepTimer
from geeco_tpu.utils.runscript import save_run_command


def test_save_run_command(tmp_path):
  parser = argparse.ArgumentParser()
  parser.add_argument('--foo', type=int, default=3)
  import sys
  old = sys.argv
  sys.argv = ['prog', '--foo', '7', '--unknown', 'x']
  try:
    path = save_run_command(parser, str(tmp_path))
  finally:
    sys.argv = old
  assert path.endswith('-runcmd.json')
  with open(path) as fp:
    payload = json.load(fp)
  assert payload['parsed_args']['foo'] == 7
  assert '--unknown' in payload['unparsed_args']


def test_step_timer(tmp_path):
  jsonl = str(tmp_path / 't.jsonl')
  timer = StepTimer('unit', window=4, jsonl_path=jsonl)
  for _ in range(6):
    with timer:
      time.sleep(0.002)
  s = timer.stats()
  assert 0.001 < s['mean_s'] < 0.2
  assert 'Hz' in timer.report()
  timer.close()
  lines = open(jsonl).read().strip().splitlines()
  assert len(lines) == 6


def test_image_grid():
  imgs = [np.full((4, 4, 3), i * 30, np.uint8) for i in range(5)]
  grid = create_image_grid(imgs, cols=3, pad=1)
  assert grid.shape == (9, 14, 3)
  # float input normalized
  grid2 = create_image_grid([np.ones((4, 4, 3)) * 0.5], cols=1)
  assert grid2[0, 0, 0] == 127
