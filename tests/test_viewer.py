"""Terminal debug viewer: ANSI rendering + scripted interactive session.

The viewer is the rebuild's counterpart of the reference GLFW window
(src/geeco_gym/pickplace.py:590-591); these tests exercise the frame->
ANSI conversion and a scripted drive of the tiny env (no TTY needed).
"""

import io

import numpy as np
import pytest

from geeco_tpu.render.viewer import TerminalViewer, frame_to_ansi


def test_frame_to_ansi_dimensions_and_colors():
  frame = np.zeros((32, 48, 3), np.uint8)
  frame[:16] = (255, 0, 0)      # top half red
  frame[16:] = (0, 0, 255)      # bottom half blue
  text = frame_to_ansi(frame, max_cols=48, max_rows=16)
  lines = text.split('\n')
  assert len(lines) == 16                      # 32 px rows -> 16 cell rows
  assert '▀' in lines[0]
  assert '38;2;255;0;0' in lines[0]            # red foreground on top
  assert '38;2;0;0;255' in lines[-1]           # blue rows at the bottom
  # every line resets its SGR state
  assert all(l.endswith('\x1b[0m') for l in lines)


def test_frame_to_ansi_accepts_float_frames():
  frame = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
  text = frame_to_ansi(frame, max_cols=16, max_rows=8)
  assert text.count('\n') == 7


def test_terminal_viewer_noop_without_tty():
  viewer = TerminalViewer()   # stdout under pytest is not a TTY
  viewer.feed(np.zeros((8, 8, 3), np.uint8))
  viewer.close()
  assert viewer.frames_shown == 1


def test_terminal_viewer_writes_to_file():
  buf = io.StringIO()
  viewer = TerminalViewer(fps=0, file=buf, max_cols=8, max_rows=4)
  viewer.feed(np.full((8, 8, 3), 128, np.uint8), hud='t=0')
  viewer.close()
  out = buf.getvalue()
  assert '▀' in out and 't=0' in out


@pytest.mark.slow
def test_scripted_viewer_session_tiny_env():
  """Drive the interactive CLI with a scripted key sequence on CPU.

  slow-marked (round-4 verdict ask 9: fast suite <10 min): the tiny-env
  compile is ~65 s and the ANSI formatting it exercises end-to-end is
  covered by the four fast tests above; the full CLI drive runs in the
  nightly/full suite (pytest -m '')."""
  import types

  from geeco_tpu.run import viewer as cli

  args = types.SimpleNamespace(
      shapes='pad1-cube1', frame_res=(32, 32), seed=0, move=0.5,
      keys='we gxq', out_dir='.', n_substeps=4, solver_iterations=8,
      fps=0.0)
  steps = cli.main(args)
  # 'w', 'e', ' ', 'g' step; 'x' resets t to 0; 'q' quits
  assert steps == 0
