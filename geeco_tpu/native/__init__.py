"""Native (C++) components: build-on-first-use shared libraries."""

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(os.path.expanduser('~'), '.cache', 'geeco_tpu')


def build_lib(name: str) -> str:
  """Compile geeco_tpu/native/<name>.cpp into a cached shared library."""
  src = os.path.join(_DIR, f'{name}.cpp')
  os.makedirs(_CACHE, exist_ok=True)
  lib = os.path.join(_CACHE, f'lib{name}.so')
  if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
    return lib
  cmd = ['g++', '-O2', '-shared', '-fPIC', '-o', lib, src, '-lz']
  subprocess.run(cmd, check=True, capture_output=True)
  return lib
