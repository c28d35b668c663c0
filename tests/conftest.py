"""Test configuration: force a virtual 8-device CPU mesh before jax imports.

Sharding/pjit tests run on 8 virtual CPU devices as the multi-chip stand-in
(real multi-chip hardware is not available in CI); numerical tests also run on
CPU for speed and determinism.
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

# The axon TPU plugin (injected via sitecustomize on this image) may already
# have imported jax with JAX_PLATFORMS=axon; first axon backend init blocks
# for minutes over the device tunnel.  Force the CPU platform post-import —
# this must run before any jax computation.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache: the big env/model graphs take minutes to
# compile on this 1-core box; re-runs of the suite hit the cache instead.
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(REPO_ROOT, '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
if REPO_ROOT not in sys.path:
  sys.path.insert(0, REPO_ROOT)

REFERENCE_ASSETS = os.path.join(REPO_ROOT, 'geeco_tpu', 'assets_gym')


def reference_xml(name: str) -> str:
  """Path to a reference scene XML (read-only)."""
  return os.path.join(REFERENCE_ASSETS, 'envs', name)
