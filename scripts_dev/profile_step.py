"""Dev: op-level TPU profile of one env step (+render) at a given batch.

Captures a jax.profiler trace of N steady-state steps and prints the
self-time breakdown by op category from the trace events, so the perf
work targets the measured bottleneck instead of a guess.

Env: B (default 256), N (default 4), RENDER (1 default), SCENE,
     METHOD/ITERS (solver), OUT (trace dir, default /tmp/step_trace).
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from geeco_tpu.envs.base import GeecoEnv

B = int(os.environ.get('B', '256'))
N = int(os.environ.get('N', '4'))
RENDER = int(os.environ.get('RENDER', '1'))
SCENE = os.environ.get('SCENE', 'pad2-cube2')
METHOD = os.environ.get('METHOD', 'psd')
ITERS = int(os.environ.get('ITERS', '60'))
OUT = os.environ.get('OUT', '/tmp/step_trace')


def readback(*arrays):
  tot = sum(jnp.sum(a[..., -1].astype(jnp.float32)) for a in arrays)
  return float(jax.device_get(tot))


env = GeecoEnv(shapes=SCENE, settle_steps=2, solver_method=METHOD,
               solver_iterations=ITERS)
env.setup()
rngs = jax.random.split(jax.random.PRNGKey(0), B)
es = jax.jit(jax.vmap(env.reset_random))(rngs)
readback(es.phys.qpos)

if RENDER:
  def fn(es, action):
    es = env.step(es, action)
    rgb, _ = env.render(es)
    return es, rgb
else:
  def fn(es, action):
    es = env.step(es, action)
    return es, es.phys.qvel

batched = jax.jit(jax.vmap(fn))
base = jnp.tile(jnp.asarray([0.1, 0.0, 0.2, 1.0]), (B, 1))
es, out = batched(es, base)
readback(es.phys.qpos, out)

jax.profiler.start_trace(OUT)
for i in range(N):
  es, out = batched(es, base + 0.01 * i)
readback(es.phys.qpos, out)
jax.profiler.stop_trace()
print('trace written to', OUT)

# ---- parse the trace: self-time by op name on the device track
paths = glob.glob(os.path.join(OUT, 'plugins/profile/*/*.trace.json.gz'))
if not paths:
  print('no trace json found'); sys.exit(0)
path = max(paths, key=os.path.getmtime)
with gzip.open(path, 'rt') as f:
  trace = json.load(f)
events = trace.get('traceEvents', [])
# device-track events: pid/tid with 'dur' on TPU lanes
by_name = defaultdict(float)
total = 0.0
pid_names = {e.get('pid'): e.get('args', {}).get('name', '')
             for e in events if e.get('ph') == 'M' and
             e.get('name') == 'process_name'}
for e in events:
  if e.get('ph') != 'X' or 'dur' not in e:
    continue
  pname = pid_names.get(e.get('pid'), '')
  if 'TPU' not in str(pname) and 'tpu' not in str(pname):
    continue
  name = e.get('name', '?')
  by_name[name] += e['dur']
  total += e['dur']
print(f'total device time: {total / 1e3:.1f} ms over {N} steps '
      f'({total / 1e3 / N:.1f} ms/step)')
for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
  print(f'{dur / 1e3 / N:9.2f} ms/step  {100 * dur / max(total, 1):5.1f}%  '
        f'{name[:110]}')
