"""Dev profiler: time physics-only vs render-only vs full step at batch B."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from geeco_tpu.envs.base import GeecoEnv

B = int(os.environ.get('B', '256'))
N = int(os.environ.get('N', '10'))

env = GeecoEnv(shapes='pad2-cube2', settle_steps=2)
env.setup()

rngs = jax.random.split(jax.random.PRNGKey(0), B)
es = jax.jit(jax.vmap(env.reset_random))(rngs)
jax.block_until_ready(es.phys.qpos)
actions = jnp.tile(jnp.asarray([0.1, 0.0, 0.2, 1.0]), (B, 1))


def timed(name, fn, *args):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(N):
    out = fn(*args)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / N
  print(f'{name:24s} {dt*1e3:9.2f} ms/call  {B/dt:12.1f} env-steps/s')
  return out


phys = jax.jit(jax.vmap(env.step))
rend = jax.jit(jax.vmap(env.render))


def full(es, a):
  es = env.step(es, a)
  rgb, d = env.render(es)
  return es, rgb, d


fullj = jax.jit(jax.vmap(full))

timed('physics step (20 sub)', phys, es, actions)
timed('render 256x256', rend, es)
timed('step+render', fullj, es, actions)
