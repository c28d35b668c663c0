"""Per-stage render + physics profiler at batch B (forced-readback timing).

Times, at B envs on the current backend:
  - full control step (20 substeps + render)       [the bench number]
  - physics step only, and with collide_every/solver-iteration variants
  - render only, and its stages: project+shade / binning / raster kernel
Env knobs: B (default 256), N (timed iters, default 10).

Usage (TPU, during a training pause):
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts_dev/profile_render_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from geeco_tpu.envs.base import GeecoEnv
from geeco_tpu.render import rasterizer as R

B = int(os.environ.get('B', '256'))
N = int(os.environ.get('N', '10'))


def readback(x):
  leaves = jax.tree.leaves(x)
  tot = sum(jnp.sum(l.astype(jnp.float32) if l.dtype != jnp.float32 else l)
            for l in leaves if hasattr(l, 'dtype'))
  return float(jax.device_get(tot))


def timed(name, fn, *args):
  out = fn(*args)          # compile
  readback(out)
  out = fn(*args)          # steady-state dispatch
  readback(out)
  t0 = time.perf_counter()
  for _ in range(N):
    out = fn(*args)
  readback(out)
  dt = (time.perf_counter() - t0) / N
  print(f'{name:34s} {dt*1e3:9.2f} ms/call  {B/dt:12.1f} env-steps/s',
        flush=True)
  return dt


def main():
  env = GeecoEnv(shapes='pad2-cube2', settle_steps=2)
  env.setup()
  rngs = jax.random.split(jax.random.PRNGKey(0), B)
  es = jax.jit(jax.vmap(env.reset_random))(rngs)
  readback(es.phys.qpos)
  actions = jnp.tile(jnp.asarray([0.1, 0.0, 0.2, 1.0]), (B, 1))

  def full(es, a):
    es2 = env.step(es, a)
    rgb, d = env.render(es2)
    return es2.phys.qpos, rgb

  def tp_stage(es):
    kin = env.kin(es)
    tp = R._project_and_shade(env.renderer, kin, es.rgba)
    return tp.colp, tp.x0

  def bin_stage(es):
    kin = env.kin(es)
    tp = R._project_and_shade(env.renderer, kin, es.rgba)
    return R._bin_pallas(env.renderer, tp)

  def kern_stage(es):
    kin = env.kin(es)
    tp = R._project_and_shade(env.renderer, kin, es.rgba)
    planes = R._bin_pallas(env.renderer, tp)
    izb, cb = R._raster_pallas_call(planes, env.renderer.tile,
                                    R._pack_sky(env.renderer.sky_rgb),
                                    mid_sub=2,
                                    interpret=jax.default_backend() != 'tpu')
    return izb, cb

  def shade_only(es):
    # projection + shading WITHOUT shadow occlusion, to split its cost
    r2 = env.renderer._replace(shadows=False)
    kin = env.kin(es)
    tp = R._project_and_shade(r2, kin, es.rgba)
    return tp.colp, tp.x0

  timed('full step+render', jax.jit(jax.vmap(full)), es, actions)
  timed('physics step', jax.jit(jax.vmap(env.step)), es, actions)
  timed('render', jax.jit(jax.vmap(env.render)), es)
  timed('  project+shade (w/ shadows)', jax.jit(jax.vmap(tp_stage)), es)
  timed('  project+shade (no shadows)', jax.jit(jax.vmap(shade_only)), es)
  timed('  ..+binning', jax.jit(jax.vmap(bin_stage)), es)
  timed('  ..+raster kernel', jax.jit(jax.vmap(kern_stage)), es)

  for ce in (2, 4):
    e2 = GeecoEnv(shapes='pad2-cube2', settle_steps=2, collide_every=ce)
    e2.setup()
    timed(f'physics ce={ce}', jax.jit(jax.vmap(e2.step)), es, actions)
  e3 = GeecoEnv(shapes='pad2-cube2', settle_steps=2, solver_iterations=40)
  e3.setup()
  timed('physics si=40', jax.jit(jax.vmap(e3.step)), es, actions)


if __name__ == '__main__':
  main()
