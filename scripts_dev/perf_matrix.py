"""Dev: one-process solver/batch perf matrix on the real chip.

Times the full env step (20 substeps + 256x256 render) for a list of
(solver_method, solver_iterations, batch) configs in ONE python process so
the ~3 min axon tunnel init and scene compile are paid once.  Follows the
axon measurement rules (forced host readbacks, per-iter perturbed inputs).

Env overrides:
  CONFIGS  semicolon list of method:iters[:select_k[:collide_every[:mass_inverse]]]
           (default "psd:60;bb:60;bb:90;pallas:60"); select_k overrides
           the contact active-set size (default: env auto, 128 for
           pad2-cube2); collide_every reuses narrowphase contacts for
           that many substeps (default 1 = exact)
  SWEEP    comma list of batch sizes (default "256,512,1024")
  N        timed iters per config (default 8)
  SCENE    (default pad2-cube2)
  RENDER   1 = step+render (default), 0 = physics only, 2 = render only
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from geeco_tpu.envs.base import GeecoEnv

CONFIGS = os.environ.get('CONFIGS', 'psd:60;bb:60;bb:90;pallas:60')
SWEEP = [int(b) for b in os.environ.get('SWEEP', '256,512,1024').split(',')]
N = int(os.environ.get('N', '8'))
SCENE = os.environ.get('SCENE', 'pad2-cube2')
RENDER = int(os.environ.get('RENDER', '1'))
# RK=coarse_k,mid_k : binning-capacity trim (fidelity gate:
# scripts_dev/binning_fidelity.py — adopt only at <1% pixel mismatch)
RK = os.environ.get('RK', '')


def readback(*arrays):
  tot = sum(jnp.sum(a[..., -1].astype(jnp.float32)) for a in arrays)
  return float(jax.device_get(tot))


def bench_env(env, B, n_iters):
  rngs = jax.random.split(jax.random.PRNGKey(0), B)
  es = jax.jit(jax.vmap(env.reset_random))(rngs)
  readback(es.phys.qpos)

  if RENDER == 1:
    def fn(es, action):
      es = env.step(es, action)
      rgb, _ = env.render(es)
      return es, rgb
  elif RENDER == 2:
    def fn(es, action):
      # perturb qpos from the action so repeated renders aren't cacheable
      es = es.replace(phys=es.phys.replace(
          qpos=es.phys.qpos + 1e-6 * jnp.sum(action)))
      rgb, _ = env.render(es)
      return es, rgb
  else:
    def fn(es, action):
      es = env.step(es, action)
      return es, es.phys.qvel

  batched = jax.jit(jax.vmap(fn))
  base = jnp.tile(jnp.asarray([0.1, 0.0, 0.2, 1.0]), (B, 1))
  deltas = [jax.device_put(0.01 * jnp.sin(0.7 * i + jnp.arange(4))[None, :])
            for i in range(n_iters)]
  t_c0 = time.perf_counter()
  es2, out = batched(es, base + deltas[0])
  readback(es2.phys.qpos, out)
  compile_s = time.perf_counter() - t_c0
  es2, out = batched(es2, base + deltas[1])
  readback(es2.phys.qpos, out)

  t0 = time.perf_counter()
  for i in range(n_iters):
    es2, out = batched(es2, base + deltas[i])
  readback(es2.phys.qpos, out)
  dt = time.perf_counter() - t0
  return B * n_iters / dt, dt / n_iters, compile_s


def main():
  rows = []
  for cfg in CONFIGS.split(';'):
    parts = cfg.split(':')
    method, iters = parts[0], int(parts[1])
    sel_k = int(parts[2]) if len(parts) > 2 and parts[2] else None
    ce = int(parts[3]) if len(parts) > 3 and parts[3] else 1
    mi = parts[4] if len(parts) > 4 and parts[4] else 'chol'
    su = int(parts[5]) if len(parts) > 5 and parts[5] else 1
    roll_tok = parts[6] if len(parts) > 6 and parts[6] else 'auto'
    roll = {'auto': 'auto', 'on': True, 'off': False}.get(roll_tok)
    if roll is None:
      raise SystemExit(f'bad roll token {roll_tok!r} in {cfg!r}: '
                       f'valid tokens are auto/on/off')
    tag = (f'{method}@{iters}' + (f' K={sel_k}' if sel_k else '') +
           (f' ce={ce}' if ce > 1 else '') +
           (f' mi={mi}' if mi != 'chol' else '') +
           (f' su={su}' if su > 1 else '') +
           (f' roll={roll}' if roll != 'auto' else ''))
    rk = {}
    if RK:
      k1, k2 = (int(v) for v in RK.split(','))
      rk = {'renderer_kwargs': {'coarse_k': k1, 'mid_k': k2}}
      tag += f' rk={k1}/{k2}'
    env = GeecoEnv(shapes=SCENE, settle_steps=2, solver_method=method,
                   solver_iterations=iters, contact_select_k=sel_k,
                   collide_every=ce, mass_inverse=mi, substep_unroll=su,
                   rolling=roll, **rk)
    env.setup()
    for B in SWEEP:
      try:
        sps, ms, comp = bench_env(env, B, N)
      except Exception as e:
        print(f'{tag} B={B}: FAILED {type(e).__name__}: {e}',
              flush=True)
        continue
      rows.append((tag, B, sps, ms))
      print(f'{tag} B={B}: {sps:9.1f} env-steps/s  '
            f'{ms * 1e3:8.1f} ms/step  (compile {comp:.0f}s)', flush=True)
  best = max(rows, key=lambda r: r[2]) if rows else None
  if best:
    print(f'BEST: {best[0]} B={best[1]} -> {best[2]:.1f} steps/s')


if __name__ == '__main__':
  main()
