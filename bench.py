"""Benchmark: batched env stepping + rendering throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/sec/chip", "vs_baseline": N}

The metric is control-rate env steps (20 physics substeps @ 2 ms + one
256x256 RGB render each, the reference's operating point: SURVEY.md §6).
``vs_baseline`` is the fraction of the BASELINE.json north-star target of
1e6 env-steps/sec (the reference repo publishes no throughput numbers;
BASELINE.json "published": {}).

Env overrides: BENCH_NUM_ENVS, BENCH_STEPS, BENCH_RENDER_EVERY.
"""

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
  sys.path.insert(0, REPO_ROOT)

NORTH_STAR = 1_000_000.0


def main():
  import jax
  import jax.numpy as jnp

  num_envs = int(os.environ.get('BENCH_NUM_ENVS', '256'))
  n_iters = int(os.environ.get('BENCH_STEPS', '10'))

  from geeco_tpu.envs.base import GeecoEnv

  env = GeecoEnv(shapes='pad2-cube2', settle_steps=2)
  env.setup()

  rngs = jax.random.split(jax.random.PRNGKey(0), num_envs)
  reset = jax.jit(jax.vmap(env.reset_random))
  es = reset(rngs)
  jax.block_until_ready(es.phys.qpos)

  def step_and_render(es, action):
    es = env.step(es, action)
    rgb, _ = env.render(es)
    return es, rgb

  batched = jax.jit(jax.vmap(step_and_render))
  actions = jnp.tile(jnp.asarray([0.1, 0.0, 0.2, 1.0]), (num_envs, 1))

  # warmup / compile
  es, rgb = batched(es, actions)
  jax.block_until_ready(rgb)

  t0 = time.perf_counter()
  for _ in range(n_iters):
    es, rgb = batched(es, actions)
  jax.block_until_ready(rgb)
  dt = time.perf_counter() - t0

  steps_per_sec = num_envs * n_iters / dt
  out = {
      'metric': (f'pad2-cube2 env steps/sec/chip ({num_envs} envs, '
                 '20 substeps + 256x256 render per step)'),
      'value': round(steps_per_sec, 2),
      'unit': 'env_steps/sec/chip',
      'vs_baseline': round(steps_per_sec / NORTH_STAR, 6),
  }
  print(json.dumps(out))


if __name__ == '__main__':
  main()
