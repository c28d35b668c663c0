"""Fidelity gate for render-binning capacity trims (coarse_k / mid_k).

The hierarchical binning (rasterizer._bin_pallas) keeps the top-K1
triangles per 64-px coarse region and K2 per 32-px mid region.  Smaller
K1/K2 shrink the top_k and the 12-operand sort that dominate the render
stage of the control step (r3 profile: binning ~44% of the full step).
This gate renders real mid-episode states and reports, per (K1, K2)
variant, the fraction of pixels that differ from the production
512/192 configuration by more than 2/255 on any channel.

Adoption rule (perf_runbook.md note b): mismatch < 1% of pixels on every
probe state.  Run on CPU (exact same math as TPU at f32).

Usage: JAX_PLATFORMS=cpu python scripts_dev/binning_fidelity.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geeco_tpu.envs.base import GeecoEnv

VARIANTS = [(512, 192), (192, 96), (128, 64), (96, 48)]


def probe_states(env, n_steps=(0, 20, 45)):
  """Settled reset + a few expert-ish mid-episode states."""
  rng = jax.random.PRNGKey(3)
  es = env.reset_random(rng)
  states = []
  step = jax.jit(env.step)
  a_seq = [jnp.asarray([0.2, 0.1, -0.3, 1.0]), jnp.asarray([-0.1, 0.3, 0.2, -1.0])]
  k = 0
  for i in range(max(n_steps) + 1):
    if i in n_steps:
      states.append(es)
    es = step(es, a_seq[k % 2])
    k += 1
  return states


def main():
  base_env = GeecoEnv(shapes='pad2-cube2', settle_steps=2)
  base_env.setup()
  states = probe_states(base_env)
  renders = {}
  for (k1, k2) in VARIANTS:
    env = GeecoEnv(shapes='pad2-cube2', settle_steps=2,
                   renderer_kwargs={'coarse_k': k1, 'mid_k': k2})
    env.setup()
    render = jax.jit(env.render)
    t0 = time.time()
    imgs = [np.asarray(render(es)[0]) for es in states]
    renders[(k1, k2)] = imgs
    print(f'# rendered {len(imgs)} states at K1={k1} K2={k2} '
          f'({time.time()-t0:.1f}s)', flush=True)

  ref = renders[VARIANTS[0]]
  print(f'{"K1":>4} {"K2":>4}  worst-state mismatch(>2/255)  per-state')
  for (k1, k2) in VARIANTS[1:]:
    fracs = []
    for a, b in zip(ref, renders[(k1, k2)]):
      diff = np.abs(a.astype(np.int32) - b.astype(np.int32)).max(axis=-1)
      fracs.append(float((diff > 2).mean()))
    print(f'{k1:>4} {k2:>4}  {max(fracs)*100:26.3f}%  '
          + ' '.join(f'{f*100:.3f}%' for f in fracs), flush=True)


if __name__ == '__main__':
  main()
