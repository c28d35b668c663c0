"""Expert behavioral gate at reference scale (n ~ 1000 episodes).

The reference evaluates policies over ~1000 test episodes
(scripts/gym_pickplace.py:571-573); round-1 gates were n=16/8.  This runs
the scripted expert over many random resets per scene family — no frame
recording, no IO on the hot path — and writes EXPERT_GATE_r{N}.json.

Run (TPU):  python scripts_dev/expert_gate.py [--num 512] [--batch 64]
Run (CPU smoke):  JAX_PLATFORMS=cpu python scripts_dev/expert_gate.py \
    --scenes pad2-cube2 --num 8 --batch 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

DEFAULT_SCENES = {
    # scene: episodes (pick family gets the reference-protocol weight;
    # clutter 100 and mesh scenes 10 match the reference eval protocol,
    # SURVEY.md §6 eval row)
    'pad2-cube2': 512,
    'pad2-cube2-clutter4': 128,
    'pad2-cube2-clutter12': 128,
    'push-pad2-cube2': 256,
    'ball-cup': 16,
    'nut-cone': 16,
}


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--scenes', nargs='*', default=None,
                 help='scene names (default: the gate set)')
  p.add_argument('--num', type=int, default=None,
                 help='episodes per scene (overrides the gate defaults)')
  p.add_argument('--batch', type=int, default=64)
  p.add_argument('--seed', type=int, default=7)
  p.add_argument('--out', type=str, default='EXPERT_GATE_r2.json')
  p.add_argument('--solver_iters', type=int, default=None,
                 help='override env solver_iterations (default-flip gate)')
  args = p.parse_args()

  import jax
  import numpy as np
  from geeco_tpu.envs.base import make_env
  from geeco_tpu.expert.policies import init_expert_state, make_expert, \
      rollout

  plan = {s: (args.num or DEFAULT_SCENES.get(s, 128))
          for s in (args.scenes or DEFAULT_SCENES)}
  results = {}
  for scene, n_eps in plan.items():
    t0 = time.time()
    env_kwargs = ({'solver_iterations': args.solver_iters}
                  if args.solver_iters else {})
    env = make_env(scene, frame_res=(64, 64), **env_kwargs)
    env.setup()
    expert = make_expert(env)

    @jax.jit
    def episode_batch(rngs):
      es = jax.vmap(env.reset_random)(rngs)
      es_f, _ = jax.vmap(
          lambda e: rollout(env, e, expert, length=100))(es)
      return jax.vmap(env.eval_metrics)(es_f)

    rng = jax.random.PRNGKey(args.seed)
    succ, dists = [], []
    done = 0
    while done < n_eps:
      b = min(args.batch, n_eps - done)
      rng, sub = jax.random.split(rng)
      m = jax.device_get(episode_batch(jax.random.split(sub, args.batch)))
      succ.extend(np.asarray(m['task_success'][:b]).tolist())
      dists.extend(np.asarray(m['goal_dist'][:b]).tolist())
      done += b
      print(f'{scene}: {done}/{n_eps} running success '
            f'{100 * np.mean(succ):.2f}%', flush=True)
    results[scene] = {
        'episodes': len(succ),
        'success_rate': float(np.mean(succ)),
        'goal_dist_median': float(np.median(dists)),
        'goal_dist_p95': float(np.percentile(dists, 95)),
        'seconds': round(time.time() - t0, 1),
    }
    print(f'>>> {scene}: {100 * results[scene]["success_rate"]:.2f}% '
          f'over {len(succ)} episodes '
          f'({results[scene]["seconds"]}s)', flush=True)

  with open(args.out, 'w') as fp:
    json.dump(results, fp, indent=2, sort_keys=True)
  print(f'>>> wrote {args.out}')


if __name__ == '__main__':
  main()
