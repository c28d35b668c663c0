"""Dev: closed-loop action probe — is the served policy alive in-sim?

Resets the env to a recorded test episode's initial state, runs N
closed-loop steps through the batched serving path (make_closed_loop),
and prints the policy's actions next to the expert's recorded commands
from the same init.  Distinguishes "policy weak but responsive" (actions
of sane magnitude pointing roughly like the expert's) from "serving path
broken" (constant/zero actions — round-1 failure mode).

CPU-friendly at small N.  Env: MODEL_DIR, DS, N_STEPS (default 25).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_platforms', 'cpu')

from geeco_tpu.data.dataset import list_records
from geeco_tpu.data.episode import load_episode_npz
from geeco_tpu.envs.base import ResetSpec, make_env
from geeco_tpu.models import snapshots
from geeco_tpu.models.closed_loop import init_policy_state, make_closed_loop
from geeco_tpu.models.e2evmc import init_lstm_carry, make_model
from geeco_tpu.models.params import load_model_config

MODEL_DIR = os.environ.get('MODEL_DIR', '/root/models/geeco-f')
DS = os.environ.get('DS', '/root/ds2/collect')
N_STEPS = int(os.environ.get('N_STEPS', '25'))

cfg = load_model_config(os.path.join(MODEL_DIR, 'e2evmc_config.json'))
model = make_model(cfg, True)
ckpt = snapshots.latest_checkpoint(MODEL_DIR)
print(f'ckpt: {ckpt}')

env = make_env('pad2-cube2', frame_res=(cfg.img_height, cfg.img_width))
env.setup()

path = list_records(DS, 'default', 'test')[0]
ep, ctx = load_episode_npz(path)
print(f'episode: {os.path.basename(path)}  task={ctx["task_goal"]}/'
      f'{ctx["task_object"]}')

oq = np.stack([np.asarray(ep[f'object_qpos-{j}'][0])
               for j in env.obj_joint_names]).copy()
oq[:, 2] -= 0.025
spec = ResetSpec(obj_qpos=jnp.asarray(oq),
                 mocap_qpos=jnp.asarray(ep['mocap_qpos-robot0:mocap'][0]),
                 task_goal=jnp.asarray(
                     env.goal_sites.index(ctx['task_goal']), jnp.int32),
                 task_object=jnp.asarray(
                     env.cube_sites.index(ctx['task_object']), jnp.int32))
es = env.reset_to(spec, jax.random.PRNGKey(0))

K = cfg.window_size
f0 = jnp.zeros((1, K, cfg.img_height, cfg.img_width, 3))
j0 = jnp.zeros((1, K, 7))
t0 = jnp.zeros((1, cfg.img_height, cfg.img_width, 3))
c0 = init_lstm_carry(cfg, 1)
tmpl = model.init(jax.random.PRNGKey(0), f0, j0, t0, c0,
                  jnp.asarray(True))['params']
params = snapshots.restore_params(ckpt, tmpl)

tgt = jnp.asarray(ep['rgb'][-1].astype(np.float32) / 255.0)

# inline serving semantics (mirrors models/closed_loop.py policy_step for
# stateless-trained models: ring buffer + fresh carry + reset=True) so the
# action is visible for inspection
STATELESS = getattr(cfg, 'train_carry', 'bptt') == 'stateless'


@jax.jit
def probe_step(params, es, frames, jnts, carry, started):
  rgb, depth = env.render(es)
  obs = rgb.astype(jnp.float32) / 255.0
  jnt = env.proprioception(es)
  frames = jnp.where(started,
                     jnp.concatenate([frames[1:], obs[None]]),
                     jnp.broadcast_to(obs[None], frames.shape))
  jnts = jnp.where(started,
                   jnp.concatenate([jnts[1:], jnt[None]]),
                   jnp.broadcast_to(jnt[None], jnts.shape))
  if STATELESS:
    in_carry, reset = init_lstm_carry(cfg, 1), jnp.asarray(True)
  else:
    in_carry, reset = carry, jnp.logical_not(started)
  ep_out, carry = model.apply({'params': params}, frames[None], jnts[None],
                              tgt[None], in_carry, reset)
  cmd_ee = ep_out['pred_cmd_ee'][0]
  cmd_grp = (jnp.argmax(ep_out['logits_cmd_grp'][0]) - 1).astype(jnp.float32)
  action = jnp.concatenate([cmd_ee, cmd_grp[None]])
  es = env.step(es, action)
  m = env.eval_metrics(es)
  return es, frames, jnts, carry, action, m


DUMP = os.environ.get('DUMP', '')          # dir: save frame PNGs every 5 steps
if DUMP:
  os.makedirs(DUMP, exist_ok=True)
  from PIL import Image
  Image.fromarray(np.asarray(ep['rgb'][-1])).save(
      os.path.join(DUMP, 'target.png'))

frames = jnp.zeros((K, cfg.img_height, cfg.img_width, 3))
jnts = jnp.zeros((K, 7))
carry = init_lstm_carry(cfg, 1)
started = jnp.asarray(False)
print(f'{"t":>3} {"policy cmd_ee":>26} grp | {"expert cmd":>26} grp')
for t in range(N_STEPS):
  es, frames, jnts, carry, action, m = probe_step(
      params, es, frames, jnts, carry, started)
  started = jnp.asarray(True)
  a = np.asarray(action).ravel()
  ec = ep['cmd'][min(t, len(ep['cmd']) - 1)]
  print(f'{t:3d} [{a[0]:+.3f} {a[1]:+.3f} {a[2]:+.3f}] {a[3]:+.0f} | '
        f'[{ec[0]:+.3f} {ec[1]:+.3f} {ec[2]:+.3f}] {ec[3]:+.0f}  '
        f'gd={float(m["goal_dist"]):.3f}', flush=True)
  if DUMP and t % 5 == 0:
    from PIL import Image
    Image.fromarray(
        (np.asarray(frames[-1]) * 255).astype(np.uint8)).save(
        os.path.join(DUMP, f'obs_{t:03d}.png'))
