"""Vectorized scripted experts: per-env FSMs stepped in lockstep.

The reference experts are Python while-loops driving one env
(pick&place: scripts/gym_pickplace.py:369-563; pushing:
scripts/gym_pushing.py:250-443).  Here each phase machine is a pure
function (ExpertState, observations) -> (action, ExpertState') with
branch-free phase transitions, so thousands of demonstrations run in
lockstep under vmap+scan on TPU.

Constants and exit conditions match the reference exactly, including its
actual runtime behavior: the pick&place DROP phase never exits before the
episode cap (the release test compares finger positions in meters against
the command value 1.0, gym_pickplace.py:475-481), so DROP is a terminal
"hold open, drift up" phase.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..envs.base import EnvState, GeecoEnv

# pick & place constants (gym_pickplace.py:140-151)
OFFSET_HEIGHT_PRE_GRASP = 0.05
DIST_PRE_GRASP = 0.005
DIST_GRASP = 0.002
DIST_ON_TOP = 0.175
DIST_GOAL = 0.01
MULT = 6.0
OPEN, CLOSE, NOOP = 1.0, -1.0, 0.0

# pushing constants (gym_pushing.py:127-133)
OFFSET_PRE_PUSH = 0.1
DIST_PRE_PUSH = 0.015


class ExpertState(NamedTuple):
  phase: jax.Array     # int32
  target: jax.Array    # [3] phase-entry captured target
  aux: jax.Array       # [3] secondary capture (post-grasp pose / offsets)
  count: jax.Array     # int32 sub-phase counter (pushing backoff)


def init_expert_state() -> ExpertState:
  return ExpertState(phase=jnp.zeros((), jnp.int32), target=jnp.zeros(3),
                     aux=jnp.zeros(3), count=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# pick & place: PRE_GRASP(0) GRASP(1) POST_GRASP(2) MOVE(3) DROP(4)
# ---------------------------------------------------------------------------


def pickplace_expert(env: GeecoEnv):
  """Returns step_fn(es, xs) -> (action [4], xs')."""

  def step_fn(es: EnvState, xs: ExpertState):
    kin = env.kin(es)
    grip = env.grip_pos(kin)
    obj = env.task_object_pos(es, kin)
    pad = env.task_goal_pos(es, kin)

    pre_grasp_vec = obj - grip + jnp.array([0.0, 0.0,
                                            OFFSET_HEIGHT_PRE_GRASP])
    grasp_vec = obj - grip

    phase = xs.phase
    target = xs.target  # MOVE goal (captured at POST_GRASP exit)
    aux = xs.aux        # POST_GRASP grip target (captured at GRASP exit)

    # --- transitions (evaluated like the reference's while conditions)
    adv0 = (phase == 0) & (jnp.linalg.norm(pre_grasp_vec) < DIST_PRE_GRASP)
    phase = jnp.where(adv0, 1, phase)
    adv1 = (phase == 1) & (jnp.linalg.norm(grasp_vec) < DIST_GRASP)
    aux = jnp.where(adv1, grip + jnp.array([0.0, 0.0,
                                            OFFSET_HEIGHT_PRE_GRASP]), aux)
    phase = jnp.where(adv1, 2, phase)
    adv2 = (phase == 2) & (jnp.linalg.norm(aux - grip) < DIST_PRE_GRASP)
    target = jnp.where(adv2, pad + jnp.array([0.0, 0.0, DIST_ON_TOP]),
                       target)
    phase = jnp.where(adv2, 3, phase)
    adv3 = (phase == 3) & (jnp.linalg.norm(target - obj) < DIST_GOAL)
    phase = jnp.where(adv3, 4, phase)

    # --- phase actions
    acts = jnp.stack([
        jnp.concatenate([pre_grasp_vec * MULT, jnp.array([OPEN])]),
        jnp.concatenate([grasp_vec * MULT, jnp.array([CLOSE])]),
        jnp.concatenate([(aux - grip) * MULT, jnp.array([CLOSE])]),
        jnp.concatenate([(target - obj) * MULT, jnp.array([CLOSE])]),
        jnp.array([0.0, 0.0, OFFSET_HEIGHT_PRE_GRASP / 2, OPEN]),
    ])
    action = acts[jnp.clip(phase, 0, 4)]
    return action, ExpertState(phase=phase, target=target, aux=aux,
                               count=xs.count)

  return step_fn


# ---------------------------------------------------------------------------
# pushing: PRE_PUSH_X(0) PUSH_X(1) BACKOFF(2) PRE_PUSH_Y(3) PUSH_Y(4) IDLE(5)
# ---------------------------------------------------------------------------


def pushing_expert(env: GeecoEnv):
  """Returns step_fn(es, xs) -> (action [4], xs')."""

  def step_fn(es: EnvState, xs: ExpertState):
    kin = env.kin(es)
    grip = env.grip_pos(kin)
    obj = env.task_object_pos(es, kin)
    pad = env.task_goal_pos(es, kin)

    pre_x_vec = obj - grip - jnp.array([OFFSET_PRE_PUSH, 0.0, 0.0])

    phase = xs.phase
    target = xs.target   # push goal (x-phase or y-phase)
    aux = xs.aux         # [offset_sign, goal_y, 0]
    count = xs.count

    # --- transitions
    adv0 = (phase == 0) & (jnp.linalg.norm(pre_x_vec) < DIST_PRE_PUSH)
    # capture x-push goal: [pad.x, obj.y, obj.z] (gym_pushing.py:286-288)
    target = jnp.where(adv0, jnp.stack([pad[0], obj[1], obj[2]]), target)
    phase = jnp.where(adv0, 1, phase)

    adv1 = (phase == 1) & (jnp.linalg.norm(target - obj) < DIST_GOAL)
    on_target_y = jnp.abs(pad[1] - obj[1]) < DIST_GOAL
    # skip straight to IDLE when already aligned in y (gym_pushing.py:421)
    sign = jnp.where(pad[1] - obj[1] > 0, -1.0, 1.0)
    aux = jnp.where(adv1, jnp.stack([sign, pad[1], 0.0]), aux)
    count = jnp.where(adv1, 0, count)
    phase = jnp.where(adv1, jnp.where(on_target_y, 5, 2), phase)

    in_backoff = phase == 2
    count = jnp.where(in_backoff, count + 1, count)
    phase = jnp.where(in_backoff & (count >= 3), 3, phase)

    pre_y_vec = obj - grip + jnp.stack(
        [jnp.zeros(()), aux[0] * OFFSET_PRE_PUSH, jnp.zeros(())])
    adv3 = (phase == 3) & (jnp.linalg.norm(pre_y_vec) < DIST_PRE_PUSH)
    # capture y-push goal: [obj.x, pad.y, obj.z] (gym_pushing.py:361-363)
    target = jnp.where(adv3, jnp.stack([obj[0], aux[1], obj[2]]), target)
    phase = jnp.where(adv3, 4, phase)

    adv4 = (phase == 4) & (jnp.linalg.norm(target - obj) < DIST_GOAL)
    phase = jnp.where(adv4, 5, phase)

    # --- phase actions
    acts = jnp.stack([
        jnp.concatenate([pre_x_vec * MULT, jnp.array([CLOSE])]),
        jnp.concatenate([(target - obj) * MULT, jnp.array([CLOSE])]),
        jnp.array([-OFFSET_PRE_PUSH * MULT, 0.0, 0.0, CLOSE]),
        jnp.concatenate([pre_y_vec * MULT, jnp.array([CLOSE])]),
        jnp.concatenate([(target - obj) * MULT, jnp.array([CLOSE])]),
        jnp.array([0.0, 0.0, 0.0, NOOP]),
    ])
    action = acts[jnp.clip(phase, 0, 5)]
    return action, ExpertState(phase=phase, target=target, aux=aux,
                               count=count)

  return step_fn


def make_expert(env: GeecoEnv):
  return pushing_expert(env) if env.task == 'pushing' \
      else pickplace_expert(env)


# ---------------------------------------------------------------------------
# rollout driver
# ---------------------------------------------------------------------------


def rollout(env: GeecoEnv, es: EnvState, expert_step, length: int = 100,
            record_fn=None, step_textures=None, action_noise=None):
  """Scan an expert episode; returns (final EnvState, stacked records).

  record_fn(env, es, action, xs, textures=...) -> pytree of per-step
  records (called with the PRE-step state, matching the reference
  recording order: pickplace.py:326-340 records, then steps).

  step_textures ([length, R, R, 3] or None): per-step background texel
  frames for video domain randomization, forwarded to record_fn.

  action_noise ([length, 4] or None): DART-style noise injection — the
  EXECUTED action is expert + noise (then exec-clipped like any action),
  while the RECORDED cmd stays the expert's clean action.  The dataset
  thus demonstrates corrective behavior from the slightly-off states a
  closed-loop imitation policy actually visits (covariate-shift
  mitigation; Laskey et al. 2017).  Note recorded cmd sequences from
  noisy episodes do NOT open-loop replay to the recorded states (the
  per-step state records remain self-consistent).
  """

  def body(carry, x):
    tex, nz = x
    es, xs = carry
    action, xs2 = expert_step(es, xs)
    rec = record_fn(env, es, action, xs2, textures=tex) \
        if record_fn is not None else action
    exec_action = action if nz is None else action + nz
    es2 = env.step(es, exec_action)
    return (es2, xs2), rec

  (es_f, _), recs = jax.lax.scan(
      body, (es, init_expert_state()), (step_textures, action_noise),
      length=length if (step_textures is None and action_noise is None)
      else None)
  return es_f, recs
