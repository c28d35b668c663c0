"""GEECO task environments as pure functions over pytrees.

TPU-native redesign of the reference gym envs (PickAndPlaceEnv /
PushingEnv, reference: src/geeco_gym/pickplace.py, pushing.py): instead of
a stateful object mutating one MjSim, a ``GeecoEnv`` compiles all static
structure once and exposes pure ``reset`` / ``step`` / ``observe`` /
``render`` functions over an ``EnvState`` pytree — `vmap` them over a batch
axis and `jit` the whole rollout.

Reproduced behavioral contract (file:line = reference):
  * action = [dx, dy, dz, cmd_grp]; pos deltas scaled by 0.05; gripper
    command rint -> {-1: -0.005, 0: 0.0, +1: 0.05} added to current finger
    qpos as position-servo targets; EE quat held at [1, 0, 1, 0]
    (pickplace.py:342-376; gym robotics ctrl_set_action/mocap_set_action)
  * 20 physics substeps per control step (pickplace.py:95)
  * reset: restore captured initial state; recolor task objects
    (deterministic map + random pool, pickplace.py:386-425); queued reset
    states (z += 0.025 adjust, pickplace.py:454-480) or spawn-grid
    randomization (z = 0.27+0.037 pick / 0.27+0.025 push; mocap at
    ROBOT_XPOS0 + sphere(0.03), quat [1,0,1,0]; pickplace.py:482-521,
    pushing.py:423-460); settle with 10 control steps (pickplace.py:525)
  * setup: slides (0.405, 0.48, 0); mocap to grip + (-0.498, 0.005,
    -0.431+0.2); settle 10 control steps (pickplace.py:532-549)
  * observation/eval vectors match _get_obs / eval predicates
    (pickplace.py:633-671; scripts/gym_pickplace.py:571-601)
"""

from __future__ import annotations

import functools
import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import math as gm
from ..core import mjcf
from ..core.model import (Kin, Model, State, get_joint_qpos, make_state,
                          set_joint_qpos)
from ..physics import kinematics as K
from ..physics.step import Stepper, build_stepper
from ..render.rasterizer import Renderer, build_renderer
from . import spawn

# ---------------------------------------------------------------- constants

# Vendored copy of the reference asset tree (MJCF scenes, robot, meshes,
# textures; upstream assets/gym/).  Overridable via GEECO_ASSET_ROOT for
# running against an external checkout.
ASSET_ROOT = os.environ.get(
    'GEECO_ASSET_ROOT',
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 'assets_gym'))

MODEL_XML = {
    # pick & place scenes (pickplace.py:24-46)
    'pad1-cube1': 'geeco-pad1-cube1.xml',
    'pad2-cube1': 'geeco-pad2-cube1.xml',
    'pad1-cube2': 'geeco-pad1-cube2.xml',
    'pad2-cube2': 'geeco-pad2-cube2.xml',
    'pad2-cube2-clutter4': 'geeco-pad2-cube2-clutter4.xml',
    'pad2-cube2-clutter12': 'geeco-pad2-cube2-clutter12.xml',
    'ball-cup': 'geeco-ball-cup.xml',
    'bridge-pad': 'geeco-bridge-pad.xml',
    'diamond-pad': 'geeco-diamond-pad.xml',
    'nut-cone': 'geeco-nut-cone.xml',
    # pushing scenes (pushing.py:24-36)
    'push-pad1-cube1': 'geeco-push-pad1-cube1.xml',
    'push-pad1-cube2': 'geeco-push-pad1-cube2.xml',
    'push-pad2-cube1': 'geeco-push-pad2-cube1.xml',
    'push-pad2-cube2': 'geeco-push-pad2-cube2.xml',
}

# randomized spawn workspaces (pickplace.py:483-495, pushing.py:423-428)
SPAWN_DIMS = {
    'pad1-cube1': ((1.075, 1.425), (0.350, 1.150), (6, 8), 0.0),
    'pad1-cube2': ((1.075, 1.425), (0.350, 1.150), (6, 8), 0.0),
    'pad2-cube1': ((1.075, 1.425), (0.350, 1.150), (4, 7), 0.0),
    'pad2-cube2': ((1.075, 1.425), (0.350, 1.150), (4, 7), 0.0),
    'pad2-cube2-clutter4': ((1.075, 1.425), (0.350, 1.150), (4, 7), 0.0),
    'pad2-cube2-clutter12': ((1.075, 1.425), (0.350, 1.150), (4, 7), 0.0),
    'ball-cup': ((1.075, 1.425), (0.350, 1.150), (3, 6), 0.0),
    'bridge-pad': ((1.075, 1.425), (0.350, 1.150), (3, 6), 0.0),
    'diamond-pad': ((1.075, 1.425), (0.350, 1.150), (3, 6), 0.0),
    'nut-cone': ((1.075, 1.425), (0.350, 1.150), (3, 6), 0.0),
    'push-pad1-cube1': ((1.2, 1.3), (0.450, 1.050), (6, 8), 0.1),
    'push-pad1-cube2': ((1.175, 1.4), (0.5, 1.0), (2, 3), 0.125),
    'push-pad2-cube1': ((1.175, 1.4), (0.5, 1.0), (2, 3), 0.125),
    'push-pad2-cube2': ((1.175, 1.4), (0.5, 1.0), (2, 3), 0.125),
}

ROBOT_XPOS0_PICK = np.array([1.3419, 0.7491, 0.555])   # pickplace.py:57
ROBOT_XPOS0_PUSH = np.array([1.3419, 0.7491, 0.8])     # pushing.py:450
EE_QUAT = np.array([1.0, 0.0, 1.0, 0.0]) / np.sqrt(2.0)
GRIPPER_CTRL = {-1: -0.005, 0: 0.0, 1: 0.05}           # pickplace.py:353-357

# deterministic reset colors (pickplace.py:386-405)
COLOR_MAP = {
    'object0': (1, 0, 0, 1), 'object1': (1, 1, 0, 1), 'object2': (1, 0, 1, 1),
    'goal0': (0, 0, 1, 1), 'goal1': (0, 1, 0, 1), 'goal2': (0, 1, 1, 1),
    'clutter0': (1, 0, 0, 1), 'clutter1': (1, 1, 0, 1),
    'clutter2': (0, 0, 1, 1), 'clutter3': (0, 1, 0, 1),
    'clutter4': (1, 0, 0, 1), 'clutter5': (1, 1, 0, 1),
    'clutter6': (0, 0, 1, 1), 'clutter7': (0, 1, 0, 1),
    'clutter8': (1, 0, 0, 1), 'clutter9': (1, 1, 0, 1),
    'clutter10': (0, 0, 1, 1), 'clutter11': (0, 1, 0, 1),
}
COLOR_POOL = np.array([
    (1, 0, 0, 1), (1, 1, 0, 1), (1, 0, 1, 1),
    (0, 0, 1, 1), (0, 1, 0, 1), (0, 1, 1, 1)], np.float32)

# eval radii (scripts/gym_pickplace.py:571-573)
OBJ_VICINITY = 0.0625
GRASP_VICINITY = 0.025
GOAL_VICINITY = 0.05

ARM_JOINTS = (
    'robot0:shoulder_pan_joint', 'robot0:shoulder_lift_joint',
    'robot0:upperarm_roll_joint', 'robot0:elbow_flex_joint',
    'robot0:forearm_roll_joint', 'robot0:wrist_flex_joint',
    'robot0:wrist_roll_joint')
FINGER_JOINTS = ('robot0:l_gripper_finger_joint',
                 'robot0:r_gripper_finger_joint')
MONITORED_JOINTS = (
    'robot0:slide0', 'robot0:slide1', 'robot0:slide2',
    'robot0:torso_lift_joint', 'robot0:head_pan_joint',
    'robot0:head_tilt_joint') + ARM_JOINTS + \
    ('robot0:r_gripper_finger_joint', 'robot0:l_gripper_finger_joint')


# ---------------------------------------------------------------- pytrees


@struct.dataclass
class EnvState:
  phys: State
  ts: jax.Array          # int32 control-step counter
  task_goal: jax.Array   # int32 index into env.goal_sites
  task_object: jax.Array  # int32 index into env.cube_sites
  goal_pos: jax.Array    # [3] gym GoalEnv target
  rgba: jax.Array        # [ngeom, 4] per-env render colors
  rng: jax.Array         # PRNG key


class ResetSpec(NamedTuple):
  """Queued deterministic reset (CSV rows; gym_pickplace.py:185-218)."""
  obj_qpos: jax.Array    # [n_task_objs, 7] aligned with env.obj_joint_ids
  mocap_qpos: jax.Array  # [7]
  task_goal: jax.Array   # int32 index into env.goal_sites
  task_object: jax.Array  # int32 index into env.cube_sites
  # optional [n_arm+n_finger] recorded arm/gripper joint positions
  # (monitored_joints order).  Restoring them makes reset_to reproduce a
  # RECORDED initial state exactly: settling the default pose against the
  # episode's mocap does NOT converge to the recorded arm pose within
  # settle_steps, which put the policy's jnt_state input far off the
  # training manifold at t=0 (round-3: eval jnt [−0.00,−0.86,…,1.46,…]
  # vs recorded [0.41,0.48,…,0.00,…] -> 0% closed-loop success).
  arm_qpos: Optional[jax.Array] = None


# ---------------------------------------------------------------- env


class GeecoEnv:
  """Compiled GEECO environment; all methods pure (jit/vmap-able)."""

  def __init__(self, shapes: str = 'pad2-cube2', frame_res=(256, 256),
               asset_root: str = ASSET_ROOT, n_substeps: int = 20,
               settle_steps: int = 10, solver_iterations: int = 60,
               solver_method: Optional[str] = None, hysteresis: float = 0.0,
               contact_select_k: Optional[int] = None,
               collide_every: int = 1, substep_unroll: int = 1,
               solver_unroll: int = 1, contact_select: Optional[str] = None,
               mass_inverse: str = 'chol', rolling: str | bool = 'auto',
               start_sphere_r: float = 0.03,
               renderer_kwargs: Optional[dict] = None):
    import os
    if not (rolling == 'auto' or isinstance(rolling, bool)):
      # any other string would be truthy downstream: rolling='off' would
      # silently ENABLE the condim-6 rolling rows (ADVICE.md round 2)
      raise ValueError(f"rolling must be 'auto', True or False; "
                       f"got {rolling!r}")
    self.shapes = shapes
    self.task = 'pushing' if shapes.startswith('push') else 'pickplace'
    xml = os.path.join(asset_root, 'envs', MODEL_XML[shapes])
    self.model, self.assets = mjcf.load_model(xml)
    if contact_select_k is None:
      # the top-K contact active set must cover every simultaneously
      # penetrating row; clutter scenes add ~2 box-manifolds of resting
      # rows per extra free body, and at K=128 those evict the ~0-depth
      # finger-cube grasp rows mid-transport (the cube silently slips:
      # expert success 0% -> 100% on clutter4 at K>=192)
      n_free = sum(1 for t in self.model.jnt_type if t == 0)  # FREE
      contact_select_k = 128 + 16 * max(0, n_free - 4)
    # solver defaults are scene-conditional: mesh objects resting on the
    # table creep under the global-top-K + whole-system line search (the
    # active-set composition couples rest rows to robot-row rank changes);
    # per-island block solve + per-body quota selection fixes it (golden
    # MuJoCo fixture A/B, scripts_dev/creep_ab.py: nutcone static creep
    # 11.2mm -> 0.27mm, ballcup 4.6mm -> 0.74mm, task drift also improves)
    # while box-only scenes stay best under psd+topk (pick 9.2 vs 14.7mm).
    m = self.model
    free_bodies = {m.jnt_bodyid[j] for j, t in enumerate(m.jnt_type)
                   if t == 0}
    has_free_hulls = any(h >= 0 and m.geom_bodyid[g] in free_bodies
                         for g, h in enumerate(m.geom_hullid))
    if solver_method is None:
      solver_method = 'psd_block' if has_free_hulls else 'psd'
    if contact_select is None:
      contact_select = 'quota' if has_free_hulls else 'topk'
    self.stepper = build_stepper(self.model,
                                 contact_select_k=contact_select_k,
                                 select_mode=contact_select,
                                 rolling=rolling)
    self.solver_method = solver_method
    self.hysteresis = hysteresis
    self.collide_every = collide_every
    self.substep_unroll = substep_unroll
    self.solver_unroll = solver_unroll
    self.mass_inverse = mass_inverse
    h, w = frame_res
    # kept for dataset meta: a state-only collect must record the exact
    # renderer configuration so training re-renders the same pixels
    self.renderer_kwargs = dict(renderer_kwargs or {})
    self.renderer = build_renderer(self.model, self.assets, width=w,
                                   height=h, **(renderer_kwargs or {}))
    self.n_substeps = n_substeps
    self.start_sphere_r = start_sphere_r
    self.settle_steps = settle_steps
    self.solver_iterations = solver_iterations
    m = self.model

    # --- object / task structure from site names (pickplace.py:427-432)
    def sites_with(prefix):
      return tuple(n for n in m.site_name if n.startswith(prefix))
    self.obj_sites = tuple(n for n in m.site_name
                           if n.startswith(('object', 'goal', 'clutter')))
    self.goal_sites = sites_with('goal')
    self.cube_sites = sites_with('object')
    self.clutter_sites = sites_with('clutter')
    self.obj_joint_names = tuple(f'{n}:joint' for n in self.obj_sites)
    self.obj_site_ids = np.array([m.site(n) for n in self.obj_sites])
    self.goal_site_ids = np.array([m.site(n) for n in self.goal_sites])
    self.cube_site_ids = np.array([m.site(n) for n in self.cube_sites])
    self.grip_site = m.site('robot0:grip')
    self.gripper_body = m.body('robot0:gripper_link')
    self.mocap_id = 0

    # --- spawn grid (static)
    mmx, mmy, tiling, goal_off = SPAWN_DIMS[shapes]
    self.spawn_grid = spawn.compute_grid(mmx, mmy, tiling)
    self.goal_offset_x = goal_off
    self.spawn_z = 0.27 + (0.025 if self.task == 'pushing' else 0.037)
    self.robot_xpos0 = (ROBOT_XPOS0_PUSH if self.task == 'pushing'
                        else ROBOT_XPOS0_PICK)

    # --- recolor structure: (geom_id, color or None->pool) for task objects
    recolor_fixed, recolor_pool = [], []
    for name in self.obj_sites:
      geoms = [g for g in range(m.ngeom) if m.geom_name[g].startswith(name)]
      if name in COLOR_MAP:
        for g in geoms:
          recolor_fixed.append((g, np.asarray(COLOR_MAP[name], np.float32)))
      else:
        recolor_pool.append(geoms)
    self.recolor_fixed = tuple(recolor_fixed)
    self.recolor_pool = tuple(tuple(g) for g in recolor_pool)

    # --- base rgba: debug visuals off (non-viewer; pickplace.py:559-572)
    rgba0 = np.asarray(m.geom_rgba).copy()
    for g in range(m.ngeom):
      if 'crosshair' in m.geom_name[g]:
        rgba0[g, 3] = 0.0
    self.rgba0 = rgba0

    # --- monitored joints present in this model
    self.monitored_joints = tuple(j for j in MONITORED_JOINTS
                                  if j in m.jnt_name)
    self.actuated_joints = ('robot0:l_gripper_finger_joint',
                            'robot0:r_gripper_finger_joint')

    # lazily-computed initial state (after setup settle)
    self._initial_phys: Optional[State] = None
    self._jit_cache: dict = {}

  def jit(self, name: str):
    """Cached jit-compiled env method (compile once per env instance)."""
    if name not in self._jit_cache:
      self.setup()  # initial state must exist before tracing resets
      self._jit_cache[name] = jax.jit(getattr(self, name))
    return self._jit_cache[name]

  # ------------------------------------------------------------- setup

  def setup(self) -> State:
    """Reference _env_setup: returns the settled initial physics state."""
    if self._initial_phys is not None:
      return self._initial_phys
    import jax.core
    if isinstance(jnp.zeros(0) + 0, jax.core.Tracer):
      raise RuntimeError(
          'GeecoEnv.setup() must run eagerly before jit/vmap tracing: call '
          'env.setup() (or env.jit(...)) once before tracing reset/step.')
    m = self.model
    st = self.stepper
    state = st.init_state(make_state(m))
    qpos = state.qpos
    for name, val in (('robot0:slide0', 0.405), ('robot0:slide1', 0.48),
                      ('robot0:slide2', 0.0)):
      qpos = set_joint_qpos(m, qpos, name, val)
    state = state.replace(qpos=qpos)
    kin = st.fk(state)
    grip0 = kin.site_xpos[self.grip_site]
    target = grip0 + jnp.array([-0.498, 0.005, -0.431 + 0.2])
    state = state.replace(mocap_pos=target[None],
                          mocap_quat=jnp.asarray(EE_QUAT)[None],
                          ctrl=jnp.zeros((m.nu,)))

    @jax.jit
    def settle(s):
      def body(s, _):
        return self.stepper.step(s, self.n_substeps,
                                 self.solver_iterations,
                                 solver_method=self.solver_method,
                                 hysteresis=self.hysteresis,
                                 collide_every=self.collide_every,
                                 unroll=self.substep_unroll,
                                 solver_unroll=self.solver_unroll,
                                 mass_inverse=self.mass_inverse), None
      s, _ = jax.lax.scan(body, s, None, length=self.settle_steps)
      return s

    state = settle(state)
    self._initial_phys = jax.device_get(state)  # freeze as host arrays
    self._initial_phys = jax.tree.map(jnp.asarray, self._initial_phys)
    kin = st.fk(self._initial_phys)
    self.initial_gripper_xpos = np.asarray(kin.site_xpos[self.grip_site])
    return self._initial_phys

  # ------------------------------------------------------------- reset

  def _base_env_state(self, rng: jax.Array) -> EnvState:
    phys = self.setup()
    return EnvState(
        phys=phys, ts=jnp.zeros((), jnp.int32),
        task_goal=jnp.zeros((), jnp.int32),
        task_object=jnp.zeros((), jnp.int32),
        goal_pos=jnp.zeros(3), rgba=jnp.asarray(self.rgba0), rng=rng)

  def _recolor(self, rng: jax.Array) -> jax.Array:
    rgba = jnp.asarray(self.rgba0)
    for g, color in self.recolor_fixed:
      rgba = rgba.at[g].set(jnp.asarray(color))
    for geoms in self.recolor_pool:
      rng, sub = jax.random.split(rng)
      color = jnp.asarray(COLOR_POOL)[
          jax.random.randint(sub, (), 0, len(COLOR_POOL))]
      for g in geoms:
        rgba = rgba.at[g].set(color)
    return rgba

  def _settle(self, phys: State) -> State:
    def body(s, _):
      return self.stepper.step(s, self.n_substeps,
                               self.solver_iterations,
                               solver_method=self.solver_method,
                               hysteresis=self.hysteresis,
                               collide_every=self.collide_every,
                               unroll=self.substep_unroll,
                               solver_unroll=self.solver_unroll,
                               mass_inverse=self.mass_inverse), None
    phys, _ = jax.lax.scan(body, phys, None, length=self.settle_steps)
    return phys

  def reset_random(self, rng: jax.Array) -> EnvState:
    """Randomized reset (reference _reset_sim random branch)."""
    es = self._base_env_state(rng)
    r_spawn, r_sphere, r_goal, r_obj, r_color, r_next = \
        jax.random.split(rng, 6)
    phys = es.phys
    pts = spawn.sample_spawn_points(r_spawn, self.spawn_grid,
                                    len(self.obj_sites))
    qpos = phys.qpos
    for i, jname in enumerate(self.obj_joint_names):
      xy = pts[i]
      if self.goal_offset_x and self.obj_sites[i].startswith('goal'):
        xy = xy + jnp.array([self.goal_offset_x, 0.0])
      newq = jnp.concatenate([xy, jnp.array([self.spawn_z]),
                              jnp.array([1.0, 0, 0, 0])])
      qpos = set_joint_qpos(self.model, qpos, jname, newq)
    # reference samples the EE start within r=0.03 (dataset-create_tasks
    # notebook); start_sphere_r>0.03 is the TPU-side perturbation-augmented
    # collection knob (DAgger-lite start-basin coverage)
    mocap_pos = jnp.asarray(self.robot_xpos0) + \
        spawn.sample_point_within_sphere(r_sphere, self.start_sphere_r)
    phys = phys.replace(
        qpos=qpos, qvel=jnp.zeros_like(phys.qvel),
        mocap_pos=mocap_pos[None], mocap_quat=jnp.asarray(EE_QUAT)[None])
    phys = self._settle(phys)
    return es.replace(
        phys=phys,
        task_goal=jax.random.randint(r_goal, (), 0, len(self.goal_sites)),
        task_object=jax.random.randint(r_obj, (), 0, len(self.cube_sites)),
        rgba=self._recolor(r_color), rng=r_next,
        ts=jnp.zeros((), jnp.int32))

  def reset_to(self, spec: ResetSpec, rng: jax.Array) -> EnvState:
    """Deterministic queued reset (reference _reset_sim queue branch)."""
    es = self._base_env_state(rng)
    r_color, r_next = jax.random.split(rng)
    qpos = es.phys.qpos
    for i, jname in enumerate(self.obj_joint_names):
      q = spec.obj_qpos[i]
      q = q.at[2].add(0.025)  # table-height adjust (pickplace.py:466)
      qpos = set_joint_qpos(self.model, qpos, jname, q)
    if spec.arm_qpos is not None:
      for i, jname in enumerate(self.monitored_joints):
        qpos = set_joint_qpos(self.model, qpos, jname, spec.arm_qpos[i])
    phys = es.phys.replace(
        qpos=qpos, qvel=jnp.zeros_like(es.phys.qvel),
        mocap_pos=spec.mocap_qpos[:3][None],
        mocap_quat=gm.quat_normalize(spec.mocap_qpos[3:])[None])
    phys = self._settle(phys)
    return es.replace(phys=phys, task_goal=spec.task_goal,
                      task_object=spec.task_object,
                      rgba=self._recolor(r_color), rng=r_next,
                      ts=jnp.zeros((), jnp.int32))

  # ------------------------------------------------------------- step

  def step(self, es: EnvState, action: jax.Array) -> EnvState:
    """Apply [dx, dy, dz, cmd_grp] and run n_substeps of physics.

    The action is clipped to the [-1, 1] action space at EXECUTION time
    (gym 0.18 robotics RobotEnv.step clips before _set_action; the
    reference expert's P-gain MULT_POS_ACTION=6.0 relies on this
    saturation for bang-bang transport at max 0.05 m/step).  Recording
    still captures the RAW command (pickplace.py:326-340 records before
    super().step), so cmd labels keep reference semantics.  Without this
    clip the mocap jumped up to 0.33 m/step during the expert MOVE phase
    — the round-3 expert failures (7.2%: flings, drops in transit,
    placements just outside the 0.05 m radius) were all this bug.
    """
    m = self.model
    action = jnp.clip(action, -1.0, 1.0)
    pos_ctrl = action[:3] * 0.05
    cmd_grp = jnp.rint(action[3]).astype(jnp.int32)
    gripper_ctrl = jnp.where(
        cmd_grp < 0, GRIPPER_CTRL[-1],
        jnp.where(cmd_grp > 0, GRIPPER_CTRL[1], GRIPPER_CTRL[0]))
    # position servos target current finger qpos + delta (ctrl_set_action)
    phys = es.phys
    ctrl = []
    for i, j in enumerate(m.actuator_jntid):
      qadr = m.jnt_qposadr[j]
      ctrl.append(phys.qpos[qadr] + gripper_ctrl)
    ctrl = jnp.stack(ctrl)
    # mocap: snap to welded body pose, then displace (mocap_set_action)
    kin = self.stepper.fk(phys)
    mocap_pos = kin.xpos[self.gripper_body] + pos_ctrl
    mocap_quat = gm.quat_normalize(
        kin.xquat[self.gripper_body] + jnp.array([1.0, 0, 1.0, 0]))
    phys = phys.replace(ctrl=ctrl, mocap_pos=mocap_pos[None],
                        mocap_quat=mocap_quat[None])
    phys = self.stepper.step(phys, self.n_substeps, self.solver_iterations,
                             solver_method=self.solver_method,
                             hysteresis=self.hysteresis,
                             collide_every=self.collide_every,
                             unroll=self.substep_unroll,
                             solver_unroll=self.solver_unroll,
                             mass_inverse=self.mass_inverse)
    return es.replace(phys=phys, ts=es.ts + 1)

  # ------------------------------------------------------------- readouts

  def kin(self, es: EnvState) -> Kin:
    return self.stepper.fk(es.phys)

  def site_pos(self, kin: Kin, site_ids) -> jax.Array:
    return kin.site_xpos[jnp.asarray(site_ids)]

  def grip_pos(self, kin: Kin) -> jax.Array:
    return kin.site_xpos[self.grip_site]

  def task_object_pos(self, es: EnvState, kin: Kin) -> jax.Array:
    return kin.site_xpos[jnp.asarray(self.cube_site_ids)][es.task_object]

  def task_goal_pos(self, es: EnvState, kin: Kin) -> jax.Array:
    return kin.site_xpos[jnp.asarray(self.goal_site_ids)][es.task_goal]

  def proprioception(self, es: EnvState) -> jax.Array:
    """7-dof arm joint positions (controller input; gym_pickplace.py:883)."""
    return jnp.stack([get_joint_qpos(self.model, es.phys.qpos, j)
                      for j in ARM_JOINTS])

  def _site_velp(self, es: EnvState, kin: Kin, site_id: int) -> jax.Array:
    info = K.dof_info(self.model, kin)
    bodyid = self.model.site_bodyid[site_id]
    jacp, _ = K.point_jacobian(self.model, kin, info,
                               kin.site_xpos[site_id], bodyid,
                               self.stepper.anc_mask)
    return jacp.T @ es.phys.qvel

  def observe(self, es: EnvState) -> Dict[str, jax.Array]:
    """gym GoalEnv observation (reference _get_obs, pickplace.py:633-671)."""
    m = self.model
    kin = self.kin(es)
    dt = float(self.n_substeps) * float(m.opt.timestep)
    grip_pos = self.grip_pos(kin)
    grip_velp = self._site_velp(es, kin, self.grip_site) * dt
    robot_qpos = jnp.stack([get_joint_qpos(m, es.phys.qpos, j)
                            for j in self.monitored_joints])
    robot_qvel = jnp.stack([
        es.phys.qvel[m.jnt_dofadr[m.joint(j)]]
        for j in self.monitored_joints])
    obj_site = int(self.cube_site_ids[0])
    object_pos = kin.site_xpos[obj_site]
    object_rot = gm.mat_to_euler(kin.site_xmat[obj_site])
    object_velp = self._site_velp(es, kin, obj_site) * dt - grip_velp
    object_velr = jnp.zeros(3)  # rotational site velocity: unused downstream
    object_rel_pos = object_pos - grip_pos
    gripper_state = robot_qpos[-2:]
    gripper_vel = robot_qvel[-2:] * dt
    obs = jnp.concatenate([
        grip_pos, object_pos, object_rel_pos, gripper_state, object_rot,
        object_velp, object_velr, grip_velp, gripper_vel])
    return {
        'observation': obs,
        'achieved_goal': object_pos,
        'desired_goal': es.goal_pos,
    }

  def sample_goal(self, es: EnvState, goal: jax.Array) -> EnvState:
    return es.replace(goal_pos=goal)

  def reward(self, es: EnvState) -> jax.Array:
    """Sparse reward (gym FetchEnv compute_reward, threshold 0.05)."""
    kin = self.kin(es)
    d = jnp.linalg.norm(self.task_object_pos(es, kin) - es.goal_pos)
    return -(d > 0.05).astype(jnp.float32)

  # ------------------------------------------------------------- eval

  def eval_metrics(self, es: EnvState) -> Dict[str, jax.Array]:
    """obj_vicinity / grasp_success / task_success / goal_dist
    (scripts/gym_pickplace.py:575-601)."""
    kin = self.kin(es)
    grip = self.grip_pos(kin)
    obj = self.task_object_pos(es, kin)
    goal = self.task_goal_pos(es, kin)
    d_go = jnp.linalg.norm(obj - grip)
    d_og = jnp.linalg.norm(goal - obj)
    return {
        'obj_vicinity': (d_go <= OBJ_VICINITY).astype(jnp.float32),
        'grasp_success': (d_go <= GRASP_VICINITY).astype(jnp.float32),
        'task_success': (d_og <= GOAL_VICINITY).astype(jnp.float32),
        'goal_dist': d_og,
    }

  # ------------------------------------------------------------- render

  def background_slot(self) -> Optional[int]:
    """Texture slot of the camera-facing wall (reference randomizes
    'wall_04': gym_pickplace.py:860-867), or None if untextured."""
    scene = self.renderer.scene
    for s, g in enumerate(np.asarray(scene.tex_slot_geom)):
      if self.model.geom_name[int(g)] == 'wall_04':
        return s
    return None

  def background_textures(self, frame: jax.Array) -> Optional[jax.Array]:
    """Full texture-slot stack with the background wall replaced by
    `frame` ([R, R, 3] texel grid) — per-step video randomization."""
    scene = self.renderer.scene
    slot = self.background_slot()
    if slot is None:
      return None
    return jnp.asarray(scene.tex_default).at[slot].set(frame)

  def render(self, es: EnvState, textures: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array]:
    """256x256 RGB(+depth) from external_camera_1, row 0 = top.

    `textures` overrides the textured background surfaces (table top,
    floor, walls) for this render — see Renderer.render.
    """
    kin = self.kin(es)
    return self.renderer.render(kin, es.rgba, textures)

  def render_from_qpos(self, qpos: jax.Array, mocap_qpos: jax.Array,
                       rgba: jax.Array,
                       textures: Optional[jax.Array] = None
                       ) -> Tuple[jax.Array, jax.Array]:
    """Re-render a recorded frame from its stored state.

    State-only datasets (collect --dataset_formats states) store the full
    `qpos` + mocap pose per step and the per-episode recolor table instead
    of frames; FK needs nothing else (physics/kinematics.py fk reads only
    qpos and mocap_pos/quat), so training can re-synthesize the exact
    pixels on device instead of shipping them over the host link.
    Call env.setup() once before jit-tracing this.
    """
    st = self.setup()  # template for qvel/ctrl field shapes
    phys = st.replace(qpos=qpos,
                      mocap_pos=mocap_qpos[None, :3],
                      mocap_quat=mocap_qpos[None, 3:])
    return self.renderer.render(self.stepper.fk(phys), rgba, textures)


def make_env(shapes: str = 'pad2-cube2', **kwargs) -> GeecoEnv:
  return GeecoEnv(shapes=shapes, **kwargs)
