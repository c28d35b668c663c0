"""Static ``Model`` and dynamic ``State`` pytrees for the TPU physics core.

Design: MJX-style split.  ``Model`` holds compile-time scene description —
numeric parameters are jnp-array pytree leaves (so one jitted step function
serves recolored / re-parameterized variants), while *structural* integers
(tree topology, qpos layout, geom types, collision pair lists) are static
aux data so FK / collision code can unroll over them at trace time.

``State`` is the minimal per-env dynamic state: generalized coordinates,
velocities, actuator controls and mocap poses — a direct TPU-native analogue
of the mujoco-py state the reference manipulates through ``MjSim``
(reference: src/geeco_gym/pickplace.py:205-247 buffers exactly these fields).

Everything is float32.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

# --- enum codes (match MuJoCo's mjtJoint / mjtGeom for familiarity) ---------
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3
PLANE, HFIELD, SPHERE, CAPSULE, ELLIPSOID, CYLINDER, BOX, MESH = range(8)

JOINT_QPOS_DIM = {FREE: 7, BALL: 4, SLIDE: 1, HINGE: 1}
JOINT_DOF_DIM = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}


@struct.dataclass
class Option:
  """Simulation options (<option> element)."""
  timestep: jax.Array           # scalar
  gravity: jax.Array            # [3]
  density: jax.Array            # scalar, ambient fluid density
  viscosity: jax.Array          # scalar
  # static solver configuration
  solver_iterations: int = struct.field(pytree_node=False, default=30)
  ls_tolerance: float = struct.field(pytree_node=False, default=1e-8)


@struct.dataclass
class Model:
  """Static scene description compiled from MJCF (core/mjcf.py)."""

  opt: Option

  # --- sizes (static) ---
  nq: int = struct.field(pytree_node=False)
  nv: int = struct.field(pytree_node=False)
  nu: int = struct.field(pytree_node=False)
  nbody: int = struct.field(pytree_node=False)
  njnt: int = struct.field(pytree_node=False)
  ngeom: int = struct.field(pytree_node=False)
  nsite: int = struct.field(pytree_node=False)
  nmocap: int = struct.field(pytree_node=False)
  ncam: int = struct.field(pytree_node=False)
  nlight: int = struct.field(pytree_node=False)
  neq: int = struct.field(pytree_node=False)

  # --- bodies ---
  body_parentid: Tuple[int, ...] = struct.field(pytree_node=False)
  body_mocapid: Tuple[int, ...] = struct.field(pytree_node=False)  # -1 if none
  body_jntadr: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False)
  body_name: Tuple[str, ...] = struct.field(pytree_node=False)
  body_pos: jax.Array        # [nbody, 3]
  body_quat: jax.Array       # [nbody, 4]
  body_mass: jax.Array       # [nbody]
  body_inertia: jax.Array    # [nbody, 3] diagonal inertia in inertial frame
  body_ipos: jax.Array       # [nbody, 3]
  body_iquat: jax.Array      # [nbody, 4]

  # --- joints ---
  jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)
  jnt_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
  jnt_qposadr: Tuple[int, ...] = struct.field(pytree_node=False)
  jnt_dofadr: Tuple[int, ...] = struct.field(pytree_node=False)
  jnt_limited: Tuple[bool, ...] = struct.field(pytree_node=False)
  jnt_name: Tuple[str, ...] = struct.field(pytree_node=False)
  jnt_pos: jax.Array         # [njnt, 3]
  jnt_axis: jax.Array        # [njnt, 3]
  jnt_range: jax.Array       # [njnt, 2]
  jnt_stiffness: jax.Array   # [njnt]
  jnt_ref: jax.Array         # [njnt]
  jnt_springref: jax.Array   # [njnt]
  jnt_solref: jax.Array      # [njnt, 2] for limit constraints
  jnt_solimp: jax.Array      # [njnt, 5]

  # --- dofs ---
  dof_jntid: Tuple[int, ...] = struct.field(pytree_node=False)
  dof_armature: jax.Array    # [nv]
  dof_damping: jax.Array     # [nv]

  # --- geoms ---
  geom_type: Tuple[int, ...] = struct.field(pytree_node=False)
  geom_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
  geom_contype: Tuple[int, ...] = struct.field(pytree_node=False)
  geom_conaffinity: Tuple[int, ...] = struct.field(pytree_node=False)
  geom_condim: Tuple[int, ...] = struct.field(pytree_node=False)
  geom_meshid: Tuple[int, ...] = struct.field(pytree_node=False)
  geom_name: Tuple[str, ...] = struct.field(pytree_node=False)
  geom_pos: jax.Array        # [ngeom, 3]
  geom_quat: jax.Array       # [ngeom, 4]
  geom_size: jax.Array       # [ngeom, 3]
  geom_rgba: jax.Array       # [ngeom, 4]
  geom_friction: jax.Array   # [ngeom, 3] (slide, torsion, roll)
  geom_solref: jax.Array     # [ngeom, 2]
  geom_solimp: jax.Array     # [ngeom, 5]
  geom_margin: jax.Array     # [ngeom]

  # --- sites ---
  site_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
  site_name: Tuple[str, ...] = struct.field(pytree_node=False)
  site_pos: jax.Array        # [nsite, 3]
  site_quat: jax.Array       # [nsite, 4]
  site_size: jax.Array       # [nsite, 3]
  site_rgba: jax.Array       # [nsite, 4]

  # --- cameras ---
  cam_bodyid: Tuple[int, ...] = struct.field(pytree_node=False)
  cam_name: Tuple[str, ...] = struct.field(pytree_node=False)
  cam_pos: jax.Array         # [ncam, 3]
  cam_quat: jax.Array        # [ncam, 4]
  cam_fovy: jax.Array        # [ncam]

  # --- lights ---
  light_pos: jax.Array         # [nlight, 3]
  light_dir: jax.Array         # [nlight, 3]
  light_directional: Tuple[bool, ...] = struct.field(pytree_node=False)

  # --- actuators (position servos; reference scene only uses these,
  #     assets/gym/envs/geeco-pad2-cube2.xml:68-71) ---
  actuator_jntid: Tuple[int, ...] = struct.field(pytree_node=False)
  actuator_name: Tuple[str, ...] = struct.field(pytree_node=False)
  actuator_kp: jax.Array       # [nu]
  actuator_ctrlrange: jax.Array  # [nu, 2]

  # --- equality constraints (weld; assets/gym/defaults/geeco-gym.xml:50-52) ---
  eq_body1: Tuple[int, ...] = struct.field(pytree_node=False)
  eq_body2: Tuple[int, ...] = struct.field(pytree_node=False)
  eq_solref: jax.Array       # [neq, 2]
  eq_solimp: jax.Array       # [neq, 5]

  # --- collision pair groups: ((typecode1, typecode2), ((g1, g2), ...)) ---
  col_pairs: Tuple[Any, ...] = struct.field(pytree_node=False)

  # --- convex hulls for mesh narrowphase (padded; empty when no meshes).
  #     Hull h of geom g (geom_hullid[g]) is in the geom frame (AABB-centered
  #     like the render mesh).  Faces are half-spaces n·x <= off. ---
  geom_hullid: Tuple[int, ...] = struct.field(pytree_node=False)
  hull_vert: jax.Array       # [nhull, HV, 3]
  hull_vmask: jax.Array      # [nhull, HV] 1.0 = valid vertex
  hull_face: jax.Array       # [nhull, HF, 4] (nx, ny, nz, off)
  hull_fmask: jax.Array      # [nhull, HF] 1.0 = valid face
  hull_edge: jax.Array       # [nhull, HE, 3] unique edge directions (unit)
  hull_emask: jax.Array      # [nhull, HE] 1.0 = valid edge direction

  # --- default qpos (reference configuration) ---
  qpos0: jax.Array           # [nq]

  # ---------------------------------------------------------------- helpers
  def name2id(self, names: Tuple[str, ...], name: str) -> int:
    return names.index(name)

  def body(self, name: str) -> int:
    return self.body_name.index(name)

  def joint(self, name: str) -> int:
    return self.jnt_name.index(name)

  def geom(self, name: str) -> int:
    return self.geom_name.index(name)

  def site(self, name: str) -> int:
    return self.site_name.index(name)

  def cam(self, name: str) -> int:
    return self.cam_name.index(name)

  def actuator(self, name: str) -> int:
    return self.actuator_name.index(name)

  def jnt_qpos_slice(self, name: str):
    j = self.joint(name)
    adr = self.jnt_qposadr[j]
    return adr, adr + JOINT_QPOS_DIM[self.jnt_type[j]]

  def jnt_dof_slice(self, name: str):
    j = self.joint(name)
    adr = self.jnt_dofadr[j]
    return adr, adr + JOINT_DOF_DIM[self.jnt_type[j]]


@struct.dataclass
class State:
  """Per-env dynamic state (pure pytree; vmap over leading batch axis)."""
  qpos: jax.Array       # [nq]
  qvel: jax.Array       # [nv]
  ctrl: jax.Array       # [nu]
  mocap_pos: jax.Array  # [nmocap, 3]
  mocap_quat: jax.Array  # [nmocap, 4]
  time: jax.Array       # scalar
  efc_force: jax.Array | None = None  # [ne] warmstart for the contact solver


@struct.dataclass
class Kin:
  """Forward-kinematics products (per env)."""
  xpos: jax.Array        # [nbody, 3]  body frame origin, world
  xquat: jax.Array       # [nbody, 4]
  ximat: jax.Array       # [nbody, 3, 3]
  xipos: jax.Array       # [nbody, 3]  body COM, world
  geom_xpos: jax.Array   # [ngeom, 3]
  geom_xquat: jax.Array  # [ngeom, 4]
  site_xpos: jax.Array   # [nsite, 3]
  site_xmat: jax.Array   # [nsite, 3, 3]


def make_state(model: Model) -> State:
  """Initial state at the model reference configuration."""
  # mocap bodies hold their compiled body pose
  mocap_pos = []
  mocap_quat = []
  for b in range(model.nbody):
    mid = model.body_mocapid[b]
    if mid >= 0:
      mocap_pos.append(model.body_pos[b])
      mocap_quat.append(model.body_quat[b])
  if mocap_pos:
    mpos = jnp.stack(mocap_pos)
    mquat = jnp.stack(mocap_quat)
  else:
    mpos = jnp.zeros((0, 3))
    mquat = jnp.zeros((0, 4))
  return State(
      qpos=jnp.asarray(model.qpos0, jnp.float32),
      qvel=jnp.zeros((model.nv,), jnp.float32),
      ctrl=jnp.zeros((model.nu,), jnp.float32),
      mocap_pos=mpos.astype(jnp.float32),
      mocap_quat=mquat.astype(jnp.float32),
      time=jnp.zeros((), jnp.float32),
  )


# ------------------------------------------------------------------ qpos ops


def get_joint_qpos(model: Model, qpos: jax.Array, name: str) -> jax.Array:
  lo, hi = model.jnt_qpos_slice(name)
  val = qpos[..., lo:hi]
  return val[..., 0] if hi - lo == 1 else val


def set_joint_qpos(model: Model, qpos: jax.Array, name: str,
                   value: jax.Array) -> jax.Array:
  lo, hi = model.jnt_qpos_slice(name)
  value = jnp.atleast_1d(jnp.asarray(value, qpos.dtype))
  return qpos.at[..., lo:hi].set(value)


def get_joint_qvel(model: Model, qvel: jax.Array, name: str) -> jax.Array:
  lo, hi = model.jnt_dof_slice(name)
  val = qvel[..., lo:hi]
  return val[..., 0] if hi - lo == 1 else val


def set_joint_qvel(model: Model, qvel: jax.Array, name: str,
                   value: jax.Array) -> jax.Array:
  lo, hi = model.jnt_dof_slice(name)
  value = jnp.atleast_1d(jnp.asarray(value, qvel.dtype))
  return qvel.at[..., lo:hi].set(value)
