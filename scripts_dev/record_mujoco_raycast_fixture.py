"""Record golden MuJoCo ray-cast depth maps for render parity.

This image has NO OpenGL stack (no /dev/dri, no OSMesa, EGL init fails),
so the reference's actual rendered frames
(src/geeco_gym/pickplace.py:260-264 -> mujoco_py offscreen OpenGL) cannot
be reproduced here.  ``mujoco.mj_ray`` is pure CPU physics and casts
against the SAME geometry/camera the reference renders, so per-pixel
ray-cast z-depth at ``external_camera_1`` is the strongest golden visual
ground truth available: it pins the camera model (pose, fovy, aspect),
every silhouette, and all occlusion relationships.  Color/lighting are
this framework's own design and are not compared.

Output per scene: tests/fixtures/mujoco_raycast_<tag>.npz
  qpos      [F, nq]      mujoco qpos per frame (after mj_forward)
  mocap_pos [F, 1, 3], mocap_quat [F, 1, 4]
  depth     [F, H, W]    z-depth along camera -z axis; -1 where no hit
  geomid    [F, H, W]    mujoco geom id hit; -1 where none

Run: env -u PYTHONPATH python scripts_dev/record_mujoco_raycast_fixture.py
"""

import os

import mujoco
import numpy as np

H = W = 256
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENVDIR = os.path.join(REPO, 'geeco_tpu', 'assets_gym', 'envs')
FIXDIR = os.path.join(REPO, 'tests', 'fixtures')

# scene -> (xml, replay fixture providing a recorded init state, out tag,
#           record the extra posed-arm frame?)
SCENES = {
    'pad2-cube2': ('geeco-pad2-cube2.xml',
                   'mujoco_pickplace_pad2cube2.npz', 'pad2cube2', True),
    'push-pad2-cube2': ('geeco-push-pad2-cube2.xml',
                        'mujoco_pushing_pushpad2cube2.npz',
                        'pushpad2cube2', False),
    'pad2-cube2-clutter4': ('geeco-pad2-cube2-clutter4.xml',
                            'mujoco_pickplace_pad2cube2clutter4.npz',
                            'pad2cube2clutter4', False),
    'nut-cone': ('geeco-nut-cone.xml',
                 'mujoco_pickplace_nutcone.npz', 'nutcone', False),
}


def raycast(m, d, cam_id):
  cam_pos = d.cam_xpos[cam_id].copy()
  xmat = d.cam_xmat[cam_id].reshape(3, 3)  # columns = camera axes
  f = 1.0 / np.tan(np.deg2rad(m.cam_fovy[cam_id]) * 0.5)
  aspect = W / H
  depth = np.full((H, W), -1.0, np.float32)
  geomid_img = np.full((H, W), -1, np.int32)
  gid = np.zeros(1, np.int32)
  for i in range(H):
    for j in range(W):
      # exact inverse of the repo rasterizer's projection
      # (render/rasterizer.py:149-155)
      a = (2.0 * (j + 0.5) / W - 1.0) * aspect / f
      b = (1.0 - 2.0 * (i + 0.5) / H) / f
      dir_cam = np.asarray([a, b, -1.0])
      n = np.linalg.norm(dir_cam)
      dir_world = xmat @ (dir_cam / n)
      dist = mujoco.mj_ray(m, d, cam_pos, dir_world, None, 1, -1, gid)
      if gid[0] >= 0 and dist >= 0:
        depth[i, j] = dist / n   # ray length -> z-depth (cos = 1/|dir|)
        geomid_img[i, j] = gid[0]
  return depth, geomid_img


def record_scene(scene, xml, replay_fx, tag, posed_arm):
  m = mujoco.MjModel.from_xml_path(os.path.join(ENVDIR, xml))
  # non-viewer mode hides the ee debug crosshair (reference:
  # src/geeco_gym/pickplace.py:568-571 sets alpha 0; the repo env does the
  # same via rgba0) — mj_ray skips only fully-zero rgba geoms
  for g in range(m.ngeom):
    name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g) or ''
    if 'crosshair' in name:
      m.geom_rgba[g] = 0.0
      m.geom_matid[g] = -1
  d = mujoco.MjData(m)
  cam_id = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_CAMERA,
                             'external_camera_1')
  fx = np.load(os.path.join(FIXDIR, replay_fx))

  frames = []
  # frame 0: scene defaults (objects at XML positions, arm at default)
  mujoco.mj_resetData(m, d)
  mujoco.mj_forward(m, d)
  frames.append((d.qpos.copy(), d.mocap_pos.copy(), d.mocap_quat.copy()))

  # frame 1: the replay fixture's recorded randomized object placement
  mujoco.mj_resetData(m, d)
  for k, jname in enumerate(fx['obj_joint_names']):
    jid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, str(jname))
    adr = m.jnt_qposadr[jid]
    d.qpos[adr:adr + 7] = fx['init_obj_qpos'][k]
  d.mocap_pos[0] = fx['init_mocap_qpos'][:3]
  d.mocap_quat[0] = fx['init_mocap_qpos'][3:]
  mujoco.mj_forward(m, d)
  frames.append((d.qpos.copy(), d.mocap_pos.copy(), d.mocap_quat.copy()))

  if posed_arm:
    # frame 2: arm posed mid-workspace (exercises robot-link silhouettes)
    for jname, val in (('robot0:shoulder_lift_joint', -0.5),
                       ('robot0:elbow_flex_joint', 0.8),
                       ('robot0:wrist_flex_joint', 0.6),
                       ('robot0:l_gripper_finger_joint', 0.04),
                       ('robot0:r_gripper_finger_joint', 0.04)):
      jid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, jname)
      d.qpos[m.jnt_qposadr[jid]] = val
    mujoco.mj_forward(m, d)
    frames.append((d.qpos.copy(), d.mocap_pos.copy(), d.mocap_quat.copy()))

  qpos, mpos, mquat, depths, gids = [], [], [], [], []
  for k, (q, mp, mq) in enumerate(frames):
    mujoco.mj_resetData(m, d)
    d.qpos[:] = q
    d.mocap_pos[:] = mp
    d.mocap_quat[:] = mq
    mujoco.mj_forward(m, d)
    dep, gid = raycast(m, d, cam_id)
    print(f'{scene} frame {k}: hit {np.mean(dep > 0):.3f}, '
          f'z range [{dep[dep > 0].min():.3f}, {dep.max():.3f}]')
    qpos.append(q)
    mpos.append(mp)
    mquat.append(mq)
    depths.append(dep)
    gids.append(gid)

  out = os.path.join(FIXDIR, f'mujoco_raycast_{tag}.npz')
  np.savez_compressed(
      out, qpos=np.stack(qpos), mocap_pos=np.stack(mpos),
      mocap_quat=np.stack(mquat), depth=np.stack(depths),
      geomid=np.stack(gids), height=H, width=W, scene=scene)
  print('wrote', out)


def main():
  import sys
  only = sys.argv[1:] or list(SCENES)
  for scene in only:
    xml, replay_fx, tag, posed = SCENES[scene]
    record_scene(scene, xml, replay_fx, tag, posed)


if __name__ == '__main__':
  main()
