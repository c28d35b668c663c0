"""Pick-and-place CLI: collect / replay / random / controller.

Flag-compatible counterpart of the reference script
(scripts/gym_pickplace.py:49-131).  Usage:
  python -m geeco_tpu.run.gym_pickplace --sim_mode collect \
      --rendering_mode tfrecord --shapes pad2-cube2 --end_idx 10
"""

import argparse

from . import sim

ARGPARSER = argparse.ArgumentParser(
    description='Collect data for a pick-and-place task with a Fetch robot '
                '(TPU-native GEECO).')
ARGPARSER.add_argument('--wrk_dir', type=str,
                       default='../logs/gym_pickplace')
ARGPARSER.add_argument('--shapes', type=str, default='pad2-cube2',
                       help='pad1-cube1 | pad2-cube1 | pad1-cube2 | '
                            'pad2-cube2 | pad2-cube2-clutter4 | '
                            'pad2-cube2-clutter12 | ball-cup | bridge-pad | '
                            'diamond-pad | nut-cone')
ARGPARSER.add_argument('--sim_mode', type=str, default='collect',
                       help='collect | replay | random | controller')
ARGPARSER.add_argument('--max_episode_steps', type=int, default=-1)
ARGPARSER.add_argument('--dry_run', default=False, action='store_true')
ARGPARSER.add_argument('--init_states', type=str, default='')
ARGPARSER.add_argument('--start_idx', type=int, default=0)
ARGPARSER.add_argument('--end_idx', type=int, default=100)
ARGPARSER.add_argument('--replay_buffer', type=str, default='')
ARGPARSER.add_argument('--controller', type=str, default='e2evmc')
ARGPARSER.add_argument('--goal_condition', type=str, default='none',
                       help='none | target')
ARGPARSER.add_argument('--model_dir', type=str, default='')
ARGPARSER.add_argument('--checkpoint_name', type=str, default=None)
ARGPARSER.add_argument('--dataset_dir', type=str, default='')
ARGPARSER.add_argument('--tfrecord_list', type=str, default='')
ARGPARSER.add_argument('--background_video', type=str, default='')
ARGPARSER.add_argument('--carry_mode', type=str, default='auto',
                       choices=['auto', 'window', 'persistent'],
                       help='LSTM carry at serving: auto derives it from the '
                            'trained config.train_carry; window = fresh '
                            'per step; persistent = accumulated across '
                            'the episode (reference-predictor parity)')
ARGPARSER.add_argument('--shadows', type=int, default=-1,
                       help='occlusion-tested shadows: 1 on, 0 off, '
                            '-1 renderer default (on)')
ARGPARSER.add_argument('--tex_grid', type=int, default=-1,
                       help='texel grid for textured surfaces; 0 disables '
                            'texture tessellation (flat colors), -1 = '
                            'renderer default')
ARGPARSER.add_argument('--rendering_mode', type=str, default='tfrecord',
                       help='video | tfrecord')
ARGPARSER.add_argument('--frame_res', type=int, nargs=2, default=[256, 256])
ARGPARSER.add_argument('--observation_format', type=str, default='rgb')
ARGPARSER.add_argument('--num_devices', type=int, default=1,
                       help='shard the env batch over this many devices '
                            '(1-d data mesh; num_envs must divide evenly)')
ARGPARSER.add_argument('--num_envs', type=int, default=1,
                       help='TPU extension: vectorized env batch')
ARGPARSER.add_argument('--seed', type=int, default=0)
ARGPARSER.add_argument('--split_name', type=str, default='default',
                       help='dataset split for controller-mode eval')
ARGPARSER.add_argument('--dataset_formats', type=str, default='all',
                       choices=['all', 'npz', 'states'],
                       help='npz = fast uncompressed training collect '
                            '(skips pkl/tfrecord sidecars and depth); '
                            'states = frameless collect storing full qpos '
                            'per step (~40 KB/episode) — training '
                            're-renders on device (data/episode.py)')
ARGPARSER.add_argument('--start_sphere', type=float, default=0.03,
                       help='EE-start sampling sphere radius (reference '
                            'r=0.03); larger = perturbation-augmented '
                            'start-basin coverage for collection')
ARGPARSER.add_argument('--perturb_prefix', type=int, default=0,
                       help='collect mode: up to N random pre-roll steps '
                            'per episode before the expert takes over '
                            '(recorded episode starts AFTER the pre-roll; '
                            'DAgger-lite start diversity)')
ARGPARSER.add_argument('--expert_noise', type=float, default=0.0,
                       help='DART collection: execute expert + '
                            'N(0, sigma) on the EE translation, '
                            'record the clean expert action '
                            '(expert/policies.py rollout)')
ARGPARSER.add_argument('--renderer_trim', type=str, default='',
                       help='K1,K2 binning-cap override (coarse_k,mid_k); '
                       'only fidelity-gated pixel-exact values '
                       '(scripts_dev/binning_fidelity.py)')
ARGPARSER.add_argument('--debug', default=False, action='store_true')

if __name__ == '__main__':
  args, _ = ARGPARSER.parse_known_args()
  args._parser = ARGPARSER
  sim.main(args)
