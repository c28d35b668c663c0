"""Benchmark: batched env stepping + rendering throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/sec/chip", "vs_baseline": N}

The metric is control-rate env steps (20 physics substeps @ 2 ms + one
256x256 RGB render each, the reference's operating point: SURVEY.md §6).
``vs_baseline`` is the fraction of the BASELINE.json north-star target of
1e6 env-steps/sec (the reference repo publishes no throughput numbers;
BASELINE.json "published": {}).

Measurement rules (learned the hard way on the axon device relay):
  * ``jax.block_until_ready`` does NOT actually block over the relay —
    every timed region ends with a forced host readback
    (``jax.device_get`` of a reduction over the final outputs), which
    cannot complete before the computation has.
  * Actions are perturbed per iteration from pre-staged device arrays so
    repeated dispatches cannot be served from any dispatch/result cache.
  * The reported number is the best batch size from a sweep (default
    256/512/1024 — override with BENCH_SWEEP), since per-chip throughput
    is what the north star counts.

Round-3 hardening (round-2 bench timed out with no number at all —
rc=124): the default is a SINGLE batch size (the known-best B=256) with
few iters so one compile suffices, the multi-point sweep moved behind
BENCH_SWEEP, and a SIGTERM/SIGALRM handler emits the best-so-far JSON
before any driver timeout can kill the process empty-handed.

Env overrides: BENCH_SWEEP (comma list; default single 256),
BENCH_NUM_ENVS (single B, disables the sweep), BENCH_STEPS,
BENCH_BUDGET_S (self-imposed wall-clock alarm, default 1500),
BENCH_SCAN=1 (time the n_iters control steps as one lax.scan — no
host-dispatch gaps, the vectorized-collect regime; per-step work is
identical).
"""

import json
import os
import signal
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
  sys.path.insert(0, REPO_ROOT)

NORTH_STAR = 1_000_000.0

# set by main() to the actual env config (so overridden runs don't claim
# the default config in the metric string)
_CONFIG_NOTE = 'ce=2 + binning 192/96, both fidelity-gated'

# best-so-far results, readable from the signal handler
_RESULTS = {}
_TRAIN_STEPS = None   # E2EVMC episode-scan train steps/sec (ask #5)
_EMITTED = False


def _emit(note=''):
  """Print the ONE result JSON line from whatever has been measured."""
  global _EMITTED
  if _EMITTED or not _RESULTS:
    return bool(_EMITTED)
  _EMITTED = True
  best_b = max(_RESULTS, key=_RESULTS.get)
  steps_per_sec = _RESULTS[best_b]
  out = {
      'metric': (f'pad2-cube2 env steps/sec/chip (B={best_b} of '
                 f'{sorted(_RESULTS)}; 20 substeps + 256x256 render per '
                 f'step; {_CONFIG_NOTE}; '
                 f'forced-readback timing{note})'),
      'value': round(steps_per_sec, 2),
      'unit': 'env_steps/sec/chip',
      'vs_baseline': round(steps_per_sec / NORTH_STAR, 6),
  }
  if note:
    # machine-readable truncation marker: callers can distinguish a sweep
    # cut short by SIGTERM/SIGALRM from a completed one (ADVICE.md round 3)
    out['truncated'] = True
  if _TRAIN_STEPS is not None:
    # the training half of the BASELINE metric (E2EVMC episode-scan train
    # steps/sec, 8 episodes/batch, 256x256 on-device re-render)
    out['train_steps_per_sec'] = round(_TRAIN_STEPS, 3)
  print(json.dumps(out), flush=True)
  return True


def _on_signal(signum, frame):
  # a driver timeout (SIGTERM) or our own alarm: report what we have
  if _emit(note=f'; cut short by signal {signum}'):
    os._exit(0)
  os._exit(124)


def _readback(*arrays):
  """Force a host readback that depends on every array (real sync point)."""
  import jax
  import jax.numpy as jnp
  # ravel first: scalar metrics (e.g. the train-step loss) are 0-d and
  # a[..., -1] on those raises IndexError
  tot = sum(jnp.sum(jnp.ravel(a)[-1:].astype(jnp.float32)) for a in arrays)
  return float(jax.device_get(tot))


def _bench_one(env, num_envs, n_iters, scan=False):
  import jax
  import jax.numpy as jnp

  rngs = jax.random.split(jax.random.PRNGKey(0), num_envs)
  reset = jax.jit(jax.vmap(env.reset_random))
  es = reset(rngs)
  _readback(es.phys.qpos)

  def step_and_render(es, action):
    es = env.step(es, action)
    rgb, _ = env.render(es)
    return es, rgb

  base = jnp.tile(jnp.asarray([0.1, 0.0, 0.2, 1.0]), (num_envs, 1))
  n_iters = max(2, n_iters)

  if scan:
    # BENCH_SCAN=1: identical per-step work (20 substeps + render each
    # control step, distinct action every step), but the n_iters control
    # steps run as one lax.scan so the measurement has no host-dispatch
    # gaps between steps — the regime a real vectorized collect loop
    # (run/sim.py rollout) operates in.
    deltas = jnp.stack([0.01 * jnp.sin(0.7 * i + jnp.arange(4))
                        for i in range(n_iters)])[:, None, :]

    @jax.jit
    def run(es, deltas):
      def body(es, d):
        es, rgb = jax.vmap(step_and_render)(es, base + d)
        # full-frame reduction: every pixel feeds the carried scalar, so
        # XLA cannot dead-code-eliminate any tile of the rasterizer
        return es, rgb.astype(jnp.float32).sum()
      return jax.lax.scan(body, es, deltas)

    es2, s = run(es, deltas)          # warmup/compile
    _readback(es2.phys.qpos, s)
    # perturbed inputs for the timed call: identical dispatches can be
    # served from a cache over the axon relay
    t0 = time.perf_counter()
    es2, s = run(es, deltas + 1e-4)
    _readback(es2.phys.qpos, s)
    dt = time.perf_counter() - t0
    return num_envs * n_iters / dt

  batched = jax.jit(jax.vmap(step_and_render))
  # pre-staged per-iteration perturbations: distinct inputs every call,
  # with no host->device transfer inside the timed loop
  deltas = [
      jax.device_put(0.01 * jnp.sin(0.7 * i + jnp.arange(4))[None, :])
      for i in range(n_iters)
  ]

  # warmup / compile (two calls: trace+compile, then steady-state dispatch)
  es, rgb = batched(es, base + deltas[0])
  _readback(es.phys.qpos, rgb)
  es, rgb = batched(es, base + deltas[1])
  _readback(es.phys.qpos, rgb)

  t0 = time.perf_counter()
  for i in range(n_iters):
    es, rgb = batched(es, base + deltas[i])
  # forced host readback over both outputs ends the timed region
  _readback(es.phys.qpos, rgb)
  dt = time.perf_counter() - t0
  return num_envs * n_iters / dt


def _bench_train_steps(env, n_iters=5):
  """E2EVMC episode-scan train steps/sec (state-only materialization at
  256x256, the production r4/r5 training operating point) — the training
  half of the BASELINE metric (round-4 verdict ask #5).

  Self-contained: the batch is synthesized around the env's settled
  initial state with the exact key/shape layout of
  data/dataset.py::_assemble_episode_batch (state-only branch), so no
  dataset needs to exist on the bench machine.
  """
  import jax
  import jax.numpy as jnp
  import numpy as np
  from geeco_tpu.data.dataset import window_indices
  from geeco_tpu.models.params import create_e2evmc_config
  from geeco_tpu.models.train import make_episode_train_fns

  config = create_e2evmc_config({
      'control_mode': 'cartesian', 'proc_obs': 'dynimg',
      'proc_tgt': 'dyndiff', 'img_channels': 3, 'window_size': 4,
      'batch_size': 32, 'lr': 2e-4, 'lambda_aux': 1.0,
      'loss_weighting': 'cmd_mag', 'start_boost': 6.0,
      'start_boost_windows': 13,
  })
  init_fn, train_step, _, _ = make_episode_train_fns(
      config, True, chunk_windows=8, render_fn=env.render_from_qpos,
      aug_pad=10)
  ts = init_fn(jax.random.PRNGKey(0), config.batch_size)

  B = int(os.environ.get('BENCH_TRAIN_B', '8'))
  T = int(os.environ.get('BENCH_TRAIN_T', '99'))
  K = config.window_size
  phys = env.setup()
  nq = int(np.asarray(phys.qpos).shape[0])
  J = config.dim_jnt_state
  widx = window_indices(T, K, pad_start=True).astype(np.int32)
  N = widx.shape[0]
  rng = np.random.RandomState(0)
  qpos = (np.asarray(phys.qpos)[None, None, :] +
          0.01 * rng.randn(B, T, nq)).astype(np.float32)
  mocap = np.concatenate([np.asarray(phys.mocap_pos)[0],
                          np.asarray(phys.mocap_quat)[0]]).astype(np.float32)
  mocap = np.broadcast_to(mocap, (B, T, 7)).copy()
  batch = {
      'widx': widx, 'valid': np.ones((N,), bool),
      'jnt_state': rng.randn(B, T, J).astype(np.float32),
      'cmd': rng.uniform(-1, 1, (B, N, 4)).astype(np.float32),
      'vel_target': rng.randn(B, N, J).astype(np.float32),
      'ee_target': rng.randn(B, N, 7).astype(np.float32),
      'grp_target': rng.rand(B, N, 2).astype(np.float32),
      'pos_ee': rng.randn(B, N, 3).astype(np.float32),
      'pos_obj': rng.randn(B, N, 3).astype(np.float32),
      'step': np.broadcast_to(np.arange(N, dtype=np.int32), (B, N)).copy(),
      'qpos': qpos, 'mocap': mocap,
      'rgba': np.broadcast_to(np.asarray(env.rgba0, np.float32),
                              (B,) + np.asarray(env.rgba0).shape).copy(),
      'tgt_qpos': qpos[:, -1], 'tgt_mocap': mocap[:, -1],
      'aug_shift': rng.randint(-10, 11, (B, 2)).astype(np.int32),
  }
  batch = {k: jnp.asarray(v) for k, v in batch.items()}
  step = jax.jit(train_step)
  ts, m = step(ts, batch)             # trace + compile
  _readback(m['loss'])
  ts, m = step(ts, batch)             # steady-state dispatch
  _readback(m['loss'])
  t0 = time.perf_counter()
  for _ in range(n_iters):
    ts, m = step(ts, batch)
  _readback(m['loss'])
  return n_iters / (time.perf_counter() - t0)


def main():
  signal.signal(signal.SIGTERM, _on_signal)
  signal.signal(signal.SIGALRM, _on_signal)
  signal.alarm(int(os.environ.get('BENCH_BUDGET_S', '1500')))

  from geeco_tpu.envs.base import GeecoEnv

  n_iters = int(os.environ.get('BENCH_STEPS', '10'))
  if 'BENCH_NUM_ENVS' in os.environ:
    sweep = [int(os.environ['BENCH_NUM_ENVS'])]
  else:
    # single point by default: round-2's 3-point sweep (3 multi-minute
    # compiles over the axon relay) blew the driver budget -> rc=124
    sweep = [int(b) for b in
             os.environ.get('BENCH_SWEEP', '256').split(',')]

  # Round-5 perf defaults, both fidelity-gated (override via env):
  #   * collide_every=2 — narrowphase contacts reused for 2 substeps.
  #     Replay-parity sweep (STATUS.md, scripts_dev/replay_fidelity_sweep):
  #     task success preserved on ALL five MuJoCo fixtures (pick/push/
  #     clutter/nut-cone/ball-cup), drift 8.4 mm on the bench scene.
  #   * render binning caps 192/96 (from 512/192) — pixel-EXACT (0.000%
  #     mismatch >2/255) on pad2-cube2 probe states
  #     (scripts_dev/binning_fidelity.py): the scene's per-region depth
  #     complexity is far below the default capacity.
  env_kwargs = {'collide_every': 2}
  if 'BENCH_SOLVER_ITERS' in os.environ:
    env_kwargs['solver_iterations'] = int(os.environ['BENCH_SOLVER_ITERS'])
  if 'BENCH_SOLVER_METHOD' in os.environ:
    env_kwargs['solver_method'] = os.environ['BENCH_SOLVER_METHOD']
  if 'BENCH_SELECT_K' in os.environ:
    env_kwargs['contact_select_k'] = int(os.environ['BENCH_SELECT_K'])
  if 'BENCH_COLLIDE_EVERY' in os.environ:
    env_kwargs['collide_every'] = int(os.environ['BENCH_COLLIDE_EVERY'])
  if 'BENCH_SUBSTEP_UNROLL' in os.environ:
    env_kwargs['substep_unroll'] = int(os.environ['BENCH_SUBSTEP_UNROLL'])
  if 'BENCH_MASS_INVERSE' in os.environ:
    env_kwargs['mass_inverse'] = os.environ['BENCH_MASS_INVERSE']
  if 'BENCH_SOLVER_UNROLL' in os.environ:
    env_kwargs['solver_unroll'] = int(os.environ['BENCH_SOLVER_UNROLL'])
  rk = os.environ.get('BENCH_RK', '192,96')
  if rk:
    k1, k2 = (int(v) for v in rk.split(','))
    env_kwargs['renderer_kwargs'] = {'coarse_k': k1, 'mid_k': k2}
  global _CONFIG_NOTE
  _CONFIG_NOTE = (f"ce={env_kwargs['collide_every']}"
                  + (f' binning {rk.replace(",", "/")}' if rk else '')
                  + ', fidelity-gated')
  env = GeecoEnv(shapes='pad2-cube2', settle_steps=2, **env_kwargs)
  env.setup()

  scan = os.environ.get('BENCH_SCAN', '0') == '1'
  for b in sweep:
    try:
      _RESULTS[b] = _bench_one(env, b, n_iters, scan=scan)
      print(f'# B={b}: {_RESULTS[b]:.2f} env-steps/s',
            file=sys.stderr, flush=True)
    except Exception as e:  # OOM at large B must not kill the bench
      print(f'# B={b} failed: {type(e).__name__}: {e}', file=sys.stderr)
  if not _RESULTS:
    raise SystemExit('all batch sizes failed')
  if os.environ.get('BENCH_TRAIN', '1') == '1':
    global _TRAIN_STEPS
    try:
      _TRAIN_STEPS = _bench_train_steps(env)
      print(f'# train: {_TRAIN_STEPS:.3f} steps/s', file=sys.stderr,
            flush=True)
    except Exception as e:  # the env-step metric must still be emitted
      print(f'# train bench failed: {type(e).__name__}: {e}',
            file=sys.stderr)
  signal.alarm(0)
  _emit()


if __name__ == '__main__':
  main()
