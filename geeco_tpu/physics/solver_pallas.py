"""Pallas TPU kernel for the projected-gradient contact solve.

Why: each psd iteration applies the reduced operator twice, and under
``vmap`` + ``lax.scan`` XLA re-streams the per-env J/X factors (~126 KB at
K=128) from HBM on every iteration — 2 Aop x 60 iters x 20 substeps x B
envs is tens of GB per control step, the measured physics bandwidth floor.
This kernel runs the ENTIRE iteration loop with J/X resident in VMEM: one
HBM read per substep instead of one per iteration.

Layout: envs ride the 128-lane axis in blocks of E (=64), constraint rows
ride sublanes, and the nv axis is the major (non-tiled) dimension:

    Jt, Xt      [nv, nI, E]    (v-major transposes of J_I, X_I = Minv J^T)
    AIEt        [nE, nI, E]
    EEinv       [nE, nE, E]
    f, g, ...   [nI, E]

so both matvecs of Aop are plain FMA sweeps over the major axis plus one
sublane reduction — no MXU batched-GEMV (which pads N=1 to 128), no small
trailing dims for XLA to pad.

Row layout matches solver._row_order with ngrp=4 (contact groups n/t1/t2/
tor of K rows each, then 2*nlim limit rows, then padding to a multiple of
8).  The weld equality rows are already Schur-eliminated by the caller.

Used through ``solve(..., method='pallas')``: a ``custom_vmap`` wrapper
dispatches to this kernel when the solve is vmapped over a batch divisible
by E, and to an equivalent jnp path otherwise (including the unbatched
case and CPU tests, where the kernel also runs in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

def _env_block(nI: int, nv: int) -> int:
  """Envs per grid step (lanes), sized so the VMEM-resident operands
  (Jt + Xt + AIEt + vectors, double-buffered by the pipeline) stay well
  under the ~16 MB VMEM budget."""
  per_env = (2 * nv + 8) * nI * 4  # bytes: Jt, Xt, ~8 row vectors
  for e in (128, 64, 32, 16, 8):
    if 2 * per_env * e < 10 * 2**20:
      return e
  return 8


E_BLOCK = 64  # kernel block used by tests (nI there is small)


def _round8(n: int) -> int:
  return (n + 7) // 8 * 8


# ---------------------------------------------------------------------------
# shared iteration math (jnp reference; the kernel mirrors it exactly)
# ---------------------------------------------------------------------------


def _project_rows(f, mu_t, mu_tor, con_act, lim_act, K: int, nlim: int):
  """Cone projection in row-major [nI(, E)] layout (4 contact groups)."""
  fn = jnp.maximum(f[0:K], 0.0) * con_act
  ft1 = f[K:2 * K]
  ft2 = f[2 * K:3 * K]
  t_norm = jnp.sqrt(ft1 * ft1 + ft2 * ft2 + 1e-18)
  scale = jnp.minimum(1.0, mu_t * fn / t_norm)
  ft1 = ft1 * scale * con_act
  ft2 = ft2 * scale * con_act
  lim = mu_tor * fn
  ftor = jnp.clip(f[3 * K:4 * K], -lim, lim) * con_act
  parts = [fn, ft1, ft2, ftor]
  if nlim:
    flim = jnp.maximum(f[4 * K:4 * K + 2 * nlim], 0.0) * lim_act[:2 * nlim]
    parts.append(flim)
  rest = f[4 * K + 2 * nlim:]
  if rest.shape[0]:
    parts.append(jnp.zeros_like(rest))
  return jnp.concatenate(parts, axis=0)


def _psd_loop(Jt, Xt, AIEt, EEinv, R, b, precond, f0, mu_t, mu_tor,
              con_act, lim_act, K: int, nlim: int, iterations: int):
  """Reference jnp loop on kernel-layout operands (single env block).

  Shapes: Jt/Xt [nv, nI, E], AIEt [nE, nI, E], EEinv [nE, nE, E],
  vectors [nI, E] (or [K, E] / [2*nlim, E] for the cone params).
  """
  nE = AIEt.shape[0]

  def Aop(f):
    u = jnp.sum(Xt * f[None, :, :], axis=1)          # [nv, E]
    y = jnp.sum(Jt * u[:, None, :], axis=0)          # [nI, E]
    if nE:
      w = jnp.sum(AIEt * f[None, :, :], axis=1)      # [nE, E]
      z = jnp.sum(EEinv * w[None, :, :], axis=1)     # [nE, E]
      y = y - jnp.sum(AIEt * z[:, None, :], axis=0)
    return y + R * f

  def project(f):
    return _project_rows(f, mu_t, mu_tor, con_act, lim_act, K, nlim)

  def body(k, f):
    g = Aop(f) + b
    d = precond * g
    Ad = Aop(d)
    denom = jnp.sum(d * Ad, axis=0, keepdims=True)   # [1, E]
    num = jnp.sum(g * d, axis=0, keepdims=True)
    alpha = jnp.where(denom > 1e-12, num / jnp.maximum(denom, 1e-12), 0.0)
    return project(f - alpha * d)

  return jax.lax.fori_loop(0, iterations, body, project(f0))


# ---------------------------------------------------------------------------
# pallas kernel
# ---------------------------------------------------------------------------


def _kernel(Jt_r, Xt_r, AIEt_r, EEinv_r, R_r, b_r, pre_r, f0_r, mut_r,
            mutor_r, cact_r, lact_r, out_r, *, K, nlim, iterations):
  f = _psd_loop(Jt_r[...], Xt_r[...], AIEt_r[...], EEinv_r[...], R_r[...],
                b_r[...], pre_r[...], f0_r[...], mut_r[...], mutor_r[...],
                cact_r[...], lact_r[...], K, nlim, iterations)
  out_r[...] = f


def _run_pallas(Jt, Xt, AIEt, EEinv, R, b, precond, f0, mu_t, mu_tor,
                con_act, lim_act, K: int, nlim: int, iterations: int,
                interpret: bool):
  from jax.experimental import pallas as pl

  nv, nI, B = Jt.shape
  nE = AIEt.shape[0]
  E = _env_block(nI, nv)
  while B % E:
    E //= 2
  grid = (B // E,)

  def spec3(d0, d1):
    return pl.BlockSpec((d0, d1, E), lambda i: (0, 0, i))

  def spec2(d0):
    return pl.BlockSpec((d0, E), lambda i: (0, i))

  kern = functools.partial(_kernel, K=K, nlim=nlim, iterations=iterations)
  return pl.pallas_call(
      kern,
      grid=grid,
      in_specs=[spec3(nv, nI), spec3(nv, nI), spec3(nE, nI),
                spec3(nE, nE), spec2(nI), spec2(nI),
                spec2(nI), spec2(nI), spec2(K), spec2(K), spec2(K),
                spec2(lim_act.shape[0])],
      out_specs=spec2(nI),
      out_shape=jax.ShapeDtypeStruct((nI, B), jnp.float32),
      interpret=interpret,
  )(Jt, Xt, AIEt, EEinv, R, b, precond, f0, mu_t, mu_tor, con_act, lim_act)


# ---------------------------------------------------------------------------
# custom_vmap entry point (row-major per-env operands)
# ---------------------------------------------------------------------------


def make_iterator(K: int, nlim: int, nE: int, iterations: int):
  """Build f = it(J_I, X_I, A_IE, EEinv, R, b, precond, f0, mu_t, mu_tor,
  con_act, lim_act) with per-env shapes J_I [nI_log, nv], X_I [nv, nI_log],
  A_IE [nI_log, nE], EEinv [nE, nE], vectors [nI_log].

  Rows are padded to a multiple of 8 internally; the returned forces are
  sliced back to nI_log.  When the call is vmapped over a batch divisible
  by 8 the whole iteration runs as ONE pallas kernel per substep (env
  block size picked by _env_block to fit VMEM).
  """
  nI_log = 4 * K + 2 * nlim
  nI = _round8(nI_log)
  pad = nI - nI_log
  nlim_pad = _round8(max(2 * nlim, 8))

  def _prep(J_I, X_I, A_IE, EEinv, R, b, precond, f0, mu_t, mu_tor,
            con_act, lim_act, batched: bool):
    """Transpose/pad per-env (or batched) operands into kernel layout."""
    if A_IE.shape[-1] == 0:  # no weld rows: zero correction term
      A_IE = jnp.zeros(A_IE.shape[:-1] + (1,))
      EEinv = jnp.zeros(EEinv.shape[:-2] + (1, 1))
    bd = (lambda a: jnp.moveaxis(a, 0, -1)) if batched else \
        (lambda a: a[..., None])
    Jt = jnp.swapaxes(bd(J_I), 0, 1)                       # [nv, nI_log, B]
    Jt = jnp.pad(Jt, ((0, 0), (0, pad), (0, 0)))
    Xt = jnp.pad(bd(X_I), ((0, 0), (0, pad), (0, 0)))
    AIEt = jnp.pad(jnp.swapaxes(bd(A_IE), 0, 1), ((0, 0), (0, pad), (0, 0)))
    EEinvt = bd(EEinv)
    vec = lambda a: jnp.pad(bd(a), ((0, pad), (0, 0)))
    la = bd(lim_act.astype(jnp.float32)) if nlim else \
        jnp.zeros((0, bd(R).shape[-1]))
    la = jnp.pad(la, ((0, nlim_pad - 2 * nlim), (0, 0)))
    return (Jt, Xt, AIEt, EEinvt, vec(R), vec(b), vec(precond), vec(f0),
            bd(mu_t), bd(mu_tor), bd(con_act.astype(jnp.float32)), la)

  @jax.custom_batching.custom_vmap
  def it(J_I, X_I, A_IE, EEinv, R, b, precond, f0, mu_t, mu_tor,
         con_act, lim_act):
    ops = _prep(J_I, X_I, A_IE, EEinv, R, b, precond, f0, mu_t, mu_tor,
                con_act, lim_act, batched=False)
    f = _psd_loop(*ops, K, nlim, iterations)
    return f[:nI_log, 0]

  @it.def_vmap
  def _batched(axis_size, in_batched, J_I, X_I, A_IE, EEinv, R, b, precond,
               f0, mu_t, mu_tor, con_act, lim_act):
    assert all(in_batched), 'all solver operands must be batched together'
    ops = _prep(J_I, X_I, A_IE, EEinv, R, b, precond, f0, mu_t, mu_tor,
                con_act, lim_act, batched=True)
    on_tpu = jax.default_backend() == 'tpu'
    if axis_size % 8 == 0:
      f = _run_pallas(*ops, K, nlim, iterations, interpret=not on_tpu)
    else:
      f = _psd_loop(*ops, K, nlim, iterations)
    return jnp.moveaxis(f[:nI_log], -1, 0), True

  return it
