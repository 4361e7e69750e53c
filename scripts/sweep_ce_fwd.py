"""Dev-only sweep of the fused-CE forward kernel (the step's VPU-bound part).

Variants measured (slope-of-mins chained timing, device->host fence):
  base      — current per-lane online-LSE kernel, tile sweep
  exp2      — inputs pre-scaled by log2(e); exp -> exp2 saves one VPU
              multiply per element if Mosaic lowers exp as exp2(x*log2e)
  nomax     — UNSAFE (no online max): measures the headroom of removing the
              running-max loop entirely; numerics guard would be needed
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from poi_tpu.ops import fused_ce as fc  # noqa: E402

N, V, D = 16384, 44170, 128
LOG2E = 1.4426950408889634


def _lse_kernel_exp2(q_ref, t_ref, b_ref, lse_out, m_scr, l_scr):
    # Assumes q and bias are pre-scaled by log2(e); computes LSE in base-2.
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, fc.NEG)
        l_scr[:] = jnp.zeros_like(l_scr)

    logits = fc._logits_tile(q_ref, t_ref, b_ref)
    groups = logits.shape[1] // 128
    m_old = m_scr[:]
    m_new = m_old
    for k in range(groups):
        m_new = jnp.maximum(m_new, logits[:, k * 128:(k + 1) * 128])
    l_new = l_scr[:] * jnp.exp2(m_old - m_new)
    for k in range(groups):
        l_new = l_new + jnp.exp2(logits[:, k * 128:(k + 1) * 128] - m_new)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(v == pl.num_programs(1) - 1)
    def _():
        m_fin = jnp.max(m_new, axis=-1, keepdims=True)
        l_fin = jnp.sum(l_new * jnp.exp2(m_new - m_fin), axis=-1, keepdims=True)
        lse_out[:] = jnp.broadcast_to((jnp.log2(l_fin) + m_fin) / LOG2E, lse_out.shape)


def _lse_kernel_nomax(q_ref, t_ref, b_ref, lse_out, l_scr):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _():
        l_scr[:] = jnp.zeros_like(l_scr)

    logits = fc._logits_tile(q_ref, t_ref, b_ref)
    groups = logits.shape[1] // 128
    l_new = l_scr[:]
    for k in range(groups):
        l_new = l_new + jnp.exp(logits[:, k * 128:(k + 1) * 128])
    l_scr[:] = l_new

    @pl.when(v == pl.num_programs(1) - 1)
    def _():
        l_fin = jnp.sum(l_new, axis=-1, keepdims=True)
        lse_out[:] = jnp.broadcast_to(jnp.log(l_fin), lse_out.shape)


def build(kind, rb, cv):
    tc, bc, _, _ = fc._chunk(jnp.zeros((V, D)), jnp.zeros((V,)), cv)
    vp = tc.shape[0] * cv

    kern = {"base": fc._lse_kernel, "exp2": _lse_kernel_exp2}.get(kind)
    scratch = [pltpu.VMEM((rb, 128), jnp.float32), pltpu.VMEM((rb, 128), jnp.float32)]
    if kind == "nomax":
        kern = _lse_kernel_nomax
        scratch = [pltpu.VMEM((rb, 128), jnp.float32)]

    def call(q, t_flat, bias_p):
        if kind == "exp2":
            q = q * LOG2E
            bias_p = bias_p * LOG2E
        grid = (N // rb, vp // cv)
        lse = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rb, D), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cv, D), lambda r, v: (v, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cv), lambda r, v: (0, v), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rb, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            scratch_shapes=scratch,
        )(q.astype(jnp.bfloat16), t_flat, bias_p)
        return lse[:, 0]

    return call, vp


def timeit(call, q, t_flat, bias_p, n_hi=60, n_lo=10, trials=4):
    @functools.partial(jax.jit, static_argnums=3)
    def rep(q, t, b, n):
        def body(i, acc):
            out = call(q + (acc * 1e-30), t, b)
            return acc + out[0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(rep(q, t_flat, bias_p, n_lo))
    float(rep(q, t_flat, bias_p, n_hi))
    lo = hi = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter(); float(rep(q, t_flat, bias_p, n_lo)); lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(rep(q, t_flat, bias_p, n_hi)); hi = min(hi, time.perf_counter() - t0)
    return (hi - lo) / (n_hi - n_lo)


def main():
    key = jax.random.key(0)
    q = jax.random.normal(key, (N, D), jnp.float32)
    table = jax.random.normal(jax.random.key(1), (V, D), jnp.float32) * 0.05
    bias = jnp.zeros((V,))
    gf = 2 * N * V * D / 1e9

    results = []
    for kind in ["base", "exp2", "nomax"]:
        for rb in [512, 1024, 2048]:
            for cv in [512, 1024, 2048]:
                call, vp = build(kind, rb, cv)
                tc, bc, _, _ = fc._chunk(table, bias, cv)
                t_flat = tc.reshape(-1, D).astype(jnp.bfloat16)
                bias_p = bc.reshape(1, vp)
                try:
                    dt = timeit(call, q, t_flat, bias_p)
                except Exception as e:
                    print(f"{kind} rb={rb} cv={cv}: FAIL {type(e).__name__}", flush=True)
                    continue
                tf = gf / dt / 1000
                results.append((dt, kind, rb, cv))
                print(f"{kind:6s} rb={rb:5d} cv={cv:5d}: {dt*1e3:7.3f} ms  {tf:6.1f} TF/s", flush=True)
    results.sort()
    print("\nbest:", results[0])


if __name__ == "__main__":
    main()
