"""Dev-only sweep of the fused-CE backward kernel tile shapes."""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from poi_tpu.ops import fused_ce as fc  # noqa: E402

N, V, D = 16384, 44170, 128


def timeit(call, args, n_hi=40, n_lo=5, trials=4):
    @functools.partial(jax.jit, static_argnums=1)
    def rep(args, n):
        q, rest = args[0], args[1:]

        def body(i, acc):
            outs = call(q + (acc * 1e-30).astype(q.dtype), *rest)
            return acc + outs[0][0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(rep(args, n_lo))
    float(rep(args, n_hi))
    lo = hi = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter(); float(rep(args, n_lo)); lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(rep(args, n_hi)); hi = min(hi, time.perf_counter() - t0)
    return (hi - lo) / (n_hi - n_lo)


def main():
    q = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    table = jax.random.normal(jax.random.key(1), (V, D), jnp.float32) * 0.05
    bias = jnp.zeros((V,))
    lse = jnp.full((N,), 5.0, jnp.float32)
    g = jnp.ones((N,), jnp.float32) / N
    gf = 3 * 2 * N * V * D / 1e9  # 3 catalog matmuls

    results = []
    for cv in [512, 1024, 2048]:
        for rb in [256, 512, 1024]:
            tc, bc, _, _ = fc._chunk(table, bias, cv)
            t_flat = tc.reshape(-1, D).astype(jnp.bfloat16)
            vp = t_flat.shape[0]
            bias_p = bc.reshape(1, vp)
            qp = q.astype(jnp.bfloat16)
            lse128 = jnp.broadcast_to(lse[:, None], (N, 1)) * jnp.ones((1, 128), jnp.float32)
            g128 = jnp.broadcast_to(g[:, None], (N, 1)) * jnp.ones((1, 128), jnp.float32)

            def call(qp, t_flat, bias_p, lse128, g128, cv=cv, rb=rb):
                return fc._bwd_slab(qp, t_flat, bias_p, lse128, g128, cv, rb, False)

            try:
                dt = timeit(call, (qp, t_flat, bias_p, lse128, g128))
            except Exception as e:
                print(f"cv={cv} rb={rb}: FAIL {type(e).__name__}", flush=True)
                continue
            tf = gf / dt / 1000
            results.append((dt, cv, rb))
            print(f"cv={cv:5d} rb={rb:5d}: {dt*1e3:7.3f} ms  {tf:6.1f} TF/s", flush=True)
    results.sort()
    print("\nbest:", results[0])


if __name__ == "__main__":
    main()
