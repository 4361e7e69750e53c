"""Fused recurrent-cell kernels vs lax.scan at config #4/#5 widths.

VERDICT r1 item 8: the fused GRU/LSTM/RNN Pallas kernels were only measured
at the bench width (H=128); this sweeps H in {128, 256, 512} at B=256, T=64
(fwd and fwd+bwd), slope-of-mins timing (see BASELINE.md notes). Rows go
into BASELINE.md.

    python scripts/bench_cells.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

T = 64


def timed_chain(fn, args, n, trials=4):
    """Best-of wall time of n in-graph chained calls; the accumulator feeds
    back so XLA cannot hoist the body, and the final float() is the fence."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(args, n):
        def body(i, acc):
            out = fn(*jax.tree.map(lambda x: x + (acc * 1e-30).astype(x.dtype), args))
            return jnp.sum(out)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(args, 2))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chain(args, n))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn, args, n_lo=100, n_hi=1100):
    """Per-call seconds via slope-of-mins. The differential window must be
    tens of ms: these cells run 0.02-2.5 ms/call and the tunnel's round-trip
    jitter is several ms, so short chains (n~10) produce garbage (measured:
    negative slopes). n is a static fori_loop trip count — compile time does
    not grow with it."""
    return (timed_chain(fn, args, n_hi) - timed_chain(fn, args, n_lo)) / (n_hi - n_lo)


def bench_cell(kind: str, H: int, B: int):
    from poi_tpu.ops import fused_gru, fused_lstm, fused_rnn

    rng = np.random.default_rng(0)
    if kind == "gru":
        gates, mod, scan_name = 3, fused_gru, "fused_gru_scan"
    elif kind == "lstm":
        gates, mod, scan_name = 4, fused_lstm, "fused_lstm_scan"
    else:
        gates, mod, scan_name = 1, fused_rnn, "fused_rnn_scan"
    xw = jnp.asarray(rng.normal(size=(B, T, gates * H)), jnp.float32)
    wh = jnp.asarray(0.1 * rng.normal(size=(H, gates * H)), jnp.float32)
    mask = jnp.ones((B, T, H), jnp.float32)
    fused = getattr(mod, scan_name)
    if kind == "gru":
        f_args, fused_fn = (xw, wh), lambda a, b: fused(a, b)
    else:
        f_args, fused_fn = (xw, mask, wh), lambda a, m, b: fused(a, m, b)

    # lax.scan oracle at the same shapes (hoisted input proj, minimal body).
    def scan_fn(*args):
        xw_, wh_ = args[0], args[-1]
        xw_tb = jnp.swapaxes(xw_, 0, 1)

        if kind == "gru":
            def step(h, xw_t):
                hw = jnp.dot(h.astype(jnp.bfloat16), wh_.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                z = jax.nn.sigmoid(xw_t[:, :H] + hw[:, :H])
                r = jax.nn.sigmoid(xw_t[:, H:2 * H] + hw[:, H:2 * H])
                n = jnp.tanh(xw_t[:, 2 * H:] + r * hw[:, 2 * H:])
                h = (1.0 - z) * h + z * n
                return h, h
            carry = jnp.zeros((B, H), jnp.float32)
            _, hs = jax.lax.scan(step, carry, xw_tb)
        elif kind == "lstm":
            def step(carry, xw_t):
                h, c = carry
                hw = jnp.dot(h.astype(jnp.bfloat16), wh_.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                g = xw_t + hw
                i = jax.nn.sigmoid(g[:, :H])
                f = jax.nn.sigmoid(g[:, H:2 * H] + 1.0)
                o = jax.nn.sigmoid(g[:, 2 * H:3 * H])
                u = jnp.tanh(g[:, 3 * H:])
                c = f * c + i * u
                h = o * jnp.tanh(c)
                return (h, c), h
            carry = (jnp.zeros((B, H), jnp.float32),) * 2
            _, hs = jax.lax.scan(step, carry, xw_tb)
        else:
            def step(h, xw_t):
                h = jnp.tanh(xw_t + jnp.dot(h.astype(jnp.bfloat16), wh_.astype(jnp.bfloat16),
                                            preferred_element_type=jnp.float32))
                return h, h
            carry = jnp.zeros((B, H), jnp.float32)
            _, hs = jax.lax.scan(step, carry, xw_tb)
        return jnp.swapaxes(hs, 0, 1)

    def loss_of(f):
        def g(*args):
            return jnp.sum(f(*args) ** 2)
        return jax.grad(g, argnums=tuple(range(len(f_args))))

    rows = {}
    rows["fwd_fused_ms"] = slope(fused_fn, f_args) * 1e3
    rows["fwd_scan_ms"] = slope(scan_fn, f_args) * 1e3
    rows["bwd_fused_ms"] = slope(lambda *a: loss_of(fused_fn)(*a)[0], f_args) * 1e3
    rows["bwd_scan_ms"] = slope(lambda *a: loss_of(scan_fn)(*a)[0], f_args) * 1e3
    return rows


def main() -> int:
    # (B, H) points per cell: the H sweep runs on the GRU (bench workload +
    # the attention tower's recurrent layer — configs #4/#5); LSTM/RNN get
    # their preset shapes (#2/#3: B=64 H=128) plus the bench batch. Each
    # point costs ~12 tunnel compiles, so the grid is the set of shapes a
    # preset can actually select, not the cross product.
    points = {
        "gru": [(256, 128), (256, 256), (256, 512), (64, 256), (512, 512)],
        "lstm": [(64, 128), (256, 128)],
        "rnn": [(64, 128), (256, 128)],
    }
    print(f"{'cell':>5} {'B':>4} {'H':>4} {'fwd fused':>10} {'fwd scan':>9} {'x':>5} "
          f"{'f+b fused':>10} {'f+b scan':>9} {'x':>5}   (ms, T=64)")
    for kind in ("gru", "lstm", "rnn"):
        for B, H in points[kind]:
            r = bench_cell(kind, H, B)
            print(
                f"{kind:>5} {B:>4} {H:>4} "
                f"{r['fwd_fused_ms']:>10.3f} {r['fwd_scan_ms']:>9.3f} "
                f"{r['fwd_scan_ms'] / r['fwd_fused_ms']:>5.2f} "
                f"{r['bwd_fused_ms']:>10.3f} {r['bwd_scan_ms']:>9.3f} "
                f"{r['bwd_scan_ms'] / r['bwd_fused_ms']:>5.2f}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
