"""On-chip fused-cell vs scan-cell parity check at preset shapes.

The CPU test suite exercises the fused kernels in Pallas interpret mode; this
script runs the REAL Mosaic-compiled kernels on the TPU and compares forward
values and parameter/input gradients against the lax.scan cell at the exact
(B, T, H) shapes the named configs train with — because the 2k-step config-#2
replica showed scan r@10 0.2235 vs fused 0.1296 (same data, same seed), i.e.
a silent on-hardware numerical divergence.

    python scripts/check_cell_parity.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def check(kind: str, B: int, T: int, H: int, D: int | None = None) -> None:
    from poi_tpu.models.gru import gru_layer, init_gru_layer
    from poi_tpu.models.lstm import init_lstm_layer, lstm_layer

    D = D or H
    init, layer = {
        "gru": (init_gru_layer, gru_layer),
        "lstm": (init_lstm_layer, lstm_layer),
    }[kind]
    p = init(jax.random.key(0), D, H)
    x = jax.random.normal(jax.random.key(1), (B, T, D), jnp.float32) * 0.5
    lengths = jax.random.randint(jax.random.key(2), (B, 1), T // 2, T + 1)
    mask = jnp.cumsum(jnp.ones((B, T)), axis=1) <= lengths

    def run(impl):
        def f(p, x):
            h = layer(p, x, mask, jnp.bfloat16, cell_impl=impl)
            return jnp.sum(h * mask[:, :, None] * 0.1)

        val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(p, x)
        return jax.device_get((val, grads))

    v_s, g_s = run("scan")
    v_p, g_p = run("pallas")
    print(f"{kind} B={B} T={T} H={H}: fwd scan={v_s:.6f} pallas={v_p:.6f} "
          f"diff={abs(v_s - v_p):.2e}")
    gp_s, gx_s = g_s
    gp_p, gx_p = g_p
    for name in gp_s:
        a, b = np.asarray(gp_s[name]), np.asarray(gp_p[name])
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
        flag = "  <-- DIVERGES" if rel > 0.05 else ""
        print(f"    d{name}: max|Δ|={np.abs(a - b).max():.3e} rel={rel:.3e}{flag}")
    a, b = np.asarray(gx_s), np.asarray(gx_p)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    flag = "  <-- DIVERGES" if rel > 0.05 else ""
    print(f"    dx: max|Δ|={np.abs(a - b).max():.3e} rel={rel:.3e}{flag}")


def main() -> int:
    print(f"backend: {jax.default_backend()}")
    # Preset shapes: config #2 (lstm 64/64/128), config #4's GRU sublayer
    # (64/128/256), config #3 rnn (64/32/128), bench (gru 256/64/128).
    check("lstm", 64, 64, 128)
    check("gru", 64, 128, 256)
    check("gru", 256, 64, 128)
    return 0


if __name__ == "__main__":
    sys.exit(main())
