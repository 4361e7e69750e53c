"""Lane-padding for the fused recurrence kernels (ops/fused_{gru,lstm,rnn}).

Mosaic tiles f32 as (8, 128), so the kernels require H % 128 == 0 — but
configs #1/#3 run 64-d towers (BASELINE.json:7,9). Padding each *gate block*
of the pre-projected inputs and each [H, H] block of the recurrent weights to
the next lane multiple keeps the kernels' math exact on the real lanes:

- padded input columns are zero and padded ``wh`` rows/columns are zero, so
  real-lane gate pre-activations are unchanged;
- padded hidden lanes start at h0 = 0 and stay exactly 0: every recurrence
  here maps (x_pad = 0, h_pad = 0) → h_pad' = 0 (GRU: n = tanh(0 + r·0) = 0
  so h' = (1-z)·0 + z·0; LSTM: g = 0 so c' = f·0 + i·0, h' = o·tanh(0);
  tanh-RNN: tanh(0 + 0) = 0), and zero ``wh`` columns mean padded lanes never
  feed real ones;
- gradients flow through jnp.pad/slice (plain scatter/gather), so the
  custom-VJP kernels never see the raggedness.

The cost is (Hp/H)² on the recurrent matmul — at H=64→128 that is 4x the
FLOPs, but the fused kernel is still ~2x faster than the H=64 ``lax.scan``
path because the serial chain is dispatch-bound, not FLOP-bound, at these
sizes (measured in BASELINE.md).
"""

from __future__ import annotations

import jax.numpy as jnp

LANES = 128


def padded_hidden(H: int) -> int:
    return -(-H // LANES) * LANES


def pad_gate_blocks(xw: jnp.ndarray, wh: jnp.ndarray, n_gates: int):
    """Pad [B, T, n_gates*H] gate-blocked inputs and [H, n_gates*H] recurrent
    weights to the lane-aligned hidden size. Returns (xw_p, wh_p, H)."""
    H = wh.shape[0]
    Hp = padded_hidden(H)
    if Hp == H:
        return xw, wh, H
    pad = Hp - H
    x_blocks = jnp.split(xw, n_gates, axis=-1)
    xw_p = jnp.concatenate(
        [jnp.pad(b, ((0, 0), (0, 0), (0, pad))) for b in x_blocks], axis=-1
    )
    w_blocks = jnp.split(wh, n_gates, axis=-1)
    wh_p = jnp.concatenate(
        [jnp.pad(w, ((0, pad), (0, pad))) for w in w_blocks], axis=-1
    )
    return xw_p, wh_p, H
