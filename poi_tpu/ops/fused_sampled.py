"""Memory-fused sampled-softmax loss (perf path for configs #4/#5 —
reference R7's objective, SURVEY.md §2.1 R8 / §2.2 T10).

The XLA path (train/losses.sampled_softmax_loss) materializes the [B·T, S]
negative-logit matrix in HBM several times across forward + backward — at
config #4 scale (B·T=32k, S=1024) that is ~134 MB per pass and the loss
region measures ~24 TF/s. These kernels keep every logit tile in VMEM
(structure adapted from ops/fused_ce.py, which pioneered the layout here):

- forward: grid (rows, S-chunks), per-lane online LSE carry in scratch,
  accidental-hit masking (negative id == row's target) fused into the tile;
- backward: ONE kernel per row slab recomputes each tile flash-style, forms
  gp = softmax·ḡ once, and feeds all three grads: dq accumulates in the
  VMEM-resident output block, dE_neg/db_neg accumulate in scratch.

The positive-column term never enters the kernels: with a shared negative
pool, LSE([s_pos | s_neg]) == logaddexp(LSE(s_neg), s_pos), so s_pos (a
cheap per-row einsum) and its gradient are handled outside in plain JAX, and
the custom VJP boundary sits at (q, e_neg, b_neg, s_pos) — table/bias
gather-scatter transposes are left to JAX AD.

Property-tested for value + all gradients against the XLA implementation
with the same PRNG draw (tests/test_fused_sampled.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30

# VMEM budget for the backward's slab-resident dq block (bytes of fp32).
# 2 MB keeps the full working set (dq slab + de_out block + acc_e scratch +
# z tile + operands) inside the 16 MB scoped-VMEM limit at D=512/S=4096
# (config #5's shape compiled 16.02 MB with a 4 MB slab — 24 KB over).
_BWD_SLAB_BYTES = 2 << 20


def _pad_rows(a, rb, fill=0):
    n = a.shape[0]
    pad = -(-n // rb) * rb - n
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1), constant_values=fill)
    return a


def _pad_pool(e_neg, b_neg, neg_ids, chunk_s):
    s, d = e_neg.shape
    sp = -(-s // chunk_s) * chunk_s
    if sp != s:
        e_neg = jnp.pad(e_neg, ((0, sp - s), (0, 0)))
        b_neg = jnp.pad(b_neg, (0, sp - s), constant_values=NEG)
        neg_ids = jnp.pad(neg_ids, (0, sp - s), constant_values=-1)  # never a hit
    return e_neg, b_neg, neg_ids, sp


def _tile_logits(q_ref, e_ref, b_ref, ids_ref, tgt_ref):
    """[Rb, Cs] masked negative logits for one (row-block, S-chunk) tile."""
    z = (
        jax.lax.dot_general(
            q_ref[:], e_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[0, :][None, :]
    )
    hit = ids_ref[0, :][None, :] == tgt_ref[:, :1]
    return jnp.where(hit, NEG, z)


def _lse_kernel(q_ref, e_ref, b_ref, ids_ref, tgt_ref, lse_out, m_scr, l_scr):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)

    z = _tile_logits(q_ref, e_ref, b_ref, ids_ref, tgt_ref)  # [Rb, Cs]
    groups = z.shape[1] // 128
    m_old = m_scr[:]
    m_new = m_old
    for k in range(groups):
        m_new = jnp.maximum(m_new, z[:, k * 128:(k + 1) * 128])
    l_new = l_scr[:] * jnp.exp(m_old - m_new)
    for k in range(groups):
        l_new = l_new + jnp.exp(z[:, k * 128:(k + 1) * 128] - m_new)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(s == pl.num_programs(1) - 1)
    def _():
        m_fin = jnp.max(m_new, axis=-1, keepdims=True)
        l_fin = jnp.sum(l_new * jnp.exp(m_new - m_fin), axis=-1, keepdims=True)
        lse_out[:] = jnp.broadcast_to(jnp.log(l_fin) + m_fin, lse_out.shape)


def _bwd_kernel(
    q_ref, e_ref, b_ref, ids_ref, tgt_ref, lse_ref, g_ref,
    dq_out, de_out, db_out, acc_e, acc_b,
):
    s, r = pl.program_id(0), pl.program_id(1)

    @pl.when((s == 0) & (r == 0))
    def _():
        dq_out[:] = jnp.zeros_like(dq_out)

    @pl.when(r == 0)
    def _():
        acc_e[:] = jnp.zeros_like(acc_e)
        acc_b[:] = jnp.zeros_like(acc_b)

    z = _tile_logits(q_ref, e_ref, b_ref, ids_ref, tgt_ref)
    # lse_ref carries the TOTAL (incl. positive column) log-sum-exp, so gp is
    # this tile's share of the full softmax; hit columns exp(NEG - lse) -> 0.
    gp = jnp.exp(z - lse_ref[:, :1]) * g_ref[:, :1]  # [Rb, Cs]
    gpb = gp.astype(jnp.bfloat16)
    rb = q_ref.shape[0]
    row0 = r * rb
    dq_out[pl.ds(row0, rb), :] = dq_out[pl.ds(row0, rb), :] + jnp.dot(
        gpb, e_ref[:], preferred_element_type=jnp.float32
    )
    acc_e[:] = acc_e[:] + jax.lax.dot_general(
        gpb, q_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_b[:] = acc_b[:] + jnp.sum(gp, axis=0, keepdims=True)

    @pl.when(r == pl.num_programs(1) - 1)
    def _():
        de_out[:] = acc_e[:]
        db_out[:] = acc_b[:]


def _tiles(s_pool: int, d: int, n_rows: int):
    """(chunk_s, row_block) sized to VMEM: the chunk's fp32 accumulator
    (cs·d·4B) stays ≲ 2 MB — twice over in the backward as de_out block +
    acc_e scratch — and the z tile rb·cs·4B ≲ 4 MB; rb never exceeds the
    padded row count (small batches keep a single small block)."""
    chunk_s = min(
        -(-s_pool // 128) * 128,
        max(512, (2 << 20) // (4 * d) // 128 * 128),
        2048,
    )
    row_block = max(256, min(2048, (4 << 20) // (4 * chunk_s) // 256 * 256))
    return chunk_s, min(row_block, -(-n_rows // 256) * 256)


def _broadcast128(a, dtype):
    return jnp.broadcast_to(a.reshape(-1, 1).astype(dtype), (a.shape[0], 1)) * jnp.ones(
        (1, 128), dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sampled_nll_rows(q, e_neg, b_neg, s_pos, tgt, interpret=False):
    """Per-row sampled-softmax NLL.

    q: [N, D] queries; e_neg: [S, D] shared negative pool embeddings;
    b_neg: [S] negative biases (logQ correction already applied);
    s_pos: [N] positive logits; tgt: ([N] int32 targets, [S] int32 pool ids)
    as a tuple — ids enter hit masking only, they are not differentiated.
    Returns [N] fp32 nll = logaddexp(LSE(masked s_neg), s_pos) - s_pos.
    """
    nll, _ = _forward(q, e_neg, b_neg, s_pos, tgt, interpret)
    return nll


def _forward(q, e_neg, b_neg, s_pos, tgt, interpret):
    targets, neg_ids = tgt
    n_orig, d = q.shape
    chunk_s, rb = _tiles(e_neg.shape[0], d, n_orig)
    e_p, b_p, ids_p, sp = _pad_pool(
        e_neg.astype(jnp.bfloat16), b_neg, neg_ids.astype(jnp.int32), chunk_s
    )
    qp = _pad_rows(q.astype(jnp.bfloat16), rb)
    n = qp.shape[0]
    tgt128 = _broadcast128(_pad_rows(targets.astype(jnp.int32), rb, fill=-2), jnp.int32)
    grid = (n // rb, sp // chunk_s)
    lse = pl.pallas_call(
        _lse_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, d), lambda r, s: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_s, d), lambda r, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_s), lambda r, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_s), lambda r, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 128), lambda r, s: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 128), lambda r, s: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rb, 128), jnp.float32),
            pltpu.VMEM((rb, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qp, e_p, b_p.reshape(1, sp), ids_p.reshape(1, sp), tgt128)[:n_orig, 0]
    lse_tot = jnp.logaddexp(lse, s_pos)
    return lse_tot - s_pos, lse_tot


def _fwd(q, e_neg, b_neg, s_pos, tgt, interpret):
    nll, lse_tot = _forward(q, e_neg, b_neg, s_pos, tgt, interpret)
    return nll, (q, e_neg, b_neg, s_pos, tgt, lse_tot)


def _bwd(interpret, res, g):
    q, e_neg, b_neg, s_pos, tgt, lse_tot = res
    targets, neg_ids = tgt
    n_orig, d = q.shape
    s_pool = e_neg.shape[0]
    chunk_s, rb = _tiles(s_pool, d, n_orig)
    e_p, b_p, ids_p, sp = _pad_pool(
        e_neg.astype(jnp.bfloat16), b_neg, neg_ids.astype(jnp.int32), chunk_s
    )
    qp = _pad_rows(q.astype(jnp.bfloat16), rb)
    n = qp.shape[0]
    gf = g.astype(jnp.float32)
    tgt128 = _broadcast128(_pad_rows(targets.astype(jnp.int32), rb, fill=-2), jnp.int32)
    lse128 = _broadcast128(_pad_rows(lse_tot, rb), jnp.float32)
    g128 = _broadcast128(_pad_rows(gf, rb), jnp.float32)  # padded rows: g=0

    slab = max(rb, _BWD_SLAB_BYTES // (4 * d) // rb * rb)
    dq_parts, de, db = [], None, None
    for s0 in range(0, n, slab):
        size = min(slab, n - s0)
        grid = (sp // chunk_s, size // rb)
        dq_s, de_s, db_s = pl.pallas_call(
            _bwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rb, d), lambda s, r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_s, d), lambda s, r: (s, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk_s), lambda s, r: (0, s), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk_s), lambda s, r: (0, s), memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, 128), lambda s, r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, 128), lambda s, r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, 128), lambda s, r: (r, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((size, d), lambda s, r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_s, d), lambda s, r: (s, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk_s), lambda s, r: (0, s), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((size, d), jnp.float32),
                jax.ShapeDtypeStruct((sp, d), jnp.float32),
                jax.ShapeDtypeStruct((1, sp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((chunk_s, d), jnp.float32),
                pltpu.VMEM((1, chunk_s), jnp.float32),
            ],
            interpret=interpret,
        )(
            qp[s0:s0 + size], e_p, b_p.reshape(1, sp), ids_p.reshape(1, sp),
            tgt128[s0:s0 + size], lse128[s0:s0 + size], g128[s0:s0 + size],
        )
        dq_parts.append(dq_s)
        de = de_s if de is None else de + de_s
        db = db_s if db is None else db + db_s
    dq = (dq_parts[0] if len(dq_parts) == 1 else jnp.concatenate(dq_parts))[:n_orig]
    # d s_pos: the positive column's softmax weight minus the target one-hot.
    ds_pos = gf * (jnp.exp(s_pos - lse_tot) - 1.0)
    # Integer operands (targets, pool ids) take float0 cotangents.
    import numpy as _np

    f0 = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
    return dq, de[:s_pool], db[0, :s_pool], ds_pos, (f0(targets), f0(neg_ids))


sampled_nll_rows.defvjp(_fwd, _bwd)


def fused_sampled_softmax_loss(
    q, table, bias, targets, mask, rng, num_sampled: int, num_pois: int,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ``train.losses.sampled_softmax_loss`` (same PRNG draw, so
    identical negative pools), with the [B·T, S] logits fused into VMEM."""
    B, T = targets.shape
    d = q.shape[-1]
    from poi_tpu.train.losses import draw_sampled_negatives

    neg = draw_sampled_negatives(rng, num_sampled, num_pois)
    e_neg = jnp.take(table, neg, axis=0)
    b_neg = bias[neg] - jnp.log(num_sampled / num_pois)
    q2 = q.reshape(B * T, d)
    t1 = targets.reshape(-1)
    e_pos = jnp.take(table, t1, axis=0)
    s_pos = (
        jnp.einsum("nd,nd->n", q2, e_pos, preferred_element_type=jnp.float32)
        + bias[t1]
    )
    nll = sampled_nll_rows(q2, e_neg, b_neg, s_pos, (t1, neg), interpret)
    m = mask.reshape(-1).astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
