"""Training objectives (reference R8 — SURVEY.md §2.1).

Three objectives, matching the reference capability surface:

- ``ce``              dense full-catalog softmax cross-entropy (configs #1, #3)
- ``bpr``             pairwise BPR with sampled negatives (config #2)
- ``sampled_softmax`` shared-negative sampled softmax (configs #4, #5)

These are the single-device/dense implementations; the vocab-sharded variants
(log-sum-exp with cross-shard psum — SURVEY.md §2.2 T10) live in
``poi_tpu.ops.sharded_loss`` and are property-tested for equivalence against
these.

All losses take ``q`` [B, T, D] query vectors, the output table ``table``
[V, D] + ``bias`` [V], and reduce with the validity ``mask`` [B, T]; logits
are computed in bf16 inputs with fp32 accumulation (MXU-native) and
softmaxed in fp32.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from poi_tpu.utils.config import LossConfig


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def draw_bpr_negatives(rng: jax.Array, B: int, T: int, num_negatives: int, num_pois: int) -> jax.Array:
    """The BPR negative draw, shared by every loss implementation AND the
    sparse table optimizer's touched-row computation (train/sparse_opt.py):
    both must see the identical id set, so the draw lives in one place."""
    return jax.random.randint(rng, (B, T, num_negatives), 0, num_pois)


def draw_sampled_negatives(rng: jax.Array, num_sampled: int, num_pois: int) -> jax.Array:
    """The shared sampled-softmax negative pool draw (see draw_bpr_negatives)."""
    return jax.random.randint(rng, (num_sampled,), 0, num_pois)


def full_logits(q: jax.Array, table: jax.Array, bias: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """[.., D] x [V, D]^T → [.., V] in fp32 (bf16 operands, fp32 accumulate)."""
    return (
        jnp.dot(q.astype(dtype), table.astype(dtype).T, preferred_element_type=jnp.float32)
        + bias
    )


def ce_loss(
    q: jax.Array,
    table: jax.Array,
    bias: jax.Array,
    targets: jax.Array,
    mask: jax.Array,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Dense full-catalog softmax CE; numerically stable log-sum-exp in fp32."""
    logits = full_logits(q, table, bias)  # [B, T, V]
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = lse - tgt_logit
    if label_smoothing > 0.0:
        v = logits.shape[-1]
        mean_logit = jnp.mean(logits, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * (lse - mean_logit) * (v / (v - 1.0))
    return _masked_mean(nll, mask)


def bpr_loss(
    q: jax.Array,
    table: jax.Array,
    bias: jax.Array,
    targets: jax.Array,
    mask: jax.Array,
    rng: jax.Array,
    num_negatives: int,
    num_pois: int,
) -> jax.Array:
    """Bayesian Personalized Ranking: -log sigmoid(s_pos - s_neg) over sampled
    negatives (reference R5 pairing — BASELINE.json:8). Negatives are drawn
    uniformly; collisions with the positive are masked out of the mean."""
    B, T = targets.shape
    neg = draw_bpr_negatives(rng, B, T, num_negatives, num_pois)
    e_pos = jnp.take(table, targets, axis=0)  # [B, T, D]
    e_neg = jnp.take(table, neg, axis=0)  # [B, T, N, D]
    s_pos = jnp.einsum("btd,btd->bt", q, e_pos, preferred_element_type=jnp.float32) + bias[targets]
    s_neg = jnp.einsum("btd,btnd->btn", q, e_neg, preferred_element_type=jnp.float32) + bias[neg]
    diff = s_pos[..., None] - s_neg  # [B, T, N]
    pair_ok = (neg != targets[..., None]) & mask[..., None].astype(bool)
    losses = -jax.nn.log_sigmoid(diff)
    return _masked_mean(losses, pair_ok)


def sampled_softmax_loss(
    q: jax.Array,
    table: jax.Array,
    bias: jax.Array,
    targets: jax.Array,
    mask: jax.Array,
    rng: jax.Array,
    num_sampled: int,
    num_pois: int,
) -> jax.Array:
    """Sampled softmax with a shared negative pool per batch (reference R7
    objective — BASELINE.json:10).

    Negatives are uniform over the catalog; the standard logQ correction
    (subtract log expected-count) is applied to negative logits so the
    sampled objective is a consistent estimator of full softmax CE.
    Accidental hits (a negative equal to the row's positive) are masked.
    """
    neg = draw_sampled_negatives(rng, num_sampled, num_pois)  # shared pool
    e_neg = jnp.take(table, neg, axis=0)  # [S, D]
    e_pos = jnp.take(table, targets, axis=0)  # [B, T, D]
    s_pos = jnp.einsum("btd,btd->bt", q, e_pos, preferred_element_type=jnp.float32) + bias[targets]
    nll = sampled_nll_xla(q, e_neg, bias[neg], s_pos, targets, neg, num_sampled, num_pois)
    return _masked_mean(nll, mask)


def sampled_nll_xla(
    q: jax.Array,  # [B, T, D]
    e_neg: jax.Array,  # [S, D]
    b_neg: jax.Array,  # [S] raw negative biases (logQ applied here)
    s_pos: jax.Array,  # [B, T]
    targets: jax.Array,  # [B, T]
    neg: jax.Array,  # [S]
    num_sampled: int,
    num_pois: int,
) -> jax.Array:
    """[B, T] per-position sampled-softmax NLL from pre-gathered rows — the
    XLA counterpart of ``ops.fused_sampled.sampled_nll_rows`` and the shared
    core of ``sampled_softmax_loss`` and the rows-gradient train step
    (train/loop.py sparse mode).

    logQ correction: uniform sampling w/ replacement, E[count_j] = S/V.
    Accidental hits (negative == row's positive) are masked in the same
    fused elementwise pass. The combined log-sum-exp is computed as
    logaddexp(LSE(s_neg), s_pos) — identical to LSE([s_pos | s_neg]) but
    without materializing the [B, T, 1+S] concatenation (134 MB at config
    #4's B=256: the concat copy and its backward were pure HBM traffic).
    """
    s_neg = (
        jnp.einsum(
            "btd,sd->bts",
            q.astype(jnp.bfloat16),
            e_neg.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + b_neg
    )
    hit = neg[None, None, :] == targets[..., None]
    s_neg = jnp.where(hit, -1e30, s_neg - jnp.log(num_sampled / num_pois))
    return jnp.logaddexp(jax.nn.logsumexp(s_neg, axis=-1), s_pos) - s_pos


# Catalogs below this size don't benefit from chunking — dense CE is fine.
_FUSED_CE_MIN_VOCAB = 8192


def build_loss_fn(cfg: LossConfig, num_pois: int, embed_dim: int | None = None) -> Callable:
    """Returns loss(q, table, bias, targets, mask, rng) -> scalar.

    Large-catalog CE dispatches to the fused (never-materialize-logits)
    implementation: the Pallas kernel on TPU (ops/fused_ce.py — measured
    2.7x over dense at bench scale), the XLA-chunked custom-VJP elsewhere.
    """
    if cfg.kind == "ce":
        if (
            cfg.impl != "xla"
            and num_pois >= _FUSED_CE_MIN_VOCAB
            and cfg.label_smoothing == 0.0
        ):
            import jax as _jax

            if _jax.default_backend() != "cpu":
                from poi_tpu.ops.fused_ce import fused_ce_loss_pallas

                return lambda q, t, b, y, m, rng: fused_ce_loss_pallas(q, t, b, y, m)
            from poi_tpu.ops.fused_ce import fused_ce_loss

            return lambda q, t, b, y, m, rng: fused_ce_loss(q, t, b, y, m)
        return lambda q, t, b, y, m, rng: ce_loss(q, t, b, y, m, cfg.label_smoothing)
    if cfg.kind == "bpr":
        return lambda q, t, b, y, m, rng: bpr_loss(q, t, b, y, m, rng, cfg.num_negatives, num_pois)
    if cfg.kind == "sampled_softmax":
        import jax as _jax

        # Fused path needs lane-aligned queries (D % 128); S >= 128 keeps the
        # kernel grid non-degenerate. Everything else stays on the XLA path.
        shapes_ok = cfg.num_sampled >= 128 and (embed_dim is None or embed_dim % 128 == 0)
        if cfg.impl != "xla" and _jax.default_backend() != "cpu" and (
            shapes_ok or cfg.impl == "fused"
        ):
            from poi_tpu.ops.fused_sampled import fused_sampled_softmax_loss

            return lambda q, t, b, y, m, rng: fused_sampled_softmax_loss(
                q, t, b, y, m, rng, cfg.num_sampled, num_pois
            )
        return lambda q, t, b, y, m, rng: sampled_softmax_loss(q, t, b, y, m, rng, cfg.num_sampled, num_pois)
    raise ValueError(f"unknown loss {cfg.kind!r}")
