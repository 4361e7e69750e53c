"""Train state and optimizer construction."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from poi_tpu.utils.config import TrainConfig


class TrainState(NamedTuple):
    step: jax.Array  # scalar int32
    params: Any
    opt_state: Any
    rng: jax.Array  # PRNG key threaded through sampled losses


def lr_schedule(cfg: TrainConfig):
    """The LR schedule as a callable(step) — also used for logging."""
    if cfg.lr_schedule == "cosine":
        # Honor warmup_steps as configured (optax accepts 0); an explicit
        # warmup longer than the run is a config error. But when the value is
        # the untouched dataclass default, a short probe run (num_steps < 200)
        # never chose it — clamp instead of raising (ADVICE r4).
        warmup = cfg.warmup_steps
        if warmup > cfg.num_steps // 2:
            if warmup == TrainConfig.warmup_steps:
                warmup = cfg.num_steps // 10
                # Visible, because the default value is indistinguishable
                # from an explicit --set train.warmup_steps=100: anyone who
                # meant the long warmup sees what actually ran.
                import logging

                logging.getLogger(__name__).warning(
                    "warmup_steps=%d (the default) exceeds half of "
                    "num_steps=%d; clamping warmup to %d",
                    cfg.warmup_steps, cfg.num_steps, warmup,
                )
            else:
                raise ValueError(
                    f"train.warmup_steps={cfg.warmup_steps} exceeds half the "
                    f"run (num_steps={cfg.num_steps}); cosine decay would never "
                    "meaningfully start"
                )
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=cfg.num_steps,
            end_value=cfg.lr_min_frac * cfg.learning_rate,
        )
    if cfg.lr_schedule != "constant":
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.warmup_steps > 0:
        return optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
    return lambda step: jnp.asarray(cfg.learning_rate, jnp.float32)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Warmup → constant LR with global-norm clipping.

    The reference family trains with SGD/Adagrad via theano updates
    (SURVEY.md §2.1 R9); adam is the default here, with sgd/adagrad available
    for parity experiments.
    """
    lr = lr_schedule(cfg)
    if cfg.optimizer == "adam":
        opt = optax.adamw(lr, weight_decay=cfg.weight_decay) if cfg.weight_decay else optax.adam(lr)
    elif cfg.optimizer == "adagrad":
        opt = optax.adagrad(lr)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(opt)
    return optax.chain(*chain)


def init_state(rng: jax.Array, params: Any, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        rng=rng,
    )
