"""Orbax checkpointing: sharded save/restore of the full train state
(SURVEY.md §5 "Checkpoint/resume").

The reference's persistence story is at most pickled shared variables; here
every checkpoint carries params + optimizer state + step + PRNG key (saved
sharded — each host writes its own shards) plus the loader position and the
serialized config, so a preempted run resumes exactly: same data order, same
sampling keys, same optimizer moments.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from poi_tpu.train.state import TrainState

log = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._async_save = async_save
        self._sel_mgr: ocp.CheckpointManager | None = None

    # ------------------------------------------------------------------ save
    def save(self, step: int, state: TrainState, loader_state: dict | None = None, config_json: str | None = None) -> None:
        extra = {"loader": loader_state, "config": config_json}
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_serializable(state)),
                extra=ocp.args.JsonSave(extra),
            ),
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        if self._sel_mgr is not None:
            self._sel_mgr.wait_until_finished()

    def delete(self, step: int) -> None:
        """Remove one step."""
        self._mgr.delete(step)

    # ------------------------------------------------- selected (best-on-val)
    # Best-on-val-selected params live in their OWN manager under
    # <directory>/selected, keyed by the step they were trained to. The main
    # step sequence always carries the true end-of-run state (consistent
    # params/opt_state/step), so resuming with a larger train.num_steps is
    # sound; eval/recommend prefer the selected params when present
    # (ADVICE r4: overwriting the final step with best-step params left the
    # real end-of-run params unrecoverable and resumed-from-mismatched pairs).
    def _selected_mgr(self) -> ocp.CheckpointManager:
        if self._sel_mgr is None:
            self._sel_mgr = ocp.CheckpointManager(
                os.path.join(self.directory, "selected"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    # Honor the manager's sync/async choice: a synchronous
                    # manager must not leave an async-selected-write window
                    # where the final step exists but the selection does not.
                    enable_async_checkpointing=self._async_save,
                ),
            )
        return self._sel_mgr

    def save_selected(
        self, step: int, params: Any, metric: str | None = None, score: float | None = None
    ) -> None:
        """Persist the best-on-val params under their own step number, with
        the selection metric/score so a resumed run can seed its tracker and
        never overwrite a better previous selection."""
        self._selected_mgr().save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                extra=ocp.args.JsonSave({"metric": metric, "score": score}),
            ),
        )

    def selected_step(self) -> int | None:
        if not os.path.isdir(os.path.join(self.directory, "selected")):
            return None
        return self._selected_mgr().latest_step()

    def selected_info(self) -> dict | None:
        """{'step', 'metric', 'score'} of the persisted selection, or None."""
        step = self.selected_step()
        if step is None:
            return None
        try:
            restored = self._selected_mgr().restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
            )
            extra = restored.get("extra") or {}
        except Exception:  # pre-r5 selected checkpoints carry no extra item
            extra = {}
        return {"step": step, **extra}

    def restore_selected(self, abstract_params: Any) -> Any:
        step = self.selected_step()
        if step is None:
            raise FileNotFoundError(f"no selected checkpoint under {self.directory}")
        restored = self._selected_mgr().restore(
            step, args=ocp.args.Composite(params=ocp.args.StandardRestore(abstract_params))
        )
        return restored["params"]

    # --------------------------------------------------------------- restore
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, abstract_state: TrainState, step: int | None = None) -> tuple[TrainState, dict]:
        """Restore into the sharding/layout of ``abstract_state`` (use
        jax.eval_shape + shardings so large tables restore born-sharded)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(_serializable(abstract_state)),
                extra=ocp.args.JsonRestore(),
            ),
        )
        d = dict(restored["state"])
        d["rng"] = jax.random.wrap_key_data(d["rng"])
        state = TrainState(**d)
        extra = restored.get("extra") or {}
        return state, (extra.get("loader") or {})

    def saved_config(self, step: int | None = None) -> str | None:
        """The config JSON persisted with a checkpoint (None if absent)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
            )
        except Exception:
            return None
        return (restored.get("extra") or {}).get("config")

    def close(self) -> None:
        self._mgr.close()
        if self._sel_mgr is not None:
            self._sel_mgr.close()


def warn_config_mismatch(saved_json: str | None, cfg, sections=("model", "data", "loss")) -> list[str]:
    """Compare semantics-bearing config sections against a checkpoint's saved
    config and log what differs. Same-shaped params under a different config
    (e.g. another attn_window or feature-bucketing) restore WITHOUT error and
    silently evaluate wrong — the one failure mode shape checking can't catch.
    Returns the list of differing dotted keys (for tests)."""
    if not saved_json:
        return []
    try:
        import json as _json

        saved = _json.loads(saved_json)
    except Exception:
        return []
    live = _json.loads(cfg.to_json())
    diffs = []
    for sec in sections:
        a, b = saved.get(sec, {}), live.get(sec, {})
        for k in sorted(set(a) | set(b)):
            if a.get(k) != b.get(k):
                diffs.append(f"{sec}.{k}: checkpoint={a.get(k)!r} vs run={b.get(k)!r}")
    if diffs:
        log.warning(
            "config differs from the one this checkpoint was trained with "
            "(same-shaped params restore silently; results may be wrong):\n  %s",
            "\n  ".join(diffs),
        )
    return diffs


def _serializable(state: TrainState) -> dict:
    """TrainState → plain dict with the typed PRNG key flattened to uint32
    key data (typed key dtypes aren't serializable)."""
    d = state._asdict()
    rng = d["rng"]
    if jax.dtypes.issubdtype(getattr(rng, "dtype", None), jax.dtypes.prng_key):
        if isinstance(rng, jax.ShapeDtypeStruct):
            d["rng"] = jax.ShapeDtypeStruct(rng.shape + (2,), np.uint32)
        else:
            d["rng"] = jax.random.key_data(rng)
    return d


def abstract_like(state: TrainState, shardings=None) -> TrainState:
    """ShapeDtypeStruct pytree (optionally with shardings) for restore."""
    def absify(x, s=None):
        if hasattr(x, "shape"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
        return x

    if shardings is None:
        return jax.tree.map(absify, state)
    return jax.tree.map(absify, state, shardings)
