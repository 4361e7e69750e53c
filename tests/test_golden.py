"""Golden-metric regression (SURVEY.md §4 Integration tier): the smoke config
trained 400 steps with fixed seeds must reproduce the recorded loss and
ranking metrics. Catches silent numerics regressions that shape/equivalence
tests can't (e.g. a wrong-but-finite gate ordering).

Runs in a FRESH subprocess on ONE device: under the shared 8-fake-device
mesh this test trains 8-way data-parallel, and its cross-device all-reduce
rendezvous (8 threads) reproducibly hit XLA's 40 s termination timeout when
two xdist workers plus subprocess tests compete for this box's 2 cores —
`F rendezvous.cc: Expected 8 threads ... only 6 arrived` → native abort.
Single-device removes the collectives entirely (DP ≡ single-device is a
separately tested property; the golden tolerances absorb the reassociation
drift) and the subprocess keeps it hermetic.

Regenerate tests/golden_metrics.json deliberately when making an intentional
numerics change (see the snippet in the git history of this file).
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_metrics.json")

_RUNNER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Replace only the device-count flag a pytest parent leaks via its own
    # XLA_FLAGS (this run must be single-device — no collectives); any other
    # inherited XLA flags are preserved.
    kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(kept + ["--xla_force_host_platform_device_count=1"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)

    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.eval.evaluate import evaluate
    from poi_tpu.train.loop import train

    cfg = get_config("smoke").with_overrides(
        {"train.num_steps": "400", "train.log_every": "100"}
    )
    ds = load_dataset(cfg.data)
    trainer, state, history = train(cfg, ds)
    m = evaluate(trainer.model, state.params, ds, cfg)
    print("GOLDEN " + json.dumps({"final_loss": history[-1]["loss"], **m}))
    """
)


@pytest.mark.slow
def test_golden_metrics_reproduce():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = next(l for l in r.stdout.splitlines() if l.startswith("GOLDEN "))
    got = json.loads(line[len("GOLDEN "):])

    assert abs(got["final_loss"] - golden["final_loss"]) < 0.02 * abs(golden["final_loss"]), (
        got, golden)
    assert abs(got["recall@10"] - golden["recall@10"]) < 0.03, (got, golden)
    assert abs(got["ndcg@10"] - golden["ndcg@10"]) < 0.03, (got, golden)
