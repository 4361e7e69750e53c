"""True multi-process validation (SURVEY.md §2.2 T7): two JAX processes,
jax.distributed over a local coordinator, gloo CPU collectives, a global
(4 data x 2 model) mesh spanning both processes, per-host loader shards, and
the real Trainer/train() path — the same code that runs on a multi-host TPU
slice, minus the hardware."""

import json
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and jax.device_count() == 8

    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.train.loop import train

    cfg = get_config("smoke").with_overrides(
        {
            "mesh.model": "2",
            "mesh.embedding_mode": "psum",
            "train.num_steps": "5",
            "train.log_every": "1",
            "train.batch_size": "16",
        }
    )
    ds = load_dataset(cfg.data)
    trainer, state, history = train(cfg, ds)
    print("RESULT " + json.dumps({"pid": pid, "losses": [h["loss"] for h in history]}))
    """
)


@pytest.mark.slow
def test_two_process_training(tmp_path):
    port = "29741"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    results = {}
    outputs = {}
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        outputs[i] = out
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results[i] = json.loads(line[len("RESULT "):])
    assert set(results) == {0, 1}, outputs
    l0, l1 = results[0]["losses"], results[1]["losses"]
    assert len(l0) == 5
    # Both processes observe the same global loss at every step.
    for a, b in zip(l0, l1):
        assert abs(a - b) < 1e-5, (l0, l1)
    # And the optimization makes progress.
    assert l0[-1] < l0[0]
