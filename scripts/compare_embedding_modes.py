"""psum vs a2a vocab-sharded lookup: collective traffic comparison.

VERDICT r1 Weak #7: the a2a routing mode ends in a full all_gather, so its
advantage over psum was unmeasured. Real multi-chip timing needs hardware
this box doesn't have (1 TPU chip), so this script compiles BOTH lookup modes
on a fake 8-device mesh at config-#5-shaped dims and counts the per-device
collective bytes in the optimized HLO — the quantity ICI bandwidth actually
charges for. Results are recorded in BASELINE.md.

    python scripts/compare_embedding_modes.py [--model-shards 8] [--dim 512]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "s64": 8, "pred": 1}
_COLLECTIVES = ("all-gather", "all-reduce", "all-to-all", "collective-permute", "reduce-scatter")


def collective_bytes(hlo: str) -> dict[str, int]:
    """Sum output-shape bytes of each collective op in optimized HLO text.
    (Per-device payload; a ring all-reduce moves ~2x its output size on the
    wire, so treat these as relative, not absolute, link traffic.)"""
    out: dict[str, int] = {}
    for line in hlo.splitlines():
        m = re.search(r"=\s*(?:\(([^)]*)\)|(\w+)\[([\d,]*)\][^ ]*)\s+(%?[\w-]+)", line)
        if not m:
            continue
        op = None
        for c in _COLLECTIVES:
            if re.search(rf"\b{c}(-start|-done)?\(", line) and "-done(" not in line:
                op = c
                break
        if op is None:
            continue
        shapes = []
        if m.group(1) is not None:  # tuple shape
            shapes = re.findall(r"(\w+)\[([\d,]*)\]", m.group(1))
        else:
            shapes = [(m.group(2), m.group(3))]
        n = 0
        for dt, dims in shapes:
            sz = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
            n += sz * _DTYPE_BYTES.get(dt, 4)
        out[op] = out.get(op, 0) + n
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model-shards", type=int, default=8)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--vocab", type=int, default=65536, help="scaled-down 1M catalog (traffic is V-independent)")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--seqlen", type=int, default=64)
    p.add_argument("--capacity-factor", type=float, default=2.0)
    args = p.parse_args(argv)

    from poi_tpu.ops.embedding import make_lookup
    from poi_tpu.parallel.mesh import make_mesh

    m = args.model_shards
    mesh = make_mesh(data=8 // m if m < 8 else 1, model=m)
    v, d = args.vocab, args.dim
    table = jnp.zeros((v, d), jnp.float32)
    ids = jnp.zeros((args.batch, args.seqlen), jnp.int32)

    n_ids = args.batch * args.seqlen
    # Ring-protocol wire cost per payload byte: all-reduce = reduce-scatter +
    # all-gather ~ 2(M-1)/M; the single-phase collectives ~ (M-1)/M.
    wire = {
        "all-reduce": 2.0 * (m - 1) / m,
        "all-gather": (m - 1) / m,
        "all-to-all": (m - 1) / m,
        "reduce-scatter": (m - 1) / m,
        "collective-permute": 1.0,
    }
    print(f"mesh={dict(mesh.shape)} V={v} D={d} ids={n_ids} "
          f"(dense vectors = {n_ids * d * 4 / 1e6:.1f} MB fp32)")
    print(f"{'mode':>6} {'payload MB/device':>18} {'wire MB/device':>15}  breakdown")
    for mode in ("psum", "a2a"):
        lookup = make_lookup(mesh, mode, args.capacity_factor)

        def fwd_bwd(t, i):
            return jnp.sum(lookup(t, i) ** 2)

        hlo = (
            jax.jit(jax.grad(fwd_bwd))
            .lower(
                jax.ShapeDtypeStruct(table.shape, table.dtype,
                                     sharding=jax.NamedSharding(mesh, jax.P("model", None))),
                jax.ShapeDtypeStruct(ids.shape, ids.dtype,
                                     sharding=jax.NamedSharding(mesh, jax.P("data", None))),
            )
            .compile()
            .as_text()
        )
        counts = collective_bytes(hlo)
        total = sum(counts.values())
        wired = sum(b * wire.get(k, 1.0) for k, b in counts.items())
        pretty = ", ".join(f"{k}={b / 1e6:.2f}MB" for k, b in sorted(counts.items()))
        print(f"{mode:>6} {total / 1e6:>18.2f} {wired / 1e6:>15.2f}  {pretty}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
