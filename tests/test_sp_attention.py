"""Sequence-parallel attention equivalence: ring / Ulysses vs local blockwise
on a real fake-device mesh (SURVEY.md §2.2 T4/T5, §4 Property tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poi_tpu.models.attention import init_mha
from poi_tpu.ops.attention import blockwise_attention, multihead_attention, vanilla_attention
from poi_tpu.parallel.mesh import make_mesh
from poi_tpu.parallel.sp_attention import make_sp_attention

B, T, D, H, W = 4, 16, 16, 4, 5


@pytest.fixture(scope="module")
def mesh24(eight_devices):
    return make_mesh(data=2, model=4)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    p = init_mha(jax.random.key(1), D)
    return x, p


def _local_reference(x, p):
    return multihead_attention(x, p, num_heads=H, window=W, impl="vanilla", dtype=jnp.float32)


def test_blockwise_equals_vanilla(setup):
    x, p = setup
    ref = _local_reference(x, p)
    blk = multihead_attention(x, p, num_heads=H, window=W, impl="blockwise", block_size=4, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_sp_equals_local(impl, mesh24, setup):
    x, p = setup
    ref = _local_reference(x, p)
    sp = make_sp_attention(mesh24, num_heads=H, window=W, impl=impl, block_size=4)
    got = sp(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_sp_grads_match_local(impl, mesh24, setup):
    x, p = setup
    sp = make_sp_attention(mesh24, num_heads=H, window=W, impl=impl, block_size=4)
    cot = jnp.asarray(np.random.default_rng(2).normal(size=(B, T, D)), jnp.float32)
    g_sp = jax.grad(lambda pp: jnp.sum(sp(x, pp) * cot))(p)
    g_ref = jax.grad(lambda pp: jnp.sum(_local_reference(x, pp) * cot))(p)
    for key in p:
        np.testing.assert_allclose(np.asarray(g_sp[key]), np.asarray(g_ref[key]), atol=1e-3, rtol=1e-3)


def test_window_longer_than_shard(mesh24, setup):
    """Window spanning multiple sequence shards must still be exact."""
    x, p = setup
    wide = 13  # > T/M = 4
    ref = multihead_attention(x, p, num_heads=H, window=wide, impl="vanilla", dtype=jnp.float32)
    for impl in ("ring", "ulysses"):
        sp = make_sp_attention(mesh24, num_heads=H, window=wide, impl=impl, block_size=4)
        np.testing.assert_allclose(np.asarray(sp(x, p)), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_attention_model_trains_with_sp(impl, eight_devices):
    """End-to-end: attention model on a (2, 4) mesh with SP attention matches
    the blockwise model on a (8, 1) mesh."""
    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import load_dataset
    from poi_tpu.data.pipeline import TrainLoader
    from poi_tpu.models.base import DataDims
    from poi_tpu.train.loop import Trainer

    cfg = get_config("smoke").with_overrides(
        {
            "model.kind": "attention",
            "model.attn_heads": "4",
            "model.attn_window": "6",
            "model.compute_dtype": "float32",
            "model.embed_dim": "32",
            "model.hidden_dim": "32",
        }
    )
    ds = load_dataset(cfg.data)
    dims = DataDims.from_dataset(ds)
    cfg_sp = cfg.with_overrides({"model.attn_impl": impl})
    t_sp = Trainer(cfg_sp, dims, mesh=make_mesh(data=2, model=4))
    t_ref = Trainer(cfg, dims.padded_to(4), mesh=make_mesh(data=8, model=1))
    s_sp, s_ref = t_sp.init_state(), t_ref.init_state()
    loader = TrainLoader(ds.train, batch_size=16, seed=0)
    batch = next(loader)
    loader.close()
    _, m_sp = t_sp.step(s_sp, batch)
    _, m_ref = t_ref.step(s_ref, batch)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]), rtol=1e-4)


@pytest.mark.parametrize("t,w", [(16, 5), (17, 4), (32, 16), (8, 3), (12, 12), (31, 7)])
def test_banded_equals_vanilla(t, w):
    """banded_attention == vanilla_attention across ragged T, W edges
    (incl. T not a multiple of W, and 2W > T where the dispatcher would
    keep blockwise but the primitive must still be exact)."""
    from poi_tpu.ops.attention import banded_attention

    rng = np.random.default_rng(t * 100 + w)
    dh = 8
    q = jnp.asarray(rng.normal(size=(2, 3, t, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 3, t, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, t, dh)), jnp.float32)
    ref = vanilla_attention(q, k, v, w)
    got = banded_attention(q, k, v, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_banded_grads_match_vanilla():
    from poi_tpu.ops.attention import banded_attention

    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(2, 2, 24, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 24, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, 24, 8)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, 2, 24, 8)), jnp.float32)
    g_ref = jax.grad(lambda a, b, c: jnp.sum(vanilla_attention(a, b, c, 6) * ct), argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(lambda a, b, c: jnp.sum(banded_attention(a, b, c, 6) * ct), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_blockwise_primitive_still_exact():
    """The SP modes call blockwise_attention directly (kv_offset) — keep the
    primitive pinned to vanilla even though the local dispatcher now prefers
    the banded form."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 2, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 16, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, 16, 8)), jnp.float32)
    ref = vanilla_attention(q, k, v, 5)
    got = blockwise_attention(q, k, v, 5, block_size=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
