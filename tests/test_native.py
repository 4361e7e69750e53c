"""Native (C++) preprocessing vs the Python oracle: bit-identical outputs
and a speed sanity check (SURVEY.md §2.1 — the rebuild's native runtime
component; reference has none)."""

import time

import numpy as np
import pytest

from poi_tpu import native
from poi_tpu.data import checkins, dataset
from poi_tpu.utils.config import DataConfig


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def _compare(a: dataset.Examples, b: dataset.Examples):
    assert len(a) == len(b)
    for field in a.__dataclass_fields__:
        x, y = getattr(a, field), getattr(b, field)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=field)


@pytest.mark.parametrize("seed,T", [(0, 16), (1, 8), (2, 64)])
def test_native_matches_python_oracle(lib, seed, T):
    table = checkins.synthesize_checkins(120, 400, 35, seed=seed)
    cfg = DataConfig(min_user_checkins=4, min_poi_checkins=1, max_seq_len=T)
    ds_native = dataset.build_dataset(table, cfg, use_native=True)
    ds_python = dataset.build_dataset(table, cfg, use_native=False)
    _compare(ds_native.train, ds_python.train)
    _compare(ds_native.test, ds_python.test)


def test_native_edge_single_window(lib):
    """Users with exactly 2 kept check-ins produce one 1-step window."""
    table = checkins.synthesize_checkins(30, 50, 4, seed=5)
    cfg = DataConfig(min_user_checkins=2, min_poi_checkins=1, max_seq_len=4)
    ds_n = dataset.build_dataset(table, cfg, use_native=True)
    ds_p = dataset.build_dataset(table, cfg, use_native=False)
    _compare(ds_n.train, ds_p.train)
    _compare(ds_n.test, ds_p.test)


@pytest.mark.slow
def test_native_is_faster(lib):
    table = checkins.synthesize_checkins(5000, 5000, 60, seed=3)
    cfg = DataConfig(max_seq_len=32)
    t0 = time.perf_counter()
    dataset.build_dataset(table, cfg, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    dataset.build_dataset(table, cfg, use_native=False)
    t_python = time.perf_counter() - t0
    # The windowing stage is only part of build_dataset; still expect a win.
    assert t_native < t_python, (t_native, t_python)
