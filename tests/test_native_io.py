"""Native C++ writers must be byte-identical to the pure-Python oracle."""

import numpy as np
import pytest

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.io import native, writers

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")

RNG = np.random.default_rng(99)


def test_fluid_snapshot_byte_identical(tmp_path):
    cfg = SimConfig(c_num=4, c_space=48, ydim=16)
    rho = 1.0 + 0.01 * RNG.standard_normal((cfg.ydim, cfg.xdim))
    u = 0.01 * RNG.standard_normal((2, cfg.ydim, cfg.xdim))
    p_py = tmp_path / "py.dat"
    p_c = tmp_path / "c.dat"
    writers.write_fluid_snapshot(str(p_py), cfg, rho, u)
    native.write_fluid_snapshot(str(p_c), cfg, rho, u)
    assert p_py.read_bytes() == p_c.read_bytes()


def test_fluid_snapshot_byte_identical_f32_inputs(tmp_path):
    # sim fields arrive in f32 (aux_dtype); both writers must upcast to
    # f64 BEFORE scaling or ~4% of lines flip their 6th significant digit
    cfg = SimConfig(c_num=4, c_space=48, ydim=16)
    rho = (1.0 + 0.01 * RNG.standard_normal(
        (cfg.ydim, cfg.xdim))).astype(np.float32)
    u = (0.01 * RNG.standard_normal(
        (2, cfg.ydim, cfg.xdim))).astype(np.float32)
    p_py = tmp_path / "py.dat"
    p_c = tmp_path / "c.dat"
    writers.write_fluid_snapshot(str(p_py), cfg, rho, u)
    native.write_fluid_snapshot(str(p_c), cfg, rho, u)
    assert p_py.read_bytes() == p_c.read_bytes()


def test_cilia_snapshot_byte_identical(tmp_path):
    cfg = SimConfig(c_num=4, c_space=48)
    ns = cfg.ns
    s = np.stack([RNG.uniform(0, cfg.xdim, ns),
                  RNG.uniform(0, 100, ns)], axis=1)
    u_s = 0.01 * RNG.standard_normal((ns, 2))
    eps = RNG.integers(0, 2, ns).astype(np.int32)
    p_py = tmp_path / "py.dat"
    p_c = tmp_path / "c.dat"
    writers.write_cilia_snapshot(str(p_py), cfg, s, u_s, eps)
    native.write_cilia_snapshot(str(p_c), cfg, s, u_s, eps)
    assert p_py.read_bytes() == p_c.read_bytes()


def test_monotonic_seconds():
    a = native.monotonic_seconds()
    b = native.monotonic_seconds()
    assert b >= a


def test_native_is_faster_for_large_fields(tmp_path):
    import time

    cfg = SimConfig(c_num=8, c_space=64, ydim=256)
    rho = np.ones((cfg.ydim, cfg.xdim))
    u = np.zeros((2, cfg.ydim, cfg.xdim))
    # best-of-3 each (page cache warm after the first pass) with a loose
    # margin — a single cold sample is flaky on loaded CI machines
    t_py = t_c = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        writers.write_fluid_snapshot(str(tmp_path / "a.dat"), cfg, rho, u)
        t_py = min(t_py, time.perf_counter() - t0)
        t0 = time.perf_counter()
        native.write_fluid_snapshot(str(tmp_path / "b.dat"), cfg, rho, u)
        t_c = min(t_c, time.perf_counter() - t0)
    assert t_c < t_py * 1.5
