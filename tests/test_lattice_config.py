import pytest

from cuda_iblb_11_tpu.core import lattice
from cuda_iblb_11_tpu.core.config import SimConfig


def test_lattice_sanity():
    lattice.sanity()


def test_default_derived_params():
    cfg = SimConfig()
    assert cfg.xdim == 288
    assert cfg.ydim == 192
    assert cfg.T == 100000
    assert cfg.iterations == 100000
    assert cfg.interval == 1000
    assert cfg.p_step == 16666  # 100000 * 1 // 6, integer division
    assert cfg.ns == 576
    assert abs(cfg.speed - 0.008) < 1e-15
    assert abs(cfg.mach - 0.0138648) < 1e-6  # SimLog_nom.txt:9
    assert abs(cfg.tau - (0.008 * 96 / 0.332929 + 0.5)) < 1e-12
    assert abs(cfg.tau2 - (1.0 / (12.0 * (cfg.tau - 0.5)) + 0.5)) < 1e-12


def test_nominal_run_tau():
    # The 2017 golden run used LENGTH=100: TAU = 2.90291, TAU2 = 0.53468
    # (Data/Nominals/SimLog_nom.txt:6).
    cfg = SimConfig(length=100)
    assert abs(cfg.tau - 2.90291) < 5e-6
    assert abs(cfg.tau2 - 0.53468) < 5e-6


def test_scales():
    cfg = SimConfig()
    # dx*l_0 = 6e-8 m, dt*t_0 = 6.7e-7 s (SimLog_nom.txt:7-8)
    assert abs(cfg.dx * 6e-6 - 6.25e-8) < 1e-12  # LENGTH=96 era
    assert abs(cfg.t_scale - 1000.0 * 1e-5 * 0.067) < 1e-15
    assert abs(cfg.x_scale - 1e6 * (1 / 96) * 6e-6) < 1e-12


def test_from_argv_and_guard():
    cfg = SimConfig.from_argv(
        ["1", "6", "48", "1.0", "1.0", "5", "1", "100", "0", "0"]
    )
    assert cfg.c_num == 6 and cfg.T == 100000
    with pytest.raises(ValueError):
        SimConfig(c_num=2, c_space=48).validate()  # XDIM=96 < 192
    with pytest.raises(SystemExit):
        SimConfig.from_argv(["1", "2", "3"])
