"""Smoke tests for scripts/plot_fields.py (the reference's outputs are
gnuplot-oriented plot data, SURVEY.md L7; this renders them directly)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("matplotlib") is None,
    reason="matplotlib unavailable")

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "plot_fields.py")


def _mod():
    spec = importlib.util.spec_from_file_location("plot_fields", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_outputs(tmp_path):
    from cuda_iblb_11_tpu.core.config import SimConfig
    from cuda_iblb_11_tpu.io import writers

    cfg = SimConfig(c_num=4, c_space=48, ydim=16)
    rng = np.random.default_rng(3)
    rho = 1.0 + 0.01 * rng.standard_normal((cfg.ydim, cfg.xdim))
    u = 0.01 * rng.standard_normal((2, cfg.ydim, cfg.xdim))
    fluid = tmp_path / "100-fluid.dat"
    writers.write_fluid_snapshot(str(fluid), cfg, rho, u)
    ns = cfg.ns
    s = np.stack([rng.uniform(0, cfg.xdim, ns),
                  rng.uniform(0, 100, ns)], axis=1)
    u_s = 0.01 * rng.standard_normal((ns, 2))
    eps = rng.integers(0, 2, ns).astype(np.int32)
    cilia = tmp_path / "100-cilia.dat"
    writers.write_cilia_snapshot(str(cilia), cfg, s, u_s, eps)
    flux = tmp_path / "flux.dat"
    flux.write_text("0 0\n0.5 0.01\n1.0 0.03\n")
    return cfg, fluid, cilia, flux


def test_plot_all_forms(tmp_path):
    mod = _mod()
    cfg, fluid, cilia, flux = _write_outputs(tmp_path)

    # the fluid parser must invert the writer's grid layout exactly
    f = mod.read_fluid(str(fluid))
    assert f["umag"].shape == (cfg.ydim, cfg.xdim)
    s, u_s, eps = mod.read_cilia(str(cilia))
    assert s.shape == (cfg.ns, 2) and eps.shape == (cfg.ns,)

    for args in (
        ["fluid", str(fluid), "--cilia", str(cilia),
         "--out", str(tmp_path / "f.png")],
        ["cilia", str(cilia), "--out", str(tmp_path / "c.png")],
        ["flux", str(flux), "--out", str(tmp_path / "q.png")],
    ):
        assert mod.main(args + ["--dpi", "60"]) == 0
    for name in ("f.png", "c.png", "q.png"):
        assert (tmp_path / name).stat().st_size > 1000


def test_movie(tmp_path):
    mod = _mod()
    from cuda_iblb_11_tpu.core.config import SimConfig
    from cuda_iblb_11_tpu.io import writers

    cfg = SimConfig(c_num=4, c_space=48, ydim=16)
    rng = np.random.default_rng(4)
    for it in (0, 50, 100):
        rho = 1.0 + 0.01 * rng.standard_normal((cfg.ydim, cfg.xdim))
        u = 0.01 * rng.standard_normal((2, cfg.ydim, cfg.xdim))
        writers.write_fluid_snapshot(
            str(tmp_path / f"{it}-fluid.dat"), cfg, rho, u)
    out = tmp_path / "m.gif"
    assert mod.main(["movie", str(tmp_path), "--out", str(out),
                     "--dpi", "50", "--fps", "8"]) == 0
    from PIL import Image

    im = Image.open(out)
    assert im.n_frames == 3


def test_cli_entrypoint(tmp_path):
    import subprocess

    _, _, _, flux = _write_outputs(tmp_path)
    out = tmp_path / "q2.png"
    r = subprocess.run(
        [sys.executable, _SCRIPT, "flux", str(flux), "--out", str(out),
         "--dpi", "60"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
