"""IO: writer formats vs the golden files' conventions, checkpoint roundtrip."""

import os

import jax.numpy as jnp
import numpy as np

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.io import checkpoint as ckpt
from cuda_iblb_11_tpu.io.writers import (
    FluxWriter, OutputPaths, SimLog, fmt, write_cilia_snapshot,
    write_fluid_snapshot,
)
from cuda_iblb_11_tpu.core.state import initial_state


def test_fmt_matches_cpp_iostream():
    # C++ default << double formatting (6 sig digits) — values seen in the
    # golden files.
    assert fmt(-2.05717e-06) == "-2.05717e-06"
    assert fmt(125.235) == "125.235"
    assert fmt(0.67) == "0.67"
    assert fmt(0.994318) == "0.994318"


def test_flux_writer_format(tmp_path):
    cfg = SimConfig()
    p = tmp_path / "flux.dat"
    w = FluxWriter(str(p), cfg)
    w.append(0, -2.05717e-06 / cfg.x_scale)
    w.append(1000, 0.0608492 / cfg.x_scale)
    rows = p.read_text().splitlines()
    assert rows[0].split("\t")[0] == "0"
    # 1000 steps * t_scale(=0.00067 ms/step) = 0.67 ms — matches
    # flux_nom.dat's second row time.
    assert rows[1].split("\t")[0] == "0.67"
    assert abs(float(rows[1].split("\t")[1]) - 0.0608492) < 1e-6


def test_fluid_snapshot_format(tmp_path):
    cfg = SimConfig(c_num=4, c_space=48)
    rho = jnp.ones((cfg.ydim, cfg.xdim))
    u = jnp.zeros((2, cfg.ydim, cfg.xdim))
    p = tmp_path / "0-fluid.dat"
    write_fluid_snapshot(str(p), cfg, rho, u)
    lines = p.read_text().splitlines()
    # 6 columns, blank separator after each grid row (gnuplot convention,
    # like *-vector_nom.dat).
    assert len(lines) == cfg.ydim * (cfg.xdim + 1)
    first = lines[0].split("\t")
    assert len(first) == 6
    assert first[5] == "1"
    assert lines[cfg.xdim] == ""


def test_cilia_snapshot_format(tmp_path):
    cfg = SimConfig(c_num=4, c_space=48)
    ns = cfg.ns
    s = jnp.stack([jnp.linspace(2, 100, ns), jnp.ones(ns)], axis=1)
    u_s = jnp.zeros((ns, 2))
    eps = jnp.ones((ns,), jnp.int32)
    p = tmp_path / "0-cilia.dat"
    write_cilia_snapshot(str(p), cfg, s, u_s, eps)
    lines = p.read_text().splitlines()
    row = lines[0].split("\t")
    assert len(row) == 5 and row[4] == "1"


def test_simlog(tmp_path):
    cfg = SimConfig()
    log = SimLog(str(tmp_path / "SimLog.txt"), cfg)
    log.write_header()
    log.write_runtime(9636.46)
    text = (tmp_path / "SimLog.txt").read_text()
    assert "Size: 288x192" in text
    assert "Iterations: 100000" in text
    assert "Relaxation times: 2.8068, 0.536125" in text
    assert "Mach number: 0.0138648" in text
    assert "Total runtime: 02:40:36.46" in text


def test_output_paths_layout(tmp_path):
    cfg = SimConfig()
    paths = OutputPaths(str(tmp_path), cfg)
    assert paths.raw_dir.endswith(os.path.join("Raw", "6", "1"))
    assert paths.flux_path.endswith("1_6_48_1_1x5-flux.dat")


def test_checkpoint_roundtrip(tmp_path):
    cfg = SimConfig(c_num=4, c_space=48, dtype="float64")
    st = initial_state(cfg)
    st = st._replace(q=jnp.asarray(1.5, jnp.float64),
                     it=jnp.asarray(42, jnp.int32))
    p = str(tmp_path / "ck.npz")
    ckpt.save(p, st, cfg)
    st2, cfg2 = ckpt.load(p, cfg)
    assert cfg2 == cfg
    np.testing.assert_array_equal(np.asarray(st.f), np.asarray(st2.f))
    assert int(st2.it) == 42 and float(st2.q) == 1.5
