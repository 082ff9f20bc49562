"""CLI end-to-end (tiny run) and argument handling."""

import numpy as np

from cuda_iblb_11_tpu.cli import main


def test_cli_runs_and_writes_outputs(tmp_path):
    rc = main([
        "1", "4", "48", "1.0", "1.0", "5", "0.002", "2", "0", "0",
        "--output", str(tmp_path), "--quiet", "--dtype", "float32",
    ])
    assert rc == 0
    flux = np.loadtxt(tmp_path / "Flux" / "1_4_48_1_1x5-flux.dat")
    assert flux.shape == (3, 2)  # samples at 0, 100 + final at 200
    assert (tmp_path / "Raw" / "4" / "1" / "SimLog.txt").exists()


def test_cli_too_few_args():
    assert main(["1", "2", "3"]) == 1


def test_cli_domain_guard():
    # c_num=2, c_space=48 -> XDIM=96 < 2*LENGTH
    assert main(["1", "2", "48", "1.0", "1.0", "5", "1", "10", "0", "0"]) == 1
