"""Prove the pull-form streaming gather equals the reference's push-form
scatter, cell by cell, including the wall corner precedence rules.

The push emulator below re-implements the reference kernel's decision table
(LatticeBoltzmann.cu:199-365) directly in numpy: per-cell up/down/left/right
flags, bottom wall -> halfway bounce-back ("back", i -> opposite), top wall
-> specular reflection ("slip", cy mirrored), left/right -> periodic wrap
("thru"), with slip/back taking precedence over thru at corners.
"""

import jax.numpy as jnp
import numpy as np

from cuda_iblb_11_tpu.core.lattice import C, MIRROR_Y, OPPOSITE
from cuda_iblb_11_tpu.ops.reference import WallSpec, stream

RNG = np.random.default_rng(1234)


def push_stream_reference(f1):
    """Push-form emulation of LatticeBoltzmann.cu:173-373 (channel walls)."""
    nq, ydim, xdim = f1.shape
    out = np.zeros_like(f1)
    written = np.zeros(f1.shape, dtype=bool)
    for y in range(ydim):
        for x in range(xdim):
            up = y == ydim - 1
            down = y == 0
            left = x == 0
            right = x == xdim - 1
            for i in range(9):
                cx, cy = int(C[i, 0]), int(C[i, 1])
                back = thru = slip = False
                if up or down or left or right:
                    if i == 1 and right:
                        thru = True
                    elif i == 2 and up:
                        slip = True
                    elif i == 3 and left:
                        thru = True
                    elif i == 4 and down:
                        back = True
                    elif i == 5:
                        if up:
                            slip = True
                        elif right:
                            thru = True
                    elif i == 6:
                        if up:
                            slip = True
                        elif left:
                            thru = True
                    elif i == 7:
                        if down:
                            back = True
                        elif left:
                            thru = True
                    elif i == 8:
                        if down:
                            back = True
                        elif right:
                            thru = True
                if back:
                    xs, ys, k = x, y, int(OPPOSITE[i])
                elif slip:
                    xs, ys, k = x, y, int(MIRROR_Y[i])
                elif thru:
                    # jstream = j - (XDIM-1)*cx + XDIM*cy
                    j = y * xdim + x - (xdim - 1) * cx + xdim * cy
                    ys, xs, k = divmod(j, xdim)[0], j % xdim, i
                else:
                    xs, ys, k = x + cx, y + cy, i
                assert 0 <= xs < xdim and 0 <= ys < ydim, (x, y, i)
                assert not written[k, ys, xs], "push-form write collision"
                written[k, ys, xs] = True
                out[k, ys, xs] = f1[i, y, x]
    assert written.all(), "push-form left a slot unwritten"
    return out


def test_pull_equals_push_channel():
    for ydim, xdim in [(6, 8), (4, 4), (5, 12)]:
        f1 = RNG.standard_normal((9, ydim, xdim))
        expected = push_stream_reference(f1)
        got = np.asarray(stream(jnp.asarray(f1)))
        np.testing.assert_array_equal(got, expected)


def test_pull_push_conserves_mass():
    f1 = RNG.uniform(0.5, 1.5, size=(9, 6, 8))
    out = np.asarray(stream(jnp.asarray(f1)))
    assert abs(out.sum() - f1.sum()) < 1e-12


def test_fully_periodic_stream():
    f1 = RNG.standard_normal((9, 6, 8))
    walls = WallSpec(bottom="periodic", top="periodic")
    out = np.asarray(stream(jnp.asarray(f1), walls))
    for i in range(9):
        np.testing.assert_array_equal(
            out[i], np.roll(f1[i], (int(C[i, 1]), int(C[i, 0])), axis=(0, 1))
        )


def test_noslip_box_conserves_mass():
    walls = WallSpec(bottom="noslip", top="noslip", left="noslip", right="noslip")
    f1 = RNG.uniform(0.5, 1.5, size=(9, 6, 8))
    out = np.asarray(stream(jnp.asarray(f1), walls))
    assert abs(out.sum() - f1.sum()) < 1e-12


def test_moving_lid_adds_momentum():
    walls = WallSpec(
        bottom="noslip", top="moving", left="noslip", right="noslip",
        u_wall=(0.1, 0.0),
    )
    f1 = np.broadcast_to(
        np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)[:, None, None], (9, 6, 8)
    ).copy()
    out = np.asarray(stream(jnp.asarray(f1), walls))
    # Top-row incoming populations get the wall-momentum correction:
    # i=8 (cx=+1) boosted, i=7 (cx=-1) reduced, i=4 unchanged (cx=0).
    assert out[8, 5, 4] > f1[5, 5, 4]
    assert out[7, 5, 4] < f1[6, 5, 4]
    mom_x = (out * C[:, 0][:, None, None]).sum()
    assert mom_x > 0
