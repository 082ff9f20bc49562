"""Test environment: CPU backend with 8 virtual devices (for sharding tests)
and float64 enabled (for the oracle path).

NOTE: this machine's sitecustomize pre-imports jax and pins the platform to
the TPU tunnel, so the env var JAX_PLATFORMS is ignored; the platform must be
overridden via jax.config.update after import.  Pallas kernels run in
interpreter mode on CPU (handled inside the kernel module via backend
detection)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

# Duration-derived test tiers (single shared CPU core, interpret-mode
# Pallas).  Tests measured >~20 s each — the cross-kernel / cross-layout
# equivalence integrations — carry the `heavy` marker, applied centrally
# here so the tier stays one greppable list.  Every family keeps at
# least one sub-20 s sibling in the smoke tier, and the FULL suite
# remains the gate of record:
#   -m "not slow and not heavy"   smoke tier (~8 min)
#   -m "not slow"                 core gate (skips only the ~9-min
#                                 full-beat recompute + char runs)
# Measured via `pytest --durations=40` (r4); re-derive after big suite
# changes.
_HEAVY = (
    "test_accuracy_horizon.py::test_f32_velocity_error_500_2000_4000_steps",
    "test_accuracy_horizon.py::test_band_super_f32_velocity_error_500_steps",
    "test_band_super.py::test_band_super_f32_matches_fallback_short",
    "test_band_super.py::test_band_super_fallback_when_window_too_wide",
    "test_band_super.py::test_band_super_honors_beat_pattern",
    "test_band_super.py::test_band_super_matches_oracle[4]",
    "test_cli.py::test_cli_mesh_resume_from_single_device_checkpoint",
    "test_cli.py::test_cli_mesh_temporal_matches_single_device",
    "test_cli.py::test_cli_orbax_cross_layout_resume",
    "test_cli.py::test_cli_orbax_sharded_checkpoint_roundtrip",
    "test_golden_flux.py::test_early_flux_matches_f64_golden",
    "test_kernel_mirror.py::test_ghost_kernel_bit_equals_temporal_kernel",
    "test_multihost.py::test_two_process_matches_single_process",
    "test_reference_forcing_parity.py::"
    "test_reference_forcing_band_super_parity",
    "test_sharded_temporal.py::test_sharded_temporal_2d_mesh",
    "test_sharded_temporal.py::test_sharded_temporal_band_spanning_shards",
    "test_sharded_temporal.py::"
    "test_sharded_temporal_bf16_matches_single_chip_bf16",
    "test_sharded_temporal.py::test_sharded_temporal_bf16_runs_finite",
    "test_sharded_temporal.py::test_sharded_temporal_f32_close_to_oracle",
    "test_sharded_temporal.py::test_sharded_temporal_four_shards_with_remainder",
    "test_sharded_temporal.py::test_sharded_temporal_quirk_x_edge",
    "test_sharded_temporal.py::test_sharded_temporal_tiled_band_leg",
    "test_sharded_temporal.py::"
    "test_sharded_temporal_tiled_band_super_matches_oracle",
    "test_sharded_temporal.py::test_sharded_temporal_xsharded_band_super",
    "test_sharded_temporal.py::"
    "test_xsharded_band_super_phase_general_matches_oracle",
    "test_sharding.py::test_sharded_pallas_bf16_matches_single_chip_bf16",
    "test_temporal.py::test_band_super_tiled_matches_untiled",
    "test_temporal.py::test_temporal_matches_oracle[8]",
    "test_temporal.py::test_temporal_quirk_super_config_falls_back",
    "test_temporal.py::test_temporal_quirk_x_edge_matches_single_step",
    "test_temporal.py::test_temporal_reference_channel_grid",
    "test_temporal.py::test_temporal_remainder_steps",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.name}"
        if any(key.startswith(p) for p in _HEAVY):
            item.add_marker(pytest.mark.heavy)
