"""Run driver — the TPU-native counterpart of the reference's host loop
(main.cu:263-1066): interval-chunked jitted execution, flux series, optional
full-field + cilia snapshots, SimLog with completion-time prediction, and
(new) checkpoint/resume and throughput reporting."""

from __future__ import annotations

import os
import sys
import time

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.io import checkpoint as ckpt
from cuda_iblb_11_tpu.io.writers import (
    FluxWriter, OutputPaths, SimLog, write_cilia_snapshot,
    write_fluid_snapshot,
)
from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim
from cuda_iblb_11_tpu.utils.timing import ThroughputMeter, predict_completion, seconds


def _make_sim(cfg, backend, forcing, temporal, mesh, ib_x_edge="periodic",
              pattern="no_mucus"):
    """Build the simulation: single-device MucociliarySim, or a sharded sim
    over a (Y, X) device mesh when `mesh` is given (e.g. "2,4")."""
    if not mesh:
        return MucociliarySim(cfg, backend=backend, forcing=forcing,
                              temporal=temporal, ib_x_edge=ib_x_edge,
                              pattern=pattern)
    import jax

    from cuda_iblb_11_tpu.parallel.sharded import (
        ShardedMucociliarySim, ShardedPallasSim, ShardedTemporalSim,
        make_mesh,
    )

    parts = [int(v) for v in str(mesh).split(",")]
    if len(parts) != 2 or min(parts) < 1:
        raise ValueError(f"--mesh must be 'Y,X' positive ints, got {mesh!r}")
    m = make_mesh(*parts)
    xl = cfg.xdim // parts[1]
    pallas_ok = (jax.default_backend() == "tpu" and xl % 128 == 0
                 and cfg.ydim % (8 * parts[0]) == 0
                 and str(cfg.dtype) in ("float32", "bfloat16"))
    if backend == "pallas" or (backend == "auto" and pallas_ok):
        if temporal == "auto":
            # largest eligible K for the communication-avoiding sharded
            # path; quiet fallback to the per-step sharded kernel (the
            # user asked for a policy, not a specific K)
            err = None
            for K in (16, 8, 4, 2):
                try:
                    sim = ShardedTemporalSim(cfg, m, forcing=forcing,
                                             temporal=K,
                                             ib_x_edge=ib_x_edge,
                                             pattern=pattern)
                    sim.temporal_requested = "auto"
                    sim.temporal_reason = (
                        f"auto: K={K} (largest eligible sharded)")
                    return sim
                except ValueError as e:
                    err = e
            sim = ShardedPallasSim(cfg, m, forcing=forcing,
                                   ib_x_edge=ib_x_edge, pattern=pattern)
            sim.temporal_requested = "auto"
            # keep the LAST rejection (K=2, the least demanding candidate)
            # so SimLog records WHY no sharded K fit — same contract as
            # the single-device resolver (models/mucociliary.py)
            sim.temporal_reason = (f"auto: no eligible K for the sharded "
                                   f"temporal path ({err})")
            return sim
        if temporal > 1:
            # communication-avoiding K-step path; fall back to the
            # per-step sharded kernel when ineligible — loudly, so a user
            # who asked for K-step blocking knows they are not getting it
            # (different perf class, not different physics)
            try:
                return ShardedTemporalSim(cfg, m, forcing=forcing,
                                          temporal=temporal,
                                          ib_x_edge=ib_x_edge,
                                          pattern=pattern)
            except ValueError as e:
                print(f"warning: --temporal {temporal} with --mesh {mesh} "
                      f"is not eligible for the K-step sharded path ({e}); "
                      f"falling back to the per-step sharded kernel",
                      file=sys.stderr)
        return ShardedPallasSim(cfg, m, forcing=forcing,
                                ib_x_edge=ib_x_edge, pattern=pattern)
    if temporal != "auto" and temporal > 1:
        print(f"warning: --temporal {temporal} requires the sharded pallas "
              f"path; the jnp sharded backend steps one iteration at a "
              f"time (temporal ignored)", file=sys.stderr)
    sim = ShardedMucociliarySim(cfg, m, forcing=forcing,
                                ib_x_edge=ib_x_edge, pattern=pattern)
    if temporal == "auto":
        sim.temporal_requested = "auto"
        sim.temporal_reason = "auto: jnp sharded backend has no temporal path"
    return sim


def _select_device(cfg: SimConfig, mesh=None):
    """Reference device-selection semantics (main.cu:395-396): the ShARC
    flag picks device 3 (the cluster's assigned GPU) instead of device 0.
    TPU analogue: returns the jax device the single-device run should be
    pinned to, or None when no override applies (mesh runs span devices;
    ShARC on a host with < 4 devices falls back to the default, loudly)."""
    if mesh or not cfg.sharc:
        return None
    import jax

    devs = jax.devices()
    if len(devs) > 3:
        return devs[3]
    print(f"warning: ShARC flag requests device 3 but only {len(devs)} "
          f"device(s) are visible; using the default device",
          file=sys.stderr)
    return None


def _last_simlog_temporal_k(simlog_path: str) -> int | None:
    """The most recent 'Temporal K:' value recorded in an existing SimLog
    (the resumed-from run's resolved K — the LAST line wins, since each
    resume appends its own).  Values may carry an auto-reason suffix,
    e.g. 'Temporal K: 16 (auto: ...)'; None when absent/unparseable."""
    last = None
    try:
        with open(simlog_path) as fh:
            for line in fh:
                if line.startswith("Temporal K:"):
                    tok = line.split(":", 1)[1].strip().split()[0]
                    try:
                        last = int(tok)
                    except ValueError:
                        pass
    except FileNotFoundError:
        pass
    return last


def _resume_flux_rows(flux_path: str, cfg: SimConfig, it0: int,
                      interval: int) -> int:
    """Count the leading flux rows still valid at a resume from step it0.

    Rows carry the time stamp it*t_scale of the run that WROTE them, whose
    output interval may differ from the resuming run's — so rows are kept
    by time, not by dividing it0 by the new interval.  A row at exactly
    it0 is kept only when it0 is NOT a boundary of the new interval (the
    resumed loop rewrites boundary rows itself)."""
    t0 = it0 * cfg.t_scale
    # %.6g-formatted stamps carry ~5e-7 relative error; the tolerance must
    # dominate it while staying below the row spacing.  The two bounds can
    # collide (interval=1 runs past ~2.5e5 steps: the stamp quantization
    # exceeds the spacing), so the tolerance is clamped per row by the
    # OBSERVED spacing to the previous row, erring toward KEEPING rows —
    # a duplicated boundary row after resume beats silently truncating
    # valid data rows.
    stamp_tol = max(0.5 * cfg.t_scale, 2e-6 * t0)
    keep = 0
    prev = None
    try:
        with open(flux_path) as fh:
            for line in fh:
                try:
                    t = float(line.split()[0])
                except (ValueError, IndexError):
                    break
                spacing = t - prev if prev is not None else cfg.t_scale
                tol = min(stamp_tol,
                          max(0.45 * spacing, 0.45 * cfg.t_scale))
                if t < t0 - tol or (abs(t - t0) <= tol and it0 % interval):
                    keep += 1
                    prev = t
                else:
                    break
    except FileNotFoundError:
        pass
    return keep


def run(cfg: SimConfig, output_root: str = "Data/Test", backend: str = "auto",
        forcing: str = "trt_split", resume_from: str | None = None,
        checkpoint_every: int = 0, quiet: bool = False,
        profile_dir: str | None = None, temporal: int | str = 1,
        mesh: str | None = None, ib_x_edge: str = "periodic",
        checkpoint_format: str = "npz", pattern: str = "no_mucus") -> dict:
    """See _run_body; this wrapper applies the ShARC device-selection
    semantics (pin single-device runs to device 3 when cfg.sharc, the
    reference's cudaSetDevice behaviour at main.cu:395-396)."""
    device = _select_device(cfg, mesh)
    kw = dict(
        output_root=output_root, backend=backend, forcing=forcing,
        resume_from=resume_from, checkpoint_every=checkpoint_every,
        quiet=quiet, profile_dir=profile_dir, temporal=temporal, mesh=mesh,
        ib_x_edge=ib_x_edge, checkpoint_format=checkpoint_format,
        pattern=pattern, device=device)
    if device is not None:
        import jax

        with jax.default_device(device):
            return _run_body(cfg, **kw)
    return _run_body(cfg, **kw)


def _run_body(cfg: SimConfig, output_root: str = "Data/Test",
              backend: str = "auto",
              forcing: str = "trt_split", resume_from: str | None = None,
              checkpoint_every: int = 0, quiet: bool = False,
              profile_dir: str | None = None, temporal: int | str = 1,
              mesh: str | None = None, ib_x_edge: str = "periodic",
              checkpoint_format: str = "npz", pattern: str = "no_mucus",
              device=None) -> dict:
    """Execute cfg.iterations steps with interval outputs.

    profile_dir: if set, capture a jax.profiler trace of the first interval
    (the reference's only tracing was a wall-clock timer, seconds.cpp).
    mesh: "Y,X" device-mesh shape for multi-chip spatial sharding.
    checkpoint_format: "npz" (single host-gathered archive) or "orbax"
    (sharded: each host writes its own shards; resume restores directly
    onto the mesh).  --resume auto-detects the format (orbax checkpoints
    are directories).
    Returns a summary dict (runtime, MLUPS, final Q)."""
    cfg.validate()
    sim = _make_sim(cfg, backend, forcing, temporal, mesh, ib_x_edge,
                    pattern)
    profiling = False
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
        profiling = True

    paths = OutputPaths(output_root, cfg)
    paths.makedirs()
    interval = max(cfg.interval, 1)
    simlog = SimLog(paths.simlog_path, cfg)
    extra = {"Backend": backend, "Forcing": forcing,
             "Dtype": str(sim.dtype)}
    if pattern != "no_mucus":
        extra["Pattern"] = pattern
    if mesh:
        extra["Mesh"] = mesh
    if device is not None:
        extra["Device"] = str(device)
    # The RESOLVED execution configuration, after every auto/fallback
    # decision — the analogue of the reference recording its real launch
    # config (main.cu:782-783), so a run's perf class is reproducible
    # from its own artifacts.
    resolved = sim.resolved_config()
    extra["Resolved backend"] = resolved["backend"] + (
        f" ({resolved['backend_reason']})"
        if resolved["backend_reason"] else "")
    extra["Kernel path"] = resolved["band_leg"]
    extra["Storage"] = resolved["storage"]
    extra["IB path"] = resolved["ib_path"]
    extra["Temporal K"] = resolved["temporal"]
    if resolved.get("temporal_requested") == "auto":
        extra["Temporal K"] = (
            f"{resolved['temporal']} ({resolved['temporal_reason']})")
    if not quiet:
        print(f"Execution: backend={extra['Resolved backend']} "
              f"kernel={resolved['band_leg']} "
              f"storage={resolved['storage']} "
              f"temporal={resolved['temporal']} "
              f"ib={resolved['ib_path']}")

    if resume_from:
        if os.path.isdir(resume_from):  # orbax checkpoints are directories
            state, _ = ckpt.load_orbax(resume_from, cfg,
                                       sim=sim if mesh else None)
        else:
            state, _ = ckpt.load(resume_from, cfg)
            if mesh:
                state = sim.place_state(state)  # re-shard onto the mesh
        if not mesh and state.force.shape[1] == cfg.ydim:
            # jnp-mesh-saved checkpoints keep the force full-size
            # [2, Y, X] (the pallas layouts are band-only already); the
            # single-device layout is band-only (zero above the band
            # by construction — ImmersedBoundary.cu:166-231)
            state = state._replace(force=state.force[:, :cfg.force_band])
        it0 = int(state.it)
        # Preserve the flux rows already written up to the checkpoint and
        # append to SimLog instead of truncating it.  The kept rows are
        # identified by their TIME stamps (they were written at the SAVED
        # run's interval, which may differ from this run's); the resumed
        # loop rewrites the row at it0 itself iff it0 is a boundary of the
        # new interval.
        keep = _resume_flux_rows(paths.flux_path, cfg, it0, interval)
        flux = FluxWriter(paths.flux_path, cfg, keep_rows=keep)
        # a resume under a different resolved temporal K switches kernel
        # path mid-run (not bit-identical across K — f32 re-association,
        # ~1e-6 rel-L2 class): make the numeric discontinuity VISIBLE in
        # the SimLog the moment it happens, since --temporal auto makes
        # it easy to land silently (ADVICE r4)
        prev_k = _last_simlog_temporal_k(paths.simlog_path)
        simlog.write_resume_note(it0)
        if prev_k is not None and prev_k != int(resolved["temporal"]):
            note = (f"NOTE: resumed with temporal K={resolved['temporal']} "
                    f"(original run: K={prev_k}) — different kernel path, "
                    f"not bit-identical across the switch")
            simlog.write_extra({"Resume": note})
            if not quiet:
                print(f"warning: {note}", file=sys.stderr)
        # a resume may change the execution path (different backend /
        # mesh / machine) — record the resumed run's resolved config too
        simlog.write_extra({k: v for k, v in extra.items()
                            if k.startswith(("Resolved", "Kernel",
                                             "Storage", "IB path",
                                             "Temporal"))})
        if not quiet:
            print(f"Resumed from {resume_from} at it={it0}")
    else:
        state = sim.init_state()
        flux = FluxWriter(paths.flux_path, cfg)
        simlog.write_header(extra=extra)
    meter = ThroughputMeter(cells=cfg.size)
    start_epoch = time.time()
    t_start = seconds()
    if not quiet:
        print("Running Simulation...")

    it = int(state.it)
    first_interval_logged = it > 0
    last_ckpt = it
    while it < cfg.iterations:
        # Output at the START of each interval boundary, like the reference
        # (it % INTERVAL == 0 inside the loop, main.cu:938).
        if it % interval == 0:
            if cfg.bigdata:
                from cuda_iblb_11_tpu.io import native

                fluid_writer = (native.write_fluid_snapshot
                                if native.available()
                                else write_fluid_snapshot)
                cilia_writer = (native.write_cilia_snapshot
                                if native.available()
                                else write_cilia_snapshot)
                rho, u = sim.fields(state)
                fluid_writer(
                    os.path.join(paths.raw_dir, f"{it}-fluid.dat"),
                    cfg, rho, u)
                s, u_s, eps = sim.boundary_fields(state)
                cilia_writer(
                    os.path.join(paths.cilia_dir, f"{it}-cilia.dat"),
                    cfg, s, u_s, eps)
            flux.append(it, float(state.q))

        n = min(interval - it % interval, cfg.iterations - it)
        meter.start()
        state = sim.run_chunk(state, n)
        state.q.block_until_ready()
        meter.stop(n)
        it = int(state.it)

        if profiling and it >= interval:
            import jax

            jax.profiler.stop_trace()
            profiling = False
            if not quiet:
                print(f"Profiler trace written to {profile_dir}")

        if not first_interval_logged and it >= interval:
            pred = predict_completion(
                start_epoch, seconds() - t_start, cfg.iterations // interval)
            simlog.write_completion_estimate(pred)
            if not quiet:
                print("Completion time:",
                      time.asctime(time.localtime(pred)))
            first_interval_logged = True

        # "every N iterations" tracked against the last save (the loop only
        # ever stops on interval boundaries, so a modulo test could miss
        # every save when N is not a multiple of the interval).
        if checkpoint_every and it - last_ckpt >= checkpoint_every:
            if checkpoint_format == "orbax":
                ckpt.save_orbax(
                    os.path.join(paths.raw_dir, "checkpoint_orbax"),
                    state, cfg)
            else:
                ckpt.save(os.path.join(paths.raw_dir, "checkpoint.npz"),
                          state, cfg)
            last_ckpt = it

    # Final flux row after the loop (main.cu:1030-1034).
    flux.append(it, float(state.q))
    runtime = seconds() - t_start
    simlog.write_runtime(runtime)
    summary = {
        "iterations": it,
        "runtime_s": runtime,
        "mlups": meter.mlups,
        "q_final": float(state.q),
        "flux_path": paths.flux_path,
        "resolved": resolved,
    }
    if not quiet:
        print(f"Total runtime: {runtime:.2f}s  ({meter.mlups:.1f} MLUPS)")
    return summary
