"""Benchmark: tracked frames/s on one chip, full SLAM loop.

Runs the complete stereo tracking pipeline (pyramid/FAST/BRIEF extraction
x2, stereo matching, landmark projection matching, motion-only LM, KF
insertion + local BA) on an EuRoC-sized synthetic sequence and reports
steady-state tracked frames/s on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference's implied real-time rate on its
EuRoC configs (20 fps capture, config_MH_01.yaml:97) — the reference
publishes no measured numbers (BASELINE.md), so its design target is the
comparison point.
"""

import json
import os
import time

import numpy as np


def _setup_cache():
    """Persistent XLA compilation cache: first-ever run pays the TPU
    compiles (~20-40s each), every run after loads from disk."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    _setup_cache()
    from vslam_tpu.models import local_mapper, map_state, tracker
    from vslam_tpu.utils import synthetic, trajectory

    n_frames = 80
    scene = synthetic.make_scene(
        n_frames=n_frames, n_points=900, width=752, height=480, fps=20.0, seed=3
    )
    params = tracker.TrackerParams(n_features=1024, n_levels=8, active_size=4096)
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=128, keys_per_kf=1024)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)

    # pre-render all frames (host-side input, excluded from timing);
    # uint8 like a real camera feed — cast to f32 happens on device
    frames = [
        (
            scene.render(f).astype(np.uint8),
            scene.render(f, right=True).astype(np.uint8),
        )
        for f in range(n_frames)
    ]

    # async local BA (the role of the reference's LocalMapper thread,
    # src/System.cpp:18-19): the whole mapping pipeline is DISPATCHED to the
    # device queue at the KF and its result blobs are consumed one frame
    # later, when their host copies have landed — tracking never blocks on
    # BA latency and no host thread fights the GIL
    pending_ba = [None, -10]  # (handle, dispatch frame)
    BA_LATENCY = 2  # frames to let the async chain age before the fetch

    def consume_ba(f, force=False):
        if pending_ba[0] is not None and (force or f - pending_ba[1] >= BA_LATENCY):
            r = mapper.finish(pending_ba[0])
            pending_ba[0] = None
            trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
            trk.add_active(r["new_lm_ids"])

    def step(f):
        consume_ba(f)
        n_kf = len(trk.new_kf_slots)
        trk.track(*frames[f])
        if len(trk.new_kf_slots) > n_kf and trk.new_kf_slots[-1] > 0:
            consume_ba(f, force=True)  # at most one BA in flight
            pending_ba[0] = mapper.run_async(trk.new_kf_slots[-1])
            pending_ba[1] = f

    warmup = 12
    for f in range(warmup):
        n_kf = len(trk.new_kf_slots)
        trk.track(*frames[f])
        # warmup runs the mapper SYNCHRONOUSLY so its programs compile
        # before the timed section (first-call compiles are tens of
        # seconds on TPU and would otherwise stall the BA thread for the
        # entire bench, starving the tracker of triangulated landmarks)
        if len(trk.new_kf_slots) > n_kf and trk.new_kf_slots[-1] > 0:
            r = mapper.run(trk.new_kf_slots[-1])
            trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
            trk.add_active(r["new_lm_ids"])

    t0 = time.perf_counter()
    for f in range(warmup, n_frames):
        step(f)
    trk.flush()
    consume_ba(n_frames, force=True)
    dt = time.perf_counter() - t0
    fps = (n_frames - warmup) / dt

    poses = trk.trajectory()
    ate = trajectory.ate_rmse(poses, scene.poses_c2w[: len(poses)], align=False)

    baseline_fps = 20.0  # EuRoC real-time intent (no published numbers)
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_s_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
                "extra": {
                    "ate_rmse_m_synthetic": round(float(ate), 4),
                    "n_keyframes": trk.world.n_keyframes,
                    "n_landmarks": trk.world.n_landmarks,
                    "ba_runs": mapper.ba_count,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
