"""Self-contained end-to-end demo on a rendered synthetic world.

No datasets needed (this is also the verification entry point on
machines without KITTI/EuRoC): renders one of the built-in scenes,
drives the full pipeline — extraction, stereo matching, tracking,
async local BA, optional loop closure / global BA — and prints fps +
ATE against the scene's exact ground truth.

    python examples/run_synthetic.py                 # EuRoC-geometry stereo
    python examples/run_synthetic.py --scene kitti   # KITTI-geometry stereo
    python examples/run_synthetic.py --scene mono    # monocular-inertial
    python examples/run_synthetic.py --scene loop    # closed circuit + loop closure
    python examples/run_synthetic.py --viz map.html  # export the map viewer
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SCENES = {
    # name: (width, height, fps, n_frames, n_features, description)
    "euroc": (752, 480, 20.0, 80, 1024, "EuRoC-geometry stereo"),
    "kitti": (1248, 384, 10.0, 40, 2048, "KITTI-geometry stereo"),
    "mono": (752, 480, 20.0, 60, 1024, "monocular-inertial (lateral)"),
    "loop": (512, 384, 10.0, 325, 1024, "closed circuit + loop closure"),
}


def _write_config(tmp, W, H, fps, nfeat, slam_mode):
    p = pathlib.Path(tmp) / "config.yaml"
    p.write_text(f"""rectified: true
slamMode: {slam_mode}
dataset: "KITTI"
imagesPath: "/nonexistent"
fileExtension: ".png"
Camera: {{width: {W}, height: {H}, fps: {fps}, bl: 0.12}}
Camera_l: {{fx: 460.0, fy: 460.0, cx: {W / 2}, cy: {H / 2}}}
Camera_r: {{fx: 460.0, fy: 460.0, cx: {W / 2}, cy: {H / 2}}}
FE: {{nFeatures: {nfeat}, nLevels: 8, imScale: 1.2, edgeThreshold: 19, maxFastThreshold: 20, minFastThreshold: 7}}
IMU: {{Hz: 200, gyroscope_noise_density: 1.7e-4, accelerometer_noise_density: 2.0e-3, gyroscope_random_walk: 1.9e-5, accelerometer_random_walk: 3.0e-3, gravity: [0.0, 0.0, -9.81]}}
""")
    return str(p)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", choices=sorted(SCENES), default="euroc")
    ap.add_argument("--frames", type=int, default=0, help="override frame count")
    ap.add_argument("--viz", default=None, help="HTML map viewer output path")
    ap.add_argument("--global-ba", action="store_true")
    args = ap.parse_args()

    from vslam_tpu.models import system as system_mod
    from vslam_tpu.utils import datasets, synthetic, trajectory
    from vslam_tpu.utils.config import ConfigFile

    W, H, fps, n, nfeat, desc = SCENES[args.scene]
    if args.frames:
        n = args.frames
    print(f"[scene] {desc}: {W}x{H} @ {fps} fps, {n} frames, {nfeat} features")

    t0 = time.time()
    if args.scene == "loop":
        scene = synthetic.make_loop_scene(n_frames=n, width=W, height=H, fps=fps)
    elif args.scene == "mono":
        scene = synthetic.make_scene(
            n_frames=n, n_points=900, width=W, height=H, fps=fps, seed=11,
            texture="distinct", motion="lateral",
        )
    else:
        scene = synthetic.make_scene(
            n_frames=n, n_points=900, width=W, height=H, fps=fps,
            seed=3 if args.scene == "euroc" else 5,
        )
    print(f"[scene] built in {time.time() - t0:.1f}s; rendering + tracking...")

    mono = args.scene == "mono"
    conf = ConfigFile(
        _write_config(tempfile.mkdtemp(), W, H, fps, nfeat, 2 if mono else 1)
    )
    sys_ = system_mod.VSlamSystem(
        conf, async_ba=True, lm_capacity=1 << 15,
        kf_capacity=256 if args.scene == "loop" else 128,
        loop_closure=args.scene == "loop",
    )
    if mono:
        sys_.tracker.velocity = scene.velocities[0].astype(np.float32)
        bins = datasets.bin_imu_per_frame(scene.imu, scene.times)

    t0 = time.time()
    for f in range(n):
        if mono:
            sys_.track_mono_imu(scene.render(f), imu=bins[f])
        else:
            sys_.track_stereo(scene.render(f), scene.render(f, right=True))
        if (f + 1) % 50 == 0:
            print(f"  frame {f + 1}/{n}  kfs={sys_.world.n_keyframes}")
    sys_.exit()
    wall = time.time() - t0
    if args.global_ba:
        sys_.global_ba()

    poses = sys_.trajectory()
    ate = trajectory.ate_rmse(poses, scene.poses_c2w[: len(poses)], align=False)
    print(
        f"[result] {n} frames in {wall:.1f}s ({n / wall:.1f} fps incl. host "
        f"rendering) | ATE RMSE vs exact GT: {float(ate):.4f} m | "
        f"{sys_.world.n_keyframes} keyframes, {sys_.world.n_landmarks} landmarks"
        + (
            f" | loop closures: {sys_.loop_closer.closures}"
            if sys_.loop_closer is not None
            else ""
        )
    )
    if args.viz:
        from vslam_tpu.utils import viz

        viz.export_html(
            args.viz, sys_.world, poses, active_ids=sys_.tracker.active_ids
        )
        print(f"[viz] -> {args.viz}")


if __name__ == "__main__":
    main()
