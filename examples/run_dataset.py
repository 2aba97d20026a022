"""Dataset CLI driver — the VIOSlam/VIOSlamMono equivalent.

Usage:
    python examples/run_dataset.py <config.yaml> [--data-root DIR]
        [--limit N] [--out traj.txt] [--async-ba]

Mirrors the reference drivers (src/VIOSlam.cpp:141-329,
src/VIOSlamMono.cpp:112-275): loads the YAML config, enumerates the
dataset (KITTI image_0/image_1 dirs or EuRoC mav0 CSVs), parses and bins
IMU samples per frame, rectifies when the config says so (on device), runs
the frame loop, and dumps the trajectory in the reference's KITTI 3x4
format (plus TUM format for EuRoC evaluation). SIGINT finishes cleanly
and still writes the trajectory (the reference's signal flag,
src/VIOSlam.cpp:17-21).
"""

import argparse
import signal
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from vslam_tpu.models.system import VSlamSystem
from vslam_tpu.utils.config import ConfigFile, SlamMode
from vslam_tpu.utils.datasets import open_dataset

_stop = False


def _sigint(_sig, _frm):
    global _stop
    _stop = True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out", default="trajectory.txt")
    ap.add_argument("--async-ba", action="store_true")
    args = ap.parse_args()

    conf = ConfigFile(args.config)
    system = VSlamSystem(conf, async_ba=args.async_ba)
    ds = open_dataset(conf, args.data_root)
    print(f"mode={system.mode.name} frames={len(ds)} rig={system.rig.width}x{system.rig.height}")

    signal.signal(signal.SIGINT, _sigint)
    times = []
    t0 = time.time()
    n = 0
    mono = system.mode in (SlamMode.MONOCULAR, SlamMode.MONO_IMU)
    for frame in ds.frames(args.limit):
        if _stop:
            break
        if mono:
            system.track_mono_imu(frame.left, imu=frame.imu)
        else:
            system.track_stereo(frame.left, frame.right, imu=frame.imu)
        times.append(frame.t)
        n += 1
        if n % 50 == 0:
            fps = n / (time.time() - t0)
            print(f"frame {n}  {fps:.1f} fps  kfs={system.world.n_keyframes} lms={system.world.n_landmarks}")

    system.exit()
    system.save_trajectory(args.out, np.asarray(times))
    wall = time.time() - t0
    print(f"done: {n} frames in {wall:.1f}s ({n/max(wall,1e-9):.1f} fps) -> {args.out}")


if __name__ == "__main__":
    sys.exit(main())
