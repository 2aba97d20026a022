"""Per-frame active-set forensics (flush-per-frame, no BA)."""

import numpy as np


def main():
    import jax.numpy as jnp

    from vslam_tpu.models import map_state, tracker
    from vslam_tpu.utils import synthetic

    n_frames = 24
    scene = synthetic.make_scene(
        n_frames=n_frames, n_points=900, width=752, height=480, fps=20.0, seed=3
    )
    params = tracker.TrackerParams(n_features=1024, n_levels=8, active_size=4096)
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=128, keys_per_kf=1024)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    K = scene.K

    for f in range(n_frames):
        trk.track(scene.render(f).astype(np.uint8), scene.render(f, right=True).astype(np.uint8))
        trk.flush()
        s = trk.last_stats
        ids = trk.active_ids
        n_ids = int((ids >= 0).sum())
        lm_pos = np.asarray(world.arrays.lm_pos)
        lm_valid = np.asarray(world.arrays.lm_valid)
        sel = ids[ids >= 0]
        vmask = lm_valid[sel]
        pos = lm_pos[sel]
        Tcw = np.linalg.inv(trk.pose)
        pc = pos @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = K[0, 0] * pc[:, 0] / z + K[0, 2]
            v = K[1, 1] * pc[:, 1] / z + K[1, 2]
        infr = (z > 0) & (u >= 0) & (u < 752) & (v >= 0) & (v < 480)
        aged = int((trk.miss_age[ids >= 0] > params.outlier_age).sum())
        # state-cache consistency: active pos in device state vs world
        st_active = trk._state["active"]
        st_ids = np.asarray(st_active["ids"])
        st_pos = np.asarray(st_active["pos"])
        st_valid = np.asarray(st_active["valid"])
        sv = st_ids >= 0
        drift = 0.0
        if sv.any():
            drift = float(np.abs(st_pos[sv] - lm_pos[st_ids[sv]]).max())
        # ground-truth check: distance of active landmarks to nearest true point
        d = np.linalg.norm(pos[vmask][:, None, :] - scene.points_w[None], axis=-1)
        med_lm_err = float(np.median(d.min(axis=1))) if vmask.any() else -1
        print(
            f"f={f:3d} kf={len(trk.new_kf_slots)} m={s.get('n_matched',0):4d} "
            f"inl={s.get('n_inliers',0):4d} ids={n_ids:4d} valid={int(vmask.sum()):4d} "
            f"infr={int(infr.sum()):4d} aged={aged:3d} cache_drift={drift:.2e} "
            f"lm_err={med_lm_err:.3f} stvalid={int(st_valid.sum()):4d}"
        )


if __name__ == "__main__":
    main()
