"""Per-frame prediction/solve forensics (flush mode, no BA)."""
import numpy as np

def main():
    from vslam_tpu.models import map_state, tracker
    from vslam_tpu.utils import synthetic

    n_frames = 20
    scene = synthetic.make_scene(n_frames=n_frames, n_points=900, width=752, height=480, fps=20.0, seed=3)
    params = tracker.TrackerParams(n_features=1024, n_levels=8, active_size=4096)
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=128, keys_per_kf=1024)
    trk = tracker.StereoTracker(scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params)

    prev_rec = None
    for f in range(n_frames):
        trk.track(scene.render(f).astype(np.uint8), scene.render(f, right=True).astype(np.uint8))
        # peek at the pending rec BEFORE flush to grab device outputs
        if trk._pending:
            _, outputs, _, _ = trk._pending[-1]
            Tp = np.asarray(outputs["T_pred"])
            To = np.asarray(outputs["T"])
        trk.flush()
        gt = scene.poses_c2w[f]
        pred_err = np.linalg.norm(Tp[:3, 3] - gt[:3, 3]) if f > 0 else 0
        opt_err = np.linalg.norm(To[:3, 3] - gt[:3, 3]) if f > 0 else 0
        corr = np.linalg.norm(To[:3, 3] - Tp[:3, 3]) if f > 0 else 0
        s = trk.last_stats
        print(f"f={f:3d} kf={len(trk.new_kf_slots)} inl={s.get('n_inliers',0):4d} "
              f"pred_err={pred_err:7.3f} opt_err={opt_err:7.3f} |opt-pred|={corr:7.3f}")

if __name__ == "__main__":
    main()
