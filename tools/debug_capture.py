"""Capture per-frame solver inputs around the failure point, then offline
cross-solve: from prediction init vs from GROUND-TRUTH init, on the SAME
match set, and with re-matching at the GT pose. Pinpoints whether the drift
is (a) solver basin, (b) biased landmark positions, or (c) prediction-
dependent matching."""

import os
import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vslam_tpu.geometry import se3
    from vslam_tpu.models import local_mapper, map_state, tracker
    from vslam_tpu.ops import extract, lm, project_match
    from vslam_tpu.utils import synthetic

    scene = synthetic.make_scene(
        n_frames=40, n_points=900, width=752, height=480, fps=20.0, seed=3
    )
    params = tracker.TrackerParams(
        n_features=1024, n_levels=8, active_size=4096, pipeline_depth=0
    )
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=128, keys_per_kf=1024)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)
    K = jnp.asarray(scene.K, jnp.float32)
    sf = trk.scale_factors

    def cross_solve(f):
        """Re-run matching+solve for frame f outside the fused program."""
        gt = scene.poses_c2w[f].astype(np.float32)
        # exact prediction the tracker would use
        vel = trk.pose @ np.linalg.inv(trk.prev_pose)
        T_pred = (vel @ trk.pose).astype(np.float32)
        active = trk._gather_active_dev()
        keysb = extract.extract_batch(
            jnp.asarray(
                np.stack([scene.render(f), scene.render(f, right=True)]), jnp.float32
            ),
            n_levels=8, scale=1.2, total=1024, edge_margin=19,
            fast_hi=20.0, fast_lo=7.0,
        )
        kl = jax.tree.map(lambda a: a[0], keysb)
        from vslam_tpu.ops import stereo_match
        st = stereo_match.match_stereo(
            jnp.asarray(scene.render(f), jnp.float32),
            jnp.asarray(scene.render(f, right=True), jnp.float32),
            kl.xy, kl.octave, kl.desc, kl.valid,
            jax.tree.map(lambda a: a[1], keysb).xy,
            jax.tree.map(lambda a: a[1], keysb).octave,
            jax.tree.map(lambda a: a[1], keysb).desc,
            jax.tree.map(lambda a: a[1], keysb).valid,
            K[0, 0], jnp.float32(scene.baseline), sf, close_factor=40.0,
        )

        def match_and_solve(T_base, radius, label):
            proj = project_match.predict_and_cull(
                jnp.asarray(T_base), active["pos"], active["valid"], K,
                jnp.float32(scene.baseline), scene.width, scene.height,
                active["maxdist"], active["mindist"], n_levels=8,
            )
            midx, _ = project_match.match_by_projection(
                proj["pred_l"], proj["pred_oct"], active["desc"],
                active["valid"] & proj["in_l"],
                kl.xy, kl.octave, kl.desc, kl.valid,
                jnp.float32(radius), sf, jnp.float32(100.0), jnp.float32(0.8),
            )
            matched = midx >= 0
            safe = jnp.where(matched, midx, 0)
            obs = jnp.stack(
                [kl.xy[safe, 0], kl.xy[safe, 1], st["est_right_x"][safe]], axis=-1
            )
            is_st = matched & st["matched"][safe]
            w = extract.inv_sigma2(kl.octave[safe], 8)
            T_opt, chi2, inl, _st, res = lm.motion_only_ba(
                jnp.asarray(T_base), active["pos"], obs, w, is_st,
                jnp.zeros_like(matched), matched, K, jnp.float32(scene.baseline),
            )
            T_opt_np = np.asarray(T_opt)
            e = np.linalg.norm(T_opt_np[:3, 3] - gt[:3, 3]) * 1000
            print(
                f"   {label:26s} m={int(matched.sum()):4d} inl={int(inl.sum()):4d} "
                f"-> err {e:8.1f}mm iters={int(res.iterations)} cost={float(res.error):9.1f}"
            )
            return T_opt_np, np.asarray(midx), np.asarray(inl)

        pe = np.linalg.norm(T_pred[:3, 3] - gt[:3, 3]) * 1000
        print(f" frame {f}: pred err {pe:.1f}mm")
        match_and_solve(T_pred, 10.0, "pred-init, pred-match r10")
        match_and_solve(gt, 10.0, "GT-init,   GT-match  r10")
        T1, _, _ = match_and_solve(T_pred, 10.0, "pred-init (again)")
        # refine pass exactly like production
        match_and_solve(T1, 4.0, "refine from pred-solve r4")

    for f in range(20):
        n_kf = len(trk.new_kf_slots)
        if 14 <= f <= 18:
            cross_solve(f)
        trk.track(scene.render(f).astype(np.uint8), scene.render(f, right=True).astype(np.uint8))
        s = trk.last_stats
        err = np.linalg.norm(trk.pose[:3, 3] - scene.poses_c2w[f][:3, 3])
        print(
            f"f={f:3d} kf={len(trk.new_kf_slots)} m={s.get('n_matched',0):4d} "
            f"inl={s.get('n_inliers',0):4d} err={err*1000:7.1f}mm"
        )
        if len(trk.new_kf_slots) > n_kf and trk.new_kf_slots[-1] > 0:
            r = mapper.run(trk.new_kf_slots[-1])
            trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
            trk.add_active(r["new_lm_ids"])


if __name__ == "__main__":
    main()
