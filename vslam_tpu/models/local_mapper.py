"""Local mapping backend: window assembly, 2-round local BA, write-back.

Replaces reference LocalMapper (include/OptimizationBA.h:32-90,
src/OptimizationBA.cpp): the 20 ms polling thread + mutex protocol
(955-982) becomes an explicit call on map snapshots — the tracker hands
over a KF slot, the mapper assembles the covisibility window
(lastKF + <= 10 covisible, 963-967), runs the Schur-complement LM
(vslam_tpu/ops/schur.py) for 5 iterations, sweeps chi-squared outliers
(788-871), runs 10 more iterations, and scatters results back
(875-938). The caller may run it synchronously per KF or on a background
thread (device execution is async either way; see models/system.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.models import map_state
from vslam_tpu.ops import extract, schur

WINDOW = 12  # last KF + <=10 covisible + 1 pad (static shape)
LM_SLOTS = 4096  # landmark slots per BA problem (static shape)


@dataclasses.dataclass
class LocalMapperConfig:
    max_covisible: int = 10  # reference window size
    min_covis_weight: int = 15
    iters_round1: int = 5  # reference src/OptimizationBA.cpp:772-777
    iters_round2: int = 10
    n_levels: int = 8
    scale: float = 1.2


class LocalMapper:
    def __init__(self, world: map_state.WorldMap, K, baseline, config: LocalMapperConfig | None = None):
        self.world = world
        self.K = jnp.asarray(K, jnp.float32)
        self.baseline = jnp.float32(baseline)
        self.cfg = config or LocalMapperConfig()
        self.ba_count = 0

    # ------------------------------------------------------------------
    def _assemble(self, kf_slot: int):
        """Build a fixed-shape BAProblem for the covisibility window of
        `kf_slot`. Returns (problem, window_slots, local_lm_ids)."""
        w = self.world
        cfg = self.cfg
        covis = w.covisible_kfs(kf_slot, cfg.max_covisible, cfg.min_covis_weight)
        window = np.unique(np.concatenate([[kf_slot], covis])).astype(np.int64)
        window = np.sort(window)[-WINDOW:]  # temporal order; newest kept
        Wb = WINDOW
        pad_w = Wb - len(window)
        kf_slots = np.concatenate([window, np.zeros(pad_w, np.int64)])
        kf_valid = np.concatenate([np.ones(len(window), bool), np.zeros(pad_w, bool)])

        # gauge: oldest window KF fixed; also KF 0 whenever present
        fixed = np.zeros(Wb, bool)
        fixed[0] = True
        if 0 in window:
            fixed[np.where(window == 0)[0][0]] = True
        # if the window has only one valid KF something is off; fix it all
        if len(window) < 2:
            fixed[: len(window)] = True

        # landmarks observed by the window (host mirror)
        obs_tbl = w.kf_obs_lm[window]  # (wn, K)
        ids = np.unique(obs_tbl[obs_tbl >= 0])
        ids = ids[:LM_SLOTS]
        pad_l = LM_SLOTS - len(ids)
        lm_ids = np.concatenate([ids, np.zeros(pad_l, np.int64)])
        lm_valid = np.concatenate([np.ones(len(ids), bool), np.zeros(pad_l, bool)])

        # observation table -> local indices
        K_keys = w.keys_per_kf
        obs_kf = np.repeat(np.arange(Wb, dtype=np.int32), K_keys)
        flat = np.concatenate(
            [obs_tbl, np.full((pad_w, K_keys), -1, np.int64)]
        ).reshape(-1)
        if len(ids):
            local = np.searchsorted(ids, flat.clip(0))
            local = np.clip(local, 0, len(ids) - 1)
            hit = (flat >= 0) & (ids[local] == flat.clip(0))
        else:
            local = np.zeros_like(flat)
            hit = np.zeros(flat.shape, bool)
        obs_lm = np.where(hit, local, 0).astype(np.int32)
        obs_valid = hit

        m = w.arrays
        kf_slots_dev = jnp.asarray(kf_slots, jnp.int32)
        lm_ids_dev = jnp.asarray(lm_ids, jnp.int32)

        poses = m.kf_pose[kf_slots_dev]
        pts = m.lm_pos[lm_ids_dev]
        obs_uv = m.obs_uv[kf_slots_dev].reshape(-1, 3)
        obs_oct = m.obs_oct[kf_slots_dev].reshape(-1)
        obs_stereo = m.obs_stereo[kf_slots_dev].reshape(-1)
        obs_w = jnp.sqrt(extract.inv_sigma2(obs_oct, cfg.n_levels, cfg.scale))

        # odometry chain between consecutive window KFs (reference 750-768)
        poses_host = w.kf_poses_host[kf_slots.clip(0)]
        odo_rel = np.stack(
            [
                np.linalg.inv(poses_host[i]) @ poses_host[i + 1]
                for i in range(Wb - 1)
            ]
        ).astype(np.float32)
        odo_valid = kf_valid[:-1] & kf_valid[1:]

        p = schur.BAProblem(
            poses=poses,
            fixed=jnp.asarray(fixed),
            pose_valid=jnp.asarray(kf_valid),
            pts=pts,
            pt_valid=jnp.asarray(lm_valid),
            obs_kf=jnp.asarray(obs_kf),
            obs_lm=jnp.asarray(obs_lm),
            obs_uv=obs_uv,
            obs_stereo=obs_stereo,
            obs_w=obs_w,
            obs_valid=jnp.asarray(obs_valid),
            K=self.K,
            baseline=self.baseline,
            odo_rel=jnp.asarray(odo_rel),
            odo_valid=jnp.asarray(odo_valid),
        )
        return p, kf_slots, kf_valid, lm_ids, lm_valid

    # ------------------------------------------------------------------
    def run(self, kf_slot: int) -> dict:
        """Full local BA for the window around `kf_slot`; writes results
        into the map. Returns re-anchoring info for the tracker."""
        w = self.world
        cfg = self.cfg
        p, kf_slots, kf_valid, lm_ids, lm_valid = self._assemble(kf_slot)

        old_last_pose = w.kf_poses_host[kf_slot].copy()

        # round 1 -> chi2 sweep -> round 2 (reference 543-873)
        p1, _, _ = schur.local_ba(p, iters=cfg.iters_round1)
        chi2 = schur.obs_chi2(p1)
        keep = p1.obs_valid & (chi2 < schur.CHI2_THR)
        p1 = p1._replace(obs_valid=keep)
        p2, err, _ = schur.local_ba(p1, iters=cfg.iters_round2)
        chi2_final = schur.obs_chi2(p2)
        kill = p2.obs_valid & (chi2_final >= schur.CHI2_THR)

        # ---- write back (snapshot scatter; reference 875-938) ----
        K_keys = w.keys_per_kf
        obs_kill_kf = jnp.asarray(kf_slots, jnp.int32)[p2.obs_kf]
        obs_kill_key = jnp.asarray(
            np.tile(np.arange(K_keys, dtype=np.int32), WINDOW)
        )
        w.arrays = map_state.writeback_ba(
            w.arrays,
            jnp.asarray(kf_slots, jnp.int32),
            jnp.asarray(kf_valid),
            p2.poses,
            jnp.asarray(lm_ids, jnp.int32),
            jnp.asarray(lm_valid),
            p2.pts,
            obs_kill_kf,
            obs_kill_key,
            kill,
        )
        # host mirrors
        new_poses = np.asarray(p2.poses)
        for i, (slot, v) in enumerate(zip(kf_slots, kf_valid)):
            if v:
                w.kf_poses_host[slot] = new_poses[i]
        kill_host = np.asarray(kill)
        if kill_host.any():
            kkf = np.asarray(obs_kill_kf)[kill_host]
            kkey = np.asarray(obs_kill_key)[kill_host]
            w.kf_obs_lm[kkf, kkey] = -1
        self.ba_count += 1

        return {
            "kf_slot": kf_slot,
            "old_pose": old_last_pose,
            "new_pose": w.kf_poses_host[kf_slot].copy(),
            "error": float(err),
            "n_killed": int(kill_host.sum()),
            "window": kf_slots[kf_valid].tolist(),
        }
