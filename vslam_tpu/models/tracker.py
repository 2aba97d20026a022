"""Per-frame tracking frontend (stereo and stereo-inertial).

TPU-native re-design of reference FeatureTracker::TrackImage
(src/FeatureTracker.cpp:1108-1278). The per-frame pipeline is three fused
device programs (extraction+stereo matching; projection matching + motion-
only LM; keyframe data preparation), with host control flow only for the
adaptive-radius retry loop (1191-1233), the keyframe policy (1261-1267),
and slot allocation. The map is a functional SoA (models/map_state.py);
there are no mutexes — BA runs on a snapshot and writes back via scatter.

Contracts kept (SURVEY.md §2 row 9 constants):
- adaptive match radius 10 -> +30 (<= 3 retries), first frame 120,
  refine pass radius 4,
- chi2 outlier threshold 7.815 with per-octave information,
- KF policy: nStereo < 80, or every 5th frame with tracked-ratio < 0.9
  (0.7 when > 350 keys), min inliers 50,
- <= 100 new close-stereo landmarks per KF (maxAddedStereo? spawn budget),
- constant-velocity next-pose prediction (updatePoses, 1699-1708),
- landmark outlier aging after 20 missed frames (setActiveOutliers,
  1016-1034),
- BA-result re-anchoring of the current pose (changePosesLCA, 884-908).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.geometry import se3
from vslam_tpu.models import map_state
from vslam_tpu.ops import extract, lm, project_match, stereo_match


@dataclasses.dataclass
class TrackerParams:
    n_features: int = 2048
    n_levels: int = 8
    scale: float = 1.2
    fast_hi: float = 20.0
    fast_lo: float = 7.0
    edge_margin: int = 19
    active_size: int = 4096
    spawn_per_kf: int = 256
    max_spawn_close: int = 100  # reference maxAddedStereo budget per KF
    radius_schedule: tuple = (10.0, 40.0, 70.0, 100.0)
    first_frame_radius: float = 120.0
    refine_radius: float = 4.0
    desc_thr: float = 100.0
    ratio: float = 0.8
    min_inliers: int = 50
    kf_min_stereo: int = 80
    kf_every: int = 5
    kf_tracked_ratio: float = 0.9
    kf_tracked_ratio_many: float = 0.7
    many_keys: int = 350
    outlier_age: int = 20
    close_factor: float = 40.0


@functools.partial(jax.jit, static_argnames=("params_static",))
def _frontend(left, right, fx, baseline, scale_factors, params_static):
    """Extraction on both images + stereo matching — one fused program."""
    nf, nl, sc, hi, lo, edge, close_factor = params_static
    kl = extract.extract(
        left, n_levels=nl, scale=sc, total=nf, edge_margin=edge, fast_hi=hi, fast_lo=lo
    )
    kr = extract.extract(
        right, n_levels=nl, scale=sc, total=nf, edge_margin=edge, fast_hi=hi, fast_lo=lo
    )
    st = stereo_match.match_stereo(
        left,
        right,
        kl.xy,
        kl.octave,
        kl.desc,
        kl.valid,
        kr.xy,
        kr.octave,
        kr.desc,
        kr.valid,
        fx,
        baseline,
        scale_factors,
        close_factor=close_factor,
    )
    return kl, st


@functools.partial(jax.jit, static_argnames=("width", "height", "n_levels"))
def _match_and_solve(
    T_pred,
    active,
    keys: extract.Keys,
    st_depth,
    st_right_x,
    st_matched,
    radius,
    desc_thr,
    ratio,
    K,
    baseline,
    scale_factors,
    width: int,
    height: int,
    n_levels: int,
):
    """Projection matching at `radius` + motion-only LM. Returns
    (T_opt, match_idx (A,), inliers (A,), n_matched, n_inliers)."""
    proj = project_match.predict_and_cull(
        T_pred,
        active["pos"],
        active["valid"],
        K,
        baseline,
        width,
        height,
        active["maxdist"],
        active["mindist"],
        n_levels=n_levels,
    )
    midx, mdist = project_match.match_by_projection(
        proj["pred_l"],
        proj["pred_oct"],
        active["desc"],
        active["valid"] & proj["in_l"],
        keys.xy,
        keys.octave,
        keys.desc,
        keys.valid,
        radius,
        scale_factors,
        desc_thr,
        ratio,
    )
    matched = midx >= 0
    safe = jnp.where(matched, midx, 0)
    # observations: left pixel always; right-x when the key has a stereo match
    obs_u = keys.xy[safe, 0]
    obs_v = keys.xy[safe, 1]
    obs_ur = st_right_x[safe]
    is_stereo = matched & st_matched[safe]
    obs = jnp.stack([obs_u, obs_v, obs_ur], axis=-1)
    w = extract.inv_sigma2(keys.octave[safe], n_levels)
    T_opt, chi2, inl, res = lm.motion_only_ba(
        T_pred,
        active["pos"],
        obs,
        w,
        is_stereo,
        jnp.zeros_like(matched),
        matched,
        K,
        baseline,
    )
    inliers = matched & inl
    return (
        T_opt,
        midx,
        inliers,
        jnp.sum(matched),
        jnp.sum(inliers),
        jnp.sum(is_stereo & inliers),
        chi2,
    )


@functools.partial(jax.jit, static_argnames=("spawn", "n_levels", "scale"))
def _prepare_keyframe(
    T_kf,
    keys: extract.Keys,
    st_depth,
    st_right_x,
    st_matched,
    st_close,
    match_idx,  # (A,) per-active-landmark key index or -1
    inliers,  # (A,)
    active_ids,  # (A,) global landmark slots
    spawn_slots,  # (spawn,) preallocated global slots
    K,
    spawn: int,
    n_levels: int,
    scale: float,
):
    """Build the KF observation table + spawn new close-stereo landmarks
    (reference insertKeyFrame, src/FeatureTracker.cpp:743-842)."""
    N = keys.xy.shape[0]
    # per-key landmark id from per-landmark match idx
    key_lm = jnp.full((N,), -1, jnp.int32)
    ok = (match_idx >= 0) & inliers
    tgt = jnp.where(ok, match_idx, N)  # out-of-range drops
    key_lm = jnp.zeros((N + 1,), jnp.int32).at[:].set(-1).at[tgt].set(
        jnp.where(ok, active_ids, -1)
    )[:N]

    # spawn candidates: close stereo keys not matched to a landmark
    cand = keys.valid & st_close & (key_lm < 0)
    order = jnp.argsort(jnp.where(cand, st_depth, jnp.inf))
    take = order[:spawn]
    take_valid = cand[take]
    # cap to the reference's per-KF budget by rank
    rank = jnp.cumsum(take_valid.astype(jnp.int32)) - 1
    take_valid = take_valid & (rank < spawn)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    kxy = keys.xy[take]
    kz = st_depth[take]
    x = (kxy[:, 0] - cx) / fx * kz
    y = (kxy[:, 1] - cy) / fy * kz
    pc = jnp.stack([x, y, kz], axis=-1)
    pw = se3.transform_points(T_kf, pc)
    dist = jnp.linalg.norm(pc, axis=-1)
    sf = scale ** keys.octave[take].astype(jnp.float32)
    maxdist = dist * sf
    mindist = maxdist / (scale ** (n_levels - 1))
    new_desc = keys.desc[take]

    # write spawned ids into the key->lm table so the KF observes them
    key_lm = key_lm.at[jnp.where(take_valid, take, N)].set(
        jnp.where(take_valid, spawn_slots, -1), mode="drop"
    )

    obs_uv = jnp.stack([keys.xy[:, 0], keys.xy[:, 1], st_right_x], axis=-1)
    return {
        "key_lm": key_lm,
        "obs_uv": obs_uv,
        "obs_oct": keys.octave,
        "obs_stereo": st_matched & keys.valid,
        "spawn_pos": pw,
        "spawn_desc": new_desc,
        "spawn_maxdist": maxdist,
        "spawn_mindist": mindist,
        "spawn_valid": take_valid,
        "n_close": jnp.sum(st_close & keys.valid),
    }


class StereoTracker:
    """Host orchestration of the per-frame loop (reference TrackImage)."""

    def __init__(
        self,
        K: np.ndarray,
        baseline: float,
        width: int,
        height: int,
        world: map_state.WorldMap,
        params: TrackerParams | None = None,
    ):
        self.params = params or TrackerParams()
        self.K = jnp.asarray(K, jnp.float32)
        self.baseline = jnp.float32(baseline)
        self.width = width
        self.height = height
        self.world = world
        p = self.params
        self.scale_factors = jnp.asarray(extract.scale_factors(p.n_levels, p.scale))
        self._static = (
            p.n_features,
            p.n_levels,
            p.scale,
            p.fast_hi,
            p.fast_lo,
            p.edge_margin,
            p.close_factor,
        )

        self.frame_idx = 0
        self.pose = np.eye(4, dtype=np.float32)  # current cam-to-world
        self.prev_pose = np.eye(4, dtype=np.float32)
        self.pred_pose = np.eye(4, dtype=np.float32)
        self.last_kf_tracked = 0
        self.last_kf_frame = 0
        self.last_kf_slot = -1
        # host active-set bookkeeping
        self.active_ids = np.full(p.active_size, -1, np.int64)
        self.miss_age = np.zeros(p.active_size, np.int64)
        # per-frame trajectory: (ref KF slot, relative pose) records
        self.frame_records: list[tuple[int, np.ndarray]] = []
        self.new_kf_slots: list[int] = []

    # ------------------------------------------------------------------
    def _active_gather(self):
        ids = jnp.asarray(self.active_ids, jnp.int32)
        return map_state.gather_active(
            self.world.arrays, ids, self.params.active_size
        )

    def _refresh_active(self, new_ids: np.ndarray):
        """Merge newly-observed landmark ids into the active set, dropping
        the oldest-missed first (reference activeMapPoints maintenance)."""
        cur = self.active_ids
        keep = cur[(cur >= 0) & (self.miss_age[: len(cur)] <= self.params.outlier_age)]
        merged = np.unique(np.concatenate([keep, new_ids[new_ids >= 0]]))
        A = self.params.active_size
        if len(merged) > A:
            merged = merged[-A:]  # prefer newest ids
        out = np.full(A, -1, np.int64)
        out[: len(merged)] = merged
        # reset ages for the new layout
        new_age = np.zeros(A, np.int64)
        self.active_ids = out
        self.miss_age = new_age

    # ------------------------------------------------------------------
    def track(self, left: np.ndarray, right: np.ndarray, imu: np.ndarray | None = None):
        """Process one rectified stereo pair; returns the cam-to-world pose."""
        p = self.params
        L = jnp.asarray(left, jnp.float32)
        R = jnp.asarray(right, jnp.float32)
        keys, st = _frontend(
            L, R, self.K[0, 0], self.baseline, self.scale_factors, self._static
        )

        if self.frame_idx == 0:
            self._initialize_map(keys, st)
            self.frame_idx += 1
            return self.pose.copy()

        T_pred = jnp.asarray(self.pred_pose)
        active = self._active_gather()

        schedule = (
            [p.first_frame_radius]
            if self.frame_idx == 1
            else list(p.radius_schedule)
        )
        T_opt = T_pred
        midx = inl = None
        n_inl = 0
        for radius in schedule:
            T_opt, midx, inl, n_m, n_i, n_st, chi2 = _match_and_solve(
                T_pred,
                active,
                keys,
                st["depth"],
                st["est_right_x"],
                st["matched"],
                jnp.float32(radius),
                jnp.float32(p.desc_thr),
                jnp.float32(p.ratio),
                self.K,
                self.baseline,
                self.scale_factors,
                self.width,
                self.height,
                p.n_levels,
            )
            n_inl = int(n_i)
            if n_inl >= p.min_inliers:
                break
        # refine pass at radius 4 from the optimized pose (reference 1236-1241)
        T_opt, midx, inl, n_m, n_i, n_st, chi2 = _match_and_solve(
            T_opt,
            active,
            keys,
            st["depth"],
            st["est_right_x"],
            st["matched"],
            jnp.float32(p.refine_radius),
            jnp.float32(p.desc_thr),
            jnp.float32(p.ratio),
            self.K,
            self.baseline,
            self.scale_factors,
            self.width,
            self.height,
            p.n_levels,
        )
        n_inl = int(n_i)
        n_stereo_inl = int(n_st)

        self.prev_pose = self.pose
        self.pose = np.asarray(T_opt)

        # outlier aging on the active set
        inl_host = np.asarray(inl)
        matched_host = np.asarray(midx) >= 0
        self.miss_age[~inl_host] += 1
        self.miss_age[inl_host] = 0

        # ---- keyframe policy (reference 1261-1267) ----
        n_keys = int(jnp.sum(keys.valid))
        ratio_thr = (
            p.kf_tracked_ratio_many if n_keys > p.many_keys else p.kf_tracked_ratio
        )
        is_kf = (
            n_stereo_inl < p.kf_min_stereo
            or (
                self.frame_idx - self.last_kf_frame >= p.kf_every
                and n_inl < ratio_thr * max(self.last_kf_tracked, 1)
            )
        ) and n_inl >= p.min_inliers // 2
        if is_kf:
            self._insert_keyframe(keys, st, midx, inl, T_opt)
            self.last_kf_tracked = n_inl
            self.last_kf_frame = self.frame_idx
        else:
            # non-KF record: pose relative to the last KF (reference addFrame)
            ref = self.world.kf_poses_host[self.last_kf_slot]
            rel = np.linalg.inv(ref) @ self.pose
            self.frame_records.append((self.last_kf_slot, rel.astype(np.float32)))

        # constant-velocity prediction (reference updatePoses, 1699-1708)
        vel = self.pose @ np.linalg.inv(self.prev_pose)
        self.pred_pose = (vel @ self.pose).astype(np.float32)

        self.frame_idx += 1
        return self.pose.copy()

    # ------------------------------------------------------------------
    def _initialize_map(self, keys, st):
        """Frame 0: seed landmarks from stereo depth (reference
        initializeMap, src/FeatureTracker.cpp:72-123)."""
        p = self.params
        kf_slot = self.world.alloc_keyframe(0)
        spawn_dev, avail = self._alloc_spawn(p.n_features)

        data = _prepare_keyframe(
            jnp.asarray(self.pose),
            keys,
            st["depth"],
            st["est_right_x"],
            st["matched"],
            st["matched"],  # at init every stereo match seeds a landmark
            jnp.full((p.active_size,), -1, jnp.int32),
            jnp.zeros((p.active_size,), bool),
            jnp.full((p.active_size,), -1, jnp.int32),
            spawn_dev,
            self.K,
            spawn=p.n_features,
            n_levels=p.n_levels,
            scale=p.scale,
        )
        self._commit_keyframe(kf_slot, jnp.asarray(self.pose), keys, data, spawn_dev, avail)
        self.last_kf_tracked = int(jnp.sum(data["spawn_valid"]))
        self.last_kf_frame = 0

    def _insert_keyframe(self, keys, st, midx, inl, T_opt):
        p = self.params
        kf_slot = self.world.alloc_keyframe(self.frame_idx)
        spawn_dev, avail = self._alloc_spawn(p.spawn_per_kf)
        data = _prepare_keyframe(
            T_opt,
            keys,
            st["depth"],
            st["est_right_x"],
            st["matched"],
            st["close"],
            midx,
            inl,
            jnp.asarray(self.active_ids, jnp.int32),
            spawn_dev,
            self.K,
            spawn=p.spawn_per_kf,
            n_levels=p.n_levels,
            scale=p.scale,
        )
        self._commit_keyframe(kf_slot, T_opt, keys, data, spawn_dev, avail)

    def _alloc_spawn(self, count: int):
        """Reserve `count` landmark slots; returns (slots_dev (count,),
        avail_dev (count,) bool) padded for fixed shapes."""
        slots = self.world.alloc_landmarks(count)
        pad = count - len(slots)
        slots_dev = jnp.asarray(
            np.concatenate([slots, np.zeros(pad, np.int32)]), jnp.int32
        )
        avail = jnp.asarray(np.arange(count) < len(slots))
        return slots_dev, avail

    def _commit_keyframe(self, kf_slot, T_kf, keys, data, spawn_dev, avail):
        w = self.world
        w.arrays = map_state.scatter_landmarks(
            w.arrays,
            spawn_dev,
            data["spawn_pos"],
            data["spawn_desc"],
            data["spawn_maxdist"],
            data["spawn_mindist"],
            data["spawn_valid"] & avail,
        )
        w.arrays = map_state.scatter_keyframe(
            w.arrays,
            jnp.asarray(kf_slot, jnp.int32),
            T_kf,
            data["obs_uv"],
            data["obs_oct"],
            data["obs_stereo"],
            data["key_lm"],
        )
        # host mirrors
        key_lm_host = np.asarray(data["key_lm"])
        w.kf_obs_lm[kf_slot] = key_lm_host
        w.kf_poses_host[kf_slot] = np.asarray(T_kf)
        self.frame_records.append((kf_slot, np.eye(4, dtype=np.float32)))
        self.new_kf_slots.append(kf_slot)
        self.last_kf_slot = kf_slot
        # refresh active set with everything this KF observes
        self._refresh_active(key_lm_host[key_lm_host >= 0])

    # ------------------------------------------------------------------
    def reanchor(self, kf_slot: int, old_pose: np.ndarray, new_pose: np.ndarray):
        """Re-anchor the current tracking pose after an async BA update
        (reference changePosesLCA, src/FeatureTracker.cpp:884-908)."""
        delta = new_pose @ np.linalg.inv(old_pose)
        self.pose = (delta @ self.pose).astype(np.float32)
        self.pred_pose = (delta @ self.pred_pose).astype(np.float32)

    def trajectory(self) -> np.ndarray:
        """(F, 4, 4) per-frame poses recomposed as closeKF.pose * relative
        (reference saveTrajectoryAndPosition, src/System.cpp:99-107)."""
        out = []
        for kf_slot, rel in self.frame_records:
            out.append(self.world.kf_poses_host[kf_slot] @ rel)
        return np.stack(out) if out else np.zeros((0, 4, 4), np.float32)
