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
from vslam_tpu.ops import extract, imu as imu_ops, lm, project_match, stereo_match


@dataclasses.dataclass
class ImuConfig:
    """IMU noise model + extrinsics (reference IMU YAML block,
    config/config_MH_01.yaml:18-24, and T_bc1 at 112-115)."""

    gyro_noise: float  # rad/s/sqrt(Hz)
    accel_noise: float  # m/s^2/sqrt(Hz)
    gyro_walk: float
    accel_walk: float
    hz: float
    T_bc: np.ndarray  # (4,4) body-to-cam
    gravity_w: np.ndarray  # (3,) world-frame gravity (measured-gravity init,
    #                         reference src/VIOSlam.cpp:274)
    max_samples: int = 64  # static per-frame sample capacity


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
    """Extraction on both images + stereo matching — one fused program.
    Accepts uint8 inputs (4x cheaper host->device upload) and casts on
    device."""
    nf, nl, sc, hi, lo, edge, close_factor = params_static
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
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


@functools.partial(
    jax.jit,
    static_argnames=("params_static", "width", "height", "n_levels", "min_inliers", "mono"),
)
def _track_frame(
    LR,  # (2, H, W) stacked left/right (uint8 ok; cast on device)
    T_pred,
    active,
    radii,  # (R,) adaptive radius schedule (reference 1191-1233)
    refine_radius,
    desc_thr,
    ratio,
    K,
    baseline,
    scale_factors,
    imu_args,  # None, or (samples (S,7), T_prev_wc, v_prev, bias_prev,
    #            gravity_w, T_bc, ImuParams) — enables the visual-inertial
    #            15-dof solve (reference estimatePoseGTSAM IMU branch)
    params_static,
    width: int,
    height: int,
    n_levels: int,
    min_inliers: int,
    mono: bool = False,
):
    """ONE device program for a whole tracked frame: extraction on both
    images, stereo matching, the adaptive-radius projection-match + motion-
    only-LM retry loop (reference src/FeatureTracker.cpp:1191-1233) as a
    lax.while_loop, and the radius-4 refine pass (1236-1241). Keeping the
    retry loop on device removes per-retry host round-trips — the frames/s
    ceiling over a remote TPU link is dispatch latency, not FLOPs.

    mono=True drops the right image + stereo matching (reference
    TrackImageMonoIMU, src/FeatureTracker.cpp:1280-1495): all observations
    become projection-only and landmarks are spawned solely by multi-view
    triangulation in the mapper."""
    nf, nl, sc, hi, lo, edge, close_factor = params_static
    left = LR[0].astype(jnp.float32)
    kl = extract.extract(
        left, n_levels=nl, scale=sc, total=nf, edge_margin=edge, fast_hi=hi, fast_lo=lo
    )
    if mono:
        N = kl.xy.shape[0]
        st = {
            "matched": jnp.zeros((N,), bool),
            "close": jnp.zeros((N,), bool),
            "depth": jnp.zeros((N,), jnp.float32),
            "est_right_x": jnp.full((N,), -1.0, jnp.float32),
        }
    else:
        right = LR[1].astype(jnp.float32)
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
            K[0, 0],
            baseline,
            scale_factors,
            close_factor=close_factor,
        )
    keys = kl

    # IMU prediction + preintegration (reference PredictNextPoseIMU,
    # src/FeatureTracker.cpp:1036-1106): overrides the constant-velocity
    # prediction whenever real samples are present.
    if imu_args is not None:
        (imu_samples, T_prev_wc, v_prev, bias_prev, gravity_w, T_bc, imu_params) = imu_args
        T_cb = se3.inverse(T_bc)
        pre = imu_ops.preintegrate(imu_samples, bias_prev, imu_params)
        T_prev_wb = T_prev_wc @ T_cb
        T_pred_wb, v_pred = imu_ops.predict(
            T_prev_wb, v_prev, pre, bias_prev, bias_prev, gravity_w
        )
        T_pred = jnp.where(pre.dt > 0, T_pred_wb @ T_bc, T_pred)

    def attempt(T_base, v_base, b_base, radius):
        """Projection matching at `radius` + motion-only LM from T_base."""
        proj = project_match.predict_and_cull(
            T_base,
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
        midx, _ = project_match.match_by_projection(
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
        obs = jnp.stack(
            [keys.xy[safe, 0], keys.xy[safe, 1], st["est_right_x"][safe]], axis=-1
        )
        is_stereo = matched & st["matched"][safe]
        w = extract.inv_sigma2(keys.octave[safe], n_levels)
        if imu_args is None:
            T_opt, chi2, inl, _ = lm.motion_only_ba(
                T_base,
                active["pos"],
                obs,
                w,
                is_stereo,
                jnp.zeros_like(matched),
                matched,
                K,
                baseline,
            )
            v_opt, b_opt = v_base, b_base
        else:
            T_opt, v_opt, b_opt, chi2, inl, _ = lm.motion_only_ba_imu(
                T_base,
                v_base,
                bias_prev,
                T_prev_wb,
                v_prev,
                pre,
                gravity_w,
                imu_params,
                T_bc,
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
            v_opt,
            b_opt,
            midx,
            inliers,
            jnp.sum(matched),
            jnp.sum(inliers),
            jnp.sum(is_stereo & inliers),
            active["valid"] & proj["in_l"],
            proj["pred_l"],
        )

    A = active["pos"].shape[0]
    if imu_args is not None:
        v0, b0 = v_pred, bias_prev
    else:
        v0 = jnp.zeros((3,), jnp.float32)
        b0 = jnp.zeros((6,), jnp.float32)
    init = (
        jnp.int32(0),  # schedule index
        T_pred,
        v0,
        b0,
        jnp.full((A,), -1, jnp.int32),  # midx
        jnp.zeros((A,), bool),  # inliers
        jnp.int32(0),  # n_matched
        jnp.int32(0),  # n_inliers
        jnp.int32(0),  # n_stereo_inliers
    )

    def cond(c):
        return (c[0] < radii.shape[0]) & (c[7] < min_inliers)

    def body(c):
        i = c[0]
        T_opt, v_opt, b_opt, midx, inliers, n_m, n_i, n_st, _, _ = attempt(
            T_pred, v0, b0, radii[i]
        )
        return (i + 1, T_opt, v_opt, b_opt, midx, inliers, n_m, n_i, n_st)

    _, T_opt, v_opt, b_opt, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)

    # refine pass at the small radius from the optimized pose
    T_opt, v_opt, b_opt, midx, inliers, n_m, n_i, n_st, in_frame, lm_pred = attempt(
        T_opt, v_opt, b_opt, refine_radius
    )

    stats = jnp.stack(
        [
            n_m,
            n_i,
            n_st,
            jnp.sum(keys.valid).astype(jnp.int32),
            jnp.sum(st["matched"]).astype(jnp.int32),
        ]
    )
    # single host-transfer blob: [midx | inliers | in_frame | stats]
    blob = jnp.concatenate(
        [midx, inliers.astype(jnp.int32), in_frame.astype(jnp.int32), stats]
    )
    return {
        "T": T_opt,
        "v": v_opt,
        "bias": b_opt,
        "keys": keys,
        "st": st,
        "lm_pred": lm_pred,
        "midx": midx,
        "inliers": inliers,
        "in_frame": in_frame,
        "blob": blob,
    }


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
    lm_pred,  # (A, 2) predicted landmark pixels (for spawn suppression)
    lm_in_frame,  # (A,) bool
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

    # spawn candidates: close stereo keys not matched to a landmark AND not
    # within the suppression radius of any predicted in-frame landmark —
    # otherwise every ratio-test near-miss re-spawns a duplicate of an
    # existing landmark and the map degrades into ambiguous clones (the
    # reference is partially protected by its unMatchedF bookkeeping,
    # include/KeyFrame.h:29-30; this is the masked-tensor equivalent).
    diff = keys.xy[:, None, :] - lm_pred[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(lm_in_frame[None, :], d2, jnp.inf)
    near_existing = jnp.min(d2, axis=1) < (8.0 * 8.0)
    cand = keys.valid & st_close & (key_lm < 0) & ~near_existing
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

    # refreshed descriptors for matched inlier landmarks (the reference
    # recomputes a robust median descriptor per observation set,
    # src/Map.cpp:145-210; refreshing to the newest view keeps matching
    # robust under viewpoint/scale drift)
    ok_desc = (match_idx >= 0) & inliers
    desc_src = keys.desc[jnp.where(ok_desc, match_idx, 0)]

    obs_uv = jnp.stack([keys.xy[:, 0], keys.xy[:, 1], st_right_x], axis=-1)
    return {
        "key_lm": key_lm,
        "refresh_ids": jnp.where(ok_desc, active_ids, -1),
        "refresh_desc": desc_src,
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


@functools.partial(jax.jit, static_argnames=("params_static",))
def _frontend_mono(img, params_static):
    """Extraction only (bootstrap frames of the mono pipeline)."""
    nf, nl, sc, hi, lo, edge, _ = params_static
    return extract.extract(
        img.astype(jnp.float32), n_levels=nl, scale=sc, total=nf,
        edge_margin=edge, fast_hi=hi, fast_lo=lo,
    )


@jax.jit
def _imu_predict(samples, T_prev_wc, v_prev, bias_prev, gravity_w, T_bc, imu_params):
    """Host-callable IMU dead-reckoning step (reference PredictNextPoseIMU,
    src/FeatureTracker.cpp:1036-1106). Returns (T_pred_wc, v_pred)."""
    T_cb = se3.inverse(T_bc)
    pre = imu_ops.preintegrate(samples, bias_prev, imu_params)
    T_prev_wb = T_prev_wc @ T_cb
    T_pred_wb, v_pred = imu_ops.predict(
        T_prev_wb, v_prev, pre, bias_prev, bias_prev, gravity_w
    )
    keep = pre.dt > 0
    return jnp.where(keep, T_pred_wb @ T_bc, T_prev_wc), jnp.where(keep, v_pred, v_prev)


def sufficient_motion(T_a: np.ndarray, T_b: np.ndarray, min_baseline: float = 0.1, min_angle_deg: float = 5.0) -> bool:
    """Reference checkSufficientMovement (include/Conversions.h:112-137):
    enough baseline OR rotation between two poses to attempt mono init."""
    d = np.linalg.norm(T_a[:3, 3] - T_b[:3, 3])
    R = T_a[:3, :3].T @ T_b[:3, :3]
    angle = np.degrees(np.arccos(np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)))
    return d > min_baseline or angle > min_angle_deg


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
        imu_cfg: ImuConfig | None = None,
    ):
        self.params = params or TrackerParams()
        self.imu_cfg = imu_cfg
        if imu_cfg is not None:
            self._imu_const = (
                jnp.asarray(imu_cfg.gravity_w, jnp.float32),
                jnp.asarray(imu_cfg.T_bc, jnp.float32),
                imu_ops.ImuParams(
                    gyro_noise=jnp.float32(imu_cfg.gyro_noise),
                    accel_noise=jnp.float32(imu_cfg.accel_noise),
                    gyro_walk=jnp.float32(imu_cfg.gyro_walk),
                    accel_walk=jnp.float32(imu_cfg.accel_walk),
                ),
            )
        self.velocity = np.zeros(3, np.float32)  # world-frame body velocity
        self.bias = np.zeros(6, np.float32)  # [ba, bg]
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
        self._mono = False

    def set_gravity(self, gravity_w: np.ndarray):
        """Install the measured-gravity vector (reference computes it from
        the first accel sample at src/VIOSlam.cpp:274, after construction)."""
        if self.imu_cfg is None:
            return
        self.imu_cfg.gravity_w = np.asarray(gravity_w, np.float32)
        _, T_bc, prm = self._imu_const
        self._imu_const = (jnp.asarray(self.imu_cfg.gravity_w), T_bc, prm)

    # ------------------------------------------------------------------
    def _active_gather(self):
        ids = jnp.asarray(self.active_ids, jnp.int32)
        return map_state.gather_active(
            self.world.arrays, ids, self.params.active_size
        )

    def _refresh_active(self, new_ids: np.ndarray):
        """Merge newly-observed landmark ids into the active set, dropping
        aged-out landmarks (reference activeMapPoints maintenance +
        setActiveOutliers aging). Miss ages are PRESERVED across the merge
        so stale landmarks actually retire after `outlier_age` misses."""
        cur = self.active_ids
        alive = (cur >= 0) & (self.miss_age <= self.params.outlier_age)
        keep = cur[alive]
        keep_age = self.miss_age[alive]
        merged = np.unique(np.concatenate([keep, new_ids[new_ids >= 0]]))
        A = self.params.active_size
        if len(merged) > A:
            merged = merged[-A:]  # prefer newest ids
        out = np.full(A, -1, np.int64)
        out[: len(merged)] = merged
        # carry ages over to the new layout (new ids start at 0)
        new_age = np.zeros(A, np.int64)
        if len(keep):
            order = np.argsort(keep)
            pos = np.searchsorted(merged, keep[order])
            inside = (pos < len(merged)) & (merged[np.clip(pos, 0, len(merged) - 1)] == keep[order])
            new_age[pos[inside]] = keep_age[order][inside]
        self.active_ids = out
        self.miss_age = new_age

    # ------------------------------------------------------------------
    def track(self, left: np.ndarray, right: np.ndarray | None = None, imu: np.ndarray | None = None):
        """Process one rectified stereo pair (or a mono frame when this is a
        MonoTracker); returns the cam-to-world pose."""
        p = self.params
        # one stacked uint8 upload (cast happens on device)
        LR = jnp.asarray(np.stack([left, right]) if right is not None else left[None])

        if self.frame_idx == 0:
            keys, st = _frontend(
                LR[0], LR[1], self.K[0, 0], self.baseline, self.scale_factors, self._static
            )
            self._initialize_map(keys, st)
            self.frame_idx += 1
            return self.pose.copy()

        T_pred = jnp.asarray(self.pred_pose)
        active = self._active_gather()

        # same static length for frame 1 (single wide radius, repeated —
        # while_loop exits once min_inliers is reached)
        n_r = len(p.radius_schedule)
        schedule = (
            [p.first_frame_radius] * n_r
            if self.frame_idx == 1
            else list(p.radius_schedule)
        )
        imu_args = None
        if imu is not None and self.imu_cfg is not None:
            S = self.imu_cfg.max_samples
            samples = np.zeros((S, 7), np.float32)
            rows = np.asarray(imu, np.float32)[:S]
            samples[: len(rows)] = rows  # [dt, gyro, accel]; dt==0 pads are no-ops
            gravity, T_bc, imu_params = self._imu_const
            imu_args = (
                jnp.asarray(samples),
                jnp.asarray(self.pose),  # pose of the PREVIOUS frame at entry
                jnp.asarray(self.velocity),
                jnp.asarray(self.bias),
                gravity,
                T_bc,
                imu_params,
            )
        res = _track_frame(
            LR,
            T_pred,
            active,
            jnp.asarray(schedule, jnp.float32),
            jnp.float32(p.refine_radius),
            jnp.float32(p.desc_thr),
            jnp.float32(p.ratio),
            self.K,
            self.baseline,
            self.scale_factors,
            imu_args,
            self._static,
            self.width,
            self.height,
            p.n_levels,
            p.min_inliers,
            mono=self._mono,
        )
        keys, st = res["keys"], res["st"]
        T_opt, midx, inl, lm_pred, in_frame = (
            res["T"], res["midx"], res["inliers"], res["lm_pred"], res["in_frame"]
        )
        # ONE device->host transfer for all per-frame scalars/masks
        blob = np.asarray(res["blob"])
        A = p.active_size
        inl_host = blob[A : 2 * A].astype(bool)
        in_frame_host = blob[2 * A : 3 * A].astype(bool)
        n_m, n_inl, n_stereo_inl, n_keys, n_stereo_keys = (int(x) for x in blob[3 * A :])
        self.last_stats = {
            "n_matched": n_m,
            "n_inliers": n_inl,
            "n_stereo_inliers": n_stereo_inl,
            "n_keys": n_keys,
            "n_stereo_keys": n_stereo_keys,
        }

        self.prev_pose = self.pose
        self.pose = np.asarray(T_opt)
        if imu_args is not None:
            self.velocity = np.asarray(res["v"])
            self.bias = np.asarray(res["bias"])

        # outlier aging: only landmarks that projected into this frame but
        # were not matched accrue age (reference setActiveOutliers only ages
        # in-frame misses, src/FeatureTracker.cpp:1016-1034)
        self.miss_age[in_frame_host & ~inl_host] += 1
        self.miss_age[inl_host] = 0

        is_kf = self._kf_decision(n_keys, n_inl, n_stereo_inl)
        if is_kf:
            self._insert_keyframe(keys, st, midx, inl, T_opt, lm_pred, in_frame)
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

    def _kf_decision(self, n_keys: int, n_inl: int, n_stereo_inl: int) -> bool:
        """Keyframe policy (reference src/FeatureTracker.cpp:1261-1267)."""
        p = self.params
        ratio_thr = (
            p.kf_tracked_ratio_many if n_keys > p.many_keys else p.kf_tracked_ratio
        )
        return (
            n_stereo_inl < p.kf_min_stereo
            or (
                self.frame_idx - self.last_kf_frame >= p.kf_every
                and n_inl < ratio_thr * max(self.last_kf_tracked, 1)
            )
        ) and n_inl >= p.min_inliers // 2

    # ------------------------------------------------------------------
    def _initialize_map(self, keys, st):
        """Frame 0: seed landmarks from stereo depth (reference
        initializeMap, src/FeatureTracker.cpp:72-123)."""
        p = self.params
        kf_slot = self.world.alloc_keyframe(0)
        spawn_dev, avail, spawn_host = self._alloc_spawn(p.n_features)

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
            jnp.zeros((p.active_size, 2), jnp.float32),
            jnp.zeros((p.active_size,), bool),
            self.K,
            spawn=p.n_features,
            n_levels=p.n_levels,
            scale=p.scale,
        )
        self._commit_keyframe(kf_slot, jnp.asarray(self.pose), keys, data, spawn_dev, avail, spawn_host)
        self.last_kf_tracked = int(jnp.sum(data["spawn_valid"]))
        self.last_kf_frame = 0

    def _insert_keyframe(self, keys, st, midx, inl, T_opt, lm_pred, in_frame):
        p = self.params
        kf_slot = self.world.alloc_keyframe(self.frame_idx)
        spawn_dev, avail, spawn_host = self._alloc_spawn(p.spawn_per_kf)
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
            lm_pred,
            in_frame,
            self.K,
            spawn=p.spawn_per_kf,
            n_levels=p.n_levels,
            scale=p.scale,
        )
        self._commit_keyframe(kf_slot, T_opt, keys, data, spawn_dev, avail, spawn_host)

    def _alloc_spawn(self, count: int):
        """Reserve `count` landmark slots; returns (slots_dev (count,),
        avail_dev (count,) bool, slots_host) padded for fixed shapes."""
        slots = self.world.alloc_landmarks(count)
        pad = count - len(slots)
        slots_dev = jnp.asarray(
            np.concatenate([slots, np.zeros(pad, np.int32)]), jnp.int32
        )
        avail = jnp.asarray(np.arange(count) < len(slots))
        return slots_dev, avail, slots

    def _commit_keyframe(self, kf_slot, T_kf, keys, data, spawn_dev, avail, spawn_host=None):
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
        w.arrays = map_state.refresh_descriptors(
            w.arrays, data["refresh_ids"], data["refresh_desc"]
        )
        w.arrays = map_state.scatter_keyframe(
            w.arrays,
            jnp.asarray(kf_slot, jnp.int32),
            T_kf,
            data["obs_uv"],
            data["obs_oct"],
            data["obs_stereo"],
            data["key_lm"],
            keys.desc,
            keys.valid,
        )
        # host mirrors
        key_lm_host = np.asarray(data["key_lm"])
        w.kf_obs_lm[kf_slot] = key_lm_host
        w.kf_poses_host[kf_slot] = np.asarray(T_kf)
        self.frame_records.append((kf_slot, np.eye(4, dtype=np.float32)))
        self.new_kf_slots.append(kf_slot)
        self.last_kf_slot = kf_slot
        # return the unused tail of the spawn budget to the allocator (the
        # valid spawns are a depth-sorted prefix, so the tail is contiguous)
        if spawn_host is not None:
            n_used = int(np.asarray(jnp.sum(data["spawn_valid"] & avail)))
            w.release_landmarks(spawn_host[n_used:])
        # refresh active set with everything this KF observes
        self._refresh_active(key_lm_host[key_lm_host >= 0])

    def add_active(self, ids: np.ndarray):
        """Merge externally-created landmarks (e.g. local-mapper multi-view
        triangulations) into the tracked active set."""
        if len(ids):
            self._refresh_active(np.asarray(ids, np.int64))

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


class MonoTracker(StereoTracker):
    """Monocular-inertial frontend (reference TrackImageMonoIMU,
    src/FeatureTracker.cpp:1280-1495).

    Bootstrap: the first keyframe anchors the world; subsequent frames
    dead-reckon on IMU until sufficient motion accumulates (reference
    motion gate at 1312 / include/Conversions.h:112-137), collecting 3
    bootstrap keyframes (reference 1315-1330). The caller (VSlamSystem or
    the test loop) then triangulates the initial map via
    LocalMapper.find_new_points(slot, mono=True) — metric scale comes from
    the IMU dead-reckoned keyframe baselines, exactly as the reference's
    bootstrap poses do. Steady state is the shared _track_frame program
    with mono=True (projection-only observations + CombinedImuFactor)."""

    BOOTSTRAP_KFS = 3  # reference src/FeatureTracker.cpp:1315

    def __init__(self, K, width, height, world, params=None, imu_cfg=None):
        super().__init__(
            K, baseline=0.0, width=width, height=height, world=world,
            params=params, imu_cfg=imu_cfg,
        )
        self._mono = True
        self.initialized = False
        self.bootstrap_slots: list[int] = []
        self.needs_init_triangulation = False

    def track(self, left: np.ndarray, right: np.ndarray | None = None, imu: np.ndarray | None = None):
        if self.initialized:
            return super().track(left, None, imu)
        return self._bootstrap(left, imu)

    # ------------------------------------------------------------------
    def _bootstrap(self, left: np.ndarray, imu: np.ndarray | None):
        p = self.params
        # dead-reckon the pose on IMU (reference PredictNextPoseIMU)
        if imu is not None and self.imu_cfg is not None and self.frame_idx > 0:
            S = self.imu_cfg.max_samples
            samples = np.zeros((S, 7), np.float32)
            rows = np.asarray(imu, np.float32)[:S]
            samples[: len(rows)] = rows
            gravity, T_bc, imu_params = self._imu_const
            T_new, v_new = _imu_predict(
                jnp.asarray(samples),
                jnp.asarray(self.pose),
                jnp.asarray(self.velocity),
                jnp.asarray(self.bias),
                gravity,
                T_bc,
                imu_params,
            )
            self.prev_pose = self.pose
            self.pose = np.asarray(T_new)
            self.velocity = np.asarray(v_new)

        take_kf = self.frame_idx == 0 or (
            len(self.bootstrap_slots) < self.BOOTSTRAP_KFS
            and sufficient_motion(
                self.pose, self.world.kf_poses_host[self.bootstrap_slots[-1]]
            )
        )
        if take_kf:
            keys = _frontend_mono(jnp.asarray(left), self._static)
            self._insert_mono_keyframe(keys, jnp.asarray(self.pose))
            self.bootstrap_slots.append(self.last_kf_slot)
            if len(self.bootstrap_slots) >= self.BOOTSTRAP_KFS:
                # caller triangulates the initial map from this window
                self.needs_init_triangulation = True
                self.initialized = True
                self.last_kf_frame = self.frame_idx
        else:
            ref = self.world.kf_poses_host[self.last_kf_slot]
            rel = np.linalg.inv(ref) @ self.pose
            self.frame_records.append((self.last_kf_slot, rel.astype(np.float32)))
        self.pred_pose = self.pose.copy()
        self.frame_idx += 1
        return self.pose.copy()

    def _insert_mono_keyframe(self, keys, T_kf):
        """KF with observations but no spawned landmarks (mono landmarks
        come only from multi-view triangulation, reference 1497-1684)."""
        p = self.params
        kf_slot = self.world.alloc_keyframe(self.frame_idx)
        N = p.n_features
        zeros_f = jnp.zeros((N,), jnp.float32)
        spawn_dev, avail, spawn_host = self._alloc_spawn(1)
        data = _prepare_keyframe(
            T_kf,
            keys,
            zeros_f,  # st_depth
            jnp.full((N,), -1.0, jnp.float32),  # st_right_x
            jnp.zeros((N,), bool),  # st_matched
            jnp.zeros((N,), bool),  # st_close -> no spawns
            jnp.full((p.active_size,), -1, jnp.int32),
            jnp.zeros((p.active_size,), bool),
            jnp.full((p.active_size,), -1, jnp.int32),
            spawn_dev,
            jnp.zeros((p.active_size, 2), jnp.float32),
            jnp.zeros((p.active_size,), bool),
            self.K,
            spawn=1,
            n_levels=p.n_levels,
            scale=p.scale,
        )
        self._commit_keyframe(kf_slot, T_kf, keys, data, spawn_dev, avail, spawn_host)

    def _kf_decision(self, n_keys: int, n_inl: int, n_stereo_inl: int) -> bool:
        """Mono KF policy (reference 1470-1484): every-Nth frame with a low
        tracked ratio, or the tracked mono count degrading."""
        p = self.params
        ratio_thr = (
            p.kf_tracked_ratio_many if n_keys > p.many_keys else p.kf_tracked_ratio
        )
        return (
            n_inl < p.kf_min_stereo
            or (
                self.frame_idx - self.last_kf_frame >= p.kf_every
                and n_inl < ratio_thr * max(self.last_kf_tracked, 1)
            )
        ) and n_inl >= p.min_inliers // 2
