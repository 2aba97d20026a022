"""Checkpoint / resume of the full SLAM state.

The reference has NO persistence beyond the final trajectory text dump
(reference src/System.cpp:87-124; no map serialization, no resume —
SURVEY.md §5). Here the whole world state is a structure-of-arrays pytree
(models/map_state.py), so checkpointing is a single device->host gather and
an .npz write at keyframe boundaries; resume restores the arrays, the host
mirrors, and the tracker's pose/velocity/bias so a run continues bit-exact
where it stopped.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from vslam_tpu.models import map_state

FORMAT_VERSION = 3  # v3: obs_desc stored bit-packed (W, K, 8) uint32
# v2: majority-descriptor accumulator fields (lm_bitsum, lm_nobs);
#     obs_desc in the +-1 int8 (W, K, 256) form — converted on load


def save_checkpoint(path: str, world: map_state.WorldMap, tracker=None) -> None:
    """Write the map SoA (+ optional tracker runtime state) to `path`
    (.npz). Atomic: writes to a temp file then renames."""
    if tracker is not None:
        tracker.flush()  # drain the dispatch pipeline BEFORE snapshotting
    m = world.arrays
    blobs = {
        f"map.{f.name}": np.asarray(getattr(m, f.name))
        for f in dataclasses.fields(m)
    }
    blobs.update(
        {
            "host.kf_obs_lm": world.kf_obs_lm,
            "host.kf_obs_r_lm": world.kf_obs_r_lm,
            "host.kf_frame_idx": world.kf_frame_idx,
            "host.kf_poses": world.kf_poses_host,
            "host.lm_first_kf": world.lm_first_kf,
        }
    )
    meta = {
        "version": FORMAT_VERSION,
        "n_landmarks": world.n_landmarks,
        "n_keyframes": world.n_keyframes,
        "lm_capacity": world.lm_capacity,
        "kf_capacity": world.kf_capacity,
        "keys_per_kf": world.keys_per_kf,
    }
    if tracker is not None:
        blobs.update(
            {
                "trk.pose": tracker.pose,
                "trk.prev_pose": tracker.prev_pose,
                "trk.active_ids": tracker.active_ids,
                "trk.miss_age": tracker.miss_age,
                "trk.velocity": tracker.velocity,
                "trk.bias": tracker.bias,
            }
        )
        meta.update(
            {
                "frame_idx": tracker.frame_idx,
                "last_kf_tracked": tracker.last_kf_tracked,
                "last_kf_frame": tracker.last_kf_frame,
                "last_kf_slot": tracker.last_kf_slot,
                "new_kf_slots": tracker.new_kf_slots,
                "frame_records": [
                    [int(s), rel.tolist()] for s, rel in tracker.frame_records
                ],
            }
        )
    blobs["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp.npz"  # savez appends .npz unless present
    np.savez_compressed(tmp, **blobs)
    os.replace(tmp, path)


def load_checkpoint(path: str, world: map_state.WorldMap, tracker=None) -> dict:
    """Restore state saved by :func:`save_checkpoint` into `world` (and
    `tracker` if given). Returns the metadata dict."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta_json"]).decode())
    if meta["version"] not in (2, FORMAT_VERSION):
        raise ValueError(f"checkpoint version {meta['version']} != {FORMAT_VERSION}")
    for cap in ("keys_per_kf",):
        if meta[cap] != getattr(world, cap):
            raise ValueError(
                f"checkpoint {cap}={meta[cap]} does not match world "
                f"{cap}={getattr(world, cap)}"
            )
    # a checkpoint taken after the map grew (map_state.grow_landmarks /
    # grow_keyframes) restores into a fresh default-capacity world by
    # growing it to match first; a SMALLER checkpoint can't be adopted
    # (the restored arrays define the capacity, shrinking would lose the
    # preallocated headroom invariants) so that stays an error
    if meta["lm_capacity"] > world.lm_capacity:
        world.grow_landmarks(meta["lm_capacity"])
    if meta["kf_capacity"] > world.kf_capacity:
        world.grow_keyframes(meta["kf_capacity"])
    for cap in ("lm_capacity", "kf_capacity"):
        if meta[cap] != getattr(world, cap):
            raise ValueError(
                f"checkpoint {cap}={meta[cap]} does not match world "
                f"{cap}={getattr(world, cap)}"
            )
    kwargs = {
        f.name: jnp.asarray(data[f"map.{f.name}"])
        for f in dataclasses.fields(world.arrays)
    }
    if meta["version"] == 2:
        # v2 stored obs_desc as +-1 int8 (W, K, 256); the live layout is
        # bit-packed uint32 (W, K, 8)
        from vslam_tpu.ops import hamming

        kwargs["obs_desc"] = hamming.pack_signed(kwargs["obs_desc"])
    world.arrays = map_state.MapArrays(**kwargs)
    world.kf_obs_lm = data["host.kf_obs_lm"].copy()
    if "host.kf_obs_r_lm" in data:
        world.kf_obs_r_lm = data["host.kf_obs_r_lm"].copy()
    world.kf_frame_idx = data["host.kf_frame_idx"].copy()
    world.kf_poses_host = data["host.kf_poses"].copy()
    world.lm_first_kf = data["host.lm_first_kf"].copy()
    world.n_landmarks = meta["n_landmarks"]
    world.n_keyframes = meta["n_keyframes"]
    if tracker is not None and "trk.pose" in data:
        tracker.pose = data["trk.pose"].copy()
        tracker.prev_pose = data["trk.prev_pose"].copy()
        tracker.active_ids = data["trk.active_ids"].copy()
        tracker.miss_age = data["trk.miss_age"].copy()
        tracker.velocity = data["trk.velocity"].copy()
        tracker.bias = data["trk.bias"].copy()
        tracker.frame_idx = meta["frame_idx"]
        tracker.last_kf_tracked = meta["last_kf_tracked"]
        tracker.last_kf_frame = meta["last_kf_frame"]
        tracker.last_kf_slot = meta["last_kf_slot"]
        tracker.new_kf_slots = list(meta["new_kf_slots"])
        tracker.frame_records = [
            (int(s), np.asarray(rel, np.float32)) for s, rel in meta["frame_records"]
        ]
        # rebuild the device-resident state for the next dispatch
        tracker._D = np.eye(4, dtype=np.float32)
        tracker._pending.clear()
        tracker._state = tracker._fresh_state(tracker.pose)
        tracker._state["prev_pose"] = jnp.asarray(tracker.prev_pose)
    return meta
