"""Checkpoint/resume + visualization export (SURVEY.md §5: subsystems the
reference lacks entirely — designed here, not ported)."""

import numpy as np
import pytest

from vslam_tpu.models import map_state, tracker
from vslam_tpu.utils import checkpoint, synthetic, viz


@pytest.fixture(scope="module")
def tracked_world():
    scene = synthetic.make_scene(
        n_frames=8, n_points=400, width=320, height=240, fps=10.0, seed=7
    )
    params = tracker.TrackerParams(
        n_features=512, n_levels=4, active_size=1024, spawn_per_kf=256, kf_min_stereo=60
    )
    world = map_state.WorldMap(lm_capacity=8192, kf_capacity=64, keys_per_kf=512)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    for f in range(6):
        trk.track(scene.render(f), scene.render(f, right=True))
    return scene, params, world, trk


def test_checkpoint_roundtrip_bitexact(tmp_path, tracked_world):
    scene, params, world, trk = tracked_world
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(path, world, trk)

    world2 = map_state.WorldMap(lm_capacity=8192, kf_capacity=64, keys_per_kf=512)
    trk2 = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world2, params
    )
    meta = checkpoint.load_checkpoint(path, world2, trk2)
    assert meta["n_keyframes"] == world.n_keyframes
    np.testing.assert_array_equal(np.asarray(world2.arrays.lm_pos), np.asarray(world.arrays.lm_pos))
    np.testing.assert_array_equal(np.asarray(world2.arrays.obs_lm), np.asarray(world.arrays.obs_lm))
    np.testing.assert_array_equal(world2.kf_obs_lm, world.kf_obs_lm)
    np.testing.assert_array_equal(trk2.pose, trk.pose)
    np.testing.assert_array_equal(trk2.active_ids, trk.active_ids)

    # resumed run continues: track two more frames on both, poses identical
    p_a = trk.track(scene.render(6), scene.render(6, right=True))
    p_b = trk2.track(scene.render(6), scene.render(6, right=True))
    np.testing.assert_allclose(p_a, p_b, atol=1e-5)


def test_checkpoint_capacity_adoption(tmp_path, tracked_world):
    """A checkpoint taken after the map grew restores into a fresh smaller
    world by growing it to match (map_state.grow_*); a keys_per_kf
    mismatch is a genuine format incompatibility and still raises."""
    _, _, world, trk = tracked_world
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(path, world)
    other = map_state.WorldMap(lm_capacity=4096, kf_capacity=16, keys_per_kf=512)
    checkpoint.load_checkpoint(path, other)
    assert other.lm_capacity == world.lm_capacity
    assert other.kf_capacity == world.kf_capacity
    assert other.n_keyframes == world.n_keyframes
    np.testing.assert_array_equal(other.kf_obs_lm, world.kf_obs_lm)
    bad = map_state.WorldMap(lm_capacity=8192, kf_capacity=64, keys_per_kf=256)
    with pytest.raises(ValueError, match="keys_per_kf"):
        checkpoint.load_checkpoint(path, bad)


def test_viz_exports(tmp_path, tracked_world):
    _, _, world, trk = tracked_world
    traj = trk.trajectory()
    ply = tmp_path / "map.ply"
    html = tmp_path / "map.html"
    viz.export_ply(str(ply), world, traj, active_ids=trk.active_ids)
    viz.export_html(str(html), world, traj, active_ids=trk.active_ids)
    txt = ply.read_text()
    assert txt.startswith("ply")
    n_expect = int(np.asarray(world.arrays.lm_valid).sum()) + len(traj)
    assert f"element vertex {n_expect}" in txt
    page = html.read_text()
    assert "landmarks" in page and "frusta" in page
    # embedded data is valid JSON
    import json

    start = page.index("const DATA = ") + len("const DATA = ")
    end = page.index(";\n", start)
    data = json.loads(page[start:end])
    assert len(data["frusta"]) == world.n_keyframes
    # activity coloring (reference Visualization.cpp:59-94): the
    # tracker's live set marks landmarks active; both classes present
    assert len(data["active"]) == len(data["points"])
    n_act = sum(data["active"])
    assert 0 < n_act <= len(data["points"])
    assert "70 210 120" in txt  # active landmarks reach the PLY too


def test_live_map_writer(tmp_path, tracked_world):
    """LiveMapWriter rewrites the viewer only when enough NEW keyframes
    accumulated, atomically (no .tmp left behind)."""
    _, _, world, trk = tracked_world
    path = tmp_path / "live.html"
    w = viz.LiveMapWriter(str(path), world, every_n_kf=1)
    assert w.maybe_export(trk) is True
    assert path.exists() and not (tmp_path / "live.html.tmp").exists()
    mtime = path.stat().st_mtime_ns
    # no new keyframes -> no rewrite
    assert w.maybe_export(trk) is False
    assert path.stat().st_mtime_ns == mtime
