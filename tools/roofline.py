"""Speed-of-light audit of the per-frame device program (VERDICT r4 #1).

For each stage of `_track_step` at EuRoC bench shapes (752x480 stereo
pair, 1024 features, 8 levels, active set 4096) this measures:

- device time: block_until_ready timing minus the session's measured
  scalar round-trip (the remote-tunnel correction profile_device.py uses);
- FLOPs and HBM bytes: XLA's own cost model for the compiled executable
  (`compiled.cost_analysis()`), i.e. what the compiler believes it
  scheduled — not a hand count;
- the roofline bound: time_sol = max(flops / PEAK_FLOPS, bytes / PEAK_BW)
  and the utilization = time_sol / time_measured.

Peaks are TPU v5e (one chip): 197 TFLOP/s bf16 MXU, 819 GB/s HBM. The
compute path runs f32 (the MXU computes f32 matmuls at ~1/4 bf16 rate on
v5e — 49 TFLOP/s), so the FLOP bound uses the f32 peak; elementwise VPU
work is almost always bandwidth-bound anyway, which is the bound that
matters for every stage except the BRIEF/Hamming matmuls.

Run on the real chip: `python tools/roofline.py`. Results are pasted
into BASELINE.md ("Speed-of-light audit").
"""

import os
import time

import numpy as np

PEAK_FLOPS_F32 = 49e12  # v5e MXU f32 (bf16 peak 197e12)
PEAK_BW = 819e9  # v5e HBM GB/s


def timeit(fn, n=10, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n * 1000.0


def device_ms(fn, k_small=2, k_big=12, reps=3):
    """Per-call DEVICE time via dispatch pipelining: enqueue k identical
    calls back-to-back, block once; the (t(k_big)-t(k_small))/(k_big-k_small)
    slope cancels the fixed per-call completion latency that dominates
    blocked one-shot timings on the remote tunnel (~25 ms per program
    there, vs ~10 us on a locally attached chip). If the host's dispatch
    RPC itself is the bottleneck the slope measures that instead — which
    is the honest throughput bound either way. Returns (slope_ms,
    dispatch_only_ms)."""
    import jax

    def run(k):
        out = None
        for _ in range(k):
            out = fn()
        jax.block_until_ready(out)

    run(k_big)  # warm
    t_small = min(timeit_once(run, k_small) for _ in range(reps))
    t_big = min(timeit_once(run, k_big) for _ in range(reps))
    slope = (t_big - t_small) / (k_big - k_small) * 1000.0
    # dispatch-only: host cost to enqueue, no block
    t0 = time.perf_counter()
    out = None
    for _ in range(k_big):
        out = fn()
    disp = (time.perf_counter() - t0) / k_big * 1000.0
    jax.block_until_ready(out)
    return slope, disp


def timeit_once(run, k):
    t0 = time.perf_counter()
    run(k)
    return time.perf_counter() - t0


def cost(jitted, *args, **kwargs):
    """(flops, bytes) from XLA's cost analysis of the compiled executable."""
    c = jitted.lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(c, list):  # older jax returns [dict]
        c = c[0]
    return float(c.get("flops", 0.0)), float(
        c.get("bytes accessed", c.get("bytes accessed operand 0 {}", 0.0))
    )


def report(name, slope_ms, disp_ms, blocked_ms, flops, nbytes):
    t_flops = flops / PEAK_FLOPS_F32 * 1e3
    t_bw = nbytes / PEAK_BW * 1e3
    sol = max(t_flops, t_bw)
    bound = "flops" if t_flops > t_bw else "bw"
    util = 100.0 * sol / max(slope_ms, 1e-3)
    print(
        f"{name:24s} dev={slope_ms:7.2f} ms disp={disp_ms:6.2f} "
        f"blk={blocked_ms:7.2f}  {flops/1e9:8.2f} GF {nbytes/1e6:8.1f} MB"
        f"  sol={sol:6.2f} ms ({bound})  util={util:5.1f}%"
    )
    return {
        "stage": name, "dev_ms": round(slope_ms, 2),
        "dispatch_ms": round(disp_ms, 2), "blocked_ms": round(blocked_ms, 2),
        "gflops": round(flops / 1e9, 2), "mbytes": round(nbytes / 1e6, 1),
        "sol_ms": round(sol, 3), "bound": bound, "util_pct": round(util, 1),
    }


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import functools

    import jax.numpy as jnp

    from vslam_tpu.models import map_state, tracker
    from vslam_tpu.ops import extract, fast, orb, patches, pyramid, stereo_match
    from vslam_tpu.utils import synthetic

    print("devices:", jax.devices())
    one = jnp.float32(1.0)
    rtt = timeit(lambda: jnp.sin(one), n=20)
    print(f"rtt (scalar op, blocked): {rtt:7.2f} ms\n")

    scene = synthetic.make_scene(
        n_frames=12, n_points=900, width=752, height=480, fps=20.0, seed=3
    )
    params = tracker.TrackerParams(n_features=1024, n_levels=8, active_size=4096)
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=128, keys_per_kf=1024)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height,
        world, params,
    )
    from vslam_tpu.models import local_mapper

    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)
    frames = [
        (scene.render(f).astype(np.uint8), scene.render(f, right=True).astype(np.uint8))
        for f in range(12)
    ]
    for f in range(8):
        n_kf = len(trk.new_kf_slots)
        trk.track(*frames[f])
        if len(trk.new_kf_slots) > n_kf and trk.new_kf_slots[-1] > 0:
            r = mapper.run(trk.new_kf_slots[-1])
            trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
            trk.add_active(r["new_lm_ids"])
    trk.flush()

    p = trk.params
    LR = jnp.asarray(np.stack(frames[9]))
    imgs = LR.astype(jnp.float32)
    rows = []

    # ---- stage: full extraction (pyramid + FAST + patches + BRIEF) ----
    ext = jax.jit(
        functools.partial(
            extract.extract_batch, n_levels=8, scale=1.2, total=1024,
            edge_margin=19, fast_hi=20.0, fast_lo=7.0,
        )
    )
    f_, b_ = cost(ext, imgs)
    fn = lambda: ext(imgs).xy
    blk = timeit(fn)
    dev, disp = device_ms(fn)
    rows.append(report("extract_batch(x2)", dev, disp, blk, f_, b_))
    keys2 = ext(imgs)
    kl = jax.tree.map(lambda a: a[0], keys2)
    kr = jax.tree.map(lambda a: a[1], keys2)

    # ---- sub-stage: pyramid (resize + blur, 8 levels, B=2) ----
    def pyr(im):
        shapes = pyramid.level_shapes(480, 752, 8, 1.2)
        cur = im
        outs = []
        for l in range(8):
            h, w = shapes[l]
            if l > 0:
                cur = pyramid.resize_bilinear_batch(cur, h, w)
            outs.append(pyramid.gaussian_blur_batch(cur).sum())
        return sum(outs)

    jp = jax.jit(pyr)
    f_, b_ = cost(jp, imgs)
    fn = lambda: jp(imgs)
    blk = timeit(fn)
    dev, disp = device_ms(fn)
    rows.append(report("  pyramid+blur", dev, disp, blk, f_, b_))

    # ---- sub-stage: FAST detect on level 0 (biggest level) ----
    jf = jax.jit(
        jax.vmap(
            lambda im: fast.detect(
                im, threshold_hi=20.0, threshold_lo=7.0, cell=35,
                max_keypoints=290, edge_margin=19,
            )
        )
    )
    f_, b_ = cost(jf, imgs)
    fn = lambda: jf(imgs)[0]
    blk = timeit(fn)
    dev, disp = device_ms(fn)
    rows.append(report("  fast.detect L0", dev, disp, blk, f_, b_))

    # ---- sub-stage: patch window kernel (L0 quota 290 keys, 31x31 — the
    # production per-level call shape; extract.py:109) ----
    NK = extract.level_quotas(1024, 8, 1.2)[0]
    xy = keys2.xy.astype(jnp.int32)[:, :NK]
    x0 = jnp.clip(xy[:, :, 0] - 15, 0, 752 - 31)
    y0 = jnp.clip(xy[:, :, 1] - 15, 0, 480 - 31)
    jw = jax.jit(lambda im, a, b: patches.extract_windows(im, a, b, 31, 31))
    f_, b_ = cost(jw, imgs, x0, y0)
    fn = lambda: jw(imgs, x0, y0)
    blk = timeit(fn)
    dev, disp = device_ms(fn)
    rows.append(report(f"  patches L0({NK}x31x31)", dev, disp, blk, f_, b_))
    pw = jw(imgs, x0, y0)
    # orientation+BRIEF below runs on the FULL key set as in production
    pw = jnp.concatenate(
        [pw] * (1024 // NK) + [pw[:, : 1024 - (1024 // NK) * NK]], axis=1
    )

    # ---- sub-stage: orientation + BRIEF from patches ----
    def ob(patch):
        ang = orb.orientation_from_patches(patch)
        packed, signed = orb.brief_from_patches(patch, ang)
        return packed

    job = jax.jit(ob)
    f_, b_ = cost(job, pw)
    fn = lambda: job(pw)
    blk = timeit(fn)
    dev, disp = device_ms(fn)
    rows.append(report("  orient+BRIEF", dev, disp, blk, f_, b_))

    # ---- stage: stereo matching ----
    sf = jnp.asarray(extract.scale_factors(8, 1.2))
    jsm = jax.jit(
        lambda: stereo_match.match_stereo(
            imgs[0], imgs[1], kl.xy, kl.octave, kl.desc, kl.valid,
            kr.xy, kr.octave, kr.desc, kr.valid,
            trk.K[0, 0], trk.baseline, sf, close_factor=40.0,
        )["depth"]
    )
    f_, b_ = cost(jsm)
    blk = timeit(jsm)
    dev, disp = device_ms(jsm)
    rows.append(report("stereo_match", dev, disp, blk, f_, b_))

    # ---- full track step ----
    state0 = trk._state

    def track_step():
        st = {k: (jnp.array(v) if k in ("pose", "prev_pose", "vel", "bias") else v)
              for k, v in state0.items()}
        st["active"] = trk._gather_active_dev()
        st["miss_age"] = jnp.asarray(trk.miss_age, jnp.int32)
        _, outputs = tracker._track_step(
            LR, st, trk._imu_dummy, trk._imu_const, trk._radii,
            jnp.float32(p.refine_radius), jnp.float32(p.desc_thr),
            jnp.float32(p.ratio), trk.K, trk.baseline, trk.scale_factors,
            trk._static, trk.width, trk.height, p.n_levels, p.min_inliers,
            mono=False, has_imu=False,
        )
        return outputs["blob"]

    blk = timeit(track_step, n=8)
    dev, disp = device_ms(track_step, k_small=2, k_big=8)
    # cost of the full jitted step via its traced lowering
    st = {k: (jnp.array(v) if k in ("pose", "prev_pose", "vel", "bias") else v)
          for k, v in state0.items()}
    st["active"] = trk._gather_active_dev()
    st["miss_age"] = jnp.asarray(trk.miss_age, jnp.int32)
    full = tracker._track_step.lower(
        LR, st, trk._imu_dummy, trk._imu_const, trk._radii,
        jnp.float32(p.refine_radius), jnp.float32(p.desc_thr),
        jnp.float32(p.ratio), trk.K, trk.baseline, trk.scale_factors,
        trk._static, trk.width, trk.height, p.n_levels, p.min_inliers,
        mono=False, has_imu=False,
    ).compile().cost_analysis()
    if isinstance(full, list):
        full = full[0]
    f_, b_ = float(full.get("flops", 0)), float(full.get("bytes accessed", 0))
    rows.append(report("_track_step (full)", dev, disp, blk, f_, b_))

    print("\nmarkdown:")
    print("| stage | device ms | dispatch ms | blocked ms | GFLOP | MB (XLA, pre-fusion) | SoL ms (bound) | % of roofline |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['stage'].strip()} | {r['dev_ms']} | {r['dispatch_ms']} | "
            f"{r['blocked_ms']} | {r['gflops']} | "
            f"{r['mbytes']} | {r['sol_ms']} ({r['bound']}) | {r['util_pct']}% |"
        )


if __name__ == "__main__":
    main()
