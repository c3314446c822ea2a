"""Validate the global-BA backend at reference scale (VERDICT r1 #4).

The reference supports 512-1024-keyframe backends at 384x512
(validate_tartanair.py:44, test_eth3d.py buffer=1024).  This harness
fills a DepthVideo at that scale with encoded synthetic keyframes along
a loop trajectory, runs the full Backend (proximity graph over all
keyframes + update_lowmem sweeps with the pixel-chunked low-memory
alt-correlation), and reports wall time and peak device memory — the
pass criterion is completion with peak HBM below the chip budget.

Usage:
  python tools/validate_backend_scale.py --n_kf 512
  python tools/validate_backend_scale.py --n_kf 1000 --steps 4
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_kf", type=int, default=512)
    p.add_argument("--size", type=int, nargs=2, default=(384, 512))
    p.add_argument("--steps", type=int, default=8,
                   help="update_lowmem sweeps (reference terminate: 12)")
    p.add_argument("--weights", default=None, help="npz weights")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (structural validation of "
                        "the lazy-capacity/chunked paths at reduced "
                        "scale; real HBM numbers need the chip)")
    p.add_argument("--wait_gb", type=int, default=12,
                   help="block until this much HBM is allocatable before "
                        "starting (prior clients' buffers free "
                        "asynchronously, 1-2 min — PERF.md); 0 disables")
    args = p.parse_args()

    import os
    os.environ.setdefault("DROID_MEM_LOG", "1")

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    free_start = None
    if not args.cpu and args.wait_gb:
        # wait for a quiet chip AND measure the true allocatable ceiling
        # (subprocess probe with scalar-readback barriers; an idle chip
        # fits 15x1 GB).  DROID_HBM_GB is derived AFTER the video fill,
        # accounting for this tool's own leak (below).
        from tools.quiet_chip import wait_for_free_hbm
        free_start = wait_for_free_hbm(min_gb=args.wait_gb)

    from droid_slam_tpu.config import SLAMConfig
    from droid_slam_tpu.models.droidnet import DroidNet, normalize_images
    from droid_slam_tpu.runtime.backend import Backend
    from droid_slam_tpu.runtime.state import DepthVideo

    H, W = args.size
    n = args.n_kf
    cfg = SLAMConfig(image_size=(H, W), buffer=n, upsample=False)

    net = DroidNet(dtype=jnp.bfloat16)
    if args.weights:
        from droid_slam_tpu.models.convert import load_npz_weights
        params = load_npz_weights(args.weights)
    else:
        params = net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 3)), method=lambda m, x: m.fnet(x),
        )
        params = DepthVideo.init_full_params(net, params, H, W) \
            if hasattr(DepthVideo, "init_full_params") else None
    if params is None:
        # full init through the Droid constructor's path
        from droid_slam_tpu.runtime.slam import Droid
        params = Droid(cfg, seed=0).params

    video = DepthVideo(cfg)

    # a handful of distinct synthetic views, cycled over all slots: the
    # backend's cost/memory profile depends on shapes, not content
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    n_distinct = 8
    feats = []
    for k in range(n_distinct):
        img = np.clip(
            127 + 60 * np.sin(0.11 * (x + 9 * k)) * np.cos(0.13 * y)
            + 40 * np.sin(0.05 * (x - y + 17 * k))
            + rng.normal(0, 2, (H, W)), 0, 255,
        ).astype(np.uint8)
        img = np.stack([img] * 3, -1)
        xin = normalize_images(jnp.asarray(img)[None])
        fmap = net.apply(params, xin, method=lambda m, v: m.fnet(v))
        ctx = net.apply(params, xin, method=lambda m, v: m.cnet(v))
        netc, inpc = jnp.split(ctx[0], 2, axis=-1)
        feats.append((
            jnp.asarray(img), fmap[0].astype(jnp.bfloat16),
            jnp.tanh(netc), jax.nn.relu(inpc),
        ))
    print(f"encoded {n_distinct} distinct views", flush=True)

    # loop trajectory: slow orbit, so proximity finds real neighbors
    st = video.state
    t_ang = 2 * np.pi * np.arange(n) / n
    poses = np.zeros((n, 7), np.float32)
    poses[:, 0] = 0.8 * np.sin(t_ang)        # tx
    poses[:, 2] = 0.8 * (1 - np.cos(t_ang))  # tz
    poses[:, 4] = np.sin(t_ang / 2) * 0.05   # slight yaw (quat y)
    poses[:, 6] = np.sqrt(1 - poses[:, 4] ** 2)
    ht, wd = H // 8, W // 8
    disps = 1.0 + 0.1 * rng.standard_normal((n, ht, wd)).astype(np.float32)
    intr = np.tile(
        np.asarray([W / 2, W / 2, W / 2, H / 2], np.float32) / 8.0, (n, 1)
    )

    images = jnp.stack([feats[k % n_distinct][0] for k in range(n)])
    fmaps = jnp.stack([feats[k % n_distinct][1] for k in range(n)])[:, None]
    nets = jnp.stack([feats[k % n_distinct][2] for k in range(n)])
    inps = jnp.stack([feats[k % n_distinct][3] for k in range(n)])

    video.state = st.replace(
        tstamp=jnp.arange(n, dtype=jnp.float32),
        images=images, poses=jnp.asarray(poses),
        disps=jnp.asarray(np.clip(disps, 0.05, None)),
        disps_sens=jnp.zeros_like(st.disps_sens),
        intrinsics=jnp.asarray(intr),
        fmaps=fmaps, nets=nets, inps=inps,
    )
    # the local references keep the REPLACED zero-filled state arrays
    # (~3.5 GB at 1000 kf) alive on the device for the whole run — that
    # residue halved the backend's measured free-HBM budget
    # (runs/r4/backend_1000e.log: 7.7 GB probed vs ~12.9 expected)
    del st, images, fmaps, nets, inps, feats
    video.counter = n
    from droid_slam_tpu.utils.mem import pytree_nbytes
    state_gb = pytree_nbytes(video.state) / 1e9
    print(f"video filled: {n} keyframes at {H}x{W} "
          f"({state_gb:.2f} GB state)", flush=True)
    if free_start is not None and "DROID_HBM_GB" not in os.environ:
        # client-level deallocations do NOT land within a live relay
        # process (measured: 0 GB reallocatable 10+ min after freeing
        # 15 GB of probe buffers) — so the zero-filled DepthVideo state
        # this tool replaced above is LEAKED for the rest of the run.
        # Budget the backend against ceiling - leak - safety.
        os.environ["DROID_HBM_GB"] = str(
            max(free_start - state_gb - 1.0, 4.0))
        print(f"DROID_HBM_GB={os.environ['DROID_HBM_GB']} "
              f"(ceiling {free_start} - leaked replaced state "
              f"{state_gb:.1f} - 1 safety)", flush=True)

    def mem_gb():
        stats = jax.local_devices()[0].memory_stats() or {}
        pk = stats.get("peak_bytes_in_use")
        return (pk / 1e9) if pk else None

    backend = Backend(net, params, video, cfg)
    t0 = time.perf_counter()
    backend(steps=args.steps)
    # force completion (relay: block_until_ready is not a barrier)
    _ = float(np.asarray(video.state.poses[0, 0]))
    dt = time.perf_counter() - t0

    pk = mem_gb()
    d = np.asarray(video.state.disps[:n])
    q = np.asarray(video.state.poses[:n])
    ok = bool(np.isfinite(d).all() and np.isfinite(q).all())
    print(f"backend({args.steps} sweeps) over {n} keyframes: "
          f"{dt:.1f}s wall"
          + (f", peak device mem {pk:.2f} GB" if pk else
             ", peak device mem unavailable")
          + f", finite={ok}", flush=True)
    if not ok:
        raise SystemExit("non-finite state after global BA")


if __name__ == "__main__":
    main()
