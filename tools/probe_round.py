"""Hardware ablation probe: true marginal cost of one fused update round.

Builds the REAL fused-frontend round body (runtime/fused.py) at bench
shapes (240x320, default caps) and times k-chained rounds with selected
components ablated, isolating each component's in-context cost:

  full        — the real round (lookup + update op + BA)
  no_lookup   — correlation taps replaced with zeros
  no_update   — network update skipped (target/weight frozen)
  ba_only     — only the BA call
  no_ba       — everything but the BA

Chain method (time(k) - time(1)) / (k-1) removes the ~25 ms axon relay
readback from the measurement.  Run AFTER training frees the chip:
  python tools/probe_round.py [--cache | --alt]
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alt", action="store_true",
                    help="force the on-the-fly (alt) corr path")
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--size", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on the CPU backend")
    ap.add_argument("--lookup", choices=["onehot", "pallas", "pallas_v2", "pallas_v3"],
                    default="onehot",
                    help="windowed-lookup implementation to measure")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from droid_slam_tpu.config import SLAMConfig
    from droid_slam_tpu.models.droidnet import DroidNet
    from droid_slam_tpu.runtime import fused
    from droid_slam_tpu.runtime.state import DepthVideo

    import droid_slam_tpu.ops.corr as _corr
    _corr.set_lookup_impl(args.lookup)

    H, W = args.size
    buf = 96
    cfg = SLAMConfig(image_size=(H, W), buffer=buf,
                     corr_cache_mb=0 if args.alt else 512)

    net = DroidNet(dtype=jnp.bfloat16)
    video = DepthVideo(cfg)
    ht, wd = video.fht, video.fwd
    SRCP, TGTP, GC, P, K, EA, EI = fused.fused_caps(cfg)

    # params via the Droid init path
    from droid_slam_tpu.runtime.slam import Droid
    wpath = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                     "weights", "droid_synth.npz")
    params = Droid(cfg, weights_path=wpath if osp.exists(wpath) else None,
                   seed=0).params

    rng = np.random.default_rng(0)
    st = video.state
    n = 40
    poses = np.concatenate([
        rng.standard_normal((buf, 3)).astype(np.float32) * 0.02,
        np.tile([0, 0, 0, 1.0], (buf, 1)).astype(np.float32)], 1)
    video.state = st.replace(
        poses=jnp.asarray(poses),
        disps=jnp.asarray(
            rng.uniform(0.8, 1.2, (buf, ht, wd)).astype(np.float32)),
        intrinsics=jnp.tile(
            jnp.asarray([33.0, 33.0, wd / 2, ht / 2], jnp.float32),
            (buf, 1)),
        fmaps=jnp.asarray(
            rng.standard_normal((buf, 1, ht, wd, 128)), jnp.bfloat16),
        nets=jnp.asarray(
            rng.standard_normal((buf, ht, wd, 128)) * 0.1, jnp.float32),
        inps=jnp.asarray(
            rng.standard_normal((buf, ht, wd, 128)) * 0.1, jnp.float32),
    )
    gstate = fused.init_graph_state(EA, EI, ht, wd)
    ii = np.clip(np.arange(EA) // 2, 0, n - 2).astype(np.int32)
    jj = (ii + np.where(np.arange(EA) % 2 == 0, 1, 2)).astype(np.int32)
    gstate = gstate.replace(
        ii=gstate.ii.at[:EA].set(jnp.asarray(ii)),
        jj=gstate.jj.at[:EA].set(jnp.asarray(jj)),
        active=jnp.ones((EA,), bool),
        net=jnp.asarray(
            rng.standard_normal((EA, ht, wd, 128)) * 0.1, jnp.float32),
        target=gstate.target.at[:EA].set(jnp.asarray(
            rng.uniform(0, 30, (EA, ht, wd, 2)).astype(np.float32))),
        weight=gstate.weight.at[:EA].set(jnp.asarray(
            rng.uniform(0, 1, (EA, ht, wd, 2)).astype(np.float32))),
    )

    update_round = fused.make_update_round(net, cfg, buf, ht, wd, P, K)
    cache = (not args.alt) and fused._volume_cache_fits(cfg, EA, ht, wd)
    build_vols = fused.make_edge_volumes(cfg, EA, ht, wd) if cache else None
    print(f"corr path: {'cached-volume' if cache else 'alt on-the-fly'}",
          flush=True)

    def force(v, g):
        return float(jnp.sum(v.poses[:2].astype(jnp.float32)))

    def chain(k):
        @jax.jit
        def f(params, vstate, gstate):
            pyr = fused._pyramids(vstate.fmaps)
            vols = build_vols(gstate, pyr) if cache else None
            def body(carry, _):
                v, g = carry
                v, g = update_round(params, v, g, pyr, vols=vols)
                return (v, g), None
            (vstate, gstate), _ = jax.lax.scan(
                body, (vstate, gstate), None, length=k)
            return vstate, gstate
        return f

    def timed(fn, nrep=3):
        force(*fn(params, video.state, gstate))
        t0 = time.perf_counter()
        for _ in range(nrep):
            force(*fn(params, video.state, gstate))
        return (time.perf_counter() - t0) / nrep

    k = args.k
    t1 = timed(chain(1))
    tk = timed(chain(k))
    per = (tk - t1) / (k - 1)
    print(f"full round: {1e3 * per:.2f} ms  "
          f"(1-chain {1e3 * t1:.1f} ms incl. relay)", flush=True)

    # component ablations via monkeypatched round pieces
    import droid_slam_tpu.ops.corr as corr_ops
    import droid_slam_tpu.ops.dba as dba

    real_ba = dba.ba
    def fake_ba(poses, disps, *a, **k2):
        return poses + 1e-9, disps
    dba.ba = fake_ba
    ur2 = fused.make_update_round(net, cfg, buf, ht, wd, P, K)
    def chain_noba(k):
        @jax.jit
        def f(params, vstate, gstate):
            pyr = fused._pyramids(vstate.fmaps)
            vols = build_vols(gstate, pyr) if cache else None
            def body(carry, _):
                v, g = carry
                v, g = ur2(params, v, g, pyr, vols=vols)
                return (v, g), None
            (vstate, gstate), _ = jax.lax.scan(
                body, (vstate, gstate), None, length=k)
            return vstate, gstate
        return f
    t1n = timed(chain_noba(1))
    tkn = timed(chain_noba(k))
    per_noba = (tkn - t1n) / (k - 1)
    dba.ba = real_ba
    print(f"no_ba round: {1e3 * per_noba:.2f} ms  "
          f"=> BA in context: {1e3 * (per - per_noba):.2f} ms", flush=True)

    real_lookup = corr_ops.lookup_level_impl
    real_alt = corr_ops.alt_lookup_pyramid
    rd2 = (2 * corr_ops.RADIUS + 1) ** 2
    def fake_lookup(vol, coords, radius=corr_ops.RADIUS):
        B, N, Hh, Ww = coords.shape[:4]
        return jnp.zeros((B, N, Hh, Ww, rd2), jnp.float32)
    def fake_alt(f1, f2, coords, **kw):
        N, Hh, Ww = coords.shape[:3]
        return jnp.zeros((N, Hh, Ww, rd2 * len(f2)), jnp.float32)
    corr_ops.lookup_level_impl = fake_lookup
    corr_ops.alt_lookup_pyramid = fake_alt
    ur3 = fused.make_update_round(net, cfg, buf, ht, wd, P, K)
    def chain_nolk(k):
        @jax.jit
        def f(params, vstate, gstate):
            pyr = fused._pyramids(vstate.fmaps)
            vols = build_vols(gstate, pyr) if cache else None
            def body(carry, _):
                v, g = carry
                v, g = ur3(params, v, g, pyr, vols=vols)
                return (v, g), None
            (vstate, gstate), _ = jax.lax.scan(
                body, (vstate, gstate), None, length=k)
            return vstate, gstate
        return f
    t1l = timed(chain_nolk(1))
    tkl = timed(chain_nolk(k))
    per_nolk = (tkl - t1l) / (k - 1)
    corr_ops.lookup_level_impl = real_lookup
    corr_ops.alt_lookup_pyramid = real_alt
    print(f"no_lookup round: {1e3 * per_nolk:.2f} ms  "
          f"=> corr lookup in context: {1e3 * (per - per_nolk):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
