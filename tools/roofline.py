"""Roofline / MFU accounting for the five leaf costs (VERDICT r3 #4).

For each hot kernel at bench shapes (240x320 stream => 30x40 feature
grid), this measures the marginal device time by the chain method
((t_k2 - t_k1)/(k2 - k1) cancels the relay dispatch+readback) and pairs
it with XLA's own cost model (compiled.cost_analysis(): flops + bytes
accessed) to report achieved TFLOP/s and GB/s against the v5e peaks:

  MXU peak (bf16):  ~197 TFLOP/s      HBM bandwidth: ~819 GB/s

The roofline time bound for a kernel is
  t_bound = max(flops / PEAK_FLOPS, bytes / PEAK_BW)
and "% of roofline" = t_bound / t_measured — 100% means the kernel runs
at the speed of light for its arithmetic intensity; the bound_by column
says which wall it sits against.

Kernels measured (the round-3 trace's top leaves, PERF.md):
  lookup0     one-hot level-0 correlation lookup (flat cached volume)
  linearize   per-edge BA Gauss-Newton linearization (chunked)
  schur       compact selector-matmul Schur contraction (dense-P path
              at frontend sizes)
  fnet1/fnetB feature encoder, batch 1 vs batch B (the chunk hoist)
  gru         one update-operator pass over an edge chunk

Usage:  python tools/roofline.py [--cpu] [--k 6] [--batch 20]
Writes one JSON line per kernel; meant to be committed under runs/.
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

PEAK_FLOPS = 197e12     # v5e bf16 MXU
PEAK_BW = 819e9         # v5e HBM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k", type=int, default=6,
                    help="long-chain length (short chain is 1)")
    ap.add_argument("--batch", type=int, default=20,
                    help="chunk size for the batched fnet point")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--edges", type=int, default=64,
                    help="edge count (use a small value for CPU smoke)")
    args = ap.parse_args()

    if args.cpu:
        # both layers: env var (read by enable_compilation_cache) AND
        # config (the axon hook re-pins platforms after jax import) —
        # a CPU run must never claim the tunneled chip
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from droid_slam_tpu.models.droidnet import DroidNet
    from droid_slam_tpu.ops import corr as corr_ops
    from droid_slam_tpu.ops import dba

    H, W = 240, 320
    ht, wd = H // 8, W // 8
    E = args.edges              # frontend active-edge capacity chunk
    rng = np.random.default_rng(0)

    net = DroidNet(dtype=jnp.bfloat16)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        method=lambda m, x: m.fnet(x),
    )
    # full params through cnet+update init
    from droid_slam_tpu.runtime.slam import Droid
    from droid_slam_tpu.config import SLAMConfig
    params = Droid(SLAMConfig(image_size=(H, W), buffer=32), seed=0).params

    def chain(fn, x, k):
        """fn must map x -> x-like; run k times dependent."""
        def body(c, _):
            return fn(c), None
        return jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=k)[0])

    def measure(name, fn_like, x0, extra_note=""):
        """fn_like: x -> x (self-chaining).  Reports marginal time and
        XLA cost-model flops/bytes for ONE application."""
        k1, k2 = 1, args.k
        c1 = chain(fn_like, x0, k1)
        c2 = chain(fn_like, x0, k2)
        # cost analysis of a single application
        single = jax.jit(fn_like)
        try:
            ca = single.lower(x0).compile().cost_analysis() or {}
            if isinstance(ca, list):
                ca = ca[0] if ca else {}
            flops = float(ca.get("flops", 0.0))
            bytes_ = float(ca.get("bytes accessed", 0.0))
        except Exception as e:  # noqa: BLE001 - relay may not expose it
            print(f"[roofline] {name}: cost_analysis unavailable ({e})",
                  file=sys.stderr, flush=True)
            flops = bytes_ = 0.0

        def run(c):
            y = c(x0)
            jax.block_until_ready(y)
            leaf = jax.tree.leaves(y)[0]
            _ = float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))

        run(c1)
        run(c2)      # warm both
        t1 = t2 = 1e30
        for _ in range(args.reps):
            t0 = time.perf_counter(); run(c1)
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter(); run(c2)
            t2 = min(t2, time.perf_counter() - t0)
        dt = max((t2 - t1) / (k2 - k1), 1e-9)

        tf = flops / dt / 1e12
        gbs = bytes_ / dt / 1e9
        t_bound = max(flops / PEAK_FLOPS, bytes_ / PEAK_BW)
        rec = {
            "kernel": name,
            "ms": round(dt * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(bytes_ / 1e9, 3),
            "achieved_tflops": round(tf, 2),
            "achieved_gbs": round(gbs, 1),
            "intensity_flops_per_byte": round(flops / max(bytes_, 1), 1),
            "bound_by": ("compute" if flops / PEAK_FLOPS > bytes_ / PEAK_BW
                         else "memory"),
            "pct_of_roofline": round(100 * t_bound / dt, 1),
            "note": extra_note,
        }
        print(json.dumps(rec), flush=True)
        return rec

    out = []

    # ---- 1. one-hot level-0 lookup (flat cached volume) ----------------
    Q = E * ht * wd
    vol0 = jnp.asarray(rng.standard_normal((Q, ht, wd)), jnp.bfloat16)

    def lookup0(coords):
        taps = corr_ops.lookup_level_onehot_flat(vol0, coords)  # (Q, 49)
        # self-chain: derive next coords from the taps (keeps dims)
        d = jnp.mean(taps.astype(jnp.float32), axis=-1, keepdims=True)
        return coords + 1e-6 * jnp.concatenate([d, d], -1)

    coords0 = jnp.asarray(
        np.stack(np.meshgrid(np.arange(wd), np.arange(ht), indexing="xy"),
                 -1)[None].repeat(E, 0).reshape(Q, 2), jnp.float32)
    out.append(measure("lookup0_onehot", lookup0, coords0,
                       f"E={E} level-0 {ht}x{wd}"))

    # v3 Pallas (queries-along-lanes masked reduce) on the same data,
    # transposed layout
    try:
        from droid_slam_tpu.ops import corr_pallas
        vol_t = jnp.asarray(
            np.asarray(vol0.astype(jnp.float32))
            .reshape(E, ht * wd, ht, wd).transpose(0, 2, 3, 1),
            jnp.bfloat16)

        def lookup_v3(coords):
            taps = corr_pallas.lookup_flat_pallas_v3(
                vol_t, coords.reshape(E, ht * wd, 2))
            d = jnp.mean(taps, axis=-1).reshape(Q, 1)
            return coords + 1e-6 * jnp.concatenate([d, d], -1)

        out.append(measure("lookup0_pallas_v3", lookup_v3, coords0,
                           f"E={E} level-0 {ht}x{wd}"))
    except Exception as e:  # noqa: BLE001 - Mosaic may reject on HW
        print(f"[roofline] pallas v3 skipped: {e}", file=sys.stderr,
              flush=True)

    # ---- 2. BA linearization (chunked) ---------------------------------
    buf = 64
    poses = jnp.asarray(
        np.tile([0, 0, 0, 0, 0, 0, 1.0], (buf, 1)), jnp.float32)
    disps = jnp.asarray(0.8 + 0.2 * rng.random((buf, ht, wd)), jnp.float32)
    intr = jnp.asarray(np.tile([W / 16, W / 16, wd / 2, ht / 2], (buf, 1)),
                       jnp.float32)
    ii = jnp.asarray(rng.integers(0, buf - 1, E), jnp.int32)
    jj = jnp.asarray((np.asarray(ii) + 1) % buf, jnp.int32)
    tgt = jnp.asarray(rng.random((E, ht, wd, 2)) * 8, jnp.float32)
    wgt = jnp.ones((E, ht, wd, 2), jnp.float32)
    emask = jnp.ones((E,), bool)

    # chain carries (poses, disps, target) so NOTHING is loop-invariant:
    # with fixed poses/disps XLA hoists the Jacobian build out of the
    # chain scan and the marginal time measures only the residual path
    # (runs/r4/roofline.json showed 650% "roofline" from exactly that)
    def linz(c):
        p, d, t = c
        Hb, v, Eii_, Eij_, Cii_, wi_ = dba._linearize(
            p, d, intr, t, wgt, ii, jj, emask)
        eps = 1e-9 * jnp.mean(v)
        return (p + eps, d + eps, t + eps)

    carry0 = (poses, disps, tgt)
    out.append(measure("ba_linearize", linz, carry0, f"E={E} {ht}x{wd}"))

    # ---- 3. full BA iteration (assembly + Schur + solve) ---------------
    K = 32
    kx = jnp.arange(K, dtype=jnp.int32)
    kmask = jnp.ones((K,), bool)

    def ba_full(c):
        p, d, t = c
        p2, d2 = dba.ba(p, d, jnp.zeros_like(d), intr,
                        t, wgt, 1e-4 * jnp.ones((buf, ht, wd)),
                        ii, jj, emask, kx, kmask,
                        jnp.zeros((K, 1), jnp.int32),
                        jnp.int32(1), jnp.int32(buf),
                        iters=1, lm=1e-4, ep=0.1, motion_only=False, P=64)
        eps = 1e-9 * jnp.mean(p2)
        return (p2, d2, t + eps)

    out.append(measure("ba_iteration", ba_full,
                       carry0, f"E={E} P=64 K={K} 1 GN iter"))

    # ---- 4. fnet batch 1 vs batch B ------------------------------------
    def fnet_run(x):
        f = net.apply(params, x, method=lambda m, v: m.fnet(v))
        return x + 1e-6 * jnp.mean(f.astype(jnp.float32)) + 0 * x

    x1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    out.append(measure("fnet_b1", fnet_run, x1, "batch 1"))
    xb = jnp.asarray(rng.random((args.batch, H, W, 3)), jnp.float32)
    rb = measure("fnet_bB", fnet_run, xb, f"batch {args.batch}")
    rb["ms_per_frame"] = round(rb["ms"] / args.batch, 3)
    out.append(rb)

    # ---- 5. update operator (GRU + heads) over an edge chunk -----------
    netc = jnp.asarray(rng.random((E, ht, wd, 128)), jnp.float32)
    inpc = jnp.asarray(rng.random((E, ht, wd, 128)), jnp.float32)
    corrc = jnp.asarray(
        rng.random((E, ht, wd, 4 * 49)), jnp.float32)
    motn = jnp.asarray(rng.random((E, ht, wd, 4)), jnp.float32)
    seg = jnp.asarray(np.arange(E) % 32, jnp.int32)

    def upd(n):
        n2, delta, w, eta, um = net.apply(
            params, n, inpc, corrc, motn,
            method=lambda m, a, b, c, d, ix, nseg: m.update(
                a, b, c, d, ix=ix, nseg=nseg),
            ix=seg, nseg=64,
        )
        return n2.astype(n.dtype)

    out.append(measure("update_gru", upd, netc, f"E={E}"))

    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
