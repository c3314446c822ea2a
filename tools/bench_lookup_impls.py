"""A/B the cached-volume lookup layouts on the chip.

The fused frontend builds the per-edge correlation pyramid once per
keyframe step (an einsum per level) and every update round then runs a
windowed bilinear lookup on it.  Round 2 cached the pyramid as 6-D
(1, E, H, W, h2, w2) tensors; the profiler showed each round paying a
full relayout copy of levels 0-1 (~5 ms/frame) because the (Q, h2, w2)
reshape inside the lookup could not be a bitcast of the einsum-produced
layout.  Round 3 stores the pyramid pre-flattened as (Q, h2, w2)
(corr.lookup_pyramid_flat).  This tool times both layouts in the cached
context (volume produced by the same einsum as runtime/fused.py, k
lookup rounds consuming it inside one jitted program) so the relayout
cost is visible, and parity-checks flat-vs-6D at a tiny shape first.

  python tools/bench_lookup_impls.py [--size 240 320] [--edges 64]
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--edges", type=int, default=64)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from droid_slam_tpu.ops import corr

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    H, W = args.size[0] // 8, args.size[1] // 8
    E = args.edges
    D = 128  # feature dim at 1/8 res
    rng = np.random.default_rng(0)

    # --- tiny-shape parity: flat path == 6-D onehot path ---------------
    h, w, e = 6, 8, 3
    vol6 = jnp.asarray(rng.standard_normal((1, e, h, w, h, w)), jnp.float32)
    crd = jnp.asarray(rng.uniform(-2, 9, (1, e, h, w, 2)), jnp.float32)
    a = jax.jit(corr.lookup_level_onehot)(vol6, crd)
    b = jax.jit(
        lambda v, c: corr.lookup_level_onehot_flat(
            v.reshape(-1, h, w), c.reshape(-1, 2)
        )
    )(vol6, crd)
    err = float(jnp.max(jnp.abs(a.reshape(-1, a.shape[-1]) - b)))
    assert err < 1e-5, err
    print(f"parity flat vs 6-D onehot: {err:.2g}", flush=True)

    # --- cached-context timing ------------------------------------------
    # volume from the same einsum as make_edge_volumes, then k rounds of
    # pyramid lookup inside one program (scan carries the coords).
    f1 = jnp.asarray(rng.standard_normal((E, H * W, D)), jnp.bfloat16)

    def build_pyr(f2_pyr, flat):
        vols = []
        for f2 in f2_pyr:
            h2, w2 = f2.shape[1], f2.shape[2]
            v = jnp.einsum(
                "epc,eqc->epq", f1, f2.reshape(E, h2 * w2, D),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            vols.append(
                v.reshape(E * H * W, h2, w2) if flat
                else v.reshape(1, E, H, W, h2, w2)
            )
        return vols

    def rounds(vols, coords, k, flat):
        def body(c, _):
            if flat:
                taps = corr.lookup_pyramid_flat(vols, c.reshape(-1, 2))
                taps = taps.reshape(E, H, W, -1)
            else:
                taps = jnp.concatenate([
                    corr.lookup_level_onehot(v, (c / 2.0 ** l)[None])[0]
                    for l, v in enumerate(vols)
                ], axis=-1)
            c = c + 1e-6 * jnp.mean(taps, axis=-1, keepdims=True)
            return c, None
        c, _ = jax.lax.scan(body, coords, None, length=k)
        return c

    f2_pyr = [
        jnp.asarray(
            rng.standard_normal((E, max(1, H >> l), max(1, W >> l), D)),
            jnp.bfloat16,
        )
        for l in range(4)
    ]
    coords = jnp.asarray(rng.uniform(0, 20, (E, H, W, 2)), jnp.float32)

    for flat in (False, True):
        @jax.jit
        def prog(f2_pyr, coords, k=args.k, flat=flat):
            return rounds(build_pyr(f2_pyr, flat), coords, k, flat)

        float(jnp.sum(prog(f2_pyr, coords)))  # compile
        t0 = time.perf_counter()
        nrep = 5
        for _ in range(nrep):
            float(jnp.sum(prog(f2_pyr, coords)))
        per = (time.perf_counter() - t0) / nrep
        name = "flat (Q,h2,w2)" if flat else "6-D cached"
        print(f"{name:16s}: {1e3 * per:8.2f} ms "
              f"({args.k} rounds, E={E}, {H}x{W})", flush=True)


if __name__ == "__main__":
    main()
