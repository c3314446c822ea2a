"""On-silicon validation of the Pallas lookup kernel.

Compiles ops/corr_pallas.lookup_level_pallas for the real TPU, checks
exact parity against the gather reference and the one-hot matmul at
bench shapes, and times both implementations with the chain method
(cancels the axon relay readback).  Run when the chip is free:

  python tools/validate_pallas.py [--size 240 320] [--edges 44]
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
    ap.add_argument("--edges", type=int, default=44)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        # CPU has no Mosaic: run the kernels in interpret mode
        from jax.experimental.pallas import tpu as pltpu
        import contextlib
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    ctx.__enter__()

    from droid_slam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from droid_slam_tpu.ops import corr, corr_pallas

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    H, W = args.size[0] // 8, args.size[1] // 8
    E = args.edges
    rng = np.random.default_rng(0)

    for level in range(4):
        h2 = max(1, H >> level)
        w2 = max(1, W >> level)
        vol = jnp.asarray(
            rng.standard_normal((1, E, H, W, h2, w2)), jnp.bfloat16
        )
        coords = jnp.asarray(
            rng.uniform(-3, max(h2, w2) + 2, (1, E, H, W, 2)), jnp.float32
        )

        # parity reference on chip is the onehot path (itself validated
        # against the take_along_axis gather on CPU by tests/test_corr.py;
        # the gather lowers to a near-scalar loop on TPU and takes
        # minutes at level-0 size)
        want = np.asarray(jax.jit(corr.lookup_level_onehot)(vol, coords))
        for kname, kern in (("pallas", corr_pallas.lookup_level_pallas),
                            ("pallas_v2",
                             corr_pallas.lookup_level_pallas_v2)):
            got = np.asarray(kern(vol, coords))
            err = np.max(np.abs(got - want))
            print(f"L{level} ({h2}x{w2}): max|{kname} - onehot| = "
                  f"{err:.4g}", flush=True)
            assert err < 0.05, (kname, err)

    # timing: chained k-round lookups, (t_k - t_1)/(k-1)
    vol = jnp.asarray(
        rng.standard_normal((1, E, H, W, H, W)), jnp.bfloat16
    )
    coords = jnp.asarray(
        rng.uniform(0, W - 1, (1, E, H, W, 2)), jnp.float32
    )

    def chain(fn, k):
        @jax.jit
        def f(vol, coords):
            def body(c, _):
                taps = fn(vol, c)
                # feed taps back into coords so rounds can't be elided
                c = c + 1e-6 * jnp.mean(taps, axis=-1, keepdims=True)
                return c, None
            c, _ = jax.lax.scan(body, coords, None, length=k)
            return c
        return f

    def timed(fn, k, nrep=3):
        f = chain(fn, k)
        r = f(vol, coords)
        float(jnp.sum(r))                       # true barrier via readback
        t0 = time.perf_counter()
        for _ in range(nrep):
            float(jnp.sum(f(vol, coords)))
        return (time.perf_counter() - t0) / nrep

    for name, fn in (("onehot", corr.lookup_level_onehot),
                     ("pallas", corr_pallas.lookup_level_pallas),
                     ("pallas_v2", corr_pallas.lookup_level_pallas_v2)):
        t1 = timed(fn, 1)
        tk = timed(fn, args.k)
        per = (tk - t1) / (args.k - 1)
        print(f"{name}: {1e3 * per:.2f} ms/level-0 lookup "
              f"(1-chain {1e3 * t1:.1f} ms incl. relay)", flush=True)


if __name__ == "__main__":
    main()
