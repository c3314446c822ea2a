"""Distributed-BA scaling with PINNED disjoint host cores (VERDICT r3 #8).

The virtual-CPU-mesh scaling numbers (tools/bench_scaling.py) are
core-sharing-confounded: all N virtual devices draw from ONE XLA host
threadpool, so an N-device run gets the same total cores as a 1-device
run and the measured "efficiency" conflates communication overhead with
core contention.  This harness launches one OS process per shard,
`taskset`-pinned to a disjoint core set, connected via
jax.distributed — each shard really gets its own compute, so the 2-way
point isolates the communication cost the way real 2-host ICI/DCN would.

Methodology: fixed-size problem (96 frames, 48x64 feature grid, ~1.1k
edges — the 384x512 backend regime).  Baseline = 1 process on
`cores_per_shard` cores solving the WHOLE problem; S-shard = S
processes on disjoint core sets of the same size, each solving 1/S.
Ideal time ratio = S; efficiency = t_base / (S * t_dist).  Requires
S_max * cores_per_shard <= host cores (this box: 4 cores, so the
4-shard point runs at 1 core/shard against a 1-core baseline —
VERDICT r4 item 6).

Each row reports psum bytes/GN-iteration (the solver's only cross-device
communication: the dense pose system H+v plus the disjoint-frame depth
merge, parallel/dba.py:337-386).

  python tools/bench_scaling_pinned.py --shards 2,4 --cores_per_shard 1
  (worker mode is internal: --worker PID)
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

PORT = 29533
T, HT, WD, EPF, ITERS, REPS = 96, 48, 64, 12, 2, 3


def build_problem():
    import jax.numpy as jnp
    import numpy as np

    from droid_slam_tpu.geom import projective
    from droid_slam_tpu.lie import se3

    BUF = T + 4
    rng = np.random.default_rng(0)
    xs = np.cumsum(0.03 * rng.standard_normal((T, 6)), 0)
    xs[0] = 0
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (BUF, 1)).astype(np.float32)
    poses[:T] = np.asarray(se3.exp(jnp.asarray(xs, jnp.float32)))
    disps = (0.6 + 0.25 * rng.random((BUF, HT, WD))).astype(np.float32)
    intr = np.tile([WD * 1.2, WD * 1.2, WD / 2, HT / 2], (BUF, 1)).astype(
        np.float32)

    r = max(1, EPF // 2)
    ii, jj = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    keep = (np.abs(ii - jj) >= 1) & (np.abs(ii - jj) <= r)
    ii, jj = ii[keep].astype(np.int32), jj[keep].astype(np.int32)
    target, _ = projective.projective_transform(
        jnp.asarray(poses)[None], jnp.asarray(disps)[None],
        jnp.asarray(intr)[None], jnp.asarray(ii), jnp.asarray(jj))
    target = np.asarray(target[0])
    weight = np.ones_like(target)
    mask = np.ones(len(ii), bool)
    eta = 1e-4 * np.ones((BUF, HT, WD), np.float32)
    P_cap = 1
    while P_cap < T:
        P_cap *= 2
    return (poses, disps, intr, eta, ii, jj, target, weight, mask, P_cap,
            BUF)


def worker(pid, nprocs):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(f"127.0.0.1:{PORT}",
                                   num_processes=nprocs, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from droid_slam_tpu.parallel import dba as pdba

    (poses, disps, intr, eta, ii, jj, target, weight, mask, P_cap,
     BUF) = build_problem()

    n = nprocs
    E_shard = (len(ii) + n - 1) // n + 4 * EPF
    K_shard = (T + n - 1) // n + 4
    shards = pdba.shard_edges_by_frame(
        ii, jj, target, weight, mask, n_shards=n,
        E_shard=E_shard, K_shard=K_shard, D=4 * EPF, t0=1, t1=T)

    mesh = Mesh(np.array(jax.devices()), ("ba",))
    fn = pdba.make_distributed_ba(mesh, iters=ITERS, P_cap=P_cap)

    rep_sh = NamedSharding(mesh, P())
    shd_sh = NamedSharding(mesh, P("ba"))

    def glob(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx])

    args = (
        glob(poses, rep_sh), glob(disps, rep_sh),
        glob(np.zeros((BUF, HT, WD), np.float32), rep_sh),
        glob(intr, rep_sh), glob(eta, rep_sh),
        *[glob(s, shd_sh) for s in shards], 1, T,
    )

    def run():
        out = fn(*args)
        jax.block_until_ready(out)

    run()                      # warm/compile
    if nprocs > 1:
        from jax.experimental import multihost_utils as mhu
        mhu.sync_global_devices("warm")
    t0 = time.perf_counter()
    for _ in range(REPS):
        run()
    dt = (time.perf_counter() - t0) / REPS / ITERS
    if pid == 0:
        # the solver's only collectives, per GN iteration (f32):
        #   psum(H): (P_cap*6)^2, psum(vd): P_cap*6,
        #   psum(dz_full): buf*HT*WD  (parallel/dba.py:337-338,386)
        psum_bytes = 4 * ((P_cap * 6) ** 2 + P_cap * 6 + BUF * HT * WD)
        print(json.dumps({"nprocs": nprocs,
                          "ms_per_iteration": round(dt * 1e3, 2),
                          "edges": int(len(ii)), "frames": T,
                          "hw": [HT, WD], "P_cap": P_cap,
                          "psum_bytes_per_iter": psum_bytes}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--cores_per_shard", type=int, default=2)
    ap.add_argument("--shards", default="2",
                    help="comma-separated shard counts, e.g. 2,4")
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.nprocs)
        return

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    c = args.cores_per_shard
    shard_counts = [int(s) for s in args.shards.split(",")]
    ncores = os.cpu_count() or 1
    assert max(shard_counts) * c <= ncores, (
        f"{max(shard_counts)} shards x {c} cores > {ncores} host cores")

    def launch(pid, nprocs, cores):
        return subprocess.Popen(
            ["taskset", "-c", cores, sys.executable, __file__,
             "--worker", str(pid), "--nprocs", str(nprocs)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True)

    # baseline: whole problem, one shard, `c` cores
    p = launch(0, 1, ",".join(str(i) for i in range(c)))
    base = json.loads(p.communicate()[0].strip().splitlines()[-1])
    print(json.dumps({**base, "cores": c, "role": "baseline"}), flush=True)

    for S in shard_counts:
        procs = [
            launch(i, S,
                   ",".join(str(j) for j in range(i * c, (i + 1) * c)))
            for i in range(S)
        ]
        out0 = procs[0].communicate()[0]
        for q in procs[1:]:
            q.wait()
        dist = json.loads(out0.strip().splitlines()[-1])
        eff = base["ms_per_iteration"] / (S * dist["ms_per_iteration"])
        print(json.dumps({**dist, "cores_per_shard": c,
                          "role": f"{S}-shard",
                          "efficiency": round(eff, 3)}), flush=True)
        print(json.dumps({
            "metric": f"pinned_core_{S}shard_efficiency",
            "baseline_ms": base["ms_per_iteration"],
            "dist_ms": dist["ms_per_iteration"],
            "efficiency": round(eff, 3),
            "psum_bytes_per_iter": dist.get("psum_bytes_per_iter"),
            "method": "fixed-size problem; baseline 1 proc on "
                      f"{c} cores, {S} shards on disjoint {c}-core sets "
                      "via jax.distributed (taskset), so per-shard "
                      "compute is NOT shared — isolates communication",
        }), flush=True)


if __name__ == "__main__":
    main()
