"""Export an orbax train-state checkpoint to the shipped weights npz.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/export_weights.py checkpoints/r2_main4/step_105000 \
      [--out weights/droid_synth.npz]

Writes the npz plus a .json sidecar recording provenance (source
checkpoint, step, parameter count/norm) so the shipped file is
traceable to its training run.
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="orbax train-state checkpoint dir")
    ap.add_argument("--out", default=None,
                    help="output npz (default weights/droid_synth.npz)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from droid_slam_tpu.config import TrainConfig
    from droid_slam_tpu.models.convert import save_npz_weights
    from droid_slam_tpu.models.droidnet import DroidNet
    from droid_slam_tpu.training.train_step import create_train_state
    from droid_slam_tpu.training.trainer import restore_checkpoint

    tc = TrainConfig(image_size=(64, 96), n_frames=4, steps=10)
    net = DroidNet(dtype=None)
    state, _ = create_train_state(net, tc)
    state = restore_checkpoint(args.ckpt, state)
    step = int(state.step)

    out = args.out or osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))),
        "weights", "droid_synth.npz",
    )
    n = save_npz_weights(state.params, out)
    leaves = jax.tree.leaves(state.params)
    pnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in leaves)))
    meta = dict(
        source_checkpoint=osp.abspath(args.ckpt),
        step=step,
        arrays=n,
        n_params=int(sum(np.size(x) for x in leaves)),
        param_norm=round(pnorm, 4),
    )
    with open(out.replace(".npz", ".json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {out} ({n} arrays, step {step}, |p|={pnorm:.2f})")


if __name__ == "__main__":
    main()
