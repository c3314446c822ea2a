"""Training loop driver.

Re-design of /root/reference/train.py: per-batch random graph choice
(50% flow-covisibility graph, 50% temporal |i−j|≤2), first-two-pose
anchoring, random-restart inner loop reusing the last estimates, metrics
logging, and periodic checkpointing — improved over the reference by
checkpointing the FULL train state (params + optimizer + step) with orbax,
not just model weights (the reference loses optimizer state on resume,
train.py:134-136).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..geom.graph_utils import build_frame_graph, temporal_graph
from ..models.droidnet import DroidNet
from .logger import Logger
from .train_step import TrainState, create_train_state, make_train_step


def save_checkpoint(ckpt_dir, state, step):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:06d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, {
        "params": state.params, "opt_state": state.opt_state,
        "step": state.step,
    }))
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path, state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(np.asarray, {
        "params": state.params, "opt_state": state.opt_state,
        "step": state.step,
    })
    restored = ckptr.restore(os.path.abspath(path), target)
    return TrainState(
        params=restored["params"], opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]),
    )


def train(cfg: TrainConfig, dataset, mesh=None, max_steps=None,
          log_every=10, seed=0, edge_cap=None, resume=None,
          init_npz=None, start_step=None):
    """Run training over `dataset` (any object with sample_batches()).

    Edge lists are padded to a static capacity and passed as traced
    inputs, so ONE compile serves every sampled covisibility graph and
    the 50/50 graph randomization (reference train.py:88-94) runs
    uncapped.  Random-restart chains accumulate gradients and step the
    optimizer once, matching the reference's loss.backward() accumulation
    (train.py:102-127).
    """
    from .train_step import pad_edges

    # f32 compute for training: the reference trains fp32 (AMP is used
    # only at inference, motion_filter.py:32); bf16 training destabilizes
    # the flow loss
    net = DroidNet(dtype=None)
    state, tx = create_train_state(net, cfg, seed)
    if resume:
        state = restore_checkpoint(resume, state)
        print(f"resumed from {resume} at step {int(state.step)}",
              flush=True)
    elif init_npz:
        # warm-start from exported npz weights with a FRESH optimizer:
        # the fallback path when the orbax train-state dir is gone (it
        # lives under the gitignored checkpoints/, so only the exported
        # weights survive across environments).  `start_step` labels the
        # run's provenance (e.g. 105000 for weights/droid_synth.npz) and
        # advances the data stream past what the source run consumed.
        from ..models.convert import load_npz_weights

        loaded = load_npz_weights(init_npz)
        ref = jax.tree.structure(state.params["params"])
        got = jax.tree.structure(loaded["params"])
        if ref != got:
            raise ValueError(
                f"npz param tree mismatch: {init_npz} does not match "
                f"DroidNet (did the architecture change?)")
        params = {"params": jax.tree.map(jnp.asarray, loaded["params"])}
        state = TrainState(
            params=params, opt_state=tx.init(params["params"]),
            step=jnp.asarray(int(start_step or 0), jnp.int32),
        )
        print(f"warm-started from {init_npz} at step {int(state.step)} "
              f"(fresh optimizer)", flush=True)
    logger = Logger(cfg.name)

    # derive the data/graph randomness from (seed, resume step): a
    # resumed run must CONTINUE the stream, not replay the batches the
    # run already consumed (sample_batches would otherwise restart its
    # deterministic sequence from batch 0)
    start_step = int(state.step)
    rng = np.random.default_rng([seed, start_step])
    max_steps = max_steps or cfg.steps
    N = cfg.n_frames
    # capacity must hold BOTH graph families: the covisibility sampler
    # emits ~cfg.edges, the temporal |i-j|<=2 graph emits 4N-6 edges —
    # pad_edges silently truncates overflow, so undersizing would drop
    # edges (and BA constraints) for the later frames of every temporal
    # batch
    need = max(cfg.edges + 12, 4 * N - 6)
    E_cap = edge_cap or int(np.ceil(need / 8) * 8)

    accum, apply_g = make_train_step(
        net, tx, iters=cfg.iters, fix_scale=cfg.fix_scale, mesh=mesh,
    )

    try:
        batches = dataset.sample_batches(
            cfg.batch, rng=np.random.default_rng([seed + 1, start_step])
        )
    except TypeError:       # samplers without an rng parameter
        batches = dataset.sample_batches(cfg.batch)
    total_steps = start_step

    while total_steps < max_steps:
        batch_np = next(batches)

        # randomize the frame graph per batch (train.py:88-94)
        if rng.random() < 0.5:
            ii, jj = build_frame_graph(
                batch_np["poses"], batch_np["disps"],
                batch_np["intrinsics"], num=cfg.edges,
            )
        else:
            ii, jj = temporal_graph(N, r=2)
        ii_p, jj_p, emask = pad_edges(ii, jj, E_cap)

        h8 = batch_np["disps"].shape[2] // 8
        w8 = batch_np["disps"].shape[3] // 8
        batch = dict(
            images=jnp.asarray(batch_np["images"]),
            poses=jnp.asarray(batch_np["poses"]),
            disps=jnp.asarray(
                batch_np["disps"][:, :, 3::8, 3::8][:, :, :h8, :w8]
            ),
            disps_full=jnp.asarray(batch_np["disps"]),
            intrinsics=jnp.asarray(batch_np["intrinsics"]),
            ii=jnp.asarray(ii_p), jj=jnp.asarray(jj_p),
            edge_mask=jnp.asarray(emask),
        )

        t0 = time.perf_counter()
        B = batch["images"].shape[0]
        N2 = batch["images"].shape[1]
        h8 = batch["disps"].shape[-2]
        w8 = batch["disps"].shape[-1]
        Gs0 = jnp.zeros((B, N2, 7))
        disp0 = jnp.zeros((B, N2, h8, w8))   # all-zero => default init

        # random restarts reusing the last estimates, gradients summed
        # across the chain, ONE optimizer step (train.py:102-127)
        grads = jax.tree.map(jnp.zeros_like, state.params["params"])
        r = 0.0
        while r < cfg.restart_prob:
            r = rng.random()
            grads, metrics = accum(grads, state.params, batch, Gs0, disp0)
            Gs0 = metrics.pop("_Gs_last")
            disp0 = metrics.pop("_disp_last")

        state, opt_m = apply_g(state, grads)
        metrics.update(opt_m)
        total_steps += 1
        if total_steps % log_every == 0 or total_steps == 1:
            m = {k: float(v) for k, v in metrics.items()}
            m["step_time"] = time.perf_counter() - t0
            logger.push(m, total_steps)
            nf = m.get("grad_nonfinite_frac", 0.0)
            print(f"step {total_steps}: loss {m['loss']:.4f} "
                  f"geo {m['geo']:.4f} flow {m['flow']:.4f} "
                  f"pnorm {m['param_norm']:.1f} gnorm {m['grad_norm']:.2f} "
                  + (f"nanfrac {nf:.3f} " if nf > 0 else "")
                  + f"({m['step_time']:.2f}s)", flush=True)

        if total_steps % cfg.ckpt_every == 0:
            os.makedirs(cfg.ckpt_dir, exist_ok=True)
            save_checkpoint(cfg.ckpt_dir, state, total_steps)

    logger.flush(total_steps)
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    final = os.path.join(cfg.ckpt_dir, f"step_{total_steps:06d}")
    if not os.path.exists(final):   # ckpt_every may have just written it
        save_checkpoint(cfg.ckpt_dir, state, total_steps)
    return state
