"""Keyframe map state: fixed-capacity device buffers + host counter.

Re-design of the reference's DepthVideo
(/root/reference/droid_slam/depth_video.py): pre-allocated per-keyframe
buffers (timestamps, poses, inverse depths, sensor depths, intrinsics,
correlation/context/GRU features) plus geometric ops (reproject, frame
distance, BA dispatch, gauge normalization).

TPU design: the state is a single pytree of fixed-shape device arrays —
no shared-memory multiprocessing; every mutation is a jit-compiled
functional update (XLA donates and updates in place).  The keyframe
counter and bookkeeping live on the host.
"""

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..ops import dba, distance


def read_slot(arr, idx):
    """arr[idx] with a *dynamic* index.

    Outside jit, indexing with a Python int bakes the index into the XLA
    program, so every distinct frame index compiles a new (tiny) program —
    ruinous on remote-compile TPU setups.  A traced index keeps one cached
    program for all values.
    """
    return jnp.take(arr, jnp.asarray(idx, jnp.int32), axis=0)


def write_slot(arr, idx, val):
    """arr.at[idx].set(val) with a dynamic index (see read_slot)."""
    return arr.at[jnp.asarray(idx, jnp.int32)].set(val)


@flax.struct.dataclass
class VideoState:
    tstamp: jnp.ndarray        # (BUF,) f32
    images: jnp.ndarray        # (BUF, H, W, 3) uint8 (vis/debug only)
    poses: jnp.ndarray         # (BUF, 7) f32, w2c
    disps: jnp.ndarray         # (BUF, h, w) f32, init 1
    disps_sens: jnp.ndarray    # (BUF, h, w) f32
    disps_up: jnp.ndarray      # (BUF, H, W) f32 ((1,H,W) when upsample off)
    intrinsics: jnp.ndarray    # (BUF, 4) f32 at 1/8 resolution
    fmaps: jnp.ndarray         # (BUF, rig, h, w, 128) bf16
    nets: jnp.ndarray          # (BUF, h, w, 128) f16 (ref fp16,
    inps: jnp.ndarray          # (BUF, h, w, 128) f16  depth_video.py:36-38)
    damping: jnp.ndarray       # (BUF, h, w) f32 (factor_graph.damping)


def init_state(buffer, image_size, stereo=False, upsample=True):
    H, W = image_size
    h, w = H // 8, W // 8
    rig = 2 if stereo else 1
    # disps_up is only populated by the convex-upsample path; when it is
    # disabled (e.g. 1024-keyframe 384×512 backends) the full (BUF,H,W)
    # f32 buffer would waste 1.6 GB of HBM — keep a 1-row placeholder
    up_rows = buffer if upsample else 1
    return VideoState(
        tstamp=jnp.zeros((buffer,), jnp.float32),
        images=jnp.zeros((buffer, H, W, 3), jnp.uint8),
        poses=jnp.tile(
            jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32), (buffer, 1)
        ),
        disps=jnp.ones((buffer, h, w), jnp.float32),
        disps_sens=jnp.zeros((buffer, h, w), jnp.float32),
        disps_up=jnp.zeros((up_rows, H, W), jnp.float32),
        intrinsics=jnp.zeros((buffer, 4), jnp.float32),
        fmaps=jnp.zeros((buffer, rig, h, w, 128), jnp.bfloat16),
        # f16 context/GRU-seed buffers, matching the reference's fp16
        # feature stores exactly (depth_video.py:36-38); readers promote
        # to f32.  NOT bf16: these tanh/relu-bounded activations need
        # f16's 3 extra mantissa bits (bf16 measurably perturbs the GRU)
        nets=jnp.zeros((buffer, h, w, 128), jnp.float16),
        inps=jnp.zeros((buffer, h, w, 128), jnp.float16),
        damping=1e-6 * jnp.ones((buffer, h, w), jnp.float32),
    )


@jax.jit
def _append(state, idx, tstamp, image, pose, disp, disp_sens, intr,
            fmap, net, inp):
    return state.replace(
        tstamp=state.tstamp.at[idx].set(tstamp),
        images=state.images.at[idx].set(image),
        poses=state.poses.at[idx].set(pose),
        disps=state.disps.at[idx].set(disp),
        disps_sens=state.disps_sens.at[idx].set(disp_sens),
        intrinsics=state.intrinsics.at[idx].set(intr),
        fmaps=state.fmaps.at[idx].set(fmap.astype(state.fmaps.dtype)),
        nets=state.nets.at[idx].set(net.astype(state.nets.dtype)),
        inps=state.inps.at[idx].set(inp.astype(state.inps.dtype)),
    )


@jax.jit
def pool_pyramid(x, levels=4):
    """3× average-pooled pyramid of (N, h, w, C) features, dtype kept.

    The ONE implementation of the correlation pyramid's pooling — the
    fused frontend and the motion filter must stay in lockstep with the
    lookup's level semantics, so they all call this.
    """
    out = [x]
    for _ in range(levels - 1):
        N, h, w, C = x.shape
        h2, w2 = h // 2 * 2, w // 2 * 2
        x = x[:, :h2, :w2].reshape(N, h2 // 2, 2, w2 // 2, 2, C).mean((2, 4))
        out.append(x)
    return tuple(out)


def _fmap_pyramids(fmaps):
    """Pooled feature pyramids for the on-the-fly correlation.

    (BUF, rig, h, w, 128) -> tuple of 4 levels (BUF·rig, h/2^l, w/2^l, 128)
    bf16 (raw scale; the update core divides by 4, matching AltCorrBlock's
    construction, reference modules/corr.py:116-124).
    """
    return pool_pyramid(
        fmaps.reshape((-1,) + fmaps.shape[2:]).astype(jnp.bfloat16)
    )


@jax.jit
def _copy_slot(state, dst, src):
    """Copy keyframe src -> dst (rm_keyframe shift, factor_graph.py:164-181)."""
    def cp(arr):
        return arr.at[dst].set(arr[src])

    return state.replace(
        tstamp=cp(state.tstamp), images=cp(state.images),
        poses=cp(state.poses), disps=cp(state.disps),
        disps_sens=cp(state.disps_sens), intrinsics=cp(state.intrinsics),
        fmaps=cp(state.fmaps), nets=cp(state.nets), inps=cp(state.inps),
    )


@jax.jit
def _normalize(state, count):
    """Fix the monocular scale gauge: mean disparity -> 1
    (depth_video.py:129-136)."""
    mask = (jnp.arange(state.disps.shape[0]) < count)
    s = jnp.sum(
        jnp.where(mask[:, None, None], state.disps, 0.0)
    ) / (jnp.sum(mask) * state.disps.shape[1] * state.disps.shape[2])
    disps = jnp.where(mask[:, None, None], state.disps / s, state.disps)
    t_scaled = state.poses[:, :3] * s
    poses = jnp.where(
        mask[:, None],
        jnp.concatenate([t_scaled, state.poses[:, 3:]], axis=-1),
        state.poses,
    )
    return state.replace(disps=disps, poses=poses)


class DepthVideo:
    """Host wrapper: counter + functional updates of the VideoState pytree."""

    def __init__(self, config):
        self.cfg = config
        self.counter = 0
        self.ready = False
        self.state = init_state(config.buffer, config.image_size,
                                config.stereo,
                                upsample=getattr(config, "upsample", True))
        self.ht, self.wd = config.image_size
        self.fht, self.fwd = self.ht // 8, self.wd // 8

    # -- mutation ----------------------------------------------------------

    def append(self, tstamp, image, pose, disp, depth, intrinsics,
               fmap, net, inp):
        """Add a keyframe (depth_video.py:46-103 analog).

        depth: optional full-res metric depth; subsampled at pixel centers
        [3::8, 3::8] and inverted (depth_video.py:64-65).
        """
        if self.counter >= self.cfg.buffer:
            raise RuntimeError(
                f"keyframe buffer full ({self.cfg.buffer} slots): the "
                f"sequence produced more keyframes than SLAMConfig.buffer "
                f"allows — raise `buffer` (reference --buffer flag) or "
                f"increase keyframe_thresh to keyframe less often"
            )
        if depth is not None:
            d = np.asarray(depth)[3::8, 3::8]
            disp_sens = np.where(d > 0, 1.0 / np.maximum(d, 1e-8), 0.0)
        else:
            disp_sens = np.zeros((self.fht, self.fwd), np.float32)
        if disp is None:
            # preserve the slot's current value: the frontend extrapolates
            # the next keyframe's disparity into it (reference
            # depth_video.py:59-62 keeps the buffer value when item is None)
            disp = read_slot(self.state.disps, self.counter)
        elif np.ndim(disp) == 0:
            disp = np.full((self.fht, self.fwd), float(disp), np.float32)
        if pose is None:
            pose = read_slot(self.state.poses, self.counter)

        self.state = _append(
            self.state, self.counter, tstamp, image, pose, disp,
            jnp.asarray(disp_sens, jnp.float32), intrinsics,
            fmap, net, inp,
        )
        self.counter += 1

    def copy_slot(self, dst, src):
        self.state = _copy_slot(self.state, dst, src)

    def normalize(self):
        self.state = _normalize(self.state, self.counter)

    def fmap_pyramids(self):
        """Pooled correlation-feature pyramids over all keyframe slots."""
        return _fmap_pyramids(self.state.fmaps)

    def upsample(self, ix, mask):
        """Convex-upsample disparities of frames ix into disps_up
        (depth_video.py:123-127)."""
        from ..models.update import upsample_disp
        from ..ops.gathers import take_rows

        ix = jnp.asarray(ix, jnp.int32).reshape(-1)
        d = take_rows(self.state.disps, ix)
        up = upsample_disp(d, mask)
        disps_up = self.state.disps_up.at[ix].set(up)
        self.state = self.state.replace(disps_up=disps_up)

    # -- geometry ----------------------------------------------------------

    def reproject(self, ii, jj):
        coords, valid = projective.projective_transform(
            self.state.poses[None], self.state.disps[None],
            self.state.intrinsics[None], jnp.asarray(ii), jnp.asarray(jj),
        )
        return coords[0], valid[0]

    # pairs per frame_distance dispatch: each pair materializes an
    # (h, w, 2) flow field, so an unchunked 1000-keyframe proximity query
    # (t² = 1e6 pairs × 48×64 grids) would need ~25 GB of transients.
    # 16384 pairs × 3072 px × 2 × 4 B ≈ 0.4 GB per dispatch.
    DISTANCE_CHUNK = 16384

    def distance(self, ii, jj, beta=0.3, bidirectional=True):
        # pad queries to power-of-2 buckets: the frontend's candidate set
        # grows every keyframe, and an exact-shape jit would recompile
        # frame_distance once per frame (the dominant cost on remote-compile
        # TPU setups).  Queries beyond DISTANCE_CHUNK run as host-chunked
        # fixed-shape dispatches (backend global proximity at 512-1024
        # keyframes; reference computes the same t² matrix in CUDA chunks,
        # depth_video.py:149-179).
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        n = len(ii)
        if n > self.DISTANCE_CHUNK:
            out = np.empty(n, np.float32)
            c = self.DISTANCE_CHUNK
            for lo in range(0, n, c):
                hi = min(lo + c, n)
                out[lo:hi] = np.asarray(
                    self.distance(ii[lo:hi], jj[lo:hi], beta=beta,
                                  bidirectional=bidirectional)
                )
            return out
        cap = 16
        while cap < n:
            cap *= 2
        ii_p = np.zeros(cap, np.int32)
        jj_p = np.zeros(cap, np.int32)
        ii_p[:n], jj_p[:n] = ii, jj

        ii_j = jnp.asarray(ii_p)
        jj_j = jnp.asarray(jj_p)
        intr = self.state.intrinsics[0]
        d = distance.frame_distance(
            self.state.poses, self.state.disps, intr, ii_j, jj_j, beta
        )
        if bidirectional:
            d2 = distance.frame_distance(
                self.state.poses, self.state.disps, intr, jj_j, ii_j, beta
            )
            d = 0.5 * (d + d2)
        return d[:n]

    def distance_matrix(self, beta=0.3):
        """(t, t) bidirectional distance matrix, chunked through
        `distance` so large maps never materialize t²·h·w flows."""
        t = self.counter
        ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
        d = self.distance(ii.reshape(-1), jj.reshape(-1), beta=beta,
                          bidirectional=True)
        return np.asarray(d).reshape(t, t)

    def ba(self, target, weight, eta, ii, jj, edge_mask, t0, t1,
           itrs=2, lm=1e-4, ep=0.1, motion_only=False,
           pose_cap=None, depth_cap=None, degree_cap=None):
        """Dense BA over the current graph (depth_video.py:181-193 analog)."""
        cfg = self.cfg
        P = pose_cap or cfg.frontend_pose_cap
        K = depth_cap or cfg.frontend_depth_cap
        D = degree_cap or cfg.schur_degree_cap
        kx, kmask, table = dba.build_schur_tables(
            np.asarray(ii), np.asarray(edge_mask), t0, t1, K, D
        )
        # large pose windows (global BA at 256+ keyframes): compact Schur
        # via host-built local pose tables — SLAM graphs are temporally
        # local, so each depth-frame chunk couples to far fewer than P
        # poses and the dense E·CK·P selector contraction is wasteful
        extra = {}
        if P >= 256 and not motion_only:
            CK = 16
            tabs = dba.build_compact_pose_tables(
                np.asarray(ii), np.asarray(jj), np.asarray(edge_mask),
                kx, kmask, t0, t1, CK, P,
            )
            if tabs is not None and tabs[2] < P // 2:
                loc, val, _ = tabs
                extra = dict(
                    schur_chunk=CK,
                    loc_pose=jnp.asarray(loc),
                    loc_valid=jnp.asarray(val),
                )
        poses, disps = dba.ba(
            self.state.poses, self.state.disps, self.state.disps_sens,
            self.state.intrinsics, target, weight, eta,
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(edge_mask),
            jnp.asarray(kx), jnp.asarray(kmask), jnp.asarray(table),
            t0, t1, iters=itrs, lm=lm, ep=ep,
            motion_only=motion_only, P=P, **extra,
        )
        self.state = self.state.replace(poses=poses, disps=disps)
