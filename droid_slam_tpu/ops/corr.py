"""Correlation volumes and windowed bilinear lookups.

Re-design of the reference's correlation stack:
  * `CorrBlock` — precomputed all-pairs volume + 4-level average-pooled
    pyramid + (2r+1)² bilinear window lookup
    (/root/reference/droid_slam/modules/corr.py:23-71,
     /root/reference/src/correlation_kernels.cu:20-124).
  * `AltCorrBlock` — memory-light on-the-fly correlation: dot products of
    fmap1 against bilinearly-sampled fmap2 in the lookup window
    (/root/reference/droid_slam/modules/corr.py:91-139,
     /root/reference/src/altcorr_kernel.cu:28-149).

TPU design:
  * Layout is channels-last (..., H, W, C) with C = 128 = one VPU lane row.
  * Volume construction is a single bf16 einsum (MXU); lookups are batched
    gathers expressed with take_along_axis so XLA lowers them to dynamic
    gathers over a flattened last axis.
  * Tap/channel ordering matches the CUDA kernel exactly: channel index is
    ``ox * (2r+1) + oy`` (x-offset major), sample position
    ``(x + ox - r, y + oy - r)``, zero contribution from out-of-bounds
    bilinear corners (correlation_kernels.cu:47-68).
  * A Pallas kernel for the lookup lives in corr_pallas.py; this module is
    the reference implementation and the fallback path.

Functional API (no classes): pytrees of arrays in, arrays out, jit-safe.
"""

from functools import partial

import jax
import jax.numpy as jnp

NUM_LEVELS = 4
RADIUS = 3

# tap-lookup matmul precision (see lookup_level_onehot)
LOOKUP_PRECISION = jax.lax.Precision.DEFAULT


def corr_volume(fmap1, fmap2):
    """All-pairs correlation volume.

    Args:
      fmap1, fmap2: (B, N, H, W, C) feature maps.
    Returns:
      (B, N, H, W, H, W) volume = <fmap1/4, fmap2/4> (corr.py:103-110).
    """
    B, N, H, W, C = fmap1.shape
    f1 = (fmap1 / 4.0).reshape(B * N, H * W, C)
    f2 = (fmap2 / 4.0).reshape(B * N, H * W, C)
    corr = jnp.einsum(
        "qic,qjc->qij", f1, f2, preferred_element_type=jnp.float32
    )
    return corr.reshape(B, N, H, W, H, W)


def _avg_pool2(x):
    """2×2 stride-2 average pool over the last two dims of (..., H, W).

    Floors odd trailing rows/cols like torch F.avg_pool2d (corr.py:70).
    """
    shape = x.shape
    H, W = shape[-2] // 2 * 2, shape[-1] // 2 * 2
    x = x[..., :H, :W].reshape(shape[:-2] + (H // 2, 2, W // 2, 2))
    return x.mean(axis=(-3, -1))


def build_pyramid(volume, num_levels=NUM_LEVELS):
    """Average-pool the target dims of the volume into a pyramid.

    volume: (B, N, H, W, H2, W2) -> list of (B, N, H, W, H2/2^l, W2/2^l).
    """
    pyramid = [volume]
    for _ in range(num_levels - 1):
        volume = _avg_pool2(volume)
        pyramid.append(volume)
    return pyramid


def _bilinear_taps(coords, radius, h2, w2):
    """Tap positions, weights, and flat gather indices for a lookup window.

    Args:
      coords: (..., 2) float [x, y] sample centers.
    Returns:
      idx: (..., T*4) int32 flat indices into an (h2*w2,) axis (clipped),
      w:   (..., T*4) float weights (zero where out of bounds),
      with T = (2r+1)² taps ordered x-offset major.
    """
    r = radius
    rd = 2 * r + 1
    x0 = jnp.floor(coords[..., 0])
    y0 = jnp.floor(coords[..., 1])
    dx = coords[..., 0] - x0
    dy = coords[..., 1] - y0

    ox = jnp.arange(-r, r + 1, dtype=coords.dtype)
    oy = jnp.arange(-r, r + 1, dtype=coords.dtype)
    # (T,) offsets, x-major ordering to match the CUDA channel layout
    off_x = jnp.repeat(ox, rd)
    off_y = jnp.tile(oy, rd)

    # integer corner bases per tap: (..., T)
    xb = x0[..., None] + off_x
    yb = y0[..., None] + off_y

    # 4 bilinear corners: (0,0), (1,0), (0,1), (1,1) in (x, y)
    cx = jnp.stack([xb, xb + 1, xb, xb + 1], axis=-1)       # (..., T, 4)
    cy = jnp.stack([yb, yb, yb + 1, yb + 1], axis=-1)
    wx = jnp.stack([1 - dx, dx, 1 - dx, dx], axis=-1)[..., None, :]
    wy = jnp.stack([1 - dy, 1 - dy, dy, dy], axis=-1)[..., None, :]
    w = wx * wy                                             # (..., T, 4)

    valid = (cx >= 0) & (cx < w2) & (cy >= 0) & (cy < h2)
    w = jnp.where(valid, w, 0.0)

    cxi = jnp.clip(cx.astype(jnp.int32), 0, w2 - 1)
    cyi = jnp.clip(cy.astype(jnp.int32), 0, h2 - 1)
    idx = cyi * w2 + cxi

    T4 = (rd * rd) * 4
    return idx.reshape(idx.shape[:-2] + (T4,)), w.reshape(w.shape[:-2] + (T4,))


def lookup_level(volume_level, coords, radius=RADIUS):
    """Windowed bilinear lookup on one pyramid level.

    Args:
      volume_level: (B, N, H, W, h2, w2).
      coords: (B, N, H, W, 2) float [x, y] in level-resolution units.
    Returns:
      (B, N, H, W, (2r+1)²) correlation taps.
    """
    B, N, H, W, h2, w2 = volume_level.shape
    vol = volume_level.reshape(B * N * H * W, h2 * w2)
    idx, w = _bilinear_taps(coords.reshape(-1, 2), radius, h2, w2)
    vals = jnp.take_along_axis(vol, idx, axis=-1)
    T = (2 * radius + 1) ** 2
    out = (vals.astype(jnp.float32) * w).reshape(-1, T, 4).sum(-1)
    return out.reshape(B, N, H, W, T)


def lookup_level_patch(volume_level, coords, radius=RADIUS):
    """Patch-based lookup: identical output to lookup_level, formulated as
    vmapped (2r+2)² dynamic-slice extractions from a zero-padded volume
    followed by the 4-shift bilinear combine.

    XLA lowers the vmapped dynamic_slice to a gather with slice_sizes
    (2r+2, 2r+2) — contiguous 64-element blocks instead of 4·(2r+1)²
    scalar gathers per pixel, which is dramatically faster on TPU.
    """
    B, N, H, W, h2, w2 = volume_level.shape
    r = radius
    rd = 2 * r + 1
    L = rd + 1  # pad so clamped far-out windows read only zeros

    vol = volume_level.reshape(B * N, H * W, h2, w2)
    vol = jnp.pad(vol, ((0, 0), (0, 0), (L, L), (L, L)))

    c = coords.reshape(B * N, H * W, 2)
    x0f = jnp.floor(c[..., 0])
    y0f = jnp.floor(c[..., 1])
    dx = c[..., 0] - x0f
    dy = c[..., 1] - y0f
    ix = jnp.clip(x0f.astype(jnp.int32) - r + L, 0, w2 + 2 * L - (rd + 1))
    iy = jnp.clip(y0f.astype(jnp.int32) - r + L, 0, h2 + 2 * L - (rd + 1))

    def slice_patch(plane, y0, x0):
        return jax.lax.dynamic_slice(plane, (y0, x0), (rd + 1, rd + 1))

    patches = jax.vmap(jax.vmap(slice_patch))(vol, iy, ix)  # (E,HW,8,8)
    patches = patches.astype(jnp.float32)

    dxb = dx[..., None, None].astype(jnp.float32)
    dyb = dy[..., None, None].astype(jnp.float32)
    taps = (
        (1 - dxb) * (1 - dyb) * patches[..., :rd, :rd]
        + dxb * (1 - dyb) * patches[..., :rd, 1:]
        + (1 - dxb) * dyb * patches[..., 1:, :rd]
        + dxb * dyb * patches[..., 1:, 1:]
    )
    # taps[oy, ox] -> x-major channel layout
    taps = jnp.swapaxes(taps, -1, -2)
    return taps.reshape(B, N, H, W, rd * rd)


def lookup_level_onehot_flat(vol, coords, radius=RADIUS):
    """Gather-free lookup on a pre-flattened (Q, h2, w2) volume.

    TPU XLA lowers gathers to near-scalar loops (hundreds of ms for a
    frontend-sized lookup), but the windowed bilinear sample is separable:

        taps[oy, ox] = Σ_y Σ_x V[y, x] · Sy[oy, y] · Sx[ox, x]

    with Sy[oy, y] = (y == y0+oy−r)·(1−dy) + (y == y0+oy−r+1)·dy (same for
    Sx).  Building Sy/Sx with broadcasted_iota comparisons and contracting
    with two batched matmuls keeps everything on the MXU — orders of
    magnitude faster than the gather forms, with identical semantics
    (out-of-bounds rows/cols simply never match the selector → exact
    zero-contribution border handling).

    Args:
      vol: (Q, h2, w2) per-query correlation planes.
      coords: (Q, 2) float [x, y] in level units.
    Returns:
      (Q, (2r+1)²) taps, x-offset-major channel order.
    """
    Q, h2, w2 = vol.shape
    r = radius
    rd = 2 * r + 1

    c = coords
    x0 = jnp.floor(c[..., 0])
    y0 = jnp.floor(c[..., 1])
    dx = (c[..., 0] - x0).astype(vol.dtype)
    dy = (c[..., 1] - y0).astype(vol.dtype)

    offs = jnp.arange(rd, dtype=jnp.int32) - r                 # (rd,)

    def selector(base, frac, size):
        # (Q, rd, size): weighted one-hot rows
        tgt = base.astype(jnp.int32)[:, None] + offs[None, :]   # (Q, rd)
        grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
        t = tgt[:, :, None]
        return (
            (grid == t).astype(vol.dtype) * (1 - frac)[:, None, None]
            + (grid == t + 1).astype(vol.dtype) * frac[:, None, None]
        )

    Sy = selector(y0, dy, h2)                                  # (Q, rd, h2)
    Sx = selector(x0, dx, w2)                                  # (Q, rd, w2)

    # native-precision taps: the volume is already bf16 and the taps feed
    # a bf16 network, so the extra passes of HIGHEST precision buy nothing
    # measurable in tracking accuracy at ~1.3x the lookup cost (measured
    # on v5e; set LOOKUP_PRECISION = HIGHEST to restore bit-faithfulness
    # to the gather reference for diagnostics)
    T1 = jnp.einsum("qky,qyx->qkx", Sy, vol,
                    precision=LOOKUP_PRECISION,
                    preferred_element_type=jnp.float32)
    taps = jnp.einsum("qkx,qlx->qkl", T1.astype(vol.dtype), Sx,
                      precision=LOOKUP_PRECISION,
                      preferred_element_type=jnp.float32)
    # taps[oy, ox] -> x-major channel layout
    taps = jnp.swapaxes(taps, -1, -2)
    return taps.reshape(Q, rd * rd)


def lookup_level_onehot(volume_level, coords, radius=RADIUS):
    """Windowed one-hot lookup on a (B, N, H, W, h2, w2) pyramid level
    (see lookup_level_onehot_flat for the TPU formulation)."""
    B, N, H, W, h2, w2 = volume_level.shape
    Q = B * N * H * W
    # explicit Q (not -1): tiny training pyramids can reach zero-size
    # levels (h2 = w2 = 0), where -1 is unresolvable
    taps = lookup_level_onehot_flat(
        volume_level.reshape(Q, h2, w2), coords.reshape(Q, 2), radius
    )
    return taps.reshape(B, N, H, W, taps.shape[-1])


def lookup_pyramid_flat(vols, coords, radius=RADIUS, view=None):
    """Pyramid lookup over pre-flattened cached volumes.

    The fused frontend caches the per-edge volume pyramid across a
    keyframe's update rounds; storing it pre-flattened as (Q, h2, w2)
    lets every round's lookup consume it directly — profiled on v5e, the
    6-D cached form cost a full relayout copy of levels 0-1 per round
    (~5 ms/frame) because the (1,E,H,W,h2,w2) reshape inside the lookup
    could not be a bitcast of the einsum-produced layout.

    Args:
      vols: list of (Q, h2_l, w2_l) planes, level 0 first.
      coords: (Q, 2) float [x, y] at level-0 resolution.
      view: optional (B, N, H, W) logical shape, used to rebuild the 6-D
        view for non-onehot lookup impls (e.g. the Pallas kernel).
    Returns:
      (Q, L·(2r+1)²) fp32 taps, level-major channel order.
    """
    outs = []
    for l, v in enumerate(vols):
        c = coords / (2.0 ** l)
        if lookup_impl_name == "pallas_v3":
            # v is the TRANSPOSED (E, h2, w2p, HWp) layout this impl
            # wants (make_edge_volumes builds it that way, pre-padded to
            # the kernel's lane/sublane multiples); the LOGICAL query
            # count comes from coords, not the padded volume
            from .corr_pallas import lookup_flat_pallas_v3
            E = v.shape[0]
            outs.append(
                lookup_flat_pallas_v3(
                    v, c.reshape(E, -1, 2), radius
                ).reshape(coords.shape[0], -1)
            )
        elif lookup_level_impl is lookup_level_onehot:
            outs.append(lookup_level_onehot_flat(v, c, radius))
        else:
            Q, h2, w2 = v.shape
            shape = view if view is not None else (1, 1, Q, 1)
            outs.append(
                lookup_level_impl(
                    v.reshape(shape + (h2, w2)), c.reshape(shape + (2,)),
                    radius,
                ).reshape(Q, -1)
            )
    return jnp.concatenate(outs, axis=-1)


# active lookup implementation (onehot-matmul: fastest on TPU, no gathers)
lookup_level_impl = lookup_level_onehot
lookup_impl_name = "onehot"


def set_lookup_impl(name):
    """Select the windowed-lookup implementation globally.

    "onehot" (default): weighted one-hot selector matmuls on the MXU.
    "pallas"/"pallas_v2": the dynamic-rotate Pallas kernels
    (ops/corr_pallas.py) — hardware TPU only (interpret mode in tests).
    "pallas_v3": the queries-along-lanes masked-reduction kernel; the
    fused cached-volume path builds TRANSPOSED (E, h2, w2, HW) volumes
    for it.  Call before any jit tracing that should pick up the change.
    """
    global lookup_level_impl, lookup_impl_name
    lookup_impl_name = name
    if name == "onehot":
        lookup_level_impl = lookup_level_onehot
    elif name == "pallas":
        from .corr_pallas import lookup_level_pallas
        lookup_level_impl = lookup_level_pallas
    elif name == "pallas_v2":
        from .corr_pallas import lookup_level_pallas_v2
        lookup_level_impl = lookup_level_pallas_v2
    elif name == "pallas_v3":
        lookup_level_impl = lookup_level_onehot   # non-flat callers
    else:
        raise ValueError(f"unknown lookup impl {name!r}")


@partial(jax.jit, static_argnames=("radius",))
def lookup_pyramid(pyramid, coords, radius=RADIUS):
    """Full pyramid lookup: concat taps of all levels along channels.

    coords: (B, N, H, W, 2) at level-0 resolution.
    Returns (B, N, H, W, L*(2r+1)²) fp32 — the update operator's corr input
    (cor_planes = 4*(2*3+1)² = 196, droid_net.py:81).
    """
    outs = [
        lookup_level_impl(vol, coords / (2.0 ** l), radius)
        for l, vol in enumerate(pyramid)
    ]
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# On-the-fly ("alt") correlation: no precomputed volume.
# ---------------------------------------------------------------------------


def fmap_pyramid(fmaps, num_levels=NUM_LEVELS):
    """Average-pool feature maps (B, N, H, W, C) into a pyramid.

    Matches AltCorrBlock's construction (corr.py:116-124): level 0 is the
    full-resolution map; deeper levels pool *features*, not the volume.
    """
    fmaps = fmaps / 4.0
    pyramid = [fmaps]
    x = fmaps
    for _ in range(num_levels - 1):
        x = _avg_pool2(jnp.moveaxis(x, -1, -3))
        x = jnp.moveaxis(x, -3, -1)
        pyramid.append(x)
    return pyramid


def alt_lookup_level(fmap1, fmap2_level, coords, radius=RADIUS,
                     pixel_chunk=0):
    """On-the-fly correlation taps for one level.

    Args:
      fmap1: (E, H, W, C) level-0 source features (already /4).
      fmap2_level: (E, h2, w2, C) pooled target features (already /4).
      coords: (E, H, W, 2) float [x, y] in level units.
      pixel_chunk: if > 0, process the query pixels in blocks of this
        size so the transient volume is O(E · pixel_chunk · h2·w2)
        instead of O(E · H·W · h2·w2) — the true low-memory mode for
        large-resolution global BA (the role of the reference's altcorr
        kernel never materializing the volume,
        src/altcorr_kernel.cu:28-149).
    Returns:
      (E, H, W, (2r+1)²) fp32 taps: dot(fmap1[p], bilinear(fmap2_level, tap)).

    TPU formulation: materialize the (pixel-blocked) correlation volume
    with one MXU matmul (fmap1 · fmap2ᵀ — the FLOPs are nearly free at
    ~190 TFLOP/s) and run the gather-free one-hot lookup on it.  This is
    mathematically identical to sampling features first (the dot product
    is linear) and avoids all gathers.
    """
    E, H, W, C = fmap1.shape
    h2, w2 = fmap2_level.shape[1:3]
    HW = H * W
    T = (2 * radius + 1) ** 2
    f1 = fmap1.reshape(E, HW, C)
    f2 = fmap2_level.reshape(E, h2 * w2, C)
    cflat = coords.reshape(E, HW, 2)

    def block_taps(f1_b, coords_b):
        # bf16 volume: halves the transient footprint and doubles the
        # lookup matmul rate; matches the reference's fp16 feature
        # buffers (depth_video.py:36-38)
        vol = jnp.einsum(
            "epc,eqc->epq", f1_b, f2,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        PB = f1_b.shape[1]
        vol = vol.reshape(1, E, PB, 1, h2, w2)
        return lookup_level_onehot(
            vol, coords_b.reshape(1, E, PB, 1, 2), radius
        ).reshape(E, PB, T)

    if pixel_chunk <= 0 or pixel_chunk >= HW:
        return block_taps(f1, cflat).reshape(E, H, W, T)

    PB = pixel_chunk
    nblk = (HW + PB - 1) // PB
    pad = nblk * PB - HW
    f1_p = jnp.pad(f1, ((0, 0), (0, pad), (0, 0)))
    c_p = jnp.pad(cflat, ((0, 0), (0, pad), (0, 0)))
    f1_blocks = jnp.moveaxis(
        f1_p.reshape(E, nblk, PB, C), 1, 0
    )
    c_blocks = jnp.moveaxis(c_p.reshape(E, nblk, PB, 2), 1, 0)

    def body(_, blk):
        f1_b, c_b = blk
        return None, block_taps(f1_b, c_b)

    _, taps = jax.lax.scan(body, None, (f1_blocks, c_blocks))
    taps = jnp.moveaxis(taps, 0, 1).reshape(E, nblk * PB, T)[:, :HW]
    return taps.reshape(E, H, W, T)


@partial(jax.jit, static_argnames=("radius", "pixel_chunk"))
def alt_lookup_pyramid(pyr1_l0, fmap2_pyramid, coords, radius=RADIUS,
                       pixel_chunk=0):
    """Alt-corr over all levels; channel layout matches lookup_pyramid.

    Args:
      pyr1_l0: (E, H, W, C) level-0 source features (already /4).
      fmap2_pyramid: list of (E, h2, w2, C) pooled target features.
      coords: (E, H, W, 2) at level-0 resolution.
      pixel_chunk: low-memory pixel blocking (applied where it reduces
        the transient; deeper levels are already small).
    """
    outs = []
    for l, f2 in enumerate(fmap2_pyramid):
        h2w2 = f2.shape[1] * f2.shape[2]
        pc = pixel_chunk if (pixel_chunk > 0 and h2w2 > 1024) else 0
        outs.append(
            alt_lookup_level(pyr1_l0, f2, coords / (2.0 ** l), radius, pc)
        )
    return jnp.concatenate(outs, axis=-1)


def gate_corr_pyramid(pyr1_l0, fmap2_pyramid, radius=RADIUS):
    """Window correlation at the STATIC identity grid — the motion-filter
    gate (reference motion_filter.py:66-73 runs CorrBlock at coords0).

    alt_lookup_pyramid at coords0 routes through per-chunk volume einsums
    that XLA lowers at <1% MXU efficiency (profiled 21.5 ms/frame on
    v5e, the #1 cost of the fused track step).  At the identity grid the
    sample points x/2^l + off are compile-time constants, so each level
    collapses to: resample the pooled map to full resolution once with
    STATIC indices/weights, then (2r+1)² zero-padded shifts (multiples
    of 2^l) each multiply-reduced against f1 on the VPU — ~60 MFLOP per
    frame total, no volume, no gathers.

    Args:
      pyr1_l0: (E, H, W, C) level-0 source features (already /4).
      fmap2_pyramid: list of (E, h_l, w_l, C) pooled target features.
    Returns:
      (E, H, W, L·(2r+1)²) f32 == alt_lookup_pyramid(pyr1_l0,
      fmap2_pyramid, coords_grid) with the same channel layout.
    """
    import numpy as np

    E, H, W, C = pyr1_l0.shape
    r = radius
    f1 = pyr1_l0.astype(jnp.float32)
    outs = []
    for l, f2 in enumerate(fmap2_pyramid):
        s = 1 << l
        f2 = f2.astype(jnp.float32)
        # static bilinear resample of the pooled map at u/s over the
        # EXTENDED grid u in [-r·s, W-1+r·s] (the window's shifted
        # positions), with r zero rows/cols of pad on each side so
        # boundary samples keep their partial in-bounds corner
        # contributions — exactly the lookup's border semantics
        h2, w2 = f2.shape[1], f2.shape[2]
        ey = np.arange(-r * s, H + r * s)
        ex = np.arange(-r * s, W + r * s)
        iy = ey // s + r
        fy = ((ey % s) / s).astype(np.float32)
        ix = ex // s + r
        fx = ((ex % s) / s).astype(np.float32)
        # high-side pad sized for cropped pyramid levels, where the
        # full-res extent maps past h2-1 (pool_pyramid drops odd rows)
        py = int(iy.max()) + 2 - r - h2
        px = int(ix.max()) + 2 - r - w2
        f2p = jnp.pad(f2, ((0, 0), (r, max(py, 1)), (r, max(px, 1)),
                           (0, 0)))
        ry = (
            jnp.take(f2p, iy, axis=1) * (1 - fy)[None, :, None, None]
            + jnp.take(f2p, iy + 1, axis=1) * fy[None, :, None, None]
        )
        U = (
            jnp.take(ry, ix, axis=2) * (1 - fx)[None, None, :, None]
            + jnp.take(ry, ix + 1, axis=2) * fx[None, None, :, None]
        )                                    # (E, H+2rs, W+2rs, C)
        taps = []
        for ox in range(-r, r + 1):        # x-offset-major channel layout
            for oy in range(-r, r + 1):
                sh = U[:, r * s + oy * s: r * s + oy * s + H,
                       r * s + ox * s: r * s + ox * s + W]
                taps.append(jnp.sum(f1 * sh, axis=-1))
        outs.append(jnp.stack(taps, axis=-1))
    return jnp.concatenate(outs, axis=-1)
