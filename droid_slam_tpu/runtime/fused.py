"""Fully-fused, device-resident frontend: one XLA program per keyframe.

Round-1 profiling showed the host-driven frontend is round-trip bound, not
compute bound: per keyframe it paid ~5 device→host syncs (motion-filter
delta, proximity distances, cull check, ...) at ~25 ms relay latency each,
plus dozens of small dispatches — 400 ms/keyframe wall for < 100 ms of
device work.  This module re-designs the *entire* per-keyframe update of
the reference frontend (/root/reference/droid_slam/droid_frontend.py:35-73
+ factor_graph.py:85-369) as ONE jitted program:

    stale-edge retirement → proximity distance grid → NMS greedy edge
    selection → dedup/LRU-evict/insert → 4 update+BA rounds (lax.scan) →
    keyframe-cull distance → lax.cond(cull: rm_keyframe | keep: 2 more
    rounds) → pose/disparity extrapolation

returning a single scalar (the cull decision) to the host.

Design points (all semantics matched to the reference, cited inline):

  * Slot model: edge arrays hold an ACTIVE region [0, EA) — fixed-capacity
    slots the update operator processes — and an INACTIVE ring [EA, EA+EI)
    holding retired edges' frozen target/weight (factor_graph.py:136-160
    `store=True`).  Retiring an edge copies one (h, w, 2) row into the
    ring (a few KB); the ring overwrites its oldest entry when full, which
    matches the reference's unbounded store for everything the BA can still
    use (edges with ii < t0−3 are provably never read again).
  * The proximity policy (factor_graph.py:305-369; native/proximity.cpp in
    round 1) runs on device: the distance grid is a masked fixed-shape
    frame_distance batch, existing-edge suppression is one dense
    broadcast, and the greedy distance-sorted selection is a fori_loop
    over the argsort order reading the live-updated grid — exactly the
    reference algorithm.
  * All row placement (insert/retire/adopt) is dense selector math — no
    gathers/scatters (TPU runs them at ~20M elem/s; see ops/gathers.py).
  * The update+BA round body is shared by lax.scan between the 4 mandatory
    and 2 conditional iterations, so the update operator and the dense BA
    compile once.
"""

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..ops import corr as corr_ops
from ..ops import dba, distance
from ..ops.gathers import take_rows
from .factor_graph import DAMPING_EPS

INF = jnp.float32(jnp.inf)
_SEQ_MOD = 1 << 20      # LRU tie-break modulus (age ⋅ 2²⁰ + reversed seq)
_HIGH = jax.lax.Precision.HIGHEST


@flax.struct.dataclass
class GraphState:
    """Device-resident factor graph.

    Slots [0, EA) are the active region; [EA, EA+EI) is the inactive ring.
    ii/jj/target/weight span both regions; age/seq/active/net cover only
    the active region.
    """

    ii: jnp.ndarray        # (EA+EI,) int32 source frame
    jj: jnp.ndarray        # (EA+EI,) int32 target frame
    target: jnp.ndarray    # (EA+EI, h, w, 2) f32
    weight: jnp.ndarray    # (EA+EI, h, w, 2) f32
    age: jnp.ndarray       # (EA,) int32 updates since insertion
    seq: jnp.ndarray       # (EA,) int32 insertion sequence (LRU tie-break)
    active: jnp.ndarray    # (EA,) bool
    net: jnp.ndarray       # (EA, h, w, 128) f32 GRU state
    inac: jnp.ndarray      # (EI,) bool — ring slot holds a stored edge
    ring_ptr: jnp.ndarray  # () int32 next ring write position
    tick: jnp.ndarray      # () int32 global insertion counter


def init_graph_state(EA, EI, h, w):
    return GraphState(
        ii=jnp.zeros((EA + EI,), jnp.int32),
        jj=jnp.zeros((EA + EI,), jnp.int32),
        target=jnp.zeros((EA + EI, h, w, 2), jnp.float32),
        weight=jnp.zeros((EA + EI, h, w, 2), jnp.float32),
        age=jnp.zeros((EA,), jnp.int32),
        seq=jnp.zeros((EA,), jnp.int32),
        active=jnp.zeros((EA,), bool),
        net=jnp.zeros((EA, h, w, 128), jnp.float32),
        inac=jnp.zeros((EI,), bool),
        ring_ptr=jnp.zeros((), jnp.int32),
        tick=jnp.zeros((), jnp.int32),
    )


def _ea(gstate):
    return gstate.active.shape[0]


def _exist_masks(gstate):
    """(EA+EI,) validity over the whole slot space."""
    EI = gstate.inac.shape[0]
    return jnp.concatenate([gstate.active, gstate.inac])


# ---------------------------------------------------------------------------
# retirement to the inactive ring (factor_graph.py:136-160, store=True)
# ---------------------------------------------------------------------------


def _retire(gstate, mask, R=None):
    """Move ALL masked active edges into the inactive ring.

    R (the selector height) must be >= the worst-case number of masked
    edges; it defaults to EA so no retired edge can silently lose its
    stored target/weight (the reference's store=True keeps every removed
    edge, factor_graph.py:136-160).  The (R, EA) selector matmuls are
    trivial at these sizes.
    """
    EA = _ea(gstate)
    EI = gstate.inac.shape[0]
    if R is None:
        R = EA

    rk = jnp.cumsum(mask.astype(jnp.int32)) - 1
    r = jnp.arange(R, dtype=jnp.int32)
    sel = mask[None, :] & (rk[None, :] == r[:, None])        # (R, EA)
    got = jnp.any(sel, axis=1)
    n = jnp.sum(got.astype(jnp.int32))

    self_f = sel.astype(jnp.float32)
    ii_r = jnp.sum(sel * gstate.ii[None, :EA], axis=1).astype(jnp.int32)
    jj_r = jnp.sum(sel * gstate.jj[None, :EA], axis=1).astype(jnp.int32)
    # guard against non-finite rows in free slots (0·NaN = NaN in einsum)
    tgt_src = jnp.where(
        mask[:, None], gstate.target[:EA].reshape(EA, -1), 0.0
    )
    wgt_src = jnp.where(
        mask[:, None], gstate.weight[:EA].reshape(EA, -1), 0.0
    )
    tgt_r = jnp.einsum("re,ef->rf", self_f, tgt_src, precision=_HIGH)
    wgt_r = jnp.einsum("re,ef->rf", self_f, wgt_src, precision=_HIGH)

    pos = (gstate.ring_ptr + r) % EI
    ringsel = (
        (jnp.arange(EI)[:, None] == pos[None, :]) & got[None, :]
    )                                                        # (EI, R)
    # if more edges retire in one call than the ring holds (R > EI),
    # wrapped positions collide: keep only the NEWEST writer per slot so
    # the selector einsum stays one-hot (ring semantics: newest wins)
    if R > EI:
        r_newest = jnp.max(jnp.where(ringsel, r[None, :], -1), axis=1)
        ringsel = ringsel & (r[None, :] == r_newest[:, None])
    written = jnp.any(ringsel, axis=1)
    rs_f = ringsel.astype(jnp.float32)

    def place(rows_flat, old):
        v = jnp.einsum("ir,rf->if", rs_f, rows_flat, precision=_HIGH)
        v = v.reshape((EI,) + old.shape[1:])
        m = written.reshape((EI,) + (1,) * (old.ndim - 1))
        return jnp.where(m, v.astype(old.dtype), old)

    ii = gstate.ii.at[EA:].set(
        jnp.where(written,
                  jnp.sum(rs_f * ii_r[None, :], axis=1).astype(jnp.int32),
                  gstate.ii[EA:])
    )
    jj = gstate.jj.at[EA:].set(
        jnp.where(written,
                  jnp.sum(rs_f * jj_r[None, :], axis=1).astype(jnp.int32),
                  gstate.jj[EA:])
    )
    target = gstate.target.at[EA:].set(place(tgt_r, gstate.target[EA:]))
    weight = gstate.weight.at[EA:].set(place(wgt_r, gstate.weight[EA:]))

    return gstate.replace(
        ii=ii, jj=jj, target=target, weight=weight,
        active=gstate.active & ~mask,
        inac=gstate.inac | written,
        ring_ptr=(gstate.ring_ptr + n) % EI,
    )


# ---------------------------------------------------------------------------
# proximity edge selection (reference factor_graph.py:305-369)
# ---------------------------------------------------------------------------


def _distance_grid(poses, disps, intr, t0p, t1p, t, SRCP, TGTP, beta, buf):
    """Masked (SRCP, TGTP) unidirectional frame-distance grid.

    Row r ↦ frame t0p + r, col c ↦ frame t1p + c; cells outside
    [t0p, t) × [t1p, t) are +inf.
    """
    r = jnp.arange(SRCP, dtype=jnp.int32)
    c = jnp.arange(TGTP, dtype=jnp.int32)
    gi = (t0p + r)[:, None] + jnp.zeros((1, TGTP), jnp.int32)
    gj = (t1p + c)[None, :] + jnp.zeros((SRCP, 1), jnp.int32)
    valid = (gi < t) & (gj < t) & (gi >= 0) & (gj >= 0)
    ii = jnp.clip(gi.reshape(-1), 0, buf - 1)
    jj = jnp.clip(gj.reshape(-1), 0, buf - 1)
    d = distance.frame_distance(poses, disps, intr, ii, jj, beta)
    return jnp.where(valid, d.reshape(SRCP, TGTP), INF)


def _suppress_mask(i, j, t0p, t1p, nms, SRCP, TGTP):
    """Manhattan-ball suppression cells for one edge (i, j)
    (factor_graph.py:322-334 / native/proximity.cpp:36-49)."""
    rad_s = jnp.clip(jnp.abs(i - j) - 2, 0, nms)
    r = jnp.arange(SRCP, dtype=jnp.int32)[:, None]
    c = jnp.arange(TGTP, dtype=jnp.int32)[None, :]
    di = jnp.abs((t0p + r) - i)
    dj = jnp.abs((t1p + c) - j)
    return (di + dj) <= rad_s


def _select_proximity(d, gstate, t0p, t1p, t, *, rad, nms, thresh,
                      max_factors, stereo, SRCP, TGTP, GC):
    """Greedy distance-sorted edge selection with NMS, on device.

    Returns (cand_i, cand_j, cand_valid) of static length
    NC = SRCP·(1 + 2·(rad+1)) + 2·GC, in the reference's emission order
    (temporal-radius pairs first, then greedy pairs, both directions
    interleaved) so downstream seq numbering matches the host path.
    """
    S = 1 + 2 * (rad + 1)
    NC = SRCP * S + 2 * GC

    # exclusions: i - rad < j, invalid distances (proximity.cpp:69-75)
    r = jnp.arange(SRCP, dtype=jnp.int32)[:, None]
    c = jnp.arange(TGTP, dtype=jnp.int32)[None, :]
    gi = t0p + r
    gj = t1p + c
    d = jnp.where((gi - rad < gj) | (d > 100.0), INF, d)

    # suppression around existing (active ∪ inactive) edges — one dense
    # broadcast over all slots (proximity.cpp:77-80)
    exist = _exist_masks(gstate)
    rad_e = jnp.clip(jnp.abs(gstate.ii - gstate.jj) - 2, 0, nms)
    di = jnp.abs(gi[None] - gstate.ii[:, None, None])
    dj = jnp.abs(gj[None] - gstate.jj[:, None, None])
    sup = jnp.any(
        exist[:, None, None] & ((di + dj) <= rad_e[:, None, None]), axis=0
    )
    d = jnp.where(sup, INF, d)

    cand_i = jnp.zeros((NC,), jnp.int32)
    cand_j = jnp.zeros((NC,), jnp.int32)
    cand_valid = jnp.zeros((NC,), bool)

    # temporal-radius pairs, reference emission order
    # (proximity.cpp:92-102): per source i: [stereo (i,i)], then
    # (i,j),(j,i) for j = i-rad-1 .. i-1
    for ro in range(SRCP):
        i = t0p + ro
        row_ok = i < t                       # i >= t0p by construction
        if stereo:
            cand_i = cand_i.at[ro * S].set(i)
            cand_j = cand_j.at[ro * S].set(i)
            cand_valid = cand_valid.at[ro * S].set(row_ok)
            d = jnp.where(
                row_ok & (t1p <= i),
                d.at[ro, jnp.clip(i - t1p, 0, TGTP - 1)].set(INF), d,
            )
        for m in range(rad + 1):
            j = i - rad - 1 + m
            ok = row_ok & (j >= 0)
            base = ro * S + 1 + 2 * m
            cand_i = cand_i.at[base].set(i)
            cand_j = cand_j.at[base].set(jnp.maximum(j, 0))
            cand_i = cand_i.at[base + 1].set(jnp.maximum(j, 0))
            cand_j = cand_j.at[base + 1].set(i)
            cand_valid = cand_valid.at[base].set(ok)
            cand_valid = cand_valid.at[base + 1].set(ok)
            d = jnp.where(
                ok & (t1p <= j),
                d.at[ro, jnp.clip(j - t1p, 0, TGTP - 1)].set(INF), d,
            )
    n_emit = jnp.sum(cand_valid.astype(jnp.int32))

    # greedy distance-sorted selection (proximity.cpp:104-118): order is
    # fixed at sort time; suppression mutates d; the d[k] <= thresh check
    # reads the live value
    order = jnp.argsort(d.reshape(-1))

    def body(it, carry):
        d, cand_i, cand_j, cand_valid, count = carry
        k = order[it]
        ro, co = k // TGTP, k % TGTP
        val = d.reshape(-1)[k]
        i = t0p + ro
        j = t1p + co
        # <= (not <): the reference takes while the count has not yet
        # EXCEEDED the budget (native/proximity.cpp:112 `if (n_out >
        # max_factors) break`), overshooting by up to one pair — matched
        take = (val <= thresh) & (count <= max_factors)

        base = SRCP * S + 2 * it
        cand_i = cand_i.at[base].set(i)
        cand_j = cand_j.at[base].set(j)
        cand_i = cand_i.at[base + 1].set(j)
        cand_j = cand_j.at[base + 1].set(i)
        cand_valid = cand_valid.at[base].set(take)
        cand_valid = cand_valid.at[base + 1].set(take)

        sup = _suppress_mask(i, j, t0p, t1p, nms, SRCP, TGTP)
        d = jnp.where(take & sup, INF, d)
        count = count + jnp.where(take, 2, 0)
        return d, cand_i, cand_j, cand_valid, count

    _, cand_i, cand_j, cand_valid, _ = jax.lax.fori_loop(
        0, GC, body, (d, cand_i, cand_j, cand_valid, n_emit)
    )
    return cand_i, cand_j, cand_valid


# ---------------------------------------------------------------------------
# dedup + LRU eviction + slot insertion (reference factor_graph.py:43-133)
# ---------------------------------------------------------------------------


def _insert_candidates(gstate, vstate, cand_i, cand_j, cand_valid,
                       *, max_factors):
    """Dedup against existing edges, LRU-evict over the factor budget,
    and write the surviving candidates into free active slots."""
    EA = _ea(gstate)
    NC = cand_i.shape[0]

    # dedup vs active ∪ inactive (factor_graph.py:43-54)
    exist = _exist_masks(gstate)
    dup = jnp.any(
        exist[None, :]
        & (cand_i[:, None] == gstate.ii[None, :])
        & (cand_j[:, None] == gstate.jj[None, :]),
        axis=1,
    )
    new_valid = cand_valid & ~dup
    n_new = jnp.sum(new_valid.astype(jnp.int32))

    # LRU eviction by (age desc, insertion seq asc) (factor_graph.py:102-106)
    n_active = jnp.sum(gstate.active.astype(jnp.int32))
    room = max_factors - n_active
    n_evict = jnp.where(
        (n_new > room) & (n_active > 0),
        jnp.minimum(n_active, n_new - jnp.maximum(room, 0)), 0,
    )
    prio = gstate.age * _SEQ_MOD + (_SEQ_MOD - 1 - gstate.seq % _SEQ_MOD)
    prio = jnp.where(gstate.active, prio, -1)
    perm = jnp.argsort(-prio)                    # descending priority
    rank = jnp.sum(
        (perm[None, :] == jnp.arange(EA)[:, None])
        * jnp.arange(EA)[None, :], axis=1,
    )
    evict = gstate.active & (rank < n_evict)
    gstate = _retire(gstate, evict)              # store=True semantics

    # free-slot assignment: candidate with new-rank k takes the k-th free
    # slot; overflow candidates are dropped (factor_graph.py:98-100)
    free = ~gstate.active
    n_free = jnp.sum(free.astype(jnp.int32))
    new_rank = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    inserted = new_valid & (new_rank < n_free)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    A = (
        free[:, None] & inserted[None, :]
        & (free_rank[:, None] == new_rank[None, :])
    )                                            # (EA, NC) one-hot
    taken = jnp.any(A, axis=1)
    Af = A.astype(jnp.float32)

    def pick(vals, old):
        v = jnp.sum(Af * vals[None, :].astype(jnp.float32), axis=1)
        return jnp.where(taken, v.astype(old.dtype), old)

    ii_a = pick(cand_i, gstate.ii[:EA])
    jj_a = pick(cand_j, gstate.jj[:EA])
    age = jnp.where(taken, 0, gstate.age)
    slot_rank = jnp.sum(Af * new_rank[None, :], axis=1).astype(jnp.int32)
    seq = jnp.where(taken, gstate.tick + slot_rank, gstate.seq)
    tick = gstate.tick + jnp.sum(inserted.astype(jnp.int32))

    # row data: GRU state from the source frame's context features
    # (factor_graph.py:108), target from reprojection (factor_graph.py:112)
    ci = jnp.clip(cand_i, 0, vstate.poses.shape[0] - 1)
    cj = jnp.clip(cand_j, 0, vstate.poses.shape[0] - 1)
    cand_net = take_rows(vstate.nets, ci)
    cand_tgt, _ = projective.projective_transform(
        vstate.poses[None], vstate.disps[None], vstate.intrinsics[None],
        ci, cj,
    )
    cand_tgt = cand_tgt[0]

    def place(rows, old):
        flat = rows.reshape(NC, -1).astype(jnp.float32)
        # zero non-inserted rows BEFORE the selector contraction: clipped
        # frame indices of invalid candidates can reference empty buffer
        # slots (zero intrinsics → NaN reprojection), and 0·NaN = NaN
        # would pollute every output row of the einsum
        flat = jnp.where(inserted[:, None], flat, 0.0)
        v = jnp.einsum("ec,cf->ef", Af, flat, precision=_HIGH)
        v = v.reshape(old.shape)
        m = taken.reshape((EA,) + (1,) * (old.ndim - 1))
        return jnp.where(m, v.astype(old.dtype), old)

    net = place(cand_net, gstate.net)
    target = gstate.target.at[:EA].set(place(cand_tgt, gstate.target[:EA]))
    weight = gstate.weight.at[:EA].set(
        jnp.where(taken[:, None, None, None], 0.0, gstate.weight[:EA])
    )

    return gstate.replace(
        ii=gstate.ii.at[:EA].set(ii_a),
        jj=gstate.jj.at[:EA].set(jj_a),
        age=age, seq=seq, active=gstate.active | taken,
        tick=tick, net=net, target=target, weight=weight,
    )


# ---------------------------------------------------------------------------
# one update-operator + BA round (reference factor_graph.py:196-242)
# ---------------------------------------------------------------------------


_KX_OVERFLOWS = []      # debug-mode audit trail (DROID_DEBUG_KX=1)


def _kx_overflow_cb(n_member, K):
    n, K = int(n_member), int(K)
    if n > K:
        import sys
        msg = (f"_build_kx overflow: {n} depth-frame members exceed "
               f"capacity K={K}; BA silently dropped {n - K} depth frames "
               f"(raise fused_caps K / check max_age vs frontend_iters1)")
        _KX_OVERFLOWS.append(msg)
        print("WARNING: " + msg, file=sys.stderr, flush=True)


def _build_kx(ii, mask_ba, t0, t1b, buf, K):
    """Depth-frame list kx = [t0, t1b) ∪ {ii of BA edges}, on device
    (mirrors droid_kernels.cu:1337-1344 / dba.build_schur_tables).

    Members beyond K are silently truncated (no raising inside jit —
    unlike the host-path ops/dba.build_schur_tables, which raises).  The
    static capacity proof lives in fused_caps(); with DROID_DEBUG_KX=1 a
    debug callback audits the member count at runtime and records any
    overflow in _KX_OVERFLOWS so a capacity-exceeding graph fails loudly
    instead of silently dropping depth frames from BA.
    """
    b = jnp.arange(buf, dtype=jnp.int32)
    win = (b >= t0) & (b < t1b)
    incident = jnp.any((ii[None, :] == b[:, None]) & mask_ba[None, :], axis=1)
    member = win | incident
    rank = jnp.cumsum(member.astype(jnp.int32)) - 1
    k = jnp.arange(K, dtype=jnp.int32)
    sel = member[None, :] & (rank[None, :] == k[:, None])
    kx = jnp.sum(sel * b[None, :], axis=1).astype(jnp.int32)
    n_member = jnp.sum(member.astype(jnp.int32))
    kmask = k < n_member
    import os
    if os.environ.get("DROID_DEBUG_KX"):
        jax.debug.callback(lambda n: _kx_overflow_cb(n, K), n_member)
    return kx, kmask


def _volume_cache_fits(cfg, EA, ht, wd):
    """Static decision: does the per-edge volume pyramid fit the budget?

    The pyramid totals EA · ht·wd · Σ_l(h2_l·w2_l) bf16 bytes; caching it
    across a keyframe's 4+2 update rounds removes 5 of the 6 volume
    constructions (the fmaps and edge set are fixed within the step).
    """
    if cfg.corr_cache_mb <= 0:
        return False
    tgt = 0
    h2, w2 = ht, wd
    for _ in range(corr_ops.NUM_LEVELS):
        # the v3 path stores volumes born-padded (w2 to a sublane
        # multiple); budget for the padded width so the static cache
        # decision stays honest at small levels
        tgt += h2 * (-(-w2 // 8) * 8)
        h2, w2 = h2 // 2, w2 // 2
    hwp = -(-ht * wd // 128) * 128
    return EA * hwp * tgt * 2 <= cfg.corr_cache_mb * 1_000_000


def make_edge_volumes(cfg, EA, ht, wd):
    """Per-edge correlation-volume pyramid builder (one MXU einsum per
    level), cached for the whole keyframe step.  Returns
    list[(EA·ht·wd, h2_l, w2_l) bf16] — pre-flattened to the lookup's
    query layout so no per-round reshape/relayout survives (see
    corr.lookup_pyramid_flat)."""
    rig = 2 if cfg.stereo else 1

    def build(gstate, fmap_pyr):
        ii_a = gstate.ii[:EA]
        jj_a = gstate.jj[:EA]
        f1 = take_rows(fmap_pyr[0], rig * ii_a).astype(jnp.float32) / 4.0
        cam2 = rig * jj_a + (ii_a == jj_a).astype(jnp.int32) * (rig - 1)
        f1f = f1.reshape(EA, ht * wd, -1)
        transposed = corr_ops.lookup_impl_name == "pallas_v3"
        if transposed:
            # pad the QUERY axis to the kernel's 128-lane multiple on
            # the small feature map (EA·HW·128 bf16), so the big volume
            # is born padded — the round-5 trace priced padding/
            # transposing the built volume at 2.9 ms/keyframe
            HW = ht * wd
            HWp = -(-HW // 128) * 128
            f1p = jnp.pad(f1f, ((0, 0), (0, HWp - HW), (0, 0)))
        vols = []
        for p in fmap_pyr:
            f2 = take_rows(p, cam2).astype(jnp.float32) / 4.0
            h2, w2 = f2.shape[1:3]
            if transposed:
                # (E, h2, w2p, HWp): exactly the v3 kernel's blocked
                # layout (queries on lanes, sublane-aligned plane width)
                w2p = -(-w2 // 8) * 8
                f2p = jnp.pad(
                    f2, ((0, 0), (0, 0), (0, w2p - w2), (0, 0))
                ).reshape(EA, h2 * w2p, -1)
                v = jnp.einsum(
                    "eqc,epc->eqp", f2p, f1p,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                vols.append(v.reshape(EA, h2, w2p, HWp))
            else:
                v = jnp.einsum(
                    "epc,eqc->epq", f1f, f2.reshape(EA, h2 * w2, -1),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                vols.append(v.reshape(EA * ht * wd, h2, w2))
        return vols

    return build


def make_update_round(net_mod, cfg, buf, ht, wd, P, K, oracle=None):
    """Build the shared (update operator + BA) round body.

    oracle: optional dict {poses (N,7) w2c, disps (N,h,w), intr8 (4,)} —
    replaces the learned update with the ground-truth-reprojection oracle
    (unit confidence, fixed damping) used by the golden-trajectory tests.
    """
    rig = 2 if cfg.stereo else 1

    def update_round(params, vstate, gstate, fmap_pyr, vols=None):
        EA = _ea(gstate)
        ii_a = gstate.ii[:EA]
        jj_a = gstate.jj[:EA]
        active = gstate.active
        m4 = active[:, None, None, None]

        if oracle is not None:
            n_gt = oracle["poses"].shape[0]
            coords_gt, valid = projective.projective_transform(
                oracle["poses"][None], oracle["disps"][None],
                jnp.broadcast_to(oracle["intr8"], (1, n_gt, 4)),
                jnp.clip(ii_a, 0, n_gt - 1), jnp.clip(jj_a, 0, n_gt - 1),
            )
            target_a = jnp.where(m4, coords_gt[0], gstate.target[:EA])
            weight_a = jnp.where(
                m4, valid[0] * jnp.ones_like(target_a), 0.0
            )
            vstate = vstate.replace(
                damping=1e-4 * jnp.ones_like(vstate.damping)
            )
            gstate = gstate.replace(
                target=gstate.target.at[:EA].set(target_a),
                weight=gstate.weight.at[:EA].set(weight_a),
            )
        else:
            # ---- update operator over the active region ----
            coords1, _ = projective.projective_transform(
                vstate.poses[None], vstate.disps[None],
                vstate.intrinsics[None], ii_a, jj_a,
            )
            coords1 = coords1[0]
            coords0 = projective.coords_grid(ht, wd)
            motn = jnp.clip(
                jnp.concatenate(
                    [coords1 - coords0, gstate.target[:EA] - coords1],
                    axis=-1,
                ), -64.0, 64.0,
            )

            if vols is not None:
                # cached-volume lookup: the expensive volume einsums ran
                # once per keyframe step, not once per round; flat form
                # avoids any per-round relayout.  Non-onehot impls (e.g.
                # the Pallas kernel via set_lookup_impl) get the 6-D view.
                corr = corr_ops.lookup_pyramid_flat(
                    vols, coords1.reshape(-1, 2), view=(1, EA, ht, wd)
                ).reshape(EA, ht, wd, -1)
            else:
                f1 = take_rows(
                    fmap_pyr[0], rig * ii_a
                ).astype(jnp.float32) / 4.0
                cam2 = (rig * jj_a
                        + (ii_a == jj_a).astype(jnp.int32) * (rig - 1))
                f2 = [
                    take_rows(p, cam2).astype(jnp.float32) / 4.0
                    for p in fmap_pyr
                ]
                from .factor_graph import corr_pixel_chunk
                corr = corr_ops.alt_lookup_pyramid(
                    f1, f2, coords1,
                    pixel_chunk=corr_pixel_chunk(cfg, EA, ht * wd),
                )

            inp = take_rows(vstate.inps, ii_a)
            # GraphAgg over LOCAL segments (first-occurrence edge index):
            # identical per-frame means, but EA+1 segments instead of
            # buf+1 — the (buf, h, w, 128) GraphAgg conv batch cost
            # buf/EA x the useful FLOPs and its temps scale with the
            # keyframe buffer (see factor_graph._build_update_core)
            first = jnp.argmax(
                (ii_a[None, :] == ii_a[:, None]) & active[None, :], axis=1
            ).astype(jnp.int32)
            loc = jnp.where(active, first, EA)
            net_new, delta, weight, eta_loc, upmask_loc = net_mod.apply(
                params, gstate.net, inp, corr, motn,
                method=lambda m, n, i, c, f, ix, nseg: m.update(
                    n, i, c, f, ix=ix, nseg=nseg
                ),
                ix=loc, nseg=EA,
            )
            seg = jnp.where(active, ii_a, buf)
            mflt = active.astype(jnp.float32)
            eta_seg = jax.ops.segment_sum(
                take_rows(eta_loc.astype(jnp.float32), loc)
                * mflt[:, None, None],
                seg, num_segments=buf + 1,
            )[:-1]
            upmask = None
            if cfg.upsample:
                upmask = jax.ops.segment_sum(
                    take_rows(upmask_loc.astype(jnp.float32), loc)
                    * mflt[:, None, None, None],
                    seg, num_segments=buf + 1,
                )[:-1]
            # where-blends, not arithmetic masks: inactive slots may hold
            # non-finite values and 0·NaN = NaN would leak through `x·mask`
            net_new = jnp.where(m4, net_new, gstate.net)
            target_a = jnp.where(m4, coords1 + delta, gstate.target[:EA])
            weight_a = jnp.where(m4, weight, 0.0)
            cnt = jax.ops.segment_sum(
                jnp.ones_like(seg, jnp.float32), seg, num_segments=buf + 1
            )[:-1]
            # the scatter above summed identical per-frame values over a
            # frame's edges: divide by the edge count to recover the mean
            eta_seg = eta_seg / jnp.maximum(cnt, 1.0)[:, None, None]
            if cfg.upsample:
                upmask = (upmask
                          / jnp.maximum(cnt, 1.0)[:, None, None, None])
            damping = jnp.where(
                (cnt > 0)[:, None, None], eta_seg, vstate.damping
            )
            vstate = vstate.replace(damping=damping)
            gstate = gstate.replace(
                net=net_new,
                target=gstate.target.at[:EA].set(target_a),
                weight=gstate.weight.at[:EA].set(weight_a),
            )

            up_cnt = cnt if cfg.upsample else None
            up_mask = upmask if cfg.upsample else None

        # ---- dense BA over active ∪ recent-inactive edges
        #      (factor_graph.py:223-240, use_inactive=True) ----
        big = jnp.int32(buf + 1)
        min_ii = jnp.min(jnp.where(active, ii_a, big))
        t0 = jnp.maximum(1, min_ii + 1)
        t1b = jnp.max(jnp.where(active, jnp.maximum(ii_a, jj_a), -1)) + 1

        exist = _exist_masks(gstate)
        recent = (gstate.ii >= t0 - 3) & (gstate.jj >= t0 - 3)
        mask_ba = exist & recent
        mask_ba = mask_ba.at[:EA].set(active)    # active: no recency filter

        eta = 0.2 * vstate.damping + DAMPING_EPS
        kx, kmask = _build_kx(gstate.ii, mask_ba, t0, t1b, buf, K)
        poses, disps = dba.ba(
            vstate.poses, vstate.disps, vstate.disps_sens,
            vstate.intrinsics, gstate.target, gstate.weight, eta,
            gstate.ii, gstate.jj, mask_ba, kx, kmask,
            jnp.zeros((K, 1), jnp.int32), t0, t1b,
            iters=cfg.ba_iters, lm=cfg.frontend_lm, ep=cfg.frontend_ep,
            motion_only=False, P=P,
        )
        # divergence guard (reference-parity robustness: the torch stack
        # never NaNs because CUDA BA clamps internally; here an
        # ill-conditioned far-OOD round could emit non-finite values and
        # poison every later round) — revert the whole round instead
        ok = jnp.isfinite(jnp.sum(poses)) & jnp.isfinite(jnp.sum(disps))
        poses = jnp.where(ok, poses, vstate.poses)
        disps = jnp.where(ok, disps, vstate.disps)
        vstate = vstate.replace(poses=poses, disps=disps)
        gstate = gstate.replace(
            age=jnp.where(active, gstate.age + 1, gstate.age)
        )

        if oracle is None and cfg.upsample:
            # convex-upsample the POST-BA disparities of this round's
            # updated frames (the reference upsamples pre-BA estimates,
            # factor_graph.py:235-240; using the solved disparities keeps
            # disps_up consistent with disps even when a round's BA moves
            # them a lot, e.g. onto the 0.001 clamp and back)
            from ..models.update import upsample_disp
            up = upsample_disp(vstate.disps, up_mask)
            disps_up = jnp.where(
                (up_cnt > 0)[:, None, None], up, vstate.disps_up
            )
            vstate = vstate.replace(disps_up=disps_up)
        return vstate, gstate

    return update_round


# ---------------------------------------------------------------------------
# the fused per-keyframe program (reference droid_frontend.py:35-73)
# ---------------------------------------------------------------------------


def _extrapolate(vstate, tx):
    """Next-pose/disparity initialization (droid_frontend.py:69-70)."""
    from .state import read_slot, write_slot

    poses = write_slot(vstate.poses, tx, read_slot(vstate.poses, tx - 1))
    disps = write_slot(
        vstate.disps, tx,
        jnp.broadcast_to(
            read_slot(vstate.disps, tx - 1).mean(), vstate.disps.shape[1:]
        ),
    )
    return vstate.replace(poses=poses, disps=disps)


def _shift_down(vstate, ix):
    """video[ix] = video[ix+1] (rm_keyframe, factor_graph.py:164-181)."""
    from .state import read_slot

    def cp(arr):
        b = jnp.arange(arr.shape[0]).reshape(
            (-1,) + (1,) * (arr.ndim - 1)
        )
        nxt = read_slot(arr, ix + 1)
        return jnp.where(b == ix, nxt.astype(arr.dtype), arr)

    return vstate.replace(
        tstamp=cp(vstate.tstamp), images=cp(vstate.images),
        poses=cp(vstate.poses), disps=cp(vstate.disps),
        disps_sens=cp(vstate.disps_sens), intrinsics=cp(vstate.intrinsics),
        fmaps=cp(vstate.fmaps), nets=cp(vstate.nets), inps=cp(vstate.inps),
        disps_up=cp(vstate.disps_up),
    )


def _pyramids(fmaps):
    """Pooled feature pyramids (the shared state._fmap_pyramids)."""
    from .state import _fmap_pyramids

    return _fmap_pyramids(fmaps)


def fused_caps(cfg):
    """Static capacities derived from the config."""
    window = cfg.frontend_window
    SRCP = 8
    TGTP = int(np.ceil((window + 7) / 8) * 8)
    GC = max(48, cfg.frontend_max_factors)
    # _build_kx silently truncates members beyond K (no raising inside
    # jit, unlike ops/dba.build_schur_tables).  The true member bound:
    # reversed proximity pairs put active ii as low as t1-window at
    # insertion; an edge ages +1 per update round and is retired when
    # age > max_age, so it survives ceil((max_age+1)/iters1) further
    # keyframes (iters1 is the minimum rounds per keyframe — the cull
    # branch skips iters2), each sliding the window forward by one;
    # recent-inactive edges add up to 3 frames below t0.
    survive = int(np.ceil((cfg.max_age + 1) / max(1, cfg.frontend_iters1)))
    kmax = window + 3 + survive
    P = K = max(32, int(np.ceil(kmax / 8) * 8))
    assert K >= kmax, (K, kmax, window, cfg.max_age, cfg.frontend_iters1)
    EA = max(64, int(np.ceil((cfg.frontend_max_factors + 16) / 8) * 8))
    EI = cfg.frontend_edge_cap
    return SRCP, TGTP, GC, P, K, EA, EI


def make_keyframe_core(net_mod, cfg, buf, ht, wd, oracle=None):
    """The traced per-keyframe update body (droid_frontend.py:35-73).
    Returns fn(params, vstate, gstate, t1) -> (vstate, gstate, cull)."""
    rad = cfg.frontend_radius
    nms = cfg.frontend_nms
    window = cfg.frontend_window
    SRCP, TGTP, GC, P, K, EA, EI = fused_caps(cfg)

    update_round = make_update_round(net_mod, cfg, buf, ht, wd, P, K,
                                     oracle=oracle)
    cache_vols = oracle is None and _volume_cache_fits(cfg, EA, ht, wd)
    build_vols = (make_edge_volumes(cfg, EA, ht, wd) if cache_vols
                  else None)

    def keyframe_step(params, vstate, gstate, t1):
        t1 = jnp.asarray(t1, jnp.int32)
        # feature pyramids hoisted once per keyframe (fmaps don't change
        # within the step)
        fmap_pyr = _pyramids(vstate.fmaps)

        # 1. retire stale edges (droid_frontend.py:41-42, store=True)
        stale = gstate.active & (gstate.age > cfg.max_age)
        gstate = _retire(gstate, stale)

        # 2. proximity edges (droid_frontend.py:44-45)
        t0p = t1 - 5
        t1p = jnp.maximum(t1 - window, 0)
        intr0 = vstate.intrinsics[0]
        d = _distance_grid(
            vstate.poses, vstate.disps, intr0, t0p, t1p, t1,
            SRCP, TGTP, cfg.beta, buf,
        )
        ci, cj, cv = _select_proximity(
            d, gstate, t0p, t1p, t1, rad=rad, nms=nms,
            thresh=cfg.frontend_thresh,
            max_factors=cfg.frontend_max_factors, stereo=cfg.stereo,
            SRCP=SRCP, TGTP=TGTP, GC=GC,
        )
        gstate = _insert_candidates(
            gstate, vstate, ci, cj, cv,
            max_factors=cfg.frontend_max_factors,
        )

        # 3. seed the new keyframe's disparity from sensor depth
        from .state import read_slot, write_slot

        ds = read_slot(vstate.disps_sens, t1 - 1)
        d_new = jnp.where(ds > 0, ds, read_slot(vstate.disps, t1 - 1))
        vstate = vstate.replace(
            disps=write_slot(vstate.disps, t1 - 1, d_new)
        )

        # 4. mandatory update+BA rounds (droid_frontend.py:49-50).
        # Volumes are built ONCE here: the edge set and fmaps are fixed
        # for the rest of the step (the cull branch runs no more rounds).
        vols = build_vols(gstate, fmap_pyr) if cache_vols else None

        def round_body(carry, _):
            v, g = carry
            v, g = update_round(params, v, g, fmap_pyr, vols=vols)
            return (v, g), None

        (vstate, gstate), _ = jax.lax.scan(
            round_body, (vstate, gstate), None, length=cfg.frontend_iters1
        )

        # 5. keyframe cull check (droid_frontend.py:57-62)
        dc = distance.frame_distance(
            vstate.poses, vstate.disps, intr0,
            jnp.stack([t1 - 3, t1 - 2]), jnp.stack([t1 - 2, t1 - 3]),
            cfg.beta,
        )
        cull = 0.5 * (dc[0] + dc[1]) < cfg.keyframe_thresh

        def cull_branch(vstate, gstate):
            ix = t1 - 2
            vstate = _shift_down(vstate, ix)
            touch = _exist_masks(gstate) & (
                (gstate.ii == ix) | (gstate.jj == ix)
            )
            gstate = gstate.replace(
                ii=jnp.where(gstate.ii >= ix, gstate.ii - 1, gstate.ii),
                jj=jnp.where(gstate.jj >= ix, gstate.jj - 1, gstate.jj),
                active=gstate.active & ~touch[:EA],
                inac=gstate.inac & ~touch[EA:],
            )
            return _extrapolate(vstate, t1 - 1), gstate

        def keep_branch(vstate, gstate):
            (vstate, gstate), _ = jax.lax.scan(
                round_body, (vstate, gstate), None,
                length=cfg.frontend_iters2,
            )
            return _extrapolate(vstate, t1), gstate

        vstate, gstate = jax.lax.cond(
            cull, cull_branch, keep_branch, vstate, gstate
        )
        return vstate, gstate, cull.astype(jnp.int32)

    return keyframe_step


def build_keyframe_step(net_mod, cfg, buf, ht, wd, oracle=None):
    """Compile-once fused keyframe update (one dispatch, one readback)."""
    # donate (vstate, gstate): every call site rebinds its state refs to
    # the outputs, and under the relay's no-intra-process-free semantics
    # a non-donated call would leak a full state copy per invocation
    return jax.jit(make_keyframe_core(net_mod, cfg, buf, ht, wd,
                                      oracle=oracle),
                   donate_argnums=(1, 2))


def make_track_core(net_mod, cfg, buf, H, W, oracle=None):
    """The fully-fused steady-state per-frame program (un-jitted).

    Fuses the motion filter (reference motion_filter.py:45-82), the
    conditional keyframe append (depth_video.py:46-103), and the entire
    frontend keyframe update into ONE jitted program with the keyframe
    counter held on device — the host can stream frames with NO blocking
    readback per frame (flags are fetched lazily).

    Returns fn(params, vstate, gstate, counter, t1, image, tstamp, intr8,
    disp_sens) -> (vstate, gstate, counter, t1, flags) with
    flags = [is_keyframe, cull, counter'] int32.  Only valid once the
    frontend is initialized (counter > warmup).
    """
    from ..models.droidnet import normalize_images

    ht, wd = H // 8, W // 8
    rig = 2 if cfg.stereo else 1
    keyframe_core = make_keyframe_core(net_mod, cfg, buf, ht, wd,
                                       oracle=oracle)

    def track_step(params, vstate, gstate, counter, t1, image, tstamp,
                   intr8, disp_sens, filter_thresh, fmap=None, ctx=None):
        from .state import read_slot

        x = normalize_images(image)                    # (rig, H, W, 3)
        if fmap is None:
            # single-frame path; the chunked program hoists fnet out of
            # its scan and passes per-frame features in (build_track_chunk)
            fmap = net_mod.apply(params, x, method=lambda m, x: m.fnet(x))

        # motion gate: 1-edge corr + one update iteration vs the last
        # keyframe (motion_filter.py:66-73)
        kf_fmap = read_slot(vstate.fmaps, counter - 1)  # (rig, h, w, 128)
        knet = read_slot(vstate.nets, counter - 1)
        kinp = read_slot(vstate.inps, counter - 1)

        from .state import pool_pyramid

        f1 = kf_fmap[0:1].astype(jnp.float32) / 4.0
        f2_pyr = list(pool_pyramid(fmap[0:1].astype(jnp.float32) / 4.0))
        # static-grid window correlation: the gate samples at coords0,
        # where the volume-free shifted-reduce form is exact and ~20x
        # cheaper than alt_lookup_pyramid (profiled 21.5 ms/frame -> VPU
        # noise; ops/corr.py gate_corr_pyramid)
        corr = corr_ops.gate_corr_pyramid(f1, f2_pyr)
        _, delta, _ = net_mod.apply(
            params, knet[None], kinp[None], corr,
            method=lambda m, n, i, c: m.update(n, i, c),
        )
        dmag = jnp.mean(jnp.linalg.norm(delta, axis=-1))
        is_kf = dmag > filter_thresh   # dynamic: host can retune w/o recompile

        def kf_branch(vstate, gstate, counter, t1):
            # context features only for keyframes (motion_filter.py:61,77)
            # in latency mode; the chunked program hoists cnet out of its
            # scan as one batch-B stack (like fnet — batch-1 convs leave
            # the MXU mostly idle) and passes per-frame ctx in.  Instance
            # norm is per-sample, so the values are identical.
            if ctx is None:
                ctx_ = net_mod.apply(
                    params, x[0:1], method=lambda m, x: m.cnet(x)
                )[0]
            else:
                ctx_ = ctx
            netc, inpc = jnp.split(ctx_, 2, axis=-1)
            netc = jnp.tanh(netc)
            inpc = jax.nn.relu(inpc)

            # append (pose/disp keep the extrapolated slot values,
            # depth_video.py:59-62)
            c = counter
            vstate = vstate.replace(
                tstamp=vstate.tstamp.at[c].set(tstamp),
                images=vstate.images.at[c].set(image[0]),
                disps_sens=vstate.disps_sens.at[c].set(disp_sens),
                intrinsics=vstate.intrinsics.at[c].set(intr8),
                fmaps=vstate.fmaps.at[c].set(fmap.astype(jnp.bfloat16)),
                nets=vstate.nets.at[c].set(
                    netc.astype(vstate.nets.dtype)),
                inps=vstate.inps.at[c].set(
                    inpc.astype(vstate.inps.dtype)),
            )
            counter = counter + 1
            t1n = t1 + 1
            vstate, gstate, cull = keyframe_core(
                params, vstate, gstate, t1n
            )
            return (vstate, gstate, counter - cull, t1n - cull,
                    jnp.stack([jnp.int32(1), cull, counter - cull]))

        def skip_branch(vstate, gstate, counter, t1):
            return (vstate, gstate, counter, t1,
                    jnp.stack([jnp.int32(0), jnp.int32(0), counter]))

        return jax.lax.cond(
            is_kf, kf_branch, skip_branch, vstate, gstate, counter, t1
        )

    return track_step


def build_track_step(net_mod, cfg, buf, H, W, oracle=None):
    """Jitted single-frame streaming program (one dispatch per frame)."""
    return jax.jit(make_track_core(net_mod, cfg, buf, H, W, oracle=oracle),
                   donate_argnums=(1, 2))


def build_track_chunk(net_mod, cfg, buf, H, W, chunk, oracle=None):
    """Micro-batched streaming: `chunk` frames per dispatch via lax.scan
    over the fused per-frame program.

    Per-dispatch overhead (host->device arg marshalling, and ~200 ms of
    relay round-trip under the axon tunnel) dwarfs the ~170 ms of real
    device work per keyframe; amortizing it over a chunk of frames is
    the throughput mode — the same latency/throughput trade the
    reference makes by queueing frames into its CUDA stream
    (droid.py:61-72 never synchronizes per frame either).
    """
    from ..models.droidnet import normalize_images

    inner = make_track_core(net_mod, cfg, buf, H, W, oracle=oracle)

    def track_chunk(params, vstate, gstate, counter, t1, images, tstamps,
                    intr8, disp_sens, filter_thresh):
        # fnet runs on EVERY input frame regardless of the keyframe
        # decision (motion_filter.py:57), so hoist it out of the scan:
        # one batch-(B·rig) conv stack instead of B batch-1 stacks — the
        # conv stack was the top leaf cost of the round-3 trace
        # (21.6 ms/frame, PERF.md) and batch-1 convs leave the MXU
        # mostly idle.  Instance norm is per-sample, so results are
        # identical.  cnet stays per-frame inside the keyframe branch:
        # it is only needed for accepted keyframes.
        B, rig = images.shape[0], images.shape[1]
        x = normalize_images(images.reshape((B * rig,) + images.shape[2:]))
        fmaps = net_mod.apply(params, x, method=lambda m, v: m.fnet(v))
        fmaps = fmaps.reshape((B, rig) + fmaps.shape[1:])
        # cnet hoisted too: the reference computes context only for
        # accepted keyframes (motion_filter.py:61,77), but one batch-B
        # conv stack costs several times less than per-keyframe batch-1
        # stacks even at a 25% keyframe rate — and throughput mode is
        # the every-frame-is-a-keyframe regime.  Left image only.
        ctxs = net_mod.apply(params, x[::rig],
                             method=lambda m, v: m.cnet(v))

        def body(carry, frame):
            vstate, gstate, counter, t1 = carry
            image, tstamp, fmap, ctx = frame
            vstate, gstate, counter, t1, flags = inner(
                params, vstate, gstate, counter, t1, image, tstamp,
                intr8, disp_sens, filter_thresh, fmap=fmap, ctx=ctx,
            )
            return (vstate, gstate, counter, t1), flags

        (vstate, gstate, counter, t1), flags = jax.lax.scan(
            body, (vstate, gstate, counter, t1),
            (images, tstamps, fmaps, ctxs)
        )
        return vstate, gstate, counter, t1, flags[-1]

    return jax.jit(track_chunk, donate_argnums=(1, 2))


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------


class FusedFrontend:
    """Drop-in replacement for runtime.frontend.Frontend: identical
    semantics, one jitted program + one readback per keyframe.

    Initialization (the one-time warmup bootstrap,
    droid_frontend.py:75-106) reuses the host-driven Frontend machinery,
    then converts its factor graph into the device-resident GraphState.
    """

    def __init__(self, net, params, video, cfg, graph_cls=None,
                 oracle=None):
        self.video = video
        self.cfg = cfg
        self.net = net
        self.params = params
        self.graph_cls = graph_cls
        self.oracle = oracle

        self.t1 = 0
        self.filter_thresh = cfg.filter_thresh  # mutable, traced per call
        self.is_initialized = False
        h, w = video.fht, video.fwd
        _, _, _, _, _, EA, EI = fused_caps(cfg)
        self.gstate = init_graph_state(EA, EI, h, w)
        self._step = build_keyframe_step(net, cfg, cfg.buffer, h, w,
                                         oracle=oracle)
        self._track = None          # built lazily on first streamed frame
        self._counter_dev = None    # device-resident keyframe counter
        self._t1_dev = None
        self._last_flags = None
        self._since_sync = 0

    def __call__(self):
        if not self.is_initialized and self.video.counter == self.cfg.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self.t1 += 1
            vstate, gstate, cull = self._step(
                self.params, self.video.state, self.gstate,
                jnp.asarray(self.t1, jnp.int32),
            )
            self.video.state = vstate
            self.gstate = gstate
            if int(cull):
                self.video.counter -= 1
                self.t1 -= 1

    def active_edges(self):
        """(ii, jj) numpy arrays of the active edge set (diagnostics)."""
        g = self.gstate
        act = np.asarray(g.active)
        ea = act.shape[0]
        return (np.asarray(g.ii)[:ea][act], np.asarray(g.jj)[:ea][act])

    # -- zero-readback streaming (steady state) ---------------------------

    def track_frame(self, tstamp, image, depth=None, intrinsics=None):
        """Fully-fused per-frame path: motion filter + conditional keyframe
        append + frontend update in ONE dispatch, counter on device.  The
        host never blocks; flags are synced lazily every 16 frames."""
        H, W = self.cfg.image_size
        if self._track is None:
            self._track = build_track_step(
                self.net, self.cfg, self.cfg.buffer, H, W,
                oracle=self.oracle,
            )
        if self._counter_dev is None:
            self._counter_dev = jnp.asarray(self.video.counter, jnp.int32)
            self._t1_dev = jnp.asarray(self.t1, jnp.int32)

        image = jnp.asarray(image)
        if image.ndim == 3:
            image = image[None]
        if depth is not None:
            d = np.asarray(depth)[3::8, 3::8]
            disp_sens = jnp.asarray(
                np.where(d > 0, 1.0 / np.maximum(d, 1e-8), 0.0), jnp.float32
            )
        else:
            disp_sens = jnp.zeros(
                (self.video.fht, self.video.fwd), jnp.float32
            )

        out = self._track(
            self.params, self.video.state, self.gstate,
            self._counter_dev, self._t1_dev, image,
            jnp.asarray(tstamp, jnp.float32),
            jnp.asarray(intrinsics, jnp.float32) / 8.0, disp_sens,
            jnp.asarray(self.filter_thresh, jnp.float32),
        )
        (self.video.state, self.gstate, self._counter_dev,
         self._t1_dev, self._last_flags) = out

        self._since_sync += 1
        # near buffer capacity the lazy 16-frame sync cadence could let
        # the device overrun the keyframe buffer unnoticed — tighten to
        # per-frame syncs so the overflow guard sees a fresh counter
        near_full = (self.video.counter + self._since_sync
                     >= self.cfg.buffer - 2)
        if self._since_sync >= 16 or near_full:
            self.sync()

    def prefetch_frames(self, images):
        """Begin the host->device upload of a future chunk's images and
        return the device array for a later track_frames call.  Uploading
        chunk k+1 while chunk k computes hides the transfer (the dominant
        per-input-frame cost through the axon relay: ~4.6 MB uint8 per
        20-frame chunk at 240x320)."""
        imgs = jnp.asarray(np.stack([np.asarray(im) for im in images]))
        if imgs.ndim == 4:
            imgs = imgs[:, None]
        return imgs

    def track_frames(self, tstamps, images, intrinsics=None):
        """Throughput mode: `len(images)` frames in ONE dispatch.

        Per-dispatch overhead dominates the per-frame device work (see
        build_track_chunk); batching is how a TPU streams a 30 fps feed.
        RGB-only (no depth); all frames share `intrinsics`.
        """
        H, W = self.cfg.image_size
        B = len(images)
        if getattr(self, "_chunk_fns", None) is None:
            self._chunk_fns = {}
        if B not in self._chunk_fns:
            self._chunk_fns[B] = build_track_chunk(
                self.net, self.cfg, self.cfg.buffer, H, W, B,
                oracle=self.oracle,
            )
        if self._counter_dev is None:
            self._counter_dev = jnp.asarray(self.video.counter, jnp.int32)
            self._t1_dev = jnp.asarray(self.t1, jnp.int32)

        # pre-dispatch overflow guard: the whole chunk could keyframe
        if (self.video.counter + self._since_sync + B
                >= self.cfg.buffer - 2):
            self.sync()
            if self.video.counter + B >= self.cfg.buffer - 1:
                raise RuntimeError(
                    f"keyframe buffer nearly full "
                    f"({self.video.counter}+{B}/{self.cfg.buffer}); "
                    f"increase SLAMConfig.buffer"
                )

        # accept a pre-uploaded device array (see prefetch_frames): the
        # caller can overlap the next chunk's host->device image transfer
        # with this chunk's compute instead of serializing them
        if isinstance(images, jax.Array):
            imgs = images
        else:
            imgs = jnp.asarray(np.stack([np.asarray(im) for im in images]))
        if imgs.ndim == 4:
            imgs = imgs[:, None]                 # (B, rig=1, H, W, 3)
        disp_sens = jnp.zeros((self.video.fht, self.video.fwd), jnp.float32)

        out = self._chunk_fns[B](
            self.params, self.video.state, self.gstate,
            self._counter_dev, self._t1_dev, imgs,
            jnp.asarray(np.asarray(tstamps, np.float32)),
            jnp.asarray(intrinsics, jnp.float32) / 8.0, disp_sens,
            jnp.asarray(self.filter_thresh, jnp.float32),
        )
        (self.video.state, self.gstate, self._counter_dev,
         self._t1_dev, self._last_flags) = out

        self._since_sync += B
        near_full = (self.video.counter + self._since_sync
                     >= self.cfg.buffer - 2)
        # let a few chunks stay in flight before blocking on the flags
        # readback: the profiler showed a sync after EVERY chunk leaves
        # the device idle ~1.2 s per chunk through the axon relay (the
        # next chunk's ~0.8 s image upload cannot overlap compute).  The
        # pre-dispatch overflow guard above stays conservative (counts
        # every unsynced frame as a potential keyframe), so correctness
        # does not depend on the cadence.
        if self._since_sync >= max(16, 3 * B) or near_full:
            self.sync()

    def prewarm(self, chunk_sizes=()):
        """Compile every steady-state streaming program BEFORE the stream
        starts (VERDICT r3 weak #3: a mid-stream compile is a multi-second
        stall on a live 30 fps feed).

        Executes the fused keyframe step, the single-frame track program,
        and the chunked program for each requested chunk size once on
        THROWAWAY state (the track programs donate their state arguments,
        so the live video/graph state must not be passed) and discards
        the results.  Both lax.cond arms (keyframe/skip, cull/keep) are
        part of each single program, so one call per shape covers every
        branch; there are no other shape variants in steady state.
        """
        from .state import DepthVideo

        H, W = self.cfg.image_size
        h, w = self.video.fht, self.video.fwd
        rig = 2 if self.cfg.stereo else 1
        _, _, _, _, _, EA, EI = fused_caps(self.cfg)

        if self._track is None:
            self._track = build_track_step(
                self.net, self.cfg, self.cfg.buffer, H, W,
                oracle=self.oracle,
            )
        if getattr(self, "_chunk_fns", None) is None:
            self._chunk_fns = {}
        for B in chunk_sizes:
            if B not in self._chunk_fns:
                self._chunk_fns[B] = build_track_chunk(
                    self.net, self.cfg, self.cfg.buffer, H, W, B,
                    oracle=self.oracle,
                )

        intr8 = jnp.ones((4,), jnp.float32)
        disp = jnp.zeros((h, w), jnp.float32)
        thr = jnp.asarray(self.cfg.filter_thresh, jnp.float32)
        c = jnp.asarray(max(self.cfg.warmup + 2, 10), jnp.int32)

        # ONE throwaway state, chained through every program: all the
        # track programs donate (vstate, gstate), so each call reuses the
        # previous call's buffers in place.  Allocating a fresh full-size
        # state per program would LEAK each one for the process lifetime
        # under the relay's no-intra-process-free semantics (GB-scale at
        # buffer>=512 — exactly the budget prewarm exists to protect).
        vs = DepthVideo(self.cfg).state
        gs = init_graph_state(EA, EI, h, w)
        vs, gs, _ = self._step(self.params, vs, gs, c)

        out = self._track(
            self.params, vs, gs, c, c,
            jnp.zeros((rig, H, W, 3), jnp.uint8),
            jnp.zeros((), jnp.float32), intr8, disp, thr,
        )
        vs, gs = out[0], out[1]
        np.asarray(out[-1])          # block: compile done

        for B in sorted(self._chunk_fns):
            out = self._chunk_fns[B](
                self.params, vs, gs, c, c,
                jnp.zeros((B, rig, H, W, 3), jnp.uint8),
                jnp.zeros((B,), jnp.float32), intr8, disp, thr,
            )
            vs, gs = out[0], out[1]
            np.asarray(out[-1])
        del vs, gs, out

    def sync(self):
        """Block on the latest streamed frame and refresh host mirrors."""
        if self._last_flags is None:
            return
        flags = np.asarray(self._last_flags)
        self.video.counter = int(flags[2])
        self.t1 = self.video.counter
        self._since_sync = 0
        if self.video.counter >= self.cfg.buffer - 2:
            raise RuntimeError(
                f"keyframe buffer nearly full "
                f"({self.video.counter}/{self.cfg.buffer}); increase "
                f"SLAMConfig.buffer for this sequence"
            )

    def _initialize(self):
        from .factor_graph import FactorGraph
        from .frontend import Frontend

        boot = Frontend(self.net, self.params, self.video, self.cfg,
                        graph_cls=self.graph_cls or FactorGraph)
        boot._initialize()
        self.t1 = boot.t1
        self.is_initialized = True
        self._adopt(boot.graph)

    def _adopt(self, graph):
        """Convert a host-driven FactorGraph into GraphState regions."""
        g = self.gstate
        EA = _ea(g)
        EI = g.inac.shape[0]
        n = len(graph.ii)
        assert n <= EA, f"{n} boot edges exceed active capacity {EA}"

        ii = np.zeros(EA + EI, np.int32)
        jj = np.zeros(EA + EI, np.int32)
        age = np.zeros(EA, np.int32)
        seq = np.zeros(EA, np.int32)
        active = np.zeros(EA, bool)
        inac = np.zeros(EI, bool)

        ii[:n] = graph.ii
        jj[:n] = graph.jj
        age[:n] = graph.age
        seq[:n] = np.arange(n)
        active[:n] = True

        slots = jnp.asarray(
            np.concatenate([graph.slots,
                            np.zeros(EA - n, np.int64)]).astype(np.int32)
        )
        net = take_rows(graph.net_state, slots)
        target_a = take_rows(graph.target, slots)
        weight_a = take_rows(graph.weight, slots)

        n_i = min(len(graph.ii_inac), EI)
        ii[EA:EA + n_i] = graph.ii_inac[-n_i:]
        jj[EA:EA + n_i] = graph.jj_inac[-n_i:]
        inac[:n_i] = True
        start = len(graph.ii_inac) - n_i
        target_i = jnp.concatenate([
            graph.target_inac[start:start + n_i],
            jnp.zeros((EI - n_i,) + graph.target_inac.shape[1:]),
        ])
        weight_i = jnp.concatenate([
            graph.weight_inac[start:start + n_i],
            jnp.zeros((EI - n_i,) + graph.weight_inac.shape[1:]),
        ])

        self.gstate = g.replace(
            ii=jnp.asarray(ii), jj=jnp.asarray(jj),
            age=jnp.asarray(age), seq=jnp.asarray(seq),
            active=jnp.asarray(active), inac=jnp.asarray(inac),
            ring_ptr=jnp.asarray(n_i % EI, jnp.int32),
            tick=jnp.asarray(n, jnp.int32),
            net=net,
            target=jnp.concatenate([target_a, target_i]),
            weight=jnp.concatenate([weight_a, weight_i]),
        )
