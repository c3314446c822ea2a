"""SLAM session snapshotting (save/resume a mapping session).

The reference has no session persistence at all (SURVEY.md §5: training
checkpoints are model-weights-only; the SLAM map lives and dies with the
process).  Here the entire keyframe map state plus the frontend's factor
graph is serialized to one .npz, so long mapping sessions survive
restarts and can be inspected offline.
"""

import numpy as np


def _to_np(x):
    """Device array -> numpy, widening bf16 (npz can't store bfloat16)."""
    a = np.asarray(x)
    if a.dtype.kind == "V":      # bfloat16 shows up as a void dtype
        import jax.numpy as jnp
        a = np.asarray(jnp.asarray(x).astype(jnp.float32))
    return a


_GSTATE_FIELDS = ("ii", "jj", "target", "weight", "age", "seq", "active",
                  "net", "inac", "ring_ptr", "tick")


def save_session(path, droid):
    """Serialize a Droid instance's map + frontend graph state."""
    video = droid.video
    frontend = getattr(droid, "frontend", None)
    # the fused streaming path refreshes host mirrors (video.counter,
    # frontend.t1) only every 16 frames — block on the latest streamed
    # frame first so the saved counter matches the saved device arrays
    if hasattr(frontend, "sync"):
        frontend.sync()
    st = video.state
    graph = getattr(frontend, "graph", None)
    gstate = getattr(frontend, "gstate", None)   # FusedFrontend

    arrays = {
        f"video_{k}": _to_np(getattr(st, k))
        for k in (
            "tstamp", "images", "poses", "disps", "disps_sens",
            "disps_up", "intrinsics", "fmaps", "nets", "inps", "damping",
        )
    }
    arrays["counter"] = np.asarray(video.counter)

    if gstate is not None:
        arrays.update({
            f"gstate_{k}": _to_np(getattr(gstate, k))
            for k in _GSTATE_FIELDS
        })
        arrays["frontend_t1"] = np.asarray(frontend.t1)
        arrays["frontend_init"] = np.asarray(frontend.is_initialized)
    elif graph is not None:
        arrays.update(
            graph_ii=graph.ii, graph_jj=graph.jj, graph_age=graph.age,
            graph_slots=graph.slots,
            graph_free=np.asarray(graph.free, np.int64),
            graph_ii_inac=graph.ii_inac, graph_jj_inac=graph.jj_inac,
            graph_ii_bad=graph.ii_bad, graph_jj_bad=graph.jj_bad,
            graph_net_state=_to_np(graph.net_state),
            graph_target=_to_np(graph.target),
            graph_weight=_to_np(graph.weight),
            graph_target_inac=_to_np(graph.target_inac),
            graph_weight_inac=_to_np(graph.weight_inac),
            frontend_t1=np.asarray(droid.frontend.t1),
            frontend_init=np.asarray(droid.frontend.is_initialized),
        )

    np.savez_compressed(path, **arrays)
    return path


def load_session(path, droid):
    """Restore a Droid instance's map + frontend graph state in place."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    video = droid.video
    st = video.state

    video.state = st.replace(**{
        k: jnp.asarray(data[f"video_{k}"]).astype(getattr(st, k).dtype)
        for k in (
            "tstamp", "images", "poses", "disps", "disps_sens",
            "disps_up", "intrinsics", "fmaps", "nets", "inps", "damping",
        )
    })
    video.counter = int(data["counter"])

    # fail loudly on frontend-type mismatch (ADVICE r2): a fused-frontend
    # snapshot carries gstate_* keys, a host-graph one carries graph_*;
    # restoring into the wrong Droid would AttributeError or silently
    # skip the graph restore
    if hasattr(droid, "frontend"):
        if "gstate_ii" in data and not hasattr(droid.frontend, "gstate"):
            raise ValueError(
                "snapshot was saved with fused=True; this Droid was "
                "built with fused=False — rebuild with fused=True"
            )
        if "graph_ii" in data and not hasattr(droid.frontend, "graph"):
            raise ValueError(
                "snapshot was saved with fused=False; this Droid was "
                "built with fused=True — rebuild with fused=False"
            )

    if "gstate_ii" in data and hasattr(droid, "frontend"):
        g = droid.frontend.gstate
        droid.frontend.gstate = g.replace(**{
            k: jnp.asarray(data[f"gstate_{k}"]).astype(
                getattr(g, k).dtype
            )
            for k in _GSTATE_FIELDS
        })
        droid.frontend.t1 = int(data["frontend_t1"])
        droid.frontend.is_initialized = bool(data["frontend_init"])
        # drop every stale streaming mirror: _counter_dev/_t1_dev
        # re-mirror from the restored host counter on the next frame,
        # and _last_flags must not let a later sync() overwrite the
        # restored counter with the PREVIOUS session's flags
        droid.frontend._counter_dev = None
        droid.frontend._t1_dev = None
        droid.frontend._last_flags = None
        droid.frontend._since_sync = 0
    elif "graph_ii" in data and hasattr(droid, "frontend"):
        g = droid.frontend.graph
        g.ii = data["graph_ii"]
        g.jj = data["graph_jj"]
        g.age = data["graph_age"]
        g.slots = data["graph_slots"]
        g.free = [int(x) for x in data["graph_free"]]
        g.ii_inac = data["graph_ii_inac"]
        g.jj_inac = data["graph_jj_inac"]
        g.ii_bad = data["graph_ii_bad"]
        g.jj_bad = data["graph_jj_bad"]
        g.net_state = jnp.asarray(data["graph_net_state"]).astype(
            g.state_dtype)
        g.target = jnp.asarray(data["graph_target"])
        g.weight = jnp.asarray(data["graph_weight"])
        g.E_alloc = int(g.net_state.shape[0])   # lazy-growth watermark
        g.target_inac = jnp.asarray(data["graph_target_inac"])
        g.weight_inac = jnp.asarray(data["graph_weight_inac"])
        droid.frontend.t1 = int(data["frontend_t1"])
        droid.frontend.is_initialized = bool(data["frontend_init"])

    # motion filter's last-keyframe features live in the video buffers
    if hasattr(droid, "filter") and video.counter > 0:
        k = video.counter - 1
        droid.filter.fmap = video.state.fmaps[k]
        droid.filter.knet = video.state.nets[k]
        droid.filter.kinp = video.state.inps[k]
    return droid
