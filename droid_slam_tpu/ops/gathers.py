"""Gather-free row selection for TPU.

XLA lowers dynamic gathers on TPU to near-scalar element rates (~20M
elements/s measured on v5e through this stack), which makes innocent
row-indexing like ``inps[ii]`` (64 edges × 30·40·128 features ≈ 10M
elements) cost hundreds of milliseconds.  A one-hot selector matmul
computes the same selection on the MXU at TFLOP rates:

    out[e] = Σ_s (ii[e] == s) · arr[s]

Used for every hot row-take in the runtime (frame features by edge
source, disparities by frame, coupling blocks by depth frame).
"""

import jax
import jax.numpy as jnp

# below this many gathered elements, plain jnp.take wins (selector
# construction overhead dominates)
_MIN_ELEMENTS = 1 << 14


def take_rows(arr, idx):
    """arr[idx] along axis 0 via one-hot matmul (exact for 0/1 weights).

    arr: (S, ...); idx: (E,) int (values outside [0, S) produce zero rows,
    matching a masked gather).  Returns (E, ...).
    """
    S = arr.shape[0]
    E = idx.shape[0]
    tail = 1
    for d in arr.shape[1:]:
        tail *= d

    if E * tail < _MIN_ELEMENTS:
        return jnp.take(arr, jnp.clip(idx, 0, S - 1), axis=0)

    flat = arr.reshape(S, tail)
    sel = (
        idx[:, None] == jax.lax.broadcasted_iota(idx.dtype, (1, S), 1)
    ).astype(arr.dtype if arr.dtype != jnp.bool_ else jnp.float32)
    out = jnp.einsum(
        "es,sf->ef", sel, flat.astype(sel.dtype),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return out.astype(arr.dtype).reshape((E,) + arr.shape[1:])


def scatter_add_rows(values, idx, n_out):
    """Segment-sum rows via one-hot matmul: out[s] = Σ_{e: idx[e]=s} v[e].

    values: (E, ...); idx: (E,); out (n_out, ...).  Out-of-range indices
    are dropped.
    """
    E = values.shape[0]
    tail = 1
    for d in values.shape[1:]:
        tail *= d

    if E * tail < _MIN_ELEMENTS:
        clipped = jnp.clip(idx, 0, n_out)
        out = jax.ops.segment_sum(
            values.reshape(E, tail),
            jnp.where((idx >= 0) & (idx < n_out), idx, n_out),
            num_segments=n_out + 1,
        )[:-1]
        return out.reshape((n_out,) + values.shape[1:])

    sel = (
        idx[None, :] == jax.lax.broadcasted_iota(idx.dtype, (n_out, 1), 0)
    ).astype(values.dtype)
    out = jnp.einsum(
        "se,ef->sf", sel, values.reshape(E, tail),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return out.astype(values.dtype).reshape((n_out,) + values.shape[1:])
