"""Convert reference PyTorch checkpoints (droid.pth) to flax params.

The reference loads `droid.pth`, strips the DDP "module." prefix, and
truncates the update head out-channels from 3 to 2
(/root/reference/droid_slam/droid.py:45-58).  This converter performs the
same surgery and transposes conv kernels OIHW → HWIO for our channels-last
models.  No torch dependency at import time — tensors are accepted as
numpy arrays (pass `torch_load(path)` output through `to_numpy_state`).
"""

import numpy as np


def to_numpy_state(state_dict):
    """Detach a torch state_dict to {name: np.ndarray} (torch optional)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k.replace("module.", "")] = np.asarray(v)
    return out


def _conv(sd, tname):
    """Torch conv weight/bias -> flax {'kernel': HWIO, 'bias': (O,)}."""
    w = sd[f"{tname}.weight"]
    entry = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{tname}.bias" in sd:
        entry["bias"] = sd[f"{tname}.bias"]
    return entry


def _encoder(sd, prefix):
    params = {
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    for stage in (1, 2, 3):
        for blk in (0, 1):
            bp = f"{prefix}.layer{stage}.{blk}"
            entry = {
                "conv1": _conv(sd, f"{bp}.conv1"),
                "conv2": _conv(sd, f"{bp}.conv2"),
            }
            if f"{bp}.downsample.0.weight" in sd:
                entry["downsample"] = _conv(sd, f"{bp}.downsample.0")
            params[f"layer{stage}_{blk}"] = entry
    return params


def _truncate_head(entry, out_ch=2):
    """Drop extra out-channels (3→2) as in reference droid.py:53-56."""
    entry = dict(entry)
    entry["kernel"] = entry["kernel"][..., :out_ch]
    if "bias" in entry:
        entry["bias"] = entry["bias"][:out_ch]
    return entry


def convert_state_dict(sd):
    """Reference state_dict (numpy values) -> flax params for DroidNet."""
    update = {
        "corr_encoder_0": _conv(sd, "update.corr_encoder.0"),
        "corr_encoder_2": _conv(sd, "update.corr_encoder.2"),
        "flow_encoder_0": _conv(sd, "update.flow_encoder.0"),
        "flow_encoder_2": _conv(sd, "update.flow_encoder.2"),
        "weight_0": _conv(sd, "update.weight.0"),
        "weight_2": _truncate_head(_conv(sd, "update.weight.2")),
        "delta_0": _conv(sd, "update.delta.0"),
        "delta_2": _truncate_head(_conv(sd, "update.delta.2")),
        "gru": {
            "convz": _conv(sd, "update.gru.convz"),
            "convr": _conv(sd, "update.gru.convr"),
            "convq": _conv(sd, "update.gru.convq"),
            "w": _conv(sd, "update.gru.w"),
            "convz_glo": _conv(sd, "update.gru.convz_glo"),
            "convr_glo": _conv(sd, "update.gru.convr_glo"),
            "convq_glo": _conv(sd, "update.gru.convq_glo"),
        },
        "agg": {
            "conv1": _conv(sd, "update.agg.conv1"),
            "conv2": _conv(sd, "update.agg.conv2"),
            "eta": _conv(sd, "update.agg.eta.0"),
            "upmask": _conv(sd, "update.agg.upmask.0"),
        },
    }
    return {
        "params": {
            "fnet": _encoder(sd, "fnet"),
            "cnet": _encoder(sd, "cnet"),
            "update": update,
        }
    }


def load_reference_weights(path):
    """Load droid.pth with torch and convert to flax params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(to_numpy_state(sd))


def save_npz_weights(params, path):
    """Flatten flax params to a compressed npz (slash-joined keys)."""
    flat = {}

    def walk(d, pfx):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, pfx + (k,))
            else:
                flat["/".join(pfx + (k,))] = np.asarray(v)

    walk(params["params"] if "params" in params else params, ())
    np.savez_compressed(path, **flat)
    return len(flat)


def load_npz_weights(path):
    """Load a params npz written by save_npz_weights -> flax params."""
    data = np.load(path)
    tree = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return {"params": tree}


def load_weights(path):
    """Dispatch by extension: .npz (this framework's own checkpoints) or
    .pth (the reference's droid.pth, converted layer-by-layer)."""
    if str(path).endswith(".npz"):
        return load_npz_weights(path)
    return load_reference_weights(path)
