"""Numerical parity between the flax models and torch-built equivalents.

torch (CPU) is available in this environment, so we can validate the
weight-conversion path end-to-end: build a torch network with the
reference's layer semantics, convert its state_dict with models/convert,
and require the flax forward to match the torch forward to float
tolerance.  This is what guarantees a real droid.pth will load correctly
(layouts, padding, stride semantics, norm placement).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def torch_residual_block(cin, planes, norm, stride=1):
    layers = {}
    layers["conv1"] = nn.Conv2d(cin, planes, 3, padding=1, stride=stride)
    layers["conv2"] = nn.Conv2d(planes, planes, 3, padding=1)
    if stride != 1:
        layers["downsample"] = nn.Conv2d(cin, planes, 1, stride=stride)
    return layers


class TorchEncoder(nn.Module):
    """Reference BasicEncoder semantics (extractor.py:118-198), built
    independently for parity testing."""

    def __init__(self, output_dim=128, norm="instance"):
        super().__init__()
        self.norm = norm
        self.conv1 = nn.Conv2d(3, 32, 7, stride=2, padding=3)
        self.conv2 = nn.Conv2d(128, output_dim, 1)
        dims = [(32, 32, 1), (32, 64, 2), (64, 128, 2)]
        self.blocks = nn.ModuleDict()
        for s, (cin, planes, stride) in enumerate(dims, 1):
            for b in (0, 1):
                blk = torch_residual_block(
                    cin if b == 0 else planes, planes, norm,
                    stride if b == 0 else 1,
                )
                for k, v in blk.items():
                    self.blocks[f"l{s}_{b}_{k}"] = v

    def _norm(self, x):
        if self.norm == "instance":
            return F.instance_norm(x)
        return x

    def _block(self, x, s, b, stride):
        y = F.relu(self._norm(self.blocks[f"l{s}_{b}_conv1"](x)))
        y = F.relu(self._norm(self.blocks[f"l{s}_{b}_conv2"](y)))
        if stride != 1:
            x = self._norm(self.blocks[f"l{s}_{b}_downsample"](x))
        return F.relu(x + y)

    def forward(self, x):
        x = F.relu(self._norm(self.conv1(x)))
        for s, stride in [(1, 1), (2, 2), (3, 2)]:
            x = self._block(x, s, 0, stride)
            x = self._block(x, s, 1, 1)
        return self.conv2(x)

    def ref_state_dict(self, prefix):
        """Rename to the reference checkpoint naming scheme."""
        sd = {}
        sd[f"{prefix}.conv1.weight"] = self.conv1.weight
        sd[f"{prefix}.conv1.bias"] = self.conv1.bias
        sd[f"{prefix}.conv2.weight"] = self.conv2.weight
        sd[f"{prefix}.conv2.bias"] = self.conv2.bias
        for s in (1, 2, 3):
            for b in (0, 1):
                for k in ("conv1", "conv2", "downsample"):
                    key = f"l{s}_{b}_{k}"
                    if key in self.blocks:
                        mod = self.blocks[key]
                        tname = (f"{prefix}.layer{s}.{b}.{k}"
                                 if k != "downsample"
                                 else f"{prefix}.layer{s}.{b}.downsample.0")
                        sd[f"{tname}.weight"] = mod.weight
                        sd[f"{tname}.bias"] = mod.bias
        return sd


class TestEncoderParity:
    @pytest.mark.parametrize("norm,out_dim", [("instance", 128),
                                              ("none", 256)])
    def test_fnet_cnet_parity(self, norm, out_dim):
        import jax.numpy as jnp

        from droid_slam_tpu.models.convert import _encoder, to_numpy_state
        from droid_slam_tpu.models.extractor import BasicEncoder

        torch.manual_seed(0)
        tnet = TorchEncoder(output_dim=out_dim, norm=norm).eval()
        sd = to_numpy_state(tnet.ref_state_dict("enc"))
        params = {"params": _encoder(sd, "enc")}

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 48, 64, 3)).astype(np.float32)

        with torch.no_grad():
            expect = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
        expect = expect.permute(0, 2, 3, 1).numpy()

        enc = BasicEncoder(output_dim=out_dim, norm_fn=norm, dtype=None)
        got = np.asarray(enc.apply(params, jnp.asarray(x)))

        np.testing.assert_allclose(got, expect, atol=2e-4, rtol=1e-3)


class TestGRUParity:
    def test_conv_gru_parity(self):
        import jax.numpy as jnp

        from droid_slam_tpu.models.convert import _conv, to_numpy_state
        from droid_slam_tpu.models.gru import ConvGRU

        torch.manual_seed(1)
        h, i = 128, 320

        tmods = {
            "convz": nn.Conv2d(h + i, h, 3, padding=1),
            "convr": nn.Conv2d(h + i, h, 3, padding=1),
            "convq": nn.Conv2d(h + i, h, 3, padding=1),
            "w": nn.Conv2d(h, h, 1),
            "convz_glo": nn.Conv2d(h, h, 1),
            "convr_glo": nn.Conv2d(h, h, 1),
            "convq_glo": nn.Conv2d(h, h, 1),
        }

        def torch_forward(net, inp):
            net_inp = torch.cat([net, inp], dim=1)
            b, c = net.shape[:2]
            glo = torch.sigmoid(tmods["w"](net)) * net
            glo = glo.view(b, c, -1).mean(-1).view(b, c, 1, 1)
            z = torch.sigmoid(tmods["convz"](net_inp) + tmods["convz_glo"](glo))
            r = torch.sigmoid(tmods["convr"](net_inp) + tmods["convr_glo"](glo))
            q = torch.tanh(
                tmods["convq"](torch.cat([r * net, inp], dim=1))
                + tmods["convq_glo"](glo)
            )
            return (1 - z) * net + z * q

        sd = to_numpy_state({
            f"g.{k}.weight": m.weight for k, m in tmods.items()
        } | {f"g.{k}.bias": m.bias for k, m in tmods.items()})
        params = {"params": {k: _conv(sd, f"g.{k}") for k in tmods}}

        rng = np.random.default_rng(2)
        net = np.tanh(rng.standard_normal((2, 8, 10, h))).astype(np.float32)
        inp = rng.standard_normal((2, 8, 10, i)).astype(np.float32)

        with torch.no_grad():
            expect = torch_forward(
                torch.from_numpy(net).permute(0, 3, 1, 2),
                torch.from_numpy(inp).permute(0, 3, 1, 2),
            ).permute(0, 2, 3, 1).numpy()

        gru = ConvGRU(h, dtype=None)
        got = np.asarray(gru.apply(params, jnp.asarray(net), jnp.asarray(inp)))
        # tolerance headroom: conv reductions reorder under XLA-CPU /
        # torch threading (observed flake at rtol=1e-4 when the suite
        # shares cores with another heavy process); parity failures of
        # interest are orders of magnitude above this
        np.testing.assert_allclose(got, expect, atol=1e-4, rtol=1e-3)
