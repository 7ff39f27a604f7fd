"""Architectural parity: an INDEPENDENT PyTorch realization of the
UNet3D spec (written here from SURVEY.md §3.2 / the published
architecture, not imported from anywhere), weight-mapped to our
functional model, must produce the same outputs.

This is the strongest structural check we can run hermetically: if any
layer order, norm placement, padding rule, upsample convention, or head
wiring differed, the outputs would diverge.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from dycon_paper_replication_tpu.models import net_factory_3d

F = [16, 32, 64, 128, 256]  # filters at feature_scale 4


class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = nn.Conv3d(cin, cout, 3, padding=1)
        self.c2 = nn.Conv3d(cout, cout, 3, padding=1)

    def forward(self, x):
        x = TF.relu(TF.instance_norm(self.c1(x)))
        return TF.relu(TF.instance_norm(self.c2(x)))


class TorchUNet3D(nn.Module):
    """Three-head 3D U-Net: conv blocks w/ InstanceNorm, maxpool encoder,
    trilinear-upsample + concat decoder, tanh SDF + seg heads, and a
    corner-aligned-upsampled projection head with true BatchNorm."""

    def __init__(self, scale_factor=2):
        super().__init__()
        self.scale_factor = scale_factor
        self.enc = nn.ModuleList(
            [TorchConvBlock(1, F[0])] + [TorchConvBlock(F[i], F[i + 1]) for i in range(3)]
        )
        self.center = TorchConvBlock(F[3], F[4])
        self.dec = nn.ModuleList(
            [TorchConvBlock(F[4] + F[3], F[3]), TorchConvBlock(F[3] + F[2], F[2]),
             TorchConvBlock(F[2] + F[1], F[1]), TorchConvBlock(F[1] + F[0], F[0])]
        )
        self.final = nn.Conv3d(F[0], 2, 1)
        self.out_conv2 = nn.Conv3d(F[0], 2, 1)
        self.pconv1 = nn.Conv3d(F[4], 512, 1)
        self.pbn1 = nn.BatchNorm3d(512)
        self.pconv2 = nn.Conv3d(512, 256, 1)
        self.pbn2 = nn.BatchNorm3d(256)

    def forward(self, x):
        skips = []
        h = x
        for blk in self.enc:
            h = blk(h)
            skips.append(h)
            h = TF.max_pool3d(h, 2)
        center = self.center(h)  # eval mode: dropout inactive
        h = center
        for blk, skip in zip(self.dec, skips[::-1]):
            up = TF.interpolate(h, scale_factor=2, mode="trilinear", align_corners=False)
            h = blk(torch.cat([skip, up], dim=1))
        proj = TF.interpolate(center, scale_factor=self.scale_factor,
                              mode="trilinear", align_corners=True)
        proj = TF.relu(self.pbn1(self.pconv1(proj)))
        features = self.pbn2(self.pconv2(proj))
        sdf = torch.tanh(self.final(h))
        seg = self.out_conv2(h)
        return sdf, seg, features


def _copy_conv(tconv, p):
    # ours: DHWIO -> torch: (O, I, D, H, W)
    w = np.asarray(p["w"]).transpose(4, 3, 0, 1, 2)
    tconv.weight.data = torch.tensor(w)
    tconv.bias.data = torch.tensor(np.asarray(p["b"]))


def _copy_block(tblk, p):
    _copy_conv(tblk.c1, p["conv1"])
    _copy_conv(tblk.c2, p["conv2"])


@pytest.mark.parametrize("scale_factor", [2])
def test_forward_matches_independent_torch_model(rng, scale_factor):
    model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=scale_factor)
    params, state = model.init(jax.random.key(3))

    tm = TorchUNet3D(scale_factor).eval()
    for i, name in enumerate(("conv1", "conv2", "conv3", "conv4")):
        _copy_block(tm.enc[i], params[name])
    _copy_block(tm.center, params["center"])
    for i, name in enumerate(("up_concat4", "up_concat3", "up_concat2", "up_concat1")):
        _copy_block(tm.dec[i], params[name])
    _copy_conv(tm.final, params["final"])
    _copy_conv(tm.out_conv2, params["out_conv2"])
    _copy_conv(tm.pconv1, params["projection"]["conv1"])
    _copy_conv(tm.pconv2, params["projection"]["conv2"])
    for tbn, pp, ss in ((tm.pbn1, params["projection"]["bn1"], state["projection"]["bn1"]),
                        (tm.pbn2, params["projection"]["bn2"], state["projection"]["bn2"])):
        tbn.weight.data = torch.tensor(np.asarray(pp["scale"]))
        tbn.bias.data = torch.tensor(np.asarray(pp["bias"]))
        tbn.running_mean.data = torch.tensor(np.asarray(ss["mean"]))
        tbn.running_var.data = torch.tensor(np.asarray(ss["var"]))

    x = rng.normal(size=(2, 32, 32, 16, 1)).astype(np.float32)
    (sdf_j, seg_j, feat_j), _ = model.apply(params, state, jnp.asarray(x))  # eval mode

    with torch.no_grad():
        xt = torch.tensor(np.moveaxis(x, -1, 1))  # NDHWC -> NCDHW
        sdf_t, seg_t, feat_t = tm(xt)

    def cl(t):  # torch NCDHW -> channels-last numpy
        return np.moveaxis(t.numpy(), 1, -1)

    np.testing.assert_allclose(np.asarray(seg_j), cl(seg_t), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sdf_j), cl(sdf_t), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feat_j), cl(feat_t), atol=5e-4, rtol=1e-3)
