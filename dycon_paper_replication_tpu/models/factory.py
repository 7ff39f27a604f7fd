"""Model factory: string name -> (config, init, apply) triple.

Parity target: /root/reference/code/networks/net_factory_3d.py:5-12.
The reference's `vnet` branch is broken (passes kwargs VNet doesn't
accept and returns a single tensor where trainers unpack three); this
factory ships a working three-head VNet instead (documented fix, see
SURVEY.md §7 faithfulness ledger).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .unet3d import UNet3DConfig, init_unet3d, unet3d_apply


class Model:
    """A bundled functional model: cfg + init(key) + apply(params, state, x)."""

    def __init__(self, cfg, init_fn, apply_fn):
        self.cfg = cfg
        self._init = init_fn
        self._apply = apply_fn

    def init(self, key: jax.Array):
        # jit: one compiled program instead of per-parameter eager dispatches
        return jax.jit(self._init, static_argnums=1)(key, self.cfg)

    def apply(self, params, state, x, *, train: bool = False, rng=None, **kwargs):
        return self._apply(params, state, x, self.cfg, train=train, rng=rng, **kwargs)


def net_factory_3d(
    net_type: str = "unet_3D",
    in_chns: int = 1,
    class_num: int = 2,
    scaler: int = 4,
    use_aspp: bool = False,
    compute_dtype: Any = jnp.float32,
    layout: str = "NDHWC",
) -> Model:
    if net_type == "unet_3D":
        cfg = UNet3DConfig(
            in_channels=in_chns,
            n_classes=class_num,
            scale_factor=int(scaler),
            use_aspp=use_aspp,
            compute_dtype=compute_dtype,
            layout=layout,
        )
        model = Model(cfg, init_unet3d, unet3d_apply)
        if layout == "folded":
            from .unet3d_folded import unet3d_seg_folded_io

            # packed inter-op pipeline entry (folded IO seg logits) for
            # the sliding-window engine; see unet3d_seg_folded_io
            model.apply_seg_folded = (
                lambda params, state, xf: unet3d_seg_folded_io(params, state, xf, cfg)
            )
        return model
    if net_type == "vnet":
        from .vnet import VNetConfig, init_vnet, vnet_apply

        cfg = VNetConfig(
            in_channels=in_chns,
            n_classes=class_num,
            scale_factor=int(scaler),
            compute_dtype=compute_dtype,
            layout=layout,
        )
        return Model(cfg, init_vnet, vnet_apply)
    raise ValueError(f"unknown net_type: {net_type!r}")
