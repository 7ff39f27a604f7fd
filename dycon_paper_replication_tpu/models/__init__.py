"""Model zoo: functional pytree models (params as nested dicts, apply as
pure functions) in NDHWC layout."""

from .factory import net_factory_3d
from .unet3d import UNet3DConfig, init_unet3d, unet3d_apply
