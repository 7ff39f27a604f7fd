"""ops/bits.py: device-side bit packing for binary masks on the host link.

Pins the wire format (little-endian within each byte, last axis padded
up to a byte multiple) against numpy's packbits — the host-side
consumers (trainer HD95 fetch, sliding-window _finish) unpack with
`np.unpackbits(..., axis=-1, bitorder="little")`, so the device packer
must match numpy bit-for-bit.
"""

import numpy as np
import pytest

from dycon_paper_replication_tpu.ops.bits import packbits_le, unpackbits_le


@pytest.mark.parametrize("shape", [(16,), (3, 8), (2, 5), (4, 4, 13), (1, 1)])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.bool_])
def test_roundtrip(shape, dtype, rng):
    x = (rng.random(shape) > 0.5).astype(dtype)
    packed = np.asarray(packbits_le(x))
    assert packed.dtype == np.uint8
    assert packed.shape == shape[:-1] + ((shape[-1] + 7) // 8,)
    out = unpackbits_le(packed, shape[-1])
    np.testing.assert_array_equal(out, x.astype(np.uint8))


def test_matches_numpy_packbits(rng):
    x = (rng.random((5, 24)) > 0.3).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(packbits_le(x)),
        np.packbits(x, axis=-1, bitorder="little"),
    )


def test_pad_bits_are_zero(rng):
    # consumers slice back to the true extent; the pad region must be
    # zero so a full unpack never shows phantom foreground voxels
    x = np.ones((2, 9), np.float32)
    packed = np.asarray(packbits_le(x))
    full = np.unpackbits(packed, axis=-1, bitorder="little")
    assert full[:, 9:].sum() == 0
