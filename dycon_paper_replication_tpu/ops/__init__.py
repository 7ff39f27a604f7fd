"""Pure-functional compute ops: losses, ramps, metrics, pooling/resize
primitives and Pallas kernels. Everything here is jit-safe."""

from . import ramps, losses, dycon, resize
