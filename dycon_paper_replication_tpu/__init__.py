"""DyCON-TPU: a TPU-native (JAX/XLA/Pallas) framework for dynamic
uncertainty-aware consistency and contrastive semi-supervised 3D medical
image segmentation.

Re-designed from scratch for TPU hardware with the capabilities of the
PyTorch reference implementation of DyCON (CVPR 2025):

  * mean-teacher (student + EMA teacher) 3D U-Net with three heads
    (SDF regression, segmentation logits, voxel-contrastive projection)
  * four-term semi-supervised objective: CE + soft Dice (supervised),
    UnCL uncertainty-weighted consistency, FeCL focal voxel contrastive,
    and plain softmax-MSE/KL consistency
  * two-stream (labeled | unlabeled) batch construction
  * sliding-window patch inference with Dice/Jaccard/HD95/ASD metrics
  * three dataset families: BraTS-2019, Pancreas-CT, ISLES-2022

Everything on the compute path is functional JAX: parameters live in
pytrees, the training step is a single jitted program (student fwd,
teacher fwd, all losses, grad, clip, SGD+momentum, EMA) and scales over
a `jax.sharding.Mesh` with batch data parallelism.
"""

__version__ = "0.1.0"
