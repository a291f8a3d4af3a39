"""TPU-native Neural Brushstroke Engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
nv-tlabs/brushstroke_engine (SIGGRAPH Asia 2022 "Neural Brushstroke Engine"):
a geometry-conditioned StyleGAN2-ADA whose latent code selects an interactive
brush style, with a color-triad output head, patch-based any-size canvas
painting, brush libraries, projection/CLIP search, and the full training stack.

Design stance (TPU-first, not a port):
  * All activations are NHWC; conv weights HWIO; matmuls hit the MXU.
  * ``upfirdn2d`` is one fused ``lax.conv_general_dilated`` call
    (lhs_dilation = up, window_strides = down, depthwise) -- the XLA-native
    equivalent of the reference CUDA kernel
    (reference: thirdparty/.../torch_utils/ops/upfirdn2d.cu).
  * ``modulated_conv2d`` scales activations/outputs around ONE shared dense
    conv (mathematically identical to the reference's per-sample grouped conv,
    reference networks.py:31-88, but keeps the MXU busy with a single large
    matmul instead of batch-many tiny groups).
  * ``bias_act`` is plain jnp so XLA fuses it into the conv epilogue
    (the reference needed a CUDA kernel only because torch eager does not fuse;
    reference torch_utils/ops/bias_act.py).
  * Everything trains/infers under ``jax.jit``; parallelism is expressed with
    ``jax.sharding.Mesh`` + NamedSharding, not process groups.
"""

__version__ = "0.1.0"
