"""adapt_image_models_tpu — TPU-native AIM video recognition framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of
``bobochow/adapt-image-models`` (AIM, ICLR 2023 + the fork's experimental
backbones): frozen CLIP ViT image encoders adapted to video with lightweight
MLP-bottleneck adapters, trained/evaluated on K400/K700/SSv2/Diving-48/
HMDB51/UCF101-style video datasets.

Design stance (TPU-first, not a port):
  * pure-function flax.linen models, params as pytrees
  * trainable/frozen split expressed as a pytree partition (only adapter
    gradients are ever computed — XLA dead-code-eliminates frozen dW)
  * bf16 compute / fp32 LayerNorm islands / fp32 master params
  * jax.sharding.Mesh + jit shardings for data/tensor parallelism
  * Pallas flash-attention kernels for the hot attention ops
  * batched, jitted XLA preprocessing graph instead of per-sample CPU
    transform chains
"""

__version__ = "0.1.0"

from adapt_image_models_tpu.utils.registry import Registry  # noqa: F401
