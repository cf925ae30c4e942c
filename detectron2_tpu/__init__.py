"""detectron2_tpu: a TPU-native detection & segmentation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities and public API
surface of detectron2: fixed-shape compiled detection pipelines (padded
instances, in-graph NMS / RoIAlign), flax modules built through the same
registry + config machinery, SPMD data parallelism over jax device meshes.
"""

from detectron2_tpu.utils.env import setup_environment

setup_environment()

__version__ = "0.1.0"
