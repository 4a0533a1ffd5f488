"""opengaussian-tpu: a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OpenGaussian
(arXiv:2406.02058): a differentiable tile rasterizer that renders spherical
harmonics color and per-Gaussian instance-feature channels in a single pass,
plus the full multi-stage open-vocabulary pipeline (3DGS pretraining,
SAM-supervised instance features, two-level k-means codebooks, CLIP language
association), sharded over TPU device meshes.
"""

__version__ = "0.1.0"

from opengaussian_tpu.cameras import Camera  # noqa: F401
