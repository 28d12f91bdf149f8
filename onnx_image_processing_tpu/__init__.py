"""onnx_image_processing_tpu — a TPU-native JAX/Pallas rebuild of
fateshelled/onnx_image_processing.

Classical feature detection, description, matching, and geometry as fused
XLA/Pallas programs with static shapes: where the reference authors PyTorch
graphs and ships ONNX models run by onnxruntime, this framework composes pure
functions under ``jax.jit`` (the registry in :mod:`.models` is the export-layer
analogue) and scales over device meshes via :mod:`.parallel`.
"""

__version__ = "0.1.0"
