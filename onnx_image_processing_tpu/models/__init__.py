"""Composite pipelines (the reference's L3, `pytorch_model/feature_detection/`)
as pure jit-compilable functions, plus the name → executable registry that
replaces the ONNX export layer (SURVEY.md §2.7, §2.10)."""

from .shi_tomasi_family import (
    shi_tomasi_bad_detect,
    shi_tomasi_with_angle,
    shi_tomasi_angle_sparse_bad_detect,
    shi_tomasi_angle_sparse_bad_describe,
    shi_tomasi_bad_sinkhorn_match,
    shi_tomasi_sparse_bad_sinkhorn_match,
    shi_tomasi_angle_sparse_bad_sinkhorn_match,
    shi_tomasi_angle_sparse_bad_sinkhorn_match_with_filters,
)
from .akaze_family import akaze_detect_cfg, akaze_sparse_bad_sinkhorn_match
from .essential_family import (
    shi_tomasi_angle_sparse_bad_sinkhorn_essential_match,
    akaze_sparse_bad_sinkhorn_essential_match,
)
from .extraction import with_match_extraction
from .registry import (PipelineSpec, register, names, get, build,
                       build_batched, compile_model)
from .streaming import build_streaming, streaming_names, supports_streaming
from .serialize import (
    POLYMORPHIC_EXPORTS,
    export_model,
    export_model_polymorphic,
    export_streaming,
    export_to_dir,
    load_exported,
    save_exported,
    artifact_path,
)

__all__ = [
    "shi_tomasi_bad_detect",
    "shi_tomasi_with_angle",
    "shi_tomasi_angle_sparse_bad_detect",
    "shi_tomasi_angle_sparse_bad_describe",
    "shi_tomasi_bad_sinkhorn_match",
    "shi_tomasi_sparse_bad_sinkhorn_match",
    "shi_tomasi_angle_sparse_bad_sinkhorn_match",
    "shi_tomasi_angle_sparse_bad_sinkhorn_match_with_filters",
    "akaze_detect_cfg",
    "akaze_sparse_bad_sinkhorn_match",
    "shi_tomasi_angle_sparse_bad_sinkhorn_essential_match",
    "akaze_sparse_bad_sinkhorn_essential_match",
    "with_match_extraction",
    "PipelineSpec",
    "register",
    "names",
    "get",
    "build",
    "build_batched",
    "compile_model",
    "build_streaming",
    "streaming_names",
    "supports_streaming",
    "POLYMORPHIC_EXPORTS",
    "export_model",
    "export_model_polymorphic",
    "export_streaming",
    "export_to_dir",
    "load_exported",
    "save_exported",
    "artifact_path",
]
