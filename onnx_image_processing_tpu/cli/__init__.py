"""CLI apps mirroring the reference's `sample/` layer (SURVEY.md §2.11):

    python -m onnx_image_processing_tpu.cli.feature_detection -i img.jpg
    python -m onnx_image_processing_tpu.cli.image_matching -i1 a.jpg -i2 b.jpg
    python -m onnx_image_processing_tpu.cli.image_matching_extraction ...
    python -m onnx_image_processing_tpu.cli.visual_odometry -i video.mp4
    python -m onnx_image_processing_tpu.cli.export
"""
