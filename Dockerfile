# CPU image for development/tests (TPU runtime comes from the host libtpu).
# Counterpart of the reference Dockerfile (`Dockerfile:1-14`).
ARG PYTHON_VERSION=3.12
FROM python:${PYTHON_VERSION}-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    libgomp1 libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md LICENSE ./
COPY onnx_image_processing_tpu ./onnx_image_processing_tpu
RUN pip install --no-cache-dir ".[cli]"

RUN useradd -m runner
USER runner
ENTRYPOINT ["python", "-m", "onnx_image_processing_tpu.cli.image_matching"]
