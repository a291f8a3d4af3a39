# Container for the TPU-native Neural Brushstroke Engine.
#
# Parity note (reference Dockerfile): the reference ships an NGC PyTorch+CUDA
# image with an entrypoint tweak for torch CUDA-extension JIT builds.  The TPU
# rebuild needs neither CUDA nor a runtime extension compiler: the compute
# path is JAX/XLA (jax[tpu] wheels bundle libtpu) and the only native code is
# the host-side C++ data kernels built once below.
#
# Run on a Cloud TPU VM (the TPU device is exposed by the host):
#   docker build -t brushstroke-engine-tpu .
#   docker run --privileged --net=host brushstroke-engine-tpu \
#       python -m brushstroke_engine_tpu.ui.server --help

FROM python:3.12-slim

ENV PYTHONDONTWRITEBYTECODE=1
ENV PYTHONUNBUFFERED=1

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

COPY requirements.txt /workspace/requirements.txt
RUN pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir "jax[tpu]" \
         -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . /workspace
# Host-side C++ data kernels (spline rasterization, triband prep).
RUN make -C native || true
RUN pip install --no-cache-dir -e .
