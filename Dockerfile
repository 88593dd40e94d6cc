# Container image for brever_tpu (reference parity: the upstream ships
# a CUDA/PyTorch Dockerfile; this is the TPU/JAX equivalent).
#
#   docker build -t brever-tpu .
#   docker run --privileged brever-tpu python scripts/train_model.py ...
#
# On Cloud TPU VMs run with --privileged (or --device /dev/accel0) so
# libtpu can reach the accelerator; on any other host the image falls
# back to the CPU backend (jax picks the platform at runtime).

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make ffmpeg p7zip-full \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /brever_tpu

COPY pyproject.toml ./pyproject.toml
COPY brever_tpu/ ./brever_tpu/
COPY scripts/ ./scripts/
COPY config/ ./config/
COPY native/Makefile native/brever_native.cpp ./native/

# jax[tpu] pulls libtpu from the Google releases index; harmless on
# non-TPU hosts (the plugin simply fails to find a device)
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

# GIL-free C++ tar/audio loader used by the data pipeline
RUN make -C native

ENV PYTHONPATH=/brever_tpu
