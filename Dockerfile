# SPDX-License-Identifier: Apache-2.0
# StreamKit-TPU server image (CPU/TPU host; JAX wheels selected at build).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
      libopus0 libmpg123-0 g++ make pkg-config \
      libavformat-dev libavcodec-dev libavutil-dev libswresample-dev \
    && rm -rf /var/lib/apt/lists/*

# JAX backend: override JAX_WHEEL for TPU hosts (e.g. jax[tpu])
ARG JAX_WHEEL="jax"
RUN pip install --no-cache-dir ${JAX_WHEEL} aiohttp pyyaml numpy

WORKDIR /app
COPY streamkit_tpu ./streamkit_tpu
COPY native ./native
COPY samples ./samples
RUN make -C native

EXPOSE 8080
ENV SK_SERVER_ADDRESS=0.0.0.0 SK_SERVER_PORT=8080
# non-loopback binding requires explicit role configuration (see README)
CMD ["python", "-m", "streamkit_tpu.server", "serve", "--config", "/app/skit.toml"]
