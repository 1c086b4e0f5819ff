# TPU deployment image (reference: Dockerfile — CUDA base swapped for
# a TPU-enabled JAX base; ffmpeg retained only as the OGG decode
# fallback, first-party C++ handles WAV).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make ffmpeg libopus0 libgsm1 libspeex1 libmpg123-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml /app/
COPY audio_processor_tpu /app/audio_processor_tpu
COPY native /app/native
COPY config.example.yaml /app/config.yaml

# JAX with TPU support (libtpu comes from the TPU VM image).
RUN pip install --no-cache-dir "jax[tpu]" flax optax numpy pyyaml psutil \
    && pip install --no-cache-dir -e . \
    && bash native/build.sh

VOLUME ["/app/input", "/app/output", "/app/logs"]

# Online serving mode (override CMD with: --save-mode csv --serve
# --port 8080 [--grpc-port 8081]); SIGTERM drains gracefully.
EXPOSE 8080 8081

ENV CONFIG_FILE=/app/config.yaml
ENTRYPOINT ["python", "-m", "audio_processor_tpu.cli", "--config", "/app/config.yaml"]
CMD ["--save-mode", "database", "--performance-report", "--load-metadata"]
