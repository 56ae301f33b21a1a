# ucfp-tpu service image (deploy parity with the reference's Dockerfile:
# single service, healthcheck loop, env-driven config).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ curl && rm -rf /var/lib/apt/lists/*

# jax pinned CPU by default; TPU images override JAX_PLATFORMS.
RUN pip install --no-cache-dir "jax[cpu]" flax optax numpy pillow xxhash

WORKDIR /app
COPY ucfp_tpu/ ucfp_tpu/
COPY scripts/ scripts/
COPY docs/ docs/
COPY clients/ clients/

ENV UCFP_BIND=0.0.0.0:8080 \
    UCFP_DATA_DIR=/data \
    UCFP_BODY_LIMIT_MB=16

VOLUME /data
EXPOSE 8080

HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
  CMD curl -sf http://127.0.0.1:8080/healthz || exit 1

CMD ["python", "-m", "ucfp_tpu.server"]
