# ndtpu container (parity with the reference's Docker setup, Dockerfile:1-31,
# minus CUDA/GSL: the compute core is JAX/XLA on TPU, the only native build
# is the optional PLY reader, compiled on demand by ndtpu.native).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/ndtpu
COPY . .

# TPU hosts: jax[tpu]; CPU dev: plain jax.
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir jax
RUN pip install --no-cache-dir flax optax orbax-checkpoint einops pytest

RUN python -c "from ndtpu.native.io import build_native; build_native()" || true

CMD ["python", "-m", "pytest", "tests/", "-q"]
