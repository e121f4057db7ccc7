# TPU-ready container for forde-tpu. Parity with the reference's container
# contract (Dockerfile:2-37): verification gate runs before every command
# via scripts/entrypoint.sh, default command trains.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make git && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
RUN pip install --no-cache-dir \
        "jax[tpu]" flax optax orbax-checkpoint einops numpy pytest \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . .
# pre-build the native ingest batcher
RUN python -c "from forde_tpu.data import native; native.load_library()"

ENTRYPOINT ["bash", "scripts/entrypoint.sh"]
CMD ["bash", "scripts/run_training.sh", "--use_dummy_data"]
