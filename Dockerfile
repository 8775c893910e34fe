# CPU image: runs the full test suite and the 5-config end-to-end smoke on
# virtual devices (SURVEY.md §2.16 — the reference shipped cpu/gpu
# Dockerfiles + Travis smoke; this is the rebuild's equivalent).
#
#   docker build -t srl-zoo-tpu .
#   docker run --rm srl-zoo-tpu                 # smoke (5 configs e2e)
#   docker run --rm srl-zoo-tpu make test       # full pytest suite
#
# For TPU hosts, base on a libtpu-matching jax image instead and install
# with: pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential libjpeg62-turbo-dev libgl1 libglib2.0-0 make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY . .
ENV JAX_PLATFORMS=cpu
CMD ["bash", "ci/smoke.sh"]
