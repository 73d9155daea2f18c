# Runnable environment for autoprog_tpu (the reference ships its env as
# /root/reference/Dockerfile:1-8 — nvcr pytorch:20.11 + timm 0.4.5 +
# tlt 0.1.0; this is the TPU-native equivalent).
#
# Build:  docker build -t autoprog-tpu .
# Run  :  docker run --rm --privileged autoprog-tpu \
#           python main.py synthetic:// --model deit_h2_l2 --num-classes 10
# On a Cloud TPU VM, add the TPU runtime mount and install the matching
# libtpu wheel: pip install 'jax[tpu]==0.9.0' \
#   -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
#
# The image mirrors pyproject.toml's pins exactly; `pip install -e .` is
# the single source of truth for versions.

FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libjpeg62-turbo-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml ./
COPY autoprog_tpu ./autoprog_tpu
COPY native ./native
COPY scripts ./scripts
COPY main.py main_prog.py validate.py bench.py ./

# core pins + optional input pipelines + test deps (one layer, resolved
# together so the pins stay mutually consistent)
RUN pip install --no-cache-dir -e ".[tf-data,hf-data,test]"

# native image pipeline (loader workers fall back to PIL if absent)
RUN make -C native

CMD ["python", "-m", "pytest", "tests/", "-q"]
