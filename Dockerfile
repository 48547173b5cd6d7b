# dexbotic_tpu — TPU serving/training image.
#
# Counterpart of the reference's CUDA images (/root/reference/Dockerfile,
# dockerfiles/{c118t22,c130t28}): instead of CUDA+conda+torch, the TPU stack
# is jax[tpu] (jaxlib + libtpu over PJRT) on a plain python base — TPU VMs
# expose the chips via /dev/vfio, no driver layer in the image.
#
# Build:  docker build -t dexbotic-tpu .
# Run  :  docker run --privileged --net=host \
#           -e JAX_PLATFORMS=tpu dexbotic-tpu \
#           python playground/benchmarks/libero/libero_cogact.py --task inference
# (--privileged + host network is the standard TPU-VM container contract for
#  vfio device access and the gRPC runtime.)

FROM python:3.11-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive \
    PIP_NO_CACHE_DIR=1 \
    # persistent XLA compilation cache across container restarts
    JAX_COMPILATION_CACHE_DIR=/var/cache/jax

RUN apt-get update -y && \
    apt-get install -y --no-install-recommends \
        build-essential cmake ninja-build git curl \
        libgl1 libglib2.0-0 && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app

# Versions pinned to the stack this repo's suite + benches were validated on.
RUN pip install \
        "jax[tpu]==0.9.0" "libtpu==0.0.34" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install \
        numpy optax "orbax-checkpoint" chex einops \
        opencv-python-headless pillow pytest

COPY pyproject.toml /app/pyproject.toml
COPY dexbotic_tpu/ /app/dexbotic_tpu/
COPY csrc/ /app/csrc/
COPY playground/ /app/playground/
COPY hardware/ /app/hardware/
COPY script/ /app/script/
COPY tests/ /app/tests/

# native fast-image kernel (data-path resize/pad; falls back to numpy if absent)
RUN pip install -e . && \
    g++ -O3 -march=native -shared -fPIC -o csrc/libfastimage.so csrc/fast_image.cpp -lpthread || \
    echo "fast_image build skipped (numpy fallback active)"

RUN mkdir -p /var/cache/jax

# suite fast profile (CPU, 8 virtual devices — tests/conftest.py forces it);
# full CI uses script/run_suite.py
HEALTHCHECK NONE
CMD ["python", "script/run_suite.py", "-m", "not heavy", "--group-size", "4"]
