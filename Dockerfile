# TPU-host image for the gaussian-splatting-tpu framework — counterpart of
# the reference's CUDA/COLMAP image (reference Dockerfile:1-67). No COLMAP:
# the framework's own SfM bootstrap replaces it (the reference built COLMAP
# but never invoked it, SURVEY §2.16).
FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential g++ ffmpeg libgl1 libglib2.0-0 git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# TPU runtime + scientific stack. On GPU-less CI hosts jax[cpu] is enough;
# swap for jax[tpu] -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
# on TPU VMs.
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir "jax[cpu]"
RUN pip install --no-cache-dir \
    flax optax chex einops numpy scipy scikit-learn \
    opencv-python-headless pillow imageio matplotlib pytest

COPY . /workspace/
RUN bash native/build.sh && python -m pytest tests/ -q -x --co -q > /dev/null

ENTRYPOINT ["bash", "scripts/train_tpu.sh"]
