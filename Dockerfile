# Reproducible environment for the TPU engine (reference Dockerfile analog;
# the reference builds CUDA/Triton from source — here the toolchain is
# jaxlib+libtpu wheels, so the image is thin).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make git && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY . /workspace

# TPU runtime: jax[tpu] pulls libtpu; CPU fallback works for tests.
RUN pip install --no-cache-dir -U pip \
    && pip install --no-cache-dir "jax[tpu]" \
         -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
       || pip install --no-cache-dir jax \
    && pip install --no-cache-dir \
         numpy aiohttp tokenizers safetensors transformers pytest ml_dtypes \
    && pip install --no-cache-dir -e . \
    && make native

# fake 8-device mesh for hardware-less CI (tests/conftest.py contract)
ENV VTB_TEST_PLATFORM=cpu

CMD ["python", "-m", "pytest", "tests/", "-q"]
