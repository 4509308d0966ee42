# Build/dev targets (reference Makefile:6-70 analog).

PY ?= python

.PHONY: test test-fast smoke bench microbench serve offline native clean format

test:
	$(PY) -m pytest tests/ -q

# The hardware gate (VERDICT r2 #2): every kernel x dtype must (a) lower
# through the real Mosaic pipeline and (b) match its oracle on the chip.
# Run before EVERY snapshot — interpret-mode CPU tests cannot see Mosaic
# tiling/layout constraints.
smoke:
	$(PY) tools/tpu_lower_check.py
	$(PY) tools/tpu_smoke.py

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not hf and not ppl"

bench:
	$(PY) bench.py

microbench:
	$(PY) benchmarks/benchmark.py benchmarks/setups/default.conf

serve:
	$(PY) -m vllm_triton_backend_tpu.entrypoints.openai_server

offline:
	$(PY) -m vllm_triton_backend_tpu.entrypoints.offline_inference

native:
	mkdir -p csrc/build
	g++ -O2 -std=c++17 -shared -fPIC csrc/page_pool.cc -o csrc/build/libpagepool.so

clean:
	rm -rf csrc/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +

format:
	$(PY) -m black vllm_triton_backend_tpu tests benchmarks 2>/dev/null || true
