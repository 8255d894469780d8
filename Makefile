# Build/test entry points (reference: zerokit Makefile + Makefile.toml tasks).

PY ?= python

.PHONY: all native test test-fast bench warmup lint clean

all: native

# Native host runtime + C-ABI frontend (native/librln_native.so, librln_ffi.so)
native:
	$(PY) -m zerokit_tpu.runtime.build

# Hermetic CPU test suite (virtual 8-device mesh)
test:
	$(PY) -m pytest tests/ -x -q

# Skip the pairing/prover-heavy tests
test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

# Precompile the TPU pipeline into the persistent XLA cache
warmup:
	$(PY) tools/warmup_tpu.py

# Headline proofs/s benchmark (one JSON line)
bench:
	$(PY) bench.py

lint:
	$(PY) -m compileall -q zerokit_tpu tests

clean:
	rm -f native/librln_native.so native/librln_ffi.so
	find . -name __pycache__ -type d -exec rm -rf {} +
