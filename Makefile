# Build/test entry points (reference: zerokit Makefile + Makefile.toml tasks).

PY ?= python

.PHONY: all native test test-fast bench warmup dryrun lint clean

all: native

# Native host runtime + C-ABI frontend (native/librln_native.so, librln_ffi.so)
native:
	$(PY) -m zerokit_tpu.runtime.build

# Hermetic CPU test suite (virtual 8-device mesh); the dryrun gate has its
# own target below (it burns subprocess budgets by design)
test:
	$(PY) -m pytest tests/ -x -q -m "not dryrun"

# Skip the pairing/prover-heavy tests
test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow and not dryrun"

# Precompile the TPU pipeline into the persistent XLA cache
warmup:
	$(PY) tools/warmup_tpu.py

# The driver's multi-chip gate, under the wall-clock budget it must meet.
# Validates the dry-run tier ladder (depth10 -> toy -> pico) completes on an
# 8-device virtual CPU mesh within the budget on ANY host (incl. 2-core CI).
dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	  timeout 540 $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# Headline proofs/s benchmark (one JSON line)
bench:
	$(PY) bench.py

lint:
	$(PY) -m compileall -q zerokit_tpu tests

clean:
	rm -f native/librln_native.so native/librln_ffi.so
	find . -name __pycache__ -type d -exec rm -rf {} +
