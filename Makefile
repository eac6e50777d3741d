# khmer-tpu developer entry points (reference: Makefile targets
# sharedobj/test/clean/doc — here the native pieces build themselves
# on first import, so most targets are thin wrappers).

PYTHON ?= python
CPUENV = KHMER_TPU_PLATFORM=cpu

all: native

help:
	@grep -E '^[a-z][a-z-]*:' Makefile | sed 's/:.*//'

# build the native host runtime (FASTX loader + aligner core) now
# instead of on first import
native:
	$(CPUENV) $(PYTHON) -c "from khmer_tpu.native import native_available; assert native_available()"

# full suite on the CPU backend with a virtual 8-device mesh
test:
	$(CPUENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    $(PYTHON) -m pytest tests/ -q -n 8

# quick smoke: the verify recipe's CLI drive + multichip dryrun
smoke:
	$(CPUENV) $(PYTHON) -m pytest tests/test_hashtable.py tests/test_native.py -q
	$(CPUENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    $(PYTHON) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# headline benchmark (runs on whatever backend is configured; the
# committed record is BENCH_LKG.json, TPU-only)
bench:
	$(PYTHON) bench.py

bench-kernels:
	$(PYTHON) benchmarks/bench_kernels.py

bench-scaling:
	$(CPUENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    $(PYTHON) benchmarks/bench_scaling.py

# the stamps end-to-end walkthrough (examples/stamps/out/)
examples:
	$(CPUENV) bash examples/stamps/do.sh

# stamps walkthrough, all stages in ONE python process (one backend
# init + shared warm jit caches; scripts/khmer-run-pipeline.py)
examples-fast:
	$(CPUENV) KHMER_ONE_PROCESS=1 bash examples/stamps/do.sh

# pre-seed the persistent XLA compile cache with the bucketed consume
# and query shapes the CLI scripts dispatch (first compiles cost
# 30-500 s over a tunneled TPU; cached ones milliseconds).  Run once
# per backend; the cache lives in /tmp/khmer_tpu_jax_cache.
warm-cache:
	$(PYTHON) benchmarks/warm_cache.py

clean:
	rm -rf examples/stamps/out khmer_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +

.PHONY: all help native test smoke bench bench-kernels bench-scaling \
    examples examples-fast warm-cache clean
