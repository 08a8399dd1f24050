# fastgen-tpu developer targets (ref ``Makefile:23-24``)

.PHONY: pytest pytest-all bench dryrun lint

# Parallelize across cores when the box has them (pytest-xdist, one worker
# per core, file-granularity scheduling so per-file fixtures stay shared).
# On a single-core box xdist only adds IPC overhead, so it is skipped.
NPROC := $(shell nproc)
ifeq ($(shell test $(NPROC) -gt 1 && echo y),y)
PYTEST_PAR := -n auto --dist loadfile
else
PYTEST_PAR :=
endif

# quick tier: skips @pytest.mark.slow (>60s) tests. Measured 2026-08-21:
# 520 tests, ~42 min on THIS box (1 core — the suite is jit-trace-bound and
# the persistent XLA-executable cache only removes the compile step, not
# tracing/lowering); the r4 "<=15 min" bar assumed a multi-core box, where
# `-n auto` divides the wall clock by ~the core count (~6 min at 8 cores).
# The converter-replica / encoder-parity heavies live in the slow tier.
pytest:
	python -m pytest tests/ -q -m "not slow" $(PYTEST_PAR)

# the full suite (~75 min single-core)
pytest-all:
	python -m pytest tests/ -q $(PYTEST_PAR)

bench:
	python bench.py

bench-wan:
	FASTGEN_BENCH=wan python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
		"import jax; jax.config.update('jax_platforms','cpu'); \
		import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
