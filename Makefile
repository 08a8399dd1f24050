# fastgen-tpu developer targets (ref ``Makefile:23-24``)

.PHONY: pytest pytest-all bench dryrun lint

# quick tier: skips @pytest.mark.slow (>60s) tests — measured ~41 min
# single-core on this box (509 tests, 2026-08-21); the converter-replica /
# encoder-parity heavies live in the slow tier
pytest:
	python -m pytest tests/ -q -m "not slow"

# the full suite (~75 min single-core)
pytest-all:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-wan:
	FASTGEN_BENCH=wan python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
		"import jax; jax.config.update('jax_platforms','cpu'); \
		import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
