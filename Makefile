# fastgen-tpu developer targets (ref ``Makefile:23-24``)

.PHONY: pytest pytest-all bench dryrun lint

# quick tier: skips @pytest.mark.slow (>60s) tests — ~10 min on this box
pytest:
	python -m pytest tests/ -q -m "not slow"

# the full suite (~45 min single-core)
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
