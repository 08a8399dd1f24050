# fastgen-tpu developer targets (ref ``Makefile:23-24``)

.PHONY: pytest bench dryrun lint

pytest:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-wan:
	FASTGEN_BENCH=wan python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
		"import jax; jax.config.update('jax_platforms','cpu'); \
		import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
