"""Training entry point (ref ``train.py``).

Usage (same surface as the reference)::

    python train.py --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_test.py \
        - trainer.max_iter=100 model.student_update_freq=4
"""

from __future__ import annotations

import argparse
import faulthandler
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# `kill -USR1 <pid>` dumps every thread's Python stack to stderr without
# stopping the run — the first diagnostic for a stalled training loop
# (device hang vs data-loader hang vs logging hang look identical from
# the iteration log).
faulthandler.register(signal.SIGUSR1, all_threads=True)


def parse_args():
    """``--config=<py>`` followed by ``- key=value`` overrides
    (ref ``utils/scripts.py:17-34``)."""
    argv = sys.argv[1:]
    overrides = []
    if "-" in argv:
        idx = argv.index("-")
        overrides = argv[idx + 1:]
        argv = argv[:idx]
    parser = argparse.ArgumentParser(description="fastgen-tpu training")
    parser.add_argument("--config", required=True, help="python config file")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend (useful under the axon tunnel)")
    args = parser.parse_args(argv)
    return args, overrides


def maybe_init_multihost():
    """Join the multi-host JAX cluster when launched across hosts — the
    torchrun/NCCL-process-group equivalent (ref ``utils/distributed/ddp.py:
    18-41``). ``jax.distributed.initialize`` reads the coordinator address /
    process id / process count from the environment (or cloud-TPU metadata);
    single-process runs skip it entirely."""
    import jax

    if os.environ.get("FASTGEN_MULTIHOST") or \
            os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def setup(args, overrides):
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    maybe_init_multihost()
    import jax

    from fastgen_tpu.configs.config_utils import (
        import_config_from_python_file,
        override_config_with_opts,
        save_config_yaml,
    )

    config = import_config_from_python_file(args.config)
    override_config_with_opts(config, overrides)
    if jax.process_index() == 0:
        save_config_yaml(config,
                         os.path.join(config.log_config.save_path, "config.yaml"))
    return config


def main():
    args, overrides = parse_args()
    config = setup(args, overrides)

    from fastgen_tpu.trainer import Trainer
    from fastgen_tpu.utils import instantiate

    model = instantiate(config.model_class, config=config.model)
    trainer = Trainer(config)
    trainer.run(model)


if __name__ == "__main__":
    main()
