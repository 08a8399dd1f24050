"""KD trajectory generator (scripts/generate_kd_paths.py): the produced
path layout must satisfy KDModel's data contract
(``methods/knowledge_distillation/kd.py``): S non-terminal rows aligned with
``get_t_list`` so the ``sample_from_t_list`` gather indexes the matching
noise level, ``path[:, 0]`` is the scaled initial noise, and a KD train step
consumes the batch end-to-end."""

import io
import os
import sys
import tarfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.generate_kd_paths import make_rollout  # noqa: E402


RES = 16


def _tiny_edm():
    import copy

    from fastgen_tpu.configs.net import EDM_Test_Config
    from fastgen_tpu.utils import instantiate

    net = instantiate(copy.deepcopy(EDM_Test_Config))
    x = jnp.zeros((2, RES, RES, 3))
    t = jnp.full((2,), 1.0)
    cond = jax.nn.one_hot(jnp.arange(2), 10)
    params = net.init(jax.random.PRNGKey(0), x, t, condition=cond)
    return net, params, cond


class TestKDRollout:
    def test_path_contract(self):
        net, params, cond = _tiny_edm()
        ns = net.noise_scheduler
        S = 4
        t_list = np.asarray(ns.get_t_list(S), np.float32)
        rollout = make_rollout(net, params, t_list)
        noise = ns.latents(jax.random.normal(jax.random.PRNGKey(1),
                                             (2, RES, RES, 3)))
        x0, path = rollout(noise, cond, None)

        assert path.shape == (2, S, RES, RES, 3)  # non-terminal rows only
        np.testing.assert_allclose(np.asarray(path[:, 0]), np.asarray(noise),
                                   rtol=1e-6)
        assert np.isfinite(np.asarray(x0)).all()
        # nesting: a 2-step student gathers rows {0, 2}; those rows sit at
        # exactly the 2-step t_list noise levels (linear grids nest)
        t2 = np.asarray(ns.get_t_list(2), np.float32)
        np.testing.assert_allclose(t_list[[0, 2]], t2[:2], rtol=1e-6)

    def test_kd_step_consumes_generated_batch(self, tmp_path):
        net, params, cond = _tiny_edm()
        ns = net.noise_scheduler
        t_list = np.asarray(ns.get_t_list(4), np.float32)
        rollout = make_rollout(net, params, t_list)
        noise = ns.latents(jax.random.normal(jax.random.PRNGKey(2),
                                             (2, RES, RES, 3)))
        x0, path = rollout(noise, cond, None)

        # write one WDS shard in the generator's layout and load it back
        # through the Path loader key_map
        shard = tmp_path / "00000.tar"
        with tarfile.open(shard, "w") as tar:
            for j in range(2):
                for suffix, arr in (("latent.npy", x0[j]),
                                    ("path.npy", path[j]),
                                    ("txt_emb.npy", cond[j])):
                    buf = io.BytesIO()
                    np.save(buf, np.asarray(arr))
                    data = buf.getvalue()
                    info = tarfile.TarInfo(f"{j:08d}.{suffix}")
                    info.size = len(data)
                    tar.addfile(info, io.BytesIO(data))

        from fastgen_tpu.data.wds import WDSLoader

        loader = WDSLoader(datatags=[f"WDS:{tmp_path}"], batch_size=2,
                           key_map={"real": "latent.npy", "path": "path.npy",
                                    "condition": "txt_emb.npy"})
        batch = next(iter(loader))
        assert batch["path"].shape == (2, 4, RES, RES, 3)

        import copy

        from fastgen_tpu.configs.experiments.EDM.config_sft_edm_cifar10 import (
            create_config)
        from fastgen_tpu.configs.net import EDM_Test_Config
        from fastgen_tpu.methods.knowledge_distillation.kd import KDModel

        config = create_config()
        config.model.net = copy.deepcopy(EDM_Test_Config)
        config.model.input_shape = [RES, RES, 3]
        config.model.student_sample_steps = 2
        config.model.sample_t_cfg.t_list = None
        model = KDModel(config=config.model)
        model.init_optimizers()
        state = model.init_state(jax.random.PRNGKey(3))
        step = jax.jit(model.make_train_step(model.phases[0]), donate_argnums=0)
        state, loss_map, _ = step(state,
                                  {k: jnp.asarray(v) for k, v in batch.items()},
                                  jax.random.PRNGKey(4))
        assert np.isfinite(float(loss_map["total_loss"]))
