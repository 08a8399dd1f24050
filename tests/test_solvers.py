"""DPM-Solver++(2M) tests (``fastgen_tpu/ops/solvers.py`` — the TPU-native
equivalent of the reference's UniPC teacher sampling, ``Wan/network.py:919``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.networks.wan.network import WanVideoDiT
from fastgen_tpu.ops.solvers import dpm_solver_2m, shifted_t_grid

KEY = jax.random.PRNGKey(0)
KW = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
          out_channels=4, text_dim=32, rope_max_seq_len=64,
          net_pred_type="flow", schedule_type="rf")


@pytest.fixture(scope="module")
def wan():
    net = WanVideoDiT(**KW)
    x = jax.random.normal(KEY, (1, 3, 8, 8, 4))
    t = jnp.array([0.5])
    cond = {"text_embeds": jax.random.normal(KEY, (1, 4, 32))}
    params = net.init({"params": KEY}, x, t, condition=cond)
    return net, params, cond


def test_shifted_grid():
    g = shifted_t_grid(0.999, 4, shift=3.0)
    assert g[0] == pytest.approx(3 * 0.999 / (1 + 2 * 0.999))
    assert g[-1] == 0.0
    assert np.all(np.diff(g) < 0)


def test_dpm2m_second_order_convergence():
    """On a smooth synthetic flow ODE over the interior interval (away from
    the t->0/1 endpoint singularities), dpm2m must show ~2nd-order
    convergence and beat Euler by a widening margin as steps double.
    (A random-weight net has non-smooth x0 trajectories, so solver order is
    only observable on a smooth problem.)"""
    from fastgen_tpu.ops.schedules import get_noise_schedule

    ns = get_noise_schedule("rf")
    x_init = jax.random.normal(KEY, (2, 8, 8, 3))

    def x0_fn(x, t):
        # t arrives as a *traced* scalar inside the solver's lax.scan
        return jnp.tanh(x) * (1.0 - 0.5 * jnp.asarray(t, jnp.float32))

    def grid(steps):
        return np.linspace(0.9, 0.1, steps + 1)

    def euler(steps):
        x = x_init
        for tc, tn in zip(grid(steps)[:-1], grid(steps)[1:]):
            v = (x - x0_fn(x, tc)) / float(tc)
            x = x - (float(tc) - float(tn)) * v
        return np.asarray(x)

    ref = euler(4000)
    errs = {}
    for s in (16, 32):
        errs[("euler", s)] = np.abs(euler(s) - ref).mean()
        d = np.asarray(dpm_solver_2m(x0_fn, ns, x_init, grid(s),
                                     latents=x_init))
        errs[("dpm", s)] = np.abs(d - ref).mean()
    assert errs[("dpm", 16)] < errs[("euler", 16)]
    assert errs[("dpm", 32)] < 0.4 * errs[("euler", 32)]
    # ~2nd order: halving h cuts the error by ~4x (allow slack)
    assert errs[("dpm", 32)] < 0.35 * errs[("dpm", 16)]


def test_dpm2m_on_wan_runs(wan):
    net, params, cond = wan
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 8, 8, 4))
    out = np.asarray(net.apply(params, noise, method=net.sample,
                               condition=cond, guidance_scale=None,
                               num_steps=6, solver="dpm2m"))
    assert out.shape == noise.shape and np.isfinite(out).all()


def test_unipc_second_order_convergence():
    """UniPC (bh2, p=2, with corrector) on the same smooth flow ODE as the
    dpm2m test: ~2nd-order convergence, and the corrector should make it at
    least as accurate as corrector-free DPM2M at equal step count."""
    from fastgen_tpu.ops.schedules import get_noise_schedule
    from fastgen_tpu.ops.solvers import unipc_sample

    ns = get_noise_schedule("rf")
    x_init = jax.random.normal(KEY, (2, 8, 8, 3))

    def x0_fn(x, t):
        return jnp.tanh(x) * (1.0 - 0.5 * jnp.asarray(t, jnp.float32))

    def grid(steps):
        return np.linspace(0.9, 0.1, steps + 1)

    def euler(steps):
        x = x_init
        for tc, tn in zip(grid(steps)[:-1], grid(steps)[1:]):
            v = (x - x0_fn(x, tc)) / float(tc)
            x = x - (float(tc) - float(tn)) * v
        return np.asarray(x)

    ref = euler(4000)
    errs = {}
    for s in (16, 32):
        u = np.asarray(unipc_sample(x0_fn, ns, x_init, grid(s),
                                    latents=x_init))
        d = np.asarray(dpm_solver_2m(x0_fn, ns, x_init, grid(s),
                                     latents=x_init))
        errs[("unipc", s)] = np.abs(u - ref).mean()
        errs[("dpm", s)] = np.abs(d - ref).mean()
    # ~2nd order: halving h cuts the error by ~4x (allow slack)
    assert errs[("unipc", 32)] < 0.35 * errs[("unipc", 16)]
    # the UniC corrector buys accuracy over corrector-free 2M
    assert errs[("unipc", 32)] <= 1.05 * errs[("dpm", 32)]


def test_unipc_vs_dpm2m_teacher_gap(wan):
    """Bounds the teacher-sampling gap (round-3 verdict #9): the reference
    samples Wan teachers with UniPC (``Wan/network.py:919``); our FID/KD
    pipelines default to DPM2M. At 35 steps on the same net + grid the two
    must agree closely — and unipc is now available as ``solver="unipc"``."""
    net, params, cond = wan
    noise = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 8, 8, 4))
    out_u = np.asarray(net.apply(params, noise, method=net.sample,
                                 condition=cond, guidance_scale=None,
                                 num_steps=35, solver="unipc"))
    out_d = np.asarray(net.apply(params, noise, method=net.sample,
                                 condition=cond, guidance_scale=None,
                                 num_steps=35, solver="dpm2m"))
    assert np.isfinite(out_u).all()
    scale = np.abs(out_d).mean()
    delta = np.abs(out_u - out_d).mean() / max(scale, 1e-8)
    assert delta < 2e-2, f"unipc vs dpm2m relative gap {delta:.4f} at 35 steps"


def test_dpm2m_with_cfg_and_slg(wan):
    net, params, cond = wan
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 8, 8, 4))
    out = net.apply(params, noise, method=net.sample, condition=cond,
                    neg_condition={"text_embeds": jnp.zeros((1, 4, 32))},
                    guidance_scale=2.0, num_steps=3, solver="dpm2m",
                    skip_layers=(0,), skip_layers_start_percent=0.5)
    assert out.shape == noise.shape and np.isfinite(np.asarray(out)).all()


def test_dpm2m_exact_on_constant_x0():
    """With x0_fn ≡ c the flow ODE's solution at t=0 is exactly c."""
    from fastgen_tpu.ops.schedules import get_noise_schedule

    ns = get_noise_schedule("rf")
    c = jnp.full((1, 4, 4, 2), 0.7)
    out = dpm_solver_2m(lambda x, t: c, ns,
                        jax.random.normal(KEY, c.shape),
                        shifted_t_grid(0.999, 6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(c), rtol=1e-5)


def test_dpm2m_across_backbones():
    """Every teacher sampler exposing solver="dpm2m" runs and returns finite
    latents (DiT class-cond, SD15 text-cond, LTX2 video; CogVideoX covers the
    DDPM-table schedule)."""
    from fastgen_tpu.networks.dit.network import DiT
    from fastgen_tpu.networks.sd.unet import StableDiffusion15
    from fastgen_tpu.networks.ltx2.network import LTX2VideoDiT
    from fastgen_tpu.networks.cogvideox.network import CogVideoX

    cases = []
    dit = DiT(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
              depth=1, num_heads=4, num_classes=10, net_pred_type="flow",
              schedule_type="rf")
    cases.append((dit, jax.random.normal(KEY, (2, 8, 8, 4)),
                  jax.nn.one_hot(jnp.arange(2), 10)))
    sd = StableDiffusion15(context_dim=16, in_channels=4, img_resolution=16,
                           block_out_channels=(8, 16),
                           transformer_depths=(1, 0), fixed_num_heads=2)
    cases.append((sd, jax.random.normal(KEY, (1, 16, 16, 4)),
                  {"text_embeds": jax.random.normal(KEY, (1, 4, 16))}))
    ltx = LTX2VideoDiT(in_channels=4, out_channels=4, num_heads=4,
                       head_dim=24, num_layers=1, caption_channels=32,
                       rope_max_seq_len=64, net_pred_type="flow",
                       schedule_type="rf")
    cases.append((ltx, jax.random.normal(KEY, (1, 2, 8, 8, 4)),
                  {"text_embeds": jax.random.normal(KEY, (1, 4, 32))}))
    cog = CogVideoX(dim=64, num_layers=1, num_heads=4, in_channels=4,
                    text_dim=32)
    cases.append((cog, jax.random.normal(KEY, (1, 2, 8, 8, 4)),
                  {"text_embeds": jax.random.normal(KEY, (1, 4, 32))}))

    for net, x, cond in cases:
        t = jnp.full((x.shape[0],), 0.5 if net.schedule_type != "sd" else 500.0,
                     jnp.float32)
        params = net.init({"params": KEY}, x, t, condition=cond)
        out = net.apply(params, x, method=net.sample, condition=cond,
                        neg_condition=cond, guidance_scale=2.0, num_steps=3,
                        solver="dpm2m")
        assert out.shape == x.shape, type(net).__name__
        assert np.isfinite(np.asarray(out)).all(), type(net).__name__


def test_edm_heun_converges_faster_than_euler():
    """EDM-paper Heun (2nd order over Karras sigmas) must beat Euler at
    moderate step counts against a fine-grid Heun reference."""
    import copy

    from fastgen_tpu.configs.lazy import instantiate
    from fastgen_tpu.configs.net import EDM_Test_Config

    net = instantiate(copy.deepcopy(EDM_Test_Config))
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    t = jnp.full((2,), 1.0)
    cond = jax.nn.one_hot(jnp.arange(2), 10)
    params = net.init({"params": KEY}, x, t, condition=cond)
    noise = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))

    def run(solver, steps):
        return np.asarray(net.apply(params, noise, method=net.sample,
                                    condition=cond, guidance_scale=None,
                                    num_steps=steps, solver=solver))

    ref = run("heun", 96)
    assert np.isfinite(ref).all()
    err_euler = np.abs(run("euler", 16) - ref).mean()
    err_heun = np.abs(run("heun", 16) - ref).mean()
    assert err_heun < 0.6 * err_euler, (err_heun, err_euler)
