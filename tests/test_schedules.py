"""Noise-schedule math-contract tests.

Checks the same invariants the reference's schedule tests rely on
(``noise_schedule.py`` forward process, pred-type algebra round-trips,
t-sampler supports) with analytically-computed expectations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.ops.schedules import (
    EDMNoiseSchedule,
    RFNoiseSchedule,
    TrigNoiseSchedule,
    SDNoiseSchedule,
    CogVideoXNoiseSchedule,
    get_noise_schedule,
    list_noise_schedules,
)

KEY = jax.random.PRNGKey(0)
ALL = ["edm", "rf", "trig", "sd", "sdxl", "cogvideox"]


def _batch(shape=(4, 8, 8, 3)):
    k1, k2 = jax.random.split(KEY)
    return jax.random.normal(k1, shape), jax.random.normal(k2, shape)


@pytest.mark.parametrize("name", ALL)
def test_forward_process_matches_alpha_sigma(name):
    ns = get_noise_schedule(name)
    x, eps = _batch()
    t = ns.sample_t(KEY, x.shape[0])
    xt = ns.forward_process(x, eps, t)
    a = np.asarray(ns.alpha(t))[:, None, None, None]
    s = np.asarray(ns.sigma(t))[:, None, None, None]
    np.testing.assert_allclose(np.asarray(xt), a * np.asarray(x) + s * np.asarray(eps),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ALL)
def test_eps_x0_roundtrip(name):
    ns = get_noise_schedule(name)
    x, eps = _batch()
    t = ns.sample_t(KEY, x.shape[0])
    xt = ns.forward_process(x, eps, t)
    np.testing.assert_allclose(np.asarray(ns.eps_to_x0(xt, eps, t)), np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ns.x0_to_eps(xt, x, t)), np.asarray(eps),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["edm", "rf", "trig"])
def test_flow_roundtrip_and_velocity(name):
    ns = get_noise_schedule(name)
    x, eps = _batch()
    t = ns.sample_t(KEY, x.shape[0])
    xt = ns.forward_process(x, eps, t)
    flow = ns.x0_to_flow(xt, x, t)
    np.testing.assert_allclose(np.asarray(ns.flow_to_x0(xt, flow, t)), np.asarray(x),
                               rtol=1e-3, atol=1e-3)
    # flow prediction == conditional velocity alpha' x0 + sigma' eps
    vel = ns.cond_velocity(x, eps, t)
    np.testing.assert_allclose(np.asarray(flow), np.asarray(vel), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name", ["sd", "sdxl", "cogvideox", "trig"])
def test_v_pred_roundtrip(name):
    ns = get_noise_schedule(name)
    x, eps = _batch()
    t = ns.sample_t(KEY, x.shape[0])
    xt = ns.forward_process(x, eps, t)
    v = ns.x0_to_v(xt, x, t)
    np.testing.assert_allclose(np.asarray(ns.v_to_x0(xt, v, t)), np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    # for alpha^2+sigma^2=1 schedules, v target == alpha eps - sigma x0
    a = np.asarray(ns.alpha(t))[:, None, None, None]
    s = np.asarray(ns.sigma(t))[:, None, None, None]
    np.testing.assert_allclose(np.asarray(v), a * np.asarray(eps) - s * np.asarray(x),
                               rtol=1e-3, atol=1e-3)


def test_edm_alpha_sigma_identity():
    ns = EDMNoiseSchedule()
    t = jnp.array([0.002, 1.0, 80.0])
    np.testing.assert_allclose(np.asarray(ns.alpha(t)), 1.0)
    np.testing.assert_allclose(np.asarray(ns.sigma(t)), np.asarray(t))
    assert ns.max_sigma == 80.0


def test_edm_sigmas_karras_spacing():
    ns = EDMNoiseSchedule(min_t=0.002, max_t=80.0, rho=7.0, num_steps=1000)
    s = ns.sigmas
    assert s.shape == (1000,)
    assert s[0] == pytest.approx(0.002) and s[-1] == pytest.approx(80.0)
    assert np.all(np.diff(s) > 0)
    # rho-spacing: sigma^(1/rho) is linear in index
    lin = s ** (1 / 7.0)
    np.testing.assert_allclose(np.diff(lin), np.diff(lin)[0], rtol=1e-6)


def test_edm_get_t_list_ends_at_zero():
    ns = EDMNoiseSchedule()
    tl = ns.get_t_list(4)
    assert tl.shape == (5,)
    assert tl[-1] == 0.0
    assert np.all(np.diff(tl) < 0)
    assert tl[0] <= 80.0


def test_rf_trig_basics():
    rf = RFNoiseSchedule()
    t = jnp.array([0.25, 0.5])
    np.testing.assert_allclose(np.asarray(rf.alpha(t)), 1 - np.asarray(t))
    tr = TrigNoiseSchedule()
    np.testing.assert_allclose(np.asarray(tr.alpha(t)), np.cos(np.asarray(t)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tr.sigma(t)), np.sin(np.asarray(t)), rtol=1e-6)


def test_sd_alphas_cumprod_table():
    ns = SDNoiseSchedule()
    # known endpoints of the scaled_linear 0.00085->0.012 schedule
    assert ns._alphas_cumprod[0] == pytest.approx(1 - 0.00085, rel=1e-6)
    assert 0.0046 < ns._alphas_cumprod[-1] < 0.0048
    # alpha^2 + sigma^2 == 1
    t = ns.sample_t(KEY, 16)
    total = np.asarray(ns.alpha(t)) ** 2 + np.asarray(ns.sigma(t)) ** 2
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)


def test_cogvideox_zero_snr_rescale():
    ns = CogVideoXNoiseSchedule()
    assert ns._alphas_cumprod[-1] < 1e-6  # terminal SNR ~ 0


@pytest.mark.parametrize("dist,kwargs", [
    ("uniform", {}),
    ("polynomial", {}),
    ("lognormal", dict(train_p_mean=-1.2, train_p_std=1.2)),
    ("log_t", dict(train_p_mean=-1.2, train_p_std=1.2, log_t_df=2.0)),
])
def test_edm_sample_t_supports(dist, kwargs):
    ns = EDMNoiseSchedule()
    t = ns.sample_t(KEY, 512, time_dist_type=dist, **kwargs)
    t = np.asarray(t)
    assert t.shape == (512,)
    assert np.all(t >= 0.002) and np.all(t <= 80.0)
    assert np.isfinite(t).all()


def test_edm_lognormal_matches_moments():
    ns = EDMNoiseSchedule()
    t = np.asarray(ns.sample_t(jax.random.PRNGKey(7), 200_000,
                               time_dist_type="lognormal",
                               train_p_mean=-1.2, train_p_std=1.2))
    # truncation range [0.002, 80] barely clips the N(-1.2, 1.2) log-density,
    # so log t moments should be close to the untruncated ones
    assert abs(np.log(t).mean() - (-1.2)) < 0.02
    assert abs(np.log(t).std() - 1.2) < 0.02


def test_rf_shifted_sampler():
    ns = RFNoiseSchedule()
    t_u = np.asarray(ns.sample_t(KEY, 50_000, time_dist_type="uniform"))
    t_s = np.asarray(ns.sample_t(KEY, 50_000, time_dist_type="shifted", shift=5.0))
    # shift=5 pushes mass toward t=1
    assert t_s.mean() > t_u.mean() + 0.2


def test_sample_from_t_list():
    ns = EDMNoiseSchedule()
    t, ids = ns.sample_from_t_list(KEY, 256, sample_steps=4, return_ids=True)
    tl = ns.get_t_list(4)
    assert set(np.asarray(ids).tolist()) <= {0, 1, 2, 3}  # never the terminal 0
    np.testing.assert_allclose(np.asarray(t), tl[np.asarray(ids)])
    nxt = ns.next_in_t_list(ids, 4)
    np.testing.assert_allclose(np.asarray(nxt), tl[np.asarray(ids) + 1])


def test_sample_t_inhom_chunk_structure():
    ns = EDMNoiseSchedule()
    t, ids = ns.sample_t_inhom(KEY, 3, seq_len=11, chunk_size=4, sample_steps=4)
    assert t.shape == (3, 11)
    ids = np.asarray(ids)
    # first chunk absorbs the remainder: 4 + 3 = 7 equal entries, then 4 equal
    for b in range(3):
        assert len(set(ids[b, :7])) == 1
        assert len(set(ids[b, 7:11])) == 1


def test_sample_t_inhom_sft_structure():
    ns = EDMNoiseSchedule()
    t = np.asarray(ns.sample_t_inhom_sft(KEY, 2, seq_len=10, chunk_size=3,
                                         time_dist_type="uniform"))
    assert t.shape == (2, 10)
    assert len(set(t[0, :4])) == 1 and len(set(t[0, 4:7])) == 1


def test_closest_sigma_idx_and_back():
    ns = EDMNoiseSchedule()
    sig = jnp.asarray(ns.sigmas[[10, 500, 990]], dtype=jnp.float32)
    idx = ns.closest_sigma_idx(sig)
    np.testing.assert_array_equal(np.asarray(idx), [10, 500, 990])
    t = ns.sigma_idx_to_t(idx)
    np.testing.assert_allclose(np.asarray(t), np.asarray(sig), rtol=1e-5)


def test_sqrt_snr_inverse():
    for name in ["edm", "rf", "trig"]:
        ns = get_noise_schedule(name)
        t = ns.sample_t(KEY, 32)
        snr = ns.sqrt_snr(t)
        t_back = ns.sqrt_snr_to_t(snr)
        np.testing.assert_allclose(np.asarray(t_back), np.asarray(t), rtol=1e-3, atol=1e-4)


def test_convert_model_output_identity_and_errors():
    ns = EDMNoiseSchedule()
    x, eps = _batch()
    t = ns.sample_t(KEY, x.shape[0])
    xt = ns.forward_process(x, eps, t)
    assert ns.convert_model_output(xt, x, t, "x0", "x0") is x
    with pytest.raises(ValueError):
        ns.convert_model_output(xt, x, t, "x0", "bogus")


def test_samplers_jittable():
    ns = EDMNoiseSchedule()

    @jax.jit
    def step(key, x, eps):
        t = ns.sample_t(key, x.shape[0], time_dist_type="lognormal")
        return ns.forward_process(x, eps, t)

    x, eps = _batch()
    out = step(KEY, x, eps)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_registry():
    names = list_noise_schedules()
    for n in ["edm", "rf", "trig", "sd", "sdxl", "cogvideox", "alphas", "rectified_flow"]:
        assert n in names
    with pytest.raises(KeyError):
        get_noise_schedule("nope")
