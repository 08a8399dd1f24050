"""Parity tests for the flax InceptionV3 FID detector
(``fastgen_tpu/networks/inception.py``) against a torch replica of the
pytorch-fid network built here in-test (torchvision is not installed; the
replica follows the published FID-network spec: torchvision InceptionV3 with
``count_include_pad=False`` avg-pool branches, max-pool in Mixed_7c, 1008-way
fc — ref ``fastgen/networks/inception.py:23`` wraps NVIDIA's pickle of the
same network)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from fastgen_tpu.networks.inception import (
    InceptionV3, convert_inception, preprocess_uint8)

# >60s on the single-core dev box (torch-replica / large-module builds): excluded
# from the quick tier (`make pytest`); run via `make pytest-all`.
pytestmark = pytest.mark.slow



class TBasic(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _fid_avg(x):
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class TA(nn.Module):
    def __init__(self, cin, pf):
        super().__init__()
        self.branch1x1 = TBasic(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasic(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasic(cin, pf, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b1, b5, b3, self.branch_pool(_fid_avg(x))], 1)


class TB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasic(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


class TC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasic(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasic(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasic(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasic(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([b1, b7, bd, self.branch_pool(_fid_avg(x))], 1)


class TD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasic(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasic(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasic(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


class TE(nn.Module):
    def __init__(self, cin, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasic(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasic(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasic(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasic(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pooled = _fid_avg(x) if self.pool_mode == "avg" \
            else F.max_pool2d(x, 3, 1, 1)
        return torch.cat([b1, b3, bd, self.branch_pool(pooled)], 1)


class TorchFIDInception(nn.Module):
    """pytorch-fid network replica (eval-mode BN, 1008-way fc)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, kernel_size=3)
        self.Mixed_5b = TA(192, 32)
        self.Mixed_5c = TA(256, 64)
        self.Mixed_5d = TA(288, 64)
        self.Mixed_6a = TB(288)
        self.Mixed_6b = TC(768, 128)
        self.Mixed_6c = TC(768, 160)
        self.Mixed_6d = TC(768, 160)
        self.Mixed_6e = TC(768, 192)
        self.Mixed_7a = TD(768)
        self.Mixed_7b = TE(1280, "avg")
        self.Mixed_7c = TE(2048, "max")
        self.fc = nn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        feats = x.mean(dim=(2, 3))
        return feats, self.fc(feats)


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = TorchFIDInception().eval()
    # randomize BN running stats so parity actually tests them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    return net


def test_convert_matches_flax_init_structure(torch_net):
    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    variables = convert_inception(sd)
    init = InceptionV3().init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 299, 299, 3)))
    flat_c = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_i = dict(jax.tree_util.tree_flatten_with_path(init)[0])
    assert set(map(str, flat_c)) == set(map(str, flat_i))
    for k, v in flat_i.items():
        assert flat_c[k].shape == v.shape, k


def test_forward_parity_vs_torch(torch_net):
    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    variables = convert_inception(sd)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 299, 299, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        tfeat, tlog = torch_net(torch.as_tensor(x).permute(0, 3, 1, 2))
    jfeat, jlog = InceptionV3().apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jfeat), tfeat.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jlog), tlog.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_preprocess_matches_interpolate():
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 32, 32, 3), np.uint8)
    out = preprocess_uint8(jnp.asarray(imgs))
    ref = F.interpolate(torch.as_tensor(imgs).permute(0, 3, 1, 2).float() / 255.0,
                        size=(299, 299), mode="bilinear", align_corners=False)
    ref = (ref * 2 - 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_flax_detector_end_to_end(torch_net, tmp_path):
    """FID detector loads a .pth state dict and produces stable 2048-d
    features; stats pipeline runs on top of it."""
    from scripts.fid.fid import FlaxInceptionDetector, calculate_inception_stats

    path = tmp_path / "inception.pth"
    torch.save(torch_net.state_dict(), str(path))
    det = FlaxInceptionDetector(str(path), batch_size=2)
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (4, 32, 32, 3), np.uint8)
    feats = det(imgs)
    assert feats.shape == (4, 2048)
    mu, sigma = calculate_inception_stats(iter([imgs]), det)
    assert mu.shape == (2048,) and sigma.shape == (2048, 2048)
    assert np.isfinite(mu).all() and np.isfinite(sigma).all()


def test_random_seed_detector_deterministic():
    """`--detector_path=random:<seed>`: the zero-egress random-feature FID
    proxy must be deterministic per seed and seed-sensitive."""
    from scripts.fid.fid import FlaxInceptionDetector

    imgs = (np.random.RandomState(0).rand(3, 32, 32, 3) * 255).astype(np.uint8)
    d0 = FlaxInceptionDetector("random:0", batch_size=2)
    f0 = d0(imgs)
    assert f0.shape == (3, 2048) and np.isfinite(f0).all()
    # bitwise deterministic at a fixed batch size; different batch sizes
    # compile different XLA fusions -> only numerically equal
    np.testing.assert_array_equal(f0, FlaxInceptionDetector("random:0",
                                                            batch_size=2)(imgs))
    np.testing.assert_allclose(
        f0, FlaxInceptionDetector("random:0", batch_size=3)(imgs),
        atol=1e-4, rtol=1e-3)
    assert np.abs(f0 - FlaxInceptionDetector("random:1")(imgs)).max() > 1e-3


def test_random_detector_separates_distributions():
    """BN-calibrated FID-RandNet must give structured-vs-noise image sets a
    far larger FID than two halves of the same set (regression: uncalibrated
    random deep CNNs collapse to near-constant features and FID ~0)."""
    from scripts.fid.fid import (FlaxInceptionDetector,
                                 calculate_fid_from_inception_stats,
                                 calculate_inception_stats)

    det = FlaxInceptionDetector("random:0", batch_size=16)
    rs = np.random.RandomState(0)
    imgs = np.zeros((48, 32, 32, 3), np.uint8)
    for i in range(48):
        x0, y0 = rs.randint(0, 24, 2)
        imgs[i, y0:y0 + 8, x0:x0 + 8] = rs.randint(100, 255, 3, dtype=np.uint8)
    noise = rs.randint(0, 256, (48, 32, 32, 3), dtype=np.uint8)
    assert det(imgs).std() > 1e-3  # calibrated features have healthy scale
    mu1, s1 = calculate_inception_stats(iter([imgs[:24]]), det)
    mu2, s2 = calculate_inception_stats(iter([imgs[24:]]), det)
    mu3, s3 = calculate_inception_stats(iter([noise]), det)
    same = calculate_fid_from_inception_stats(mu1, s1, mu2, s2)
    diff = calculate_fid_from_inception_stats(mu1, s1, mu3, s3)
    assert diff > 10 * max(same, 1e-6)
