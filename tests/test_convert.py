"""Numerical parity of the torch->JAX converter AND the model architecture:
build a torch replica of the reference DetectionModel (1 bottleneck per
stage, real stage widths), convert its weights, and compare full-model
outputs. This pins conv padding, stride placement (v1.5 bottleneck), BN
semantics, the bilinear deconv, and the eval-time crop all at once."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tinyfaces_tpu.models.detection import TinyFacesDetector, bilinear_kernel_1d  # noqa: E402
from tools.convert_torch_checkpoint import convert_state_dict  # noqa: E402


class TorchBottleneck(nn.Module):
    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchTinyFaces(nn.Module):
    """Reference DetectionModel geometry with configurable stage depths."""

    def __init__(self, nt=25, stages=(1, 1, 1)):
        super().__init__()
        out = 5 * nt
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        def stage(cin, width, n, stride):
            blocks = [TorchBottleneck(cin, width, stride=stride)]
            blocks += [TorchBottleneck(width * 4, width) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = stage(64, 64, stages[0], 1)
        self.layer2 = stage(256, 128, stages[1], 2)
        self.layer3 = stage(512, 256, stages[2], 2)
        self.score_res3 = nn.Conv2d(512, out, 1)
        self.score_res4 = nn.Conv2d(1024, out, 1)
        self.score4_upsample = nn.ConvTranspose2d(out, out, 4, stride=2, padding=1,
                                                  bias=False)
        vec = bilinear_kernel_1d(4)
        w = np.zeros((out, out, 4, 4), np.float32)
        for i in range(out):
            w[i, i] = np.outer(vec, vec)
        with torch.no_grad():
            self.score4_upsample.weight.copy_(torch.from_numpy(w))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        res3 = self.layer2(x)
        res4 = self.layer3(res3)
        s3 = self.score_res3(res3)
        s4 = self.score4_upsample(self.score_res4(res4))
        s4 = s4[:, :, : s3.size(2), : s3.size(3)]
        return s3 + s4


@pytest.mark.slow
def test_full_model_parity_torch_vs_jax():
    torch.manual_seed(0)
    tmodel = TorchTinyFaces()
    tmodel.eval()
    # randomize BN stats so running-average semantics are exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {("model." + k if not k.startswith("score") else k): v.numpy()
          for k, v in tmodel.state_dict().items()}
    converted = convert_state_dict(sd)

    jmodel = TinyFacesDetector(stage_sizes=(1, 1, 1))
    # converted trees replace the initialized ones wholesale
    variables = {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]}

    rng = np.random.default_rng(0)
    for h, w in ((128, 128), (250, 330)):  # even and odd res3/res4 rounding
        x = rng.normal(0, 1, (1, h, w, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(jmodel.apply(variables, jnp.asarray(x), train=False))
        got_nchw = got.transpose(0, 3, 1, 2)
        assert got_nchw.shape == want.shape, (got_nchw.shape, want.shape)
        np.testing.assert_allclose(got_nchw, want, atol=2e-4)


@pytest.mark.slow
def test_full_depth_resnet101_conversion_parity():
    """Full (3, 4, 23) stage depths — insurance that converted real
    reference/torchvision ResNet-101 checkpoints drop in exactly."""
    torch.manual_seed(1)
    tmodel = TorchTinyFaces(stages=(3, 4, 23))
    tmodel.eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    sd = {("model." + k if not k.startswith("score") else k): v.numpy()
          for k, v in tmodel.state_dict().items()}
    converted = convert_state_dict(sd)
    variables = {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]}

    jmodel = TinyFacesDetector()  # default RESNET101_STAGES
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 128, 160, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jmodel.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=5e-4)


def test_resnet50_conversion_parity():
    """The --arch resnet50 backbone ((3, 4, 6) stages, reference
    model.py:13's base_model knob): converted torch checkpoints drop in."""
    torch.manual_seed(2)
    tmodel = TorchTinyFaces(stages=(3, 4, 6))
    tmodel.eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    sd = {("model." + k if not k.startswith("score") else k): v.numpy()
          for k, v in tmodel.state_dict().items()}
    converted = convert_state_dict(sd)
    variables = {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]}

    from tinyfaces_tpu.models.resnet import ARCH_STAGES

    jmodel = TinyFacesDetector(stage_sizes=ARCH_STAGES["resnet50"])
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 128, 160, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jmodel.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=5e-4)
