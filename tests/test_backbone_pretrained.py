"""Test ImageNet backbone porting into the 2D encoders (raft_core.py:20-23
parity: mmdet init_cfg Pretrained)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from camliflow_tpu.nn.resnet import ResNetEncoder2D
from camliflow_tpu.runtime.checkpoint import (
    _resnet_torch_name,
    load_backbone_pretrained,
    tree_to_flat,
)


def test_resnet_name_mapping():
    cases = [
        ("conv1/kernel", "conv1.weight"),
        ("bn1/scale", "bn1.weight"),
        ("bn1/mean", "bn1.running_mean"),
        ("layer1_0/conv3/kernel", "layer1.0.conv3.weight"),
        ("layer2_3/bn2/var", "layer2.3.bn2.running_var"),
        ("layer2_0/downsample_conv/kernel", "layer2.0.downsample.0.weight"),
        ("layer2_0/downsample_bn/bias", "layer2.0.downsample.1.bias"),
    ]
    for ours, theirs in cases:
        assert _resnet_torch_name(ours) == theirs


def test_load_backbone_pretrained_roundtrip(rng, tmp_path):
    """Fabricate a torchvision-style state_dict covering the 2-stage cut and
    check every backbone tensor is filled."""
    enc = ResNetEncoder2D(depth=50)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = jax.tree.map(np.asarray, enc.init(jax.random.PRNGKey(0), x))
    # wrap under core/fnet_2d to mimic the model tree
    wrapped = {
        "params": {"core": {"fnet_2d": variables["params"]}},
        "batch_stats": {"core": {"fnet_2d": variables["batch_stats"]}},
    }

    flat = tree_to_flat(wrapped)
    state_dict = {}
    fills = {}
    for path, value in flat.items():
        _, rest = path.split("/", 1)
        suffix = rest[len("core/fnet_2d/"):]
        if suffix.startswith("align/"):
            continue
        name = _resnet_torch_name(suffix)
        assert name is not None, path
        fill = np.full(value.shape, (len(state_dict) % 13) + 1, np.float32)
        state_dict[name] = (
            torch.from_numpy(fill.transpose(3, 2, 0, 1).copy())
            if fill.ndim == 4
            else torch.from_numpy(fill)
        )
        fills[path] = fill

    ckpt = tmp_path / "resnet50.pth"
    torch.save(state_dict, ckpt)

    out, n_loaded = load_backbone_pretrained(wrapped, ckpt)
    assert n_loaded == len(fills)
    out_flat = tree_to_flat(out)
    for path, want in fills.items():
        np.testing.assert_array_equal(out_flat[path], want)
