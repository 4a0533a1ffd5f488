"""Golden test for the self-contained JAX LPIPS (eval/lpips.py).

No pretrained weights exist in this environment, so semantics are validated
against an independently-written torch mirror of the reference's
lpipsPyTorch (reference lpipsPyTorch/modules/lpips.py:31-36,
networks.py:36-96, utils.py:6-8) built here from the SAME random weights:
identical architecture + identical math => near-identical numbers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from opengaussian_tpu.eval.lpips import (  # noqa: E402
    LPIPS,
    POOL_BEFORE,
    TAP_AFTER,
    VGG16_CHANNELS,
    convert_torch_weights,
    load_weights,
    random_weights,
)


def _torch_lpips(x, y, w):
    """Reference-mirroring torch implementation (NCHW)."""

    def feats(img):
        mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        t = (img - mean) / std
        taps = []
        for i in range(len(VGG16_CHANNELS)):
            if i in POOL_BEFORE:
                t = torch.nn.functional.max_pool2d(t, 2, 2)
            cw = torch.from_numpy(
                np.ascontiguousarray(w[f"conv{i}_w"].transpose(3, 2, 0, 1))
            )
            cb = torch.from_numpy(w[f"conv{i}_b"])
            t = torch.nn.functional.relu(
                torch.nn.functional.conv2d(t, cw, cb, padding=1)
            )
            if i in TAP_AFTER:
                norm = torch.sqrt(torch.sum(t**2, dim=1, keepdim=True))
                taps.append(t / (norm + 1e-10))
        return taps

    fx, fy = feats(x), feats(y)
    total = 0.0
    for i, (ax, ay) in enumerate(zip(fx, fy)):
        d = (ax - ay) ** 2
        lin = torch.from_numpy(w[f"lin{i}_w"]).view(1, -1, 1, 1)
        total = total + (d * lin).sum(dim=1, keepdim=True).mean((2, 3))
    return float(total)


def test_lpips_matches_torch_mirror():
    w = random_weights(seed=3)
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    ours = LPIPS(w)(a, b)
    theirs = _torch_lpips(
        torch.from_numpy(a.transpose(2, 0, 1)[None]),
        torch.from_numpy(b.transpose(2, 0, 1)[None]),
        w,
    )
    assert ours == pytest.approx(theirs, rel=2e-4, abs=1e-6)


def test_lpips_basic_properties():
    w = random_weights(seed=3)
    fn = LPIPS(w)
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert fn(a, a) == pytest.approx(0.0, abs=1e-6)
    assert fn(a, b) > 0.0
    assert fn(a, b) == pytest.approx(fn(b, a), rel=1e-5)


def test_convert_torch_weights_roundtrip(tmp_path):
    """Synthetic torchvision-layout state dicts convert into weights the JAX
    net consumes, matching module indexing (conv modules at 0,2,5,...)."""
    rng = np.random.default_rng(2)
    vgg_state, lin_state = {}, {}
    idx = 0
    cin = 3
    for i, cout in enumerate(VGG16_CHANNELS):
        if i in POOL_BEFORE:
            idx += 1
        vgg_state[f"{idx}.weight"] = rng.normal(
            0, 0.1, (cout, cin, 3, 3)
        ).astype(np.float32)
        vgg_state[f"{idx}.bias"] = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        idx += 2
        cin = cout
    for i, c in enumerate((64, 128, 256, 512, 512)):
        lin_state[f"{i}.1.weight"] = rng.uniform(0, 0.1, (1, c, 1, 1)).astype(
            np.float32
        )

    out = str(tmp_path / "lpips_vgg.npz")
    convert_torch_weights(vgg_state, lin_state, out)
    w = load_weights(out)
    assert w is not None
    assert w["conv0_w"].shape == (3, 3, 3, 64)
    assert w["conv12_w"].shape == (3, 3, 512, 512)
    assert w["lin4_w"].shape == (512,)
    # conv0 must be torchvision module 0; conv2 (after first pool) module 5
    np.testing.assert_allclose(
        w["conv0_w"], vgg_state["0.weight"].transpose(2, 3, 1, 0)
    )
    np.testing.assert_allclose(
        w["conv2_w"], vgg_state["5.weight"].transpose(2, 3, 1, 0)
    )
    a = np.zeros((16, 16, 3), np.float32)
    b = np.ones((16, 16, 3), np.float32)
    assert LPIPS(w)(a, b) > 0.0


def test_pretrained_weights_available():
    """Exercises the REAL lpips_vgg.npz wherever one exists (MIGRATION.md
    §LPIPS documents generation); skips with the reason in environments
    without the artifact, so the suite records availability explicitly."""
    from opengaussian_tpu.eval.lpips import (
        WEIGHTS_ENV,
        LPIPS,
        load_weights,
        weights_path,
    )

    p = weights_path()
    if p is None:
        pytest.skip(
            f"no lpips_vgg.npz in this environment (set ${WEIGHTS_ENV} or "
            "generate per MIGRATION.md §LPIPS)"
        )
    w = load_weights(p)
    model = LPIPS(w)
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert model(a, a) < 1e-6
    assert model(a, b) > 1e-3
