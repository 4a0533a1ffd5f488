"""Self-contained LPIPS (VGG16 feature distance) in JAX.

Port of the reference's vendored lpipsPyTorch (reference
lpipsPyTorch/modules/lpips.py:8-36, networks.py:36-96, utils.py:6-8) with the
exact same semantics:

  * z-score the input with mean (-.030, -.088, -.188), std (.458, .448, .450)
    (networks.py:41-44,52-53). NOTE the reference quirk: these constants come
    from richzhang's [-1,1] scaling layer, but the reference's metrics.py
    feeds [0,1] tensors straight in — we reproduce that behavior, callers
    pass [0,1] images;
  * VGG16 `features` trunk, activations tapped after the ReLUs of conv1_2,
    conv2_2, conv3_3, conv4_3, conv5_3 (target_layers [4, 9, 16, 23, 30],
    networks.py:90-92), i.e. before each maxpool;
  * channel-unit-normalize each tapped activation
    (x / (||x||_c + 1e-10), utils.py:6-8);
  * squared difference -> per-layer 1x1 "lin" conv to one channel -> spatial
    mean -> sum over the five layers (lpips.py:31-36).

The pretrained weights cannot be downloaded in a zero-egress environment, so
this module loads them from a local `.npz` (see `WEIGHTS_ENV` /
`DEFAULT_WEIGHTS_PATH`). `convert_torch_weights` turns the standard
torchvision `vgg16` state dict plus richzhang's `vgg.pth` lin weights into
that `.npz` once, on any machine that has them.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_ENV = "OPENGS_LPIPS_WEIGHTS"
DEFAULT_WEIGHTS_PATH = os.path.expanduser(
    "~/.cache/opengaussian_tpu/lpips_vgg.npz"
)

# torchvision vgg16.features conv layout: (out_channels, block boundaries
# marked by maxpools). 13 convs; taps after ReLU of convs 1,3,6,9,12
# (0-based) == the reference's target_layers in module indices.
VGG16_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
# maxpool BEFORE conv i (0-based): a pool precedes convs 2, 4, 7, 10
POOL_BEFORE = (2, 4, 7, 10)
TAP_AFTER = (1, 3, 6, 9, 12)  # 0-based conv indices whose ReLU is tapped
N_CHANNELS_LIST = (64, 128, 256, 512, 512)

_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_STD = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    """3x3 same conv, NHWC, weights [3,3,Cin,Cout]."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b[None, None, None, :]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg16_features(x, weights) -> list[jnp.ndarray]:
    """x [B,H,W,3] z-scored input -> the five tapped activations."""
    taps = []
    for i in range(len(VGG16_CHANNELS)):
        if i in POOL_BEFORE:
            x = _maxpool(x)
        x = jax.nn.relu(_conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"]))
        if i in TAP_AFTER:
            taps.append(x)
    return taps


def _normalize_activation(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_pair(x, y, weights) -> jnp.ndarray:
    """LPIPS between two [B,H,W,3] images (same range the caller would feed
    the reference: [0,1])."""
    xs = (x - _MEAN) / _STD
    ys = (y - _MEAN) / _STD
    fx = vgg16_features(xs, weights)
    fy = vgg16_features(ys, weights)
    total = 0.0
    for i, (ax, ay) in enumerate(zip(fx, fy)):
        d = (_normalize_activation(ax) - _normalize_activation(ay)) ** 2
        lin = weights[f"lin{i}_w"]  # [C]
        total = total + jnp.mean(
            jnp.sum(d * lin[None, None, None, :], axis=-1), axis=(1, 2)
        )
    return total  # [B]


class LPIPS:
    """Callable wrapper with lazily-jitted evaluation."""

    def __init__(self, weights: dict[str, np.ndarray]):
        self.weights = {k: jnp.asarray(v) for k, v in weights.items()}
        self._fn = jax.jit(lambda x, y: lpips_pair(x, y, self.weights))

    def __call__(self, x: np.ndarray, y: np.ndarray) -> float:
        """x, y: [H,W,3] float in [0,1]."""
        x = jnp.asarray(x, jnp.float32)[None]
        y = jnp.asarray(y, jnp.float32)[None]
        return float(self._fn(x, y)[0])


def weights_path() -> str | None:
    p = os.environ.get(WEIGHTS_ENV, DEFAULT_WEIGHTS_PATH)
    return p if os.path.exists(p) else None


def load_weights(path: str | None = None) -> dict[str, np.ndarray] | None:
    path = path or weights_path()
    if path is None or not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: data[k] for k in data.files}


_INSTANCE: LPIPS | str | None = None


def get_lpips() -> LPIPS | None:
    """Singleton LPIPS from the configured weights file; None (with one loud
    warning) when no weights are present — never a silent skip."""
    global _INSTANCE
    if _INSTANCE is None:
        w = load_weights()
        if w is None:
            print(
                "[lpips] WARNING: no weights found (set "
                f"${WEIGHTS_ENV} or place the converted npz at "
                f"{DEFAULT_WEIGHTS_PATH}; see "
                "opengaussian_tpu.eval.lpips.convert_torch_weights). "
                "LPIPS will be reported as null.",
                file=sys.stderr,
                flush=True,
            )
            _INSTANCE = "unavailable"
        else:
            _INSTANCE = LPIPS(w)
    return _INSTANCE if not isinstance(_INSTANCE, str) else None


def convert_torch_weights(vgg_state: dict, lin_state: dict,
                          out_path: str) -> None:
    """Convert torch state dicts to the npz this module loads.

    vgg_state: torchvision `vgg16(...).features.state_dict()` — keys like
    `0.weight` [Cout,Cin,3,3] following the module indices 0,2,5,7,10,...
    lin_state: richzhang v0.1 `vgg.pth` after the reference's key renaming
    (lpipsPyTorch/modules/utils.py:22-29): keys `{i}.1.weight` [1,C,1,1].
    """
    conv_module_idx = []
    idx = 0
    for i in range(len(VGG16_CHANNELS)):
        if i in POOL_BEFORE:
            idx += 1  # the maxpool module
        conv_module_idx.append(idx)
        idx += 2  # conv + relu
    out = {}
    for i, mi in enumerate(conv_module_idx):
        w = np.asarray(vgg_state[f"{mi}.weight"], np.float32)  # [Co,Ci,3,3]
        out[f"conv{i}_w"] = w.transpose(2, 3, 1, 0)  # HWIO
        out[f"conv{i}_b"] = np.asarray(vgg_state[f"{mi}.bias"], np.float32)
    for i in range(5):
        lw = np.asarray(lin_state[f"{i}.1.weight"], np.float32)  # [1,C,1,1]
        out[f"lin{i}_w"] = lw.reshape(-1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)


def random_weights(seed: int = 0) -> dict[str, np.ndarray]:
    """Random (but well-scaled) weights — for tests and architecture checks."""
    rng = np.random.default_rng(seed)
    out = {}
    cin = 3
    for i, cout in enumerate(VGG16_CHANNELS):
        out[f"conv{i}_w"] = rng.normal(
            0, np.sqrt(2.0 / (9 * cin)), (3, 3, cin, cout)
        ).astype(np.float32)
        out[f"conv{i}_b"] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
        cin = cout
    for i, c in enumerate(N_CHANNELS_LIST):
        out[f"lin{i}_w"] = rng.uniform(0, 0.1, (c,)).astype(np.float32)
    return out
