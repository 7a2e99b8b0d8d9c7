"""ResNet-18/34 image encoder (ablation encoder for SimLingo-Base).

Behavioral counterpart of reference
`simlingo_base_training/models/encoder/resnet.py` (timm ResNet backbone whose
final feature map becomes a token sequence). NHWC, BatchNorm with running
stats carried in the param tree ('bn_state'), returned updated in train mode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from simlingo_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    depth: int = 18                 # 18 or 34
    width: int = 64
    token_size: int = 512           # output embedding dim (projection)
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5

    @property
    def stage_blocks(self) -> Tuple[int, ...]:
        return {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}[self.depth]


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, (kh, kw, cin, cout), dtype)


def _bn_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _bn_state_init(c, dtype=jnp.float32):
    return {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def conv(w, x, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def batchnorm(p, state, x, training: bool, momentum: float, eps: float):
    if training:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        new_state = {
            "mean": momentum * state["mean"] + (1 - momentum) * mean,
            "var": momentum * state["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    out = (x - mean.astype(x.dtype)) * inv * p["scale"].astype(x.dtype) \
        + p["bias"].astype(x.dtype)
    return out, new_state


def init_params(key, cfg: ResNetConfig, dtype=jnp.float32
                ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    keys = iter(jax.random.split(key, 128))
    w = cfg.width
    p: Dict[str, Any] = {
        "stem": {"conv": _conv_init(next(keys), 7, 7, 3, w, dtype),
                 "bn": _bn_init(w, dtype)},
        "stages": {},
        "proj": L.linear_init(next(keys), w * 8, cfg.token_size, True, dtype),
    }
    s: Dict[str, Any] = {"stem": _bn_state_init(w, dtype), "stages": {}}
    cin = w
    for si, nblocks in enumerate(cfg.stage_blocks):
        cout = w * (2 ** si)
        p["stages"][str(si)] = {}
        s["stages"][str(si)] = {}
        for bi in range(nblocks):
            blk = {
                "conv1": _conv_init(next(keys), 3, 3, cin if bi == 0 else cout,
                                    cout, dtype),
                "bn1": _bn_init(cout, dtype),
                "conv2": _conv_init(next(keys), 3, 3, cout, cout, dtype),
                "bn2": _bn_init(cout, dtype),
            }
            st = {"bn1": _bn_state_init(cout, dtype),
                  "bn2": _bn_state_init(cout, dtype)}
            if bi == 0 and (si > 0 or cin != cout):
                blk["down_conv"] = _conv_init(next(keys), 1, 1, cin, cout, dtype)
                blk["down_bn"] = _bn_init(cout, dtype)
                st["down_bn"] = _bn_state_init(cout, dtype)
            p["stages"][str(si)][str(bi)] = blk
            s["stages"][str(si)][str(bi)] = st
        cin = cout
    return p, s


def encode(params, bn_state, images: jnp.ndarray, cfg: ResNetConfig,
           training: bool = False):
    """[B, H, W, 3] -> ([B, h*w, token_size] tokens, new_bn_state)."""
    mom, eps = cfg.bn_momentum, cfg.bn_eps
    new_state = {"stages": {}}
    # match the policy-cast weight dtype (fp32 pixels would promote the tower)
    images = images.astype(params["stem"]["conv"].dtype)
    x = conv(params["stem"]["conv"], images, stride=2)
    x, new_state["stem"] = batchnorm(params["stem"]["bn"], bn_state["stem"],
                                     x, training, mom, eps)
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    for si, nblocks in enumerate(cfg.stage_blocks):
        new_state["stages"][str(si)] = {}
        for bi in range(nblocks):
            p = params["stages"][str(si)][str(bi)]
            st = bn_state["stages"][str(si)][str(bi)]
            nst = {}
            stride = 2 if (si > 0 and bi == 0) else 1
            h = conv(p["conv1"], x, stride=stride)
            h, nst["bn1"] = batchnorm(p["bn1"], st["bn1"], h, training, mom, eps)
            h = jax.nn.relu(h)
            h = conv(p["conv2"], h)
            h, nst["bn2"] = batchnorm(p["bn2"], st["bn2"], h, training, mom, eps)
            if "down_conv" in p:
                sc = conv(p["down_conv"], x, stride=stride)
                sc, nst["down_bn"] = batchnorm(p["down_bn"], st["down_bn"],
                                               sc, training, mom, eps)
            else:
                sc = x
            x = jax.nn.relu(h + sc)
            new_state["stages"][str(si)][str(bi)] = nst
    B, H, W, C = x.shape
    tokens = L.linear(params["proj"], x.reshape(B, H * W, C))
    return tokens, new_state
