"""C3D backbone (Tran et al., ICCV 2015) — functional NDHWC form.

Architecture parity target: /root/reference/network.py:95-180 (which vendors
DavideA/c3d-pytorch): 8 conv3d(3x3x3, bias=True) layers, 5 maxpools (pool1
1x2x2, pools 2-5 2x2x2, pool5 spatial padding (0,1,1)), fc6 8192->4096;
fc7/fc8 exist in the reference but are bypassed by its forward (network.py:
168-172) and therefore not re-created here.

The flatten before fc6 follows torch's channel-first memory order
(h.view(-1, 8192) on a [N, 512, 1, 4, 4] tensor), so the NDHWC feature map is
transposed to NCDHW before reshaping — required for c3d.pickle weight porting.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from zeroshotvideoclassification_tpu.models import layers as L

_CONVS = (  # name, cin, cout
    ("conv1", 3, 64),
    ("conv2", 64, 128),
    ("conv3a", 128, 256),
    ("conv3b", 256, 256),
    ("conv4a", 256, 512),
    ("conv4b", 512, 512),
    ("conv5a", 512, 512),
    ("conv5b", 512, 512),
)


def _conv_init_with_bias(rng, cin: int, cout: int):
    """torch Conv3d default init: kaiming_uniform(a=sqrt(5)) weight,
    U(+-1/sqrt(fan_in)) bias; fan_in = cin * 27.

    kaiming_uniform(a=sqrt(5)): gain = sqrt(2/(1+5)) = 1/sqrt(3) and
    bound = gain * sqrt(3/fan_in) = 1/sqrt(fan_in) — the same bound as the
    bias, with NO extra factor."""
    kw, kb = jax.random.split(rng)
    fan_in = cin * 27
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (3, 3, 3, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


@dataclasses.dataclass(frozen=True)
class C3DBackbone:
    feature_dim: int = 4096

    def init(self, rng) -> Tuple[Dict, Dict]:
        keys = jax.random.split(rng, len(_CONVS) + 1)
        params = {
            name: _conv_init_with_bias(k, cin, cout)
            for k, (name, cin, cout) in zip(keys, _CONVS)
        }
        params["fc6"] = L.torch_linear_init(keys[-1], 8192, 4096)
        return params, {}  # no BN: C3D is batch-norm-free

    def apply(
        self, params, state, x: jax.Array, train: bool,
        compute_dtype=jnp.bfloat16,
    ):
        """x: [N, 16, 112, 112, 3] -> (fc6 features [N, 4096] fp32,
        conv5 featmap [N, 1, 4, 4, 512], state)."""
        h = L.relu(L.conv3d(x, params["conv1"], (1, 1, 1), (1, 1, 1), compute_dtype))
        h = L.maxpool3d(h, (1, 2, 2), (1, 2, 2))
        h = L.relu(L.conv3d(h, params["conv2"], (1, 1, 1), (1, 1, 1), compute_dtype))
        h = L.maxpool3d(h, (2, 2, 2), (2, 2, 2))
        h = L.relu(L.conv3d(h, params["conv3a"], (1, 1, 1), (1, 1, 1), compute_dtype))
        h = L.relu(L.conv3d(h, params["conv3b"], (1, 1, 1), (1, 1, 1), compute_dtype))
        h = L.maxpool3d(h, (2, 2, 2), (2, 2, 2))
        h = L.relu(L.conv3d(h, params["conv4a"], (1, 1, 1), (1, 1, 1), compute_dtype))
        h = L.relu(L.conv3d(h, params["conv4b"], (1, 1, 1), (1, 1, 1), compute_dtype))
        h = L.maxpool3d(h, (2, 2, 2), (2, 2, 2))
        h = L.relu(L.conv3d(h, params["conv5a"], (1, 1, 1), (1, 1, 1), compute_dtype))
        h = L.relu(L.conv3d(h, params["conv5b"], (1, 1, 1), (1, 1, 1), compute_dtype))
        featmap = L.maxpool3d(h, (2, 2, 2), (2, 2, 2), padding_dhw=(0, 1, 1))
        # torch flatten order is NCDHW (network.py:165) — transpose for parity
        n = featmap.shape[0]
        flat = jnp.transpose(featmap, (0, 4, 1, 2, 3)).reshape(n, 8192)
        feats = L.relu(L.linear(flat.astype(jnp.float32), params["fc6"]))
        return feats, featmap, state
