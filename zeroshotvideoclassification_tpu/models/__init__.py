"""Model layer: functional NDHWC video CNNs + embedding heads.

Capability parity targets: /root/reference/resnet.py (R3D-18 / MC3-18 /
R(2+1)D-18) and /root/reference/network.py (C3D, MLP head, legacy linear
head). Everything is a pure function over explicit (params, state) pytrees —
no module framework — which keeps torch-checkpoint porting, pjit sharding and
Pallas substitution transparent. Layout is channels-last [N, T, H, W, C]
(TPU-native for XLA convolutions); weight-porting handles the transpose from
torch's NCDHW checkpoints.
"""

from zeroshotvideoclassification_tpu.models.heads import (
    ZeroShotModel,
    get_network,
)
from zeroshotvideoclassification_tpu.models.resnet3d import (
    VideoResNet,
    r3d_18,
    mc3_18,
    r2plus1d_18,
)
from zeroshotvideoclassification_tpu.models.c3d import C3DBackbone
