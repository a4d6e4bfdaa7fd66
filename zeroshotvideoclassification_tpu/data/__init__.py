"""Data layer: host-side index math + decode, device-side transform kernels.

Design (TPU-first): all variability lives host-side in integer index space —
frame selection (TSN), crop offsets, flip flags, source sizes — while the
device sees only static shapes: a uint8 canvas [B, T, Hc, Wc, 3] plus small
per-sample parameter vectors. One fused device kernel then performs
bilinear-resize + crop + flip + normalize exactly matching the reference's
CPU transform chain (/root/reference/auxiliary/transforms.py:41-56).
"""

from zeroshotvideoclassification_tpu.data.sampling import (
    tsn_selection,
    tsn_frame_indices,
)
from zeroshotvideoclassification_tpu.data.transform_params import (
    TransformParams,
    resized_dims,
    make_transform_params,
)
