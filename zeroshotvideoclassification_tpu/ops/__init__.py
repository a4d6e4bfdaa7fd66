"""TPU compute kernels (XLA / Pallas) for the hot non-model ops."""

from zeroshotvideoclassification_tpu.ops.resample import fused_video_transform
from zeroshotvideoclassification_tpu.ops.cdist import (
    cosine_distances,
    nearest_class,
    topk_classes,
)
