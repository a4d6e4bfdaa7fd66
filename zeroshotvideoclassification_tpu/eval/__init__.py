"""Zero-shot evaluation layer: on-device cosine-NN classify + split protocol."""

from zeroshotvideoclassification_tpu.eval.zeroshot import (
    compute_accuracy,
    split_protocol,
    extract_embeddings,
    evaluate_dataset,
)
