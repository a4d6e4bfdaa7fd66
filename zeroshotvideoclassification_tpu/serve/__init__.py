"""Serving front-end: micro-batching HTTP endpoint over a trained checkpoint.

The reference ends at dataset evaluation; this layer productionizes the
zero-shot classifier: InferenceEngine (a ladder of compiled eval shapes,
smallest-fit padded dispatch) + MicroBatcher (max-batch/max-delay request
coalescing) + a stdlib ThreadingHTTPServer. See cli/serve.py for the
command-line entry point.
"""

from zeroshotvideoclassification_tpu.serve.batcher import MicroBatcher
from zeroshotvideoclassification_tpu.serve.engine import InferenceEngine
from zeroshotvideoclassification_tpu.serve.server import (
    ZeroShotService,
    serve_forever,
    start_server,
)
