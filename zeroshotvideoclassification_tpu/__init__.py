"""zeroshotvideoclassification_tpu — a TPU-native framework for end-to-end
zero-shot video classification.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
damien911224/ZeroShotVideoClassification (CVPR 2020, arXiv:2003.01455):
train a 3D-CNN video backbone (R(2+1)D-18 / R3D-18 / MC3-18 / C3D) to regress
clips into the 300-d GoogleNews Word2Vec embedding of their class name, then
classify *unseen* classes by cosine nearest-neighbor search in embedding space.

Layer map (bottom-up; see /root/repo/SURVEY.md for the reference layer map):

  text/      class-name -> 300-d semantic embeddings (pure functions, numpy)
  data/      host decode-to-uint8 + device-side fused transform kernels
  models/    functional NDHWC video CNNs returning (pooled, featmap)
  ops/       TPU kernels: fused affine-gather transform, cosine top-k, ...
  parallel/  device mesh + sharding policy (dp / tp / clip-axis)
  train/     pjit'd bf16 training step, Adam + MultiStepLR, checkpoints
  eval/      on-device zero-shot NN evaluation + 10-split protocol
  utils/     logging, metrics, timers
  cli/       main.py-parity command line

All compute-path code is JAX; nothing here imports torch (torch appears only
in tests as a numerical oracle and in the optional weight-porting tool).
"""

__version__ = "0.1.0"
