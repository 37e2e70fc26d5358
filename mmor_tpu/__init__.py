"""mmor_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of MM-OR.

Two stacks, rebuilt TPU-first (see SURVEY.md for the reference analysis):

1. ``mmor_tpu.models.mm2sg`` — MM2SG, a LLaVA-style multimodal VLM that turns
   operating-room scenes (multi-view RGB, point clouds, audio embeddings,
   transcripts, robot/tracker logs, segmentation-mask tokens, temporal memory)
   into scene-graph triplet strings, plus LoRA training and macro-F1 evaluation.
2. ``mmor_tpu.models.panoptic`` — a Mask2Former-style video panoptic
   segmentation pipeline (deformable-attention pixel decoder, masked-attention
   transformer decoder, referring tracker, temporal refiner) evaluated with VPQ.

Compute path is JAX/XLA with Pallas kernels for the hot ops; parallelism is
expressed with ``jax.sharding`` meshes (data/model axes) over ICI.
"""

__version__ = "0.1.0"
