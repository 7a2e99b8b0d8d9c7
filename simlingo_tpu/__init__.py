"""simlingo_tpu: a TPU-native Vision-Language-Action framework for closed-loop driving.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
SimLingo (reference: /root/reference, CVPR'25):
  * InternVL2-style VLA model (InternViT vision tower + Qwen2 LLM) producing
    driving waypoints from learned query tokens and free-form language.
  * Static-layout hybrid sequences (text + spliced image features + spliced
    waypoint embeddings + driving queries) -- no dynamic shapes under jit.
  * Pallas flash-attention kernels, pjit data/tensor parallel training,
    prefill + KV-cache greedy decode (the reference decodes without a cache).
"""

__version__ = "0.1.0"
