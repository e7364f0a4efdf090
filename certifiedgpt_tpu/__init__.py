"""certifiedgpt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
certified adversarial robustness of vision-language models via randomized
smoothing.

Re-designed from scratch for TPU with the capabilities of the reference
pipeline (leodesouza/certifiedGPT): noise-augmented finetuning of a
MiniGPT-4-style model (EVA ViT-g/14 -> Q-Former -> LLaMA/Vicuna decoder),
VQAv2 evaluation with the official protocol, Monte-Carlo smoothed
prediction/certification (Cohen et al. 2019), and targeted black-box
attack evaluation against a CLIP ensemble.

Layer map (see SURVEY.md §1 for the reference's layer map this mirrors):

- ``common/``   registry, config, logging, metrics, profiling (ref L1, L7 aux)
- ``models/``   functional JAX model graph: EVA ViT, Q-Former, LLaMA,
                MiniGPT-4 assembly, checkpoint converters (ref L2)
- ``ops/``      Pallas kernels + decode loops (TPU-native compute path)
- ``parallel/`` mesh construction and sharding rules (ref §2.8)
- ``data/``     processors, datasets, builders, host->device loader (ref L3)
- ``smoothing/``randomized-smoothing certification core (ref L4)
- ``agents/``   run loops: finetune / eval / certify / predict (ref L5)
- ``attack/``   black-box CLIP-ensemble attack evaluation (ref §2.9 gap)
- ``vqa_tools/``official VQAv2 accuracy protocol (ref L7)
"""

__version__ = "0.1.0"
