"""ml_mdm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of Matryoshka
Diffusion Models with the full capability surface of apple/ml-mdm.

The package is organised like the reference (see /root/reference SURVEY):

- ``samplers``         diffusion math: noise schedules, forward diffusion,
                       DDPM/DDIM ancestral steps, CFG, thresholding
- ``diffusion``        training/inference pipelines (single + nested)
- ``models``           Flax U-Net / NestedUNet (NHWC, bf16-friendly) + EMA
- ``ops``              Pallas TPU kernels (flash attention, fused norm)
- ``parallel``         jax.sharding Mesh helpers: DP/FSDP shardings
- ``language_models``  trie tokenizer + JAX T5 encoder
- ``reader``           streaming tar/TSV input pipeline
- ``trainer``          jit-compiled train step (grad clip, EMA, NaN skip)
- ``config``           dataclass/YAML registry, reference-YAML compatible
- ``clis``             train / generate_batch / generate_sample / metrics
"""

__version__ = "0.1.0"
