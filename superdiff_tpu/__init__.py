"""superdiff_tpu — a TPU-native framework for the superposition of diffusion
models using the Itô density estimator (capabilities of
mo-rsa24/super-diffusion, re-designed for JAX/XLA/Pallas/pjit).

Layer map (mirrors SURVEY.md §1):
  core/       schedules, Itô estimators, kappa policies, scan samplers (L1/L3/L4)
  models/     score networks: CIFAR UNet, toy MLP, SD stack, SE(3) stack (L2)
  ops/        Pallas TPU kernels for the fused sampler step (native tier)
  parallel/   mesh construction, shardings, ensemble parallelism (L0)
  train/      optimizer/EMA/train-step, orbax checkpointing (L1/L0)
  data/       input pipelines with the reference's split DSL (L0)
  eval/       FID/IS/CLIP metrics, BPD/NLL estimators (L5)
  pipelines/  experiment drivers: cifar, sd, protein (L6)
"""

__version__ = "0.1.0"

from . import core

__all__ = ["core", "__version__"]
