"""uaps-tpu: TPU-native uncertainty-aware semi-supervised defect segmentation.

A from-scratch JAX/Flax/pjit/Pallas rebuild of the capabilities of the UAPS
reference (djene-mengistu/UAPS, "Uncertainty-aware and dynamically-mixed
pseudo-labels for semi-supervised defect segmentation", Computers in Industry
152:103995, 2023).

Design stance (see SURVEY.md §7): one small functional framework — pure
functions + explicit state, a single jitted train step per method, NHWC conv
stacks, one `jax.random` key tree instead of the reference's three scattered
RNGs, mesh sharding instead of `nn.DataParallel`, and a config tree instead of
config-by-copy dataset variants.

Layout:
  uaps_tpu.ops       — losses / ramps / metrics / perturbations / cutmix
                       (pure functions; reference semantics pinned in tests)
  uaps_tpu.models    — Flax U-Net family (UNet, UNetUAPS, UNetCCT, UNetUCC,
                       UNetMCPS deep-supervision variants, ResNet backbone)
  uaps_tpu.methods   — one module per algorithm (uaps, baseline, mt, uamt,
                       cps, cct, dct, ucc): init_state / train_step / eval_step
  uaps_tpu.parallel  — device mesh, sharding rules, distributed init
  uaps_tpu.data      — dataset specs (NEU/DAGM/MTiles/KoSDD2), host pipeline,
                       synthetic fixtures
  uaps_tpu.pallas    — fused TPU kernels for the hot ops
  uaps_tpu.utils     — checkpointing (Orbax), logging, config
"""

__version__ = "0.1.0"
