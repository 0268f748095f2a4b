"""One dataclass config tree replacing the reference's config-by-copy.

The reference scatters configuration across argparse flags that are partly
dead (UAPS_train.py:36-60), hard-coded constants that override them
(epochs=800 :66, iter_per_epoch=60 :78, batch sizes and paths inside
dataloader modules), and four whole-directory dataset copies (SURVEY.md
§2.3, §5.6). Here: one tree + named presets.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass
class DataConfig:
    name: str = "synthetic"            # synthetic | neu | dagm | mtiles | kosdd2
    image_root: str = ""
    mask_root: str = ""
    test_image_root: str = ""
    test_mask_root: str = ""
    num_classes: int = 4
    in_channels: int = 3
    image_size: Tuple[int, int] = (256, 256)   # (H, W)
    batch_size: int = 16
    # split protocol (reference utilities/dataloaders.py:52-53):
    # val split first (seed 69), then labeled/unlabeled split (seed 45);
    # labeled_fraction = 1 - test_size of the second split.
    val_fraction: float = 0.15
    labeled_fraction: float = 0.10
    split_seed_val: int = 69
    split_seed_labeled: int = 45
    mean: Tuple[float, ...] = (0.485, 0.456, 0.406)
    std: Tuple[float, ...] = (0.229, 0.224, 0.225)
    # host pipeline
    shuffle_seed: int = 1337
    num_workers: int = 8
    # KoSDD2 permutes portrait 512x256 crops to landscape (SURVEY §2.3)
    transpose_to_landscape: bool = False
    binarize_mask: bool = False        # KoSDD2: (mask/255).long()


@dataclasses.dataclass
class ModelConfig:
    name: str = "unet_uaps"
    n_aux: int = 3                     # UAPS ablation: 2..4
    compute_dtype: str = "float32"     # float32 | bfloat16
    remat: bool = False                # jax.checkpoint the encoder/decoders
    # run the 1+n_aux decoders as ONE vmapped decoder over stacked params
    # (semantics-preserving; see models/unet.py stacked_decoder_apply)
    stack_decoders: bool = False
    # run the first N resolution levels with NCHW activations so the
    # pallas conv kernels need no boundary transposes (profiled at
    # ~21 ms/step of layout copies) — semantics-preserving
    nchw_levels: int = 2
    # Pallas kernel dispatch, threaded through module attributes (NOT a
    # module global — two Trainers with different settings coexist):
    #   "auto":  pallas conv/loss kernels on TPU where shape-gated (the
    #            fastest measured configuration)
    #   "fused": additionally fuse BN-normalize+leaky into the second
    #            ConvBlock conv's prologue (pallas/conv_bnl.py) —
    #            measured +3.3 ms/step vs "auto" (r2), kept opt-in
    #   "chain": the r4 fused ConvBlock chain (pallas/block_conv.py):
    #            conv kernels emit BN moments from their f32
    #            accumulators, the middle normalize+leaky+dropout runs
    #            in conv2's VMEM prologue, and each backward is ONE
    #            fused dgrad+wgrad kernel
    #   "xla":   plain XLA everywhere (the GSPMD >1-device setting,
    #            where pallas_call would run replicated)
    conv_backend: str = "auto"
    # conv kernel variant (dwm|dwnp|taps|im2col|dhdw|dwout|flat|fullh —
    # PERF.md ablations); env UAPS_CONV_VARIANT overrides at config
    # construction time only. r2 on-chip step A/B (faithful UAPS step,
    # bf16 bs16): dwnp 86.0 ms vs taps 94.2 / dwout 94.0 / flat 95.0.
    # r4: "dwm" (dwnp with the three per-dw matmuls packed into matmul
    # M — MXU time ∝ K·N·ceil(M/128), so 3 matmuls/block instead of 9
    # for free) + the coupled dwnp1 packed wgrad measured 79.5 -> 76.6
    # ms/step; "dwmf" additionally feeds the kernels FLAT [B,C,(H+8)*W]
    # lane views so every dh slice is an aligned lane extraction (no
    # sublane->lane relayouts in-kernel) — 76.6 -> 75.5 ms/step, the
    # default
    conv_variant: str = dataclasses.field(
        default_factory=lambda: os.environ.get("UAPS_CONV_VARIANT",
                                               "dwmf"))
    # out_conv (16->num_classes logits head) kernel, independent of
    # conv_variant: taps|im2col|dhdw|dwnp|dwm|dwmf pallas variants, or
    # "xla" (to_nhwc + XLA NHWC conv). A/B history: taps 98.7, im2col
    # 98.8, xla 112.7 ms/step (r2); r5b: dwmf with the Co-padded packed
    # kernels (Cout 4 zero-padded to 8 so the dw partial slices stay
    # sublane-aligned) measured 75.2 -> 72.9 ms/step — the default
    head_variant: str = dataclasses.field(
        default_factory=lambda: os.environ.get("UAPS_HEAD_VARIANT",
                                               "dwmf"))
    # multi-decoder models only: run the 1+n_aux out_conv heads as ONE
    # block-diagonal conv over the channel-concatenated final features
    # (VERDICT r3 #2 — each Cout=n_cls head wastes ~97% of MXU rows;
    # packing cuts the matmul pass count 4x). Semantics-preserving;
    # param tree unchanged (each decoder still owns its out_conv)
    packed_heads: bool = False
    # ConvBlock dropout: "auto" (fused pallas kernel on TPU — measured
    # 98.7 -> 94.6 ms/step — nn.Dropout elsewhere) | "xla" (nn.Dropout:
    # threefry mask + select) | "pallas" (force the fused kernel: on-core
    # PRNG, mask-regenerating VJP — no stored mask residual)
    dropout_backend: str = "auto"
    # NCHW 2x2 max-pool impl: "auto"/"pallas" (pallas/pool_nchw.py
    # fwd+bwd kernel on TPU where the shape gate admits it — DEFAULT
    # since r4a: after the f32-arithmetic mask rewrite (Mosaic rejects
    # i1 vector ops, "Unsupported target bitwidth for truncation") it
    # compiles on-chip and the step A/B measured 89.9 -> 85.6 ms/step
    # by killing the 256px select-and-scatter {1,0,3,2} transpose
    # chain; XLA reduce_window elsewhere) | "maskpool" (XLA fwd +
    # elementwise mask bwd, measured neutral) | "xla" (reduce_window)
    pool_backend: str = "auto"
    # NCHW BatchNorm batch-stats layout: "auto"/"4d" (nn.BatchNorm on
    # the 4-D tensor) | "flat" (reduce the conv's flat [B,C,H*W] view —
    # r2c profile said 0.10 vs 0.51 ms per reduction, but the full-step
    # A/B LOSES 2.5 ms: the flat view forces its own reshape/copy chain;
    # kept as an ablation knob only, docs/PERF.md "Round 3a")
    bn_backend: str = "auto"


@dataclasses.dataclass
class MethodConfig:
    name: str = "uaps"  # uaps|baseline|mt|uamt|cps|cct|dct|ucc
    # sigmoid-ramped consistency weights (UAPS_train.py:53-58,81-87)
    consistency1: float = 0.1          # pseudo-supervision weight max
    consistency2: float = 0.1          # uncertainty-min weight max
    consistency_rampup: float = 200.0
    ramp_iters: int = 80               # epoch_for_ramp = step // ramp_iters
    # MT / UAMT (MT_train.py:79-83; UA_MT_train.py:188-215)
    ema_decay: float = 0.99
    consistency_start_iter: int = 1000  # MT hard gate (MT_train.py:196-199)
    uamt_num_samples: int = 8          # T stochastic teacher passes
    # UAPS ablations
    dynamic_mixing: bool = True        # False -> plain averaging (:247)
    uncertainty_gate: bool = True      # False -> ungated ps-loss (:272-275)
    # MTiles variant extras (MTiles UAPS_train.py:229-239,287)
    decoder_consistency_weight: float = 0.0
    unramped_uncertainty: bool = False
    # TPU throughput option: run labeled+unlabeled through ONE forward
    # (BatchNorm then normalizes over the joint batch — a documented
    # deviation from the reference's two sequential forwards; off by
    # default for parity).
    fused_batch: bool = False
    # fused uncertainty+pseudo-label pallas kernel (pallas/uncertainty.py)
    # on TPU; False falls back to the unfused softmax/KL pipeline (+ the
    # round-1 pseudo-label kernel). A/B knob — numerics pinned equal by
    # tests/test_pallas.py::TestFusedUncertainty.
    fused_uncertainty: bool = True


@dataclasses.dataclass
class OptimConfig:
    base_lr: float = 1e-3
    # ReduceLROnPlateau(mode=max, patience=50, factor=0.1, min_lr=1e-8)
    # (UAPS_train.py:113)
    plateau_patience: int = 50
    plateau_factor: float = 0.1
    min_lr: float = 1e-8
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


@dataclasses.dataclass
class RunConfig:
    epochs: int = 800
    iter_per_epoch: int = 60
    seed: int = 1337
    out_dir: str = "runs/default"
    keep_checkpoints: int = 2
    log_every: int = 20
    save_every: int = 0      # also checkpoint latest state every N epochs
    # PRNG implementation: 'threefry2x32' (jax default, bit-stable) or
    # 'rbg' (hardware RNG path, much faster on TPU for the dropout/
    # perturbation-heavy UAPS step; streams differ from threefry but the
    # distributions are identical)
    prng_impl: str = "threefry2x32"
    # multi-device execution mode: True = shard_map (per-device step,
    # DataParallel-style BN like the reference, Pallas kernels stay
    # partitioned — parallel/shardmap_step.py), False = GSPMD (jit-sharded,
    # sync-BN, XLA convs since pallas_call runs replicated under GSPMD).
    # None = auto: shard_map whenever the mesh has >1 device (the default
    # multi-chip path; GSPMD remains the opt-out for sync-BN semantics).
    use_shard_map: Optional[bool] = None
    halt_on_nan: bool = True  # failure detection: stop on non-finite loss
    # stop after N epochs without a new best val mDice (0 = run all
    # epochs, matching the reference, which never early-stops)
    early_stop_patience: int = 0
    debug_nans: bool = False
    profile_steps: Optional[Tuple[int, int]] = None  # (start, stop)
    # K > 1 runs K train steps per dispatch via lax.scan over stacked
    # batches — semantically identical updates, amortizes the per-dispatch
    # host round-trip (~5 ms on the tunneled v5e relay). 0 = auto: 4 on
    # TPU single-device runs (where dispatch overhead is real), 1
    # elsewhere (profiling and shard_map force 1 regardless).
    steps_per_dispatch: int = 0
    # Fold sampling + the whole epoch into one jitted lax.scan over
    # DEVICE-RESIDENT fixed pools (data/device_pool.py). Requires a
    # dataset with fixed labeled+unlabeled pools and a 1-device mesh;
    # the quality runs and ablations use it because the loopback relay's
    # upload bandwidth otherwise caps 256² training at ~10 imgs/s.
    device_pools: bool = False


@dataclasses.dataclass
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    method: MethodConfig = dataclasses.field(default_factory=MethodConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    run: RunConfig = dataclasses.field(default_factory=RunConfig)


def _discover_roots(data: DataConfig) -> DataConfig:
    """Fill empty image/mask roots from the conventional data layout
    ($UAPS_DATA_ROOT/<dataset>, default /root/data/<dataset> — the layout
    scripts/prepare_data.py produces), so a provisioned machine trains
    with just `python -m uaps_tpu.train --preset neu`."""
    if data.image_root:
        return data
    base = os.path.join(os.environ.get("UAPS_DATA_ROOT", "/root/data"),
                        data.name)
    img = os.path.join(base, "images")
    if not os.path.isdir(img):
        return data
    kw = dict(image_root=img, mask_root=os.path.join(base, "annotations"))
    t = os.path.join(base, "test_images")
    ta = os.path.join(base, "test_annotations")
    # require BOTH halves: a test_images dir without annotations (e.g. an
    # unlabeled dump) must not configure a mask root that explodes later
    # deep inside the eval pipeline
    if os.path.isdir(t) and os.path.isdir(ta):
        kw.update(test_image_root=t, test_mask_root=ta)
    return dataclasses.replace(data, **kw)


def _neu(method: str = "uaps") -> Config:
    """NEU-Seg 10% labeled (reference root trainers)."""
    return Config(
        data=_discover_roots(
            DataConfig(name="neu", num_classes=4, in_channels=3,
                       batch_size=16, labeled_fraction=0.10)),
        model=ModelConfig(name=_model_for(method)),
        method=MethodConfig(name=method),
    )


def _model_for(method: str) -> str:
    return {
        "uaps": "unet_uaps", "baseline": "unet", "mt": "unet",
        "uamt": "unet", "cps": "unet_f", "cct": "unet_cct",
        "dct": "unet", "ucc": "unet_ucc",
    }[method]


def _dagm() -> Config:
    """DAGM: 7 classes, grayscale, 10% labeled; fixes the reference's
    'unet_ccps' factory bug by actually using unet_uaps (SURVEY §2.3)."""
    return Config(
        data=_discover_roots(DataConfig(
            name="dagm", num_classes=7, in_channels=1, batch_size=16,
            labeled_fraction=0.10, mean=(0.5314,), std=(0.1357,),
        )),
        model=ModelConfig(name="unet_uaps"),
        method=MethodConfig(name="uaps"),
    )


def _mtiles() -> Config:
    """MTiles: 6 classes, 40% labeled, lr 2e-3, iter/epoch 20. The
    reference adds decoder-consistency terms multiplied by 0 and an
    UNRAMPED l_uncert (MTiles UAPS_train.py:287) — exposed as flags,
    defaulting to the reference's effective behavior."""
    return Config(
        data=_discover_roots(
            DataConfig(name="mtiles", num_classes=6, batch_size=16,
                       labeled_fraction=0.40)),
        model=ModelConfig(name="unet_uaps"),
        method=MethodConfig(name="uaps", decoder_consistency_weight=0.0,
                            unramped_uncertainty=True),
        optim=OptimConfig(base_lr=2e-3),
        run=RunConfig(iter_per_epoch=20),
    )


def _kosdd2() -> Config:
    """KolektorSDD2: binary, 512x256->landscape, 40% labeled, bs 12,
    lr 2e-3, rampup 150."""
    return Config(
        data=_discover_roots(
            DataConfig(name="kosdd2", num_classes=2, batch_size=12,
                       image_size=(256, 512), labeled_fraction=0.40,
                       transpose_to_landscape=True, binarize_mask=True)),
        model=ModelConfig(name="unet_uaps"),
        method=MethodConfig(name="uaps", consistency_rampup=150.0),
        optim=OptimConfig(base_lr=2e-3),
        run=RunConfig(iter_per_epoch=20),
    )


def _synthetic(method: str = "uaps") -> Config:
    cfg = _neu(method)
    cfg.data = dataclasses.replace(
        cfg.data, name="synthetic", image_size=(64, 64), batch_size=8)
    cfg.run = dataclasses.replace(cfg.run, epochs=3, iter_per_epoch=5,
                                  out_dir="runs/synthetic")
    return cfg


PRESETS = {
    "neu": _neu,
    "dagm": _dagm,
    "mtiles": _mtiles,
    "kosdd2": _kosdd2,
    "synthetic": _synthetic,
}


def preset(name: str, **kwargs) -> Config:
    if name not in PRESETS:
        raise ValueError(f"unknown preset {name!r}; known: {sorted(PRESETS)}")
    return PRESETS[name](**kwargs)
