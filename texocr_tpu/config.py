"""Configuration system.

Loads the same YAML surface as the reference (reference: utils.py:24-28,
config/config.yml:1-45) so existing config files drop in unchanged, then
validates it into a typed view. Runtime-injected keys (``max_length``,
``vocab_size``; reference train.py:33-34) are supported the same way.

Additional TPU-only keys (all optional, defaulted):
  - ``dtype``: compute dtype for the model ("bfloat16" | "float32").
  - ``use_flash_attention``: route attention through Pallas kernels
    (true | false | "auto" = true on TPU backends only). Training under the
    flash path uses a recompute backward (ops/flash_attention.py:192-200).
  - ``mesh``: dict of mesh axis name -> size, e.g. {data: 8, model: 1}.
  - ``mask_pad_loss``: mask PAD positions out of the training loss. The
    reference computes an UNMASKED cross-entropy (reference decoder.py:140,
    despite building an ignore_index criterion at train.py:54); set this to
    false for strict parity with that behaviour.
  - ``seq_pad_multiple``: pad label batches up to a multiple of this to bound
    XLA recompilation (1 = reference-exact batch-max padding).
  - ``device_data``: park the whole dataset on the chip (uint8 buckets),
    select batches ON DEVICE and run ``device_data_steps_per_call`` optimizer
    steps per dispatch via lax.scan (training/device_data.py). Removes all
    per-step host->device traffic; host augmentation is unavailable in this
    mode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml

_TPU_DEFAULTS: Dict[str, Any] = {
    "dtype": "bfloat16",
    # "auto": Pallas flash attention on TPU, XLA einsum path elsewhere. The
    # benchmarked configuration (bench.py) is therefore what a shipped config
    # runs by default on hardware. Note: training under flash attention uses
    # a recompute (flash-forward-again) backward — see ops/flash_attention.py.
    "use_flash_attention": "auto",
    "mesh": {"data": -1},  # -1: use all available devices on the data axis
    "mask_pad_loss": True,
    "seq_pad_multiple": 32,
    "kv_quant": "none",
    "self_kv_quant": "none",
    # Rematerialize (jax.checkpoint) each transformer sub-layer and ResNet
    # bottleneck in the teacher-forced forward: backward recomputes instead
    # of storing activations. Enables large-canvas/long-seq buckets to train
    # at full batch when the dataset is also HBM-resident (device_data).
    "remat": False,
    "device_data": False,
    "device_data_steps_per_call": 16,
    # False streams the val split from the host instead of staging it in
    # HBM (the spill knob for datasets that fill the chip).
    "device_data_val": True,
    # On-device train-time augmentation (scale/translate/brightness inside
    # the scan step — device_data.augment_batch); replaces the host PIL
    # affine aug, which can't run in device_data mode.
    "device_data_augment": False,
}


def _resolve_flash(value) -> bool:
    if value == "auto" or value is None:
        import jax

        return jax.default_backend() == "tpu"
    return bool(value)


def load_config(config_path: str) -> dict:
    """Load a YAML configuration file into a plain dict (reference utils.py:24-28)."""
    with open(config_path, "r") as f:
        config = yaml.safe_load(f)
    return config


def with_defaults(config: dict) -> dict:
    """Return a copy of ``config`` with TPU-specific defaults filled in."""
    out = dict(_TPU_DEFAULTS)
    out.update(config)
    return out


@dataclasses.dataclass(frozen=True)
class AttentionStackConfig:
    embed_dim: int
    num_layers: int
    heads: int
    dim_head: int = 64
    cross_attend: bool = False
    causal: bool = False
    glu: bool = True
    exp_factor: int = 4
    dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    img_size: tuple  # (H, W) maximum canvas; reference hardcodes (160, 1008) (encoder.py:184)
    patch_size: int
    n_channels: int
    embed_dim: int
    num_layers: int
    heads: int
    # Note: the reference silently drops encoder dropout/exp_factor from the
    # config (encoder.py:182-190 passes no ff_kwargs); we honour that default
    # (glu=True, exp_factor=4, dropout=0) for checkpoint-shape parity.
    resnet_depths: tuple = (2, 4, 6)
    resnet_channels: tuple = (256, 512, 1024)
    stem_channels: int = 64
    # 'hybrid' = ResNet backbone + pointwise projection (the reference's only
    # wired-up path, encoder.py:162-191); 'patch' = plain strided-conv ViT
    # patchify (the reference defines it at encoder.py:11-28 but never uses
    # it from the factory).
    embed_layer: str = "hybrid"


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    max_length: int
    embed_dim: int
    num_layers: int
    heads: int
    cross_attend: bool = True
    glu: bool = True
    exp_factor: int = 4
    dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    encoder: EncoderConfig
    decoder: DecoderConfig
    bos_token: int
    eos_token: int
    pad_token: int
    dtype: str = "bfloat16"
    use_flash_attention: bool = False
    # 'int8' quantizes the precomputed cross-attention K/V for the decode
    # loop (halves its dominant HBM traffic; exact up to int8 rounding).
    kv_quant: str = "none"
    # 'int8' additionally stores the decode SELF-attention merged prefix in
    # int8 with per-(B, H, t) scales, quantized once per chunk at merge_hot
    # (the hot window stays bf16) — halves the decode loop's second-largest
    # HBM stream. Exact up to int8 rounding of the prefix K/V.
    self_kv_quant: str = "none"
    # Per-sub-layer / per-bottleneck activation rematerialization (see
    # _TPU_DEFAULTS["remat"]). Affects only the teacher-forced training
    # forward; the cached decode path never differentiates.
    remat: bool = False
    # Keep XLA optimization barriers around rematted regions. Required in a
    # plain jitted host-loop train step (forward+backward in one program —
    # CSE would undo the recompute and void the HBM savings); safely dropped
    # inside the device-resident lax.scan step, where CSE cannot cross loop
    # bodies and barriers only pessimize fusion. from_dict derives it from
    # the 'device_data' flag.
    remat_prevent_cse: bool = True

    @staticmethod
    def from_dict(config: dict) -> "ModelConfig":
        """Build a typed model config from the reference-format config dict.

        Mirrors reference create_encoder (encoder.py:172-191) and
        create_decoder (decoder.py:148-173) factory semantics.
        """
        config = with_defaults(config)
        for key in ("max_length", "vocab_size"):
            if key not in config:
                raise ValueError(
                    f"'{key}' not present in config — it is injected at runtime "
                    "from the dataset (reference train.py:33-34)."
                )
        enc_args = config["encoder"]
        dec_args = config["decoder"]
        encoder = EncoderConfig(
            img_size=tuple(config.get("img_size", (160, 1008))),
            patch_size=config["patch_size"],
            n_channels=enc_args["n_channels"],
            embed_dim=enc_args["embed_dim"],
            num_layers=enc_args["num_layers"],
            heads=enc_args["heads"],
            resnet_depths=tuple(enc_args.get("resnet_depths", (2, 4, 6))),
            resnet_channels=tuple(enc_args.get("resnet_channels", (256, 512, 1024))),
            stem_channels=enc_args.get("stem_channels", 64),
            embed_layer=enc_args.get("embed_layer", "hybrid"),
        )
        decoder = DecoderConfig(
            vocab_size=config["vocab_size"],
            max_length=config["max_length"],
            embed_dim=dec_args["embed_dim"],
            num_layers=dec_args["num_layers"],
            heads=dec_args["heads"],
            cross_attend=dec_args.get("cross_attend", True),
            glu=config.get("glu", True),
            exp_factor=dec_args.get("exp_factor", 4),
            dropout=dec_args.get("dropout", 0.0),
        )
        return ModelConfig(
            encoder=encoder,
            decoder=decoder,
            bos_token=config["bos_token"],
            eos_token=config["eos_token"],
            pad_token=config["trg_pad_idx"],
            dtype=config["dtype"],
            use_flash_attention=_resolve_flash(config["use_flash_attention"]),
            kv_quant=config["kv_quant"],
            self_kv_quant=config["self_kv_quant"],
            remat=bool(config["remat"]),
            remat_prevent_cse=not bool(config["device_data"]),
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int
    n_epochs: int
    optimizer: str
    optimizer_args: Dict[str, Any]
    seed: int = 42
    save_checkpoint: bool = True
    save_dir: str = "checkpoints"
    save_freq: int = 1
    val_freq: int = 1
    mask_pad_loss: bool = True
    drop_last: bool = True
    keep_small: bool = False
    batch_shuffle: bool = True
    id_shuffle: bool = True
    seq_pad_multiple: int = 32

    @staticmethod
    def from_dict(config: dict) -> "TrainConfig":
        config = with_defaults(config)
        return TrainConfig(
            batch_size=config["batch_size"],
            n_epochs=config["n_epochs"],
            optimizer=config.get("optimizer", "Adam"),
            optimizer_args=dict(config.get("optimizer_args", {"lr": 5e-4})),
            seed=config.get("seed", 42),
            save_checkpoint=config.get("save_checkpoint", True),
            save_dir=config.get("save_dir", "checkpoints"),
            save_freq=config.get("save_freq", 1),
            val_freq=config.get("val_freq", 1),
            mask_pad_loss=config.get("mask_pad_loss", True),
            drop_last=config.get("drop_last", True),
            keep_small=config.get("keep_small", False),
            batch_shuffle=config.get("batch_shuffle", True),
            id_shuffle=config.get("id_shuffle", True),
            seq_pad_multiple=config.get("seq_pad_multiple", 32),
        )


def model_config_from_yaml(
    config_path: str,
    max_length: Optional[int] = None,
    vocab_size: Optional[int] = None,
) -> ModelConfig:
    """Convenience: YAML path -> ModelConfig with runtime keys injected."""
    config = load_config(config_path)
    if max_length is not None:
        config["max_length"] = max_length
    if vocab_size is not None:
        config["vocab_size"] = vocab_size
    return ModelConfig.from_dict(config)
