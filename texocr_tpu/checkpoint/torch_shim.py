"""PyTorch -> JAX checkpoint conversion shim.

Converts a reference TeXOCR ``state_dict`` (an OCRModel's; reference
ocr_model.py:14-66) into this framework's flax parameter pytree. The mapping
is declarative and total — every reference tensor must be consumed, every
target parameter must be produced — so drift in either model fails loudly.

Reference quirks handled:
- The shared LayerNorm appears once per sub-layer in the state dict
  (``layers.{j}.0.*`` for every j; reference attention.py:200,221) with
  identical tensors; we map entry 0 and verify the rest are identical.
- Decoder positional-embedding length adaptation: like the reference wrapper
  (ocr_model.py:84-88), the converted tree adopts the CHECKPOINT's
  pos-embedding length; callers should build the model with a matching
  ``max_length`` (or pass ``target_max_length`` to pad/truncate).

Weight layout: torch Linear (out, in) -> flax (in, out); torch Conv OIHW ->
flax HWIO.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


class _Consumer:
    def __init__(self, state: Dict[str, np.ndarray]):
        self.state = dict(state)
        self.used = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.state:
            raise KeyError(f"reference checkpoint missing expected key: {key}")
        self.used.add(key)
        return np.asarray(self.state[key])

    def remaining(self):
        return sorted(set(self.state) - self.used)


def _mha(c: _Consumer, prefix: str) -> dict:
    return {
        "q": {"kernel": _linear(c.take(f"{prefix}.q.weight"))},
        "k": {"kernel": _linear(c.take(f"{prefix}.k.weight"))},
        "v": {"kernel": _linear(c.take(f"{prefix}.v.weight"))},
        "fc_out": {
            "kernel": _linear(c.take(f"{prefix}.fc_out.0.weight")),
            "bias": c.take(f"{prefix}.fc_out.0.bias"),
        },
    }


def _mlp(c: _Consumer, prefix: str, glu: bool) -> dict:
    fc_in_key = f"{prefix}.fc_in.fc" if glu else f"{prefix}.fc_in.0"
    return {
        "fc_in": {
            "kernel": _linear(c.take(f"{fc_in_key}.weight")),
            "bias": c.take(f"{fc_in_key}.bias"),
        },
        "fc_out": {
            "kernel": _linear(c.take(f"{prefix}.fc_out.weight")),
            "bias": c.take(f"{prefix}.fc_out.bias"),
        },
    }


def _norm(c: _Consumer, prefix: str) -> dict:
    return {"scale": c.take(f"{prefix}.weight"), "bias": c.take(f"{prefix}.bias")}


def _attention_stack(
    c: _Consumer, prefix: str, num_layers: int, cross_attend: bool, glu: bool
) -> dict:
    """Map ``layers.{j}.(0=shared norm, 1=block)`` triples/pairs
    (reference attention.py:208-221) onto the AttentionStack tree."""
    per_layer = 3 if cross_attend else 2
    out: dict = {"shared_norm": _norm(c, f"{prefix}.layers.0.0")}
    # The shared norm is registered once per sub-layer; check they are all
    # the same tensor (they must be — one nn.LayerNorm instance).
    ref_scale = out["shared_norm"]["scale"]
    for j in range(1, num_layers * per_layer):
        dup = c.take(f"{prefix}.layers.{j}.0.weight")
        c.take(f"{prefix}.layers.{j}.0.bias")
        if not np.array_equal(dup, ref_scale):
            raise ValueError(
                f"{prefix}.layers.{j}.0 differs from layers.0.0 — checkpoint "
                "does not share the stack LayerNorm the way the reference does."
            )
    for layer in range(num_layers):
        base = layer * per_layer
        out[f"self_attns_{layer}"] = _mha(c, f"{prefix}.layers.{base}.1")
        if cross_attend:
            out[f"cross_attns_{layer}"] = _mha(c, f"{prefix}.layers.{base + 1}.1")
        out[f"mlps_{layer}"] = _mlp(
            c, f"{prefix}.layers.{base + per_layer - 1}.1", glu
        )
    return out


def _bottleneck(c: _Consumer, prefix: str, has_proj: bool) -> dict:
    out = {
        "conv1": {"kernel": _conv(c.take(f"{prefix}.block_list.0.weight"))},
        "norm1": _norm(c, f"{prefix}.block_list.1"),
        "conv2": {"kernel": _conv(c.take(f"{prefix}.block_list.2.weight"))},
        "norm2": _norm(c, f"{prefix}.block_list.3"),
        "conv3": {"kernel": _conv(c.take(f"{prefix}.block_list.4.weight"))},
        "norm3": _norm(c, f"{prefix}.block_list.5"),
    }
    # nn.Sequential(*block_list) registers the same tensors twice under
    # ``block.{i}``; consume the duplicates so the audit stays total.
    for i in (0, 2, 4):
        c.take(f"{prefix}.block.{i}.weight")
    for i in (1, 3, 5):
        c.take(f"{prefix}.block.{i}.weight")
        c.take(f"{prefix}.block.{i}.bias")
    if has_proj:
        out["proj_conv"] = {
            "kernel": _conv(c.take(f"{prefix}.downsample.conv.weight"))
        }
        out["proj_norm"] = _norm(c, f"{prefix}.downsample.norm")
    return out


def _resnet(c: _Consumer, prefix: str, depths) -> dict:
    out = {
        "stem_conv": {"kernel": _conv(c.take(f"{prefix}.stem.0.weight"))},
        "stem_norm": _norm(c, f"{prefix}.stem.1"),
    }
    for s, depth in enumerate(depths):
        stage: dict = {}
        for i in range(depth):
            stage[f"block{i}"] = _bottleneck(
                c, f"{prefix}.stages.{s}.stage_blocks.{i}", has_proj=(i == 0)
            )
        out[f"stage{s}"] = stage
    return out


def convert_torch_state_dict(
    state: Dict[str, np.ndarray],
    *,
    num_encoder_layers: int = 4,
    num_decoder_layers: int = 4,
    resnet_depths=(2, 4, 6),
    glu: bool = True,
    target_max_length: Optional[int] = None,
) -> dict:
    """Full OCRModel state dict -> flax ``{'params': ...}``-style tree
    (without the top-level 'params' key)."""
    c = _Consumer(state)

    encoder = {
        "backbone": _resnet(c, "encoder.patch_embed.backbone_net", resnet_depths),
        "proj": {
            "kernel": _conv(c.take("encoder.patch_embed.proj.weight"))[0, 0],
            "bias": c.take("encoder.patch_embed.proj.bias"),
        },
        "cls_token": c.take("encoder.cls_token"),
        "pos_embed": c.take("encoder.pos_embed"),
        "attn_layers": _attention_stack(
            c, "encoder.attn_layers", num_encoder_layers, cross_attend=False, glu=True
        ),
        "norm": _norm(c, "encoder.norm"),
    }

    pos_embed = c.take("decoder.net.pos_embedding.embedding.weight")
    if target_max_length is not None and pos_embed.shape[0] != target_max_length:
        # Mirror the reference wrapper's length adaptation (ocr_model.py:84-88)
        # in the opposite direction: fit the table to the model being built.
        fitted = np.zeros((target_max_length, pos_embed.shape[1]), pos_embed.dtype)
        n = min(target_max_length, pos_embed.shape[0])
        fitted[:n] = pos_embed[:n]
        pos_embed = fitted

    decoder = {
        "token_embedding": {
            "embedding": c.take("decoder.net.token_embedding.weight")
        },
        "pos_embedding": {"embedding": pos_embed},
        "attn_layers": _attention_stack(
            c, "decoder.net.attn_layers", num_decoder_layers, cross_attend=True,
            glu=glu,
        ),
        "norm": _norm(c, "decoder.net.norm"),
        "to_logits": {
            "kernel": _linear(c.take("decoder.net.to_logits.weight")),
            "bias": c.take("decoder.net.to_logits.bias"),
        },
    }

    leftover = c.remaining()
    if leftover:
        raise ValueError(f"unconsumed reference checkpoint keys: {leftover}")
    return {"encoder": encoder, "decoder": decoder}


def load_torch_checkpoint(path: str, **kwargs) -> dict:
    """Load a reference ``.pth`` (either a bare state dict or the
    {'model_state_dict': ...} training checkpoint; reference utils.py:52-71)
    and convert it. Requires torch (CPU) to deserialize."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    state = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    state_np = {k: v.detach().cpu().numpy() for k, v in state.items()}
    return convert_torch_state_dict(state_np, **kwargs)
