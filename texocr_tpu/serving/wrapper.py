"""Inference wrapper: PIL image -> (tokens, LaTeX string).

The web-app-facing facade, equivalent to the reference's TeXOCRWrapper
(reference ocr_model.py:69-110): loads the tokenizer and a checkpoint (either
a reference PyTorch .pth via the conversion shim, or a native orbax
directory), adapts to the checkpoint's decoder pos-embedding length
(ocr_model.py:84-88), and serves ``__call__(img) -> (tokens, latex)``.

TPU-first serving details:
- Preprocessing pads each image up to a small set of bucket canvases
  (h mult 16, w mult 64 — the render rule) so the jitted
  encode+decode compiles once per bucket and is reused.
- Decode is the KV-cached jitted loop (models/generate.py), greedy by
  default; ``mode='sample'`` reproduces the reference's top-k/temperature
  sampling (default temp 0.3, ocr_model.py:94); ``mode='beam'`` runs the
  ancestry-indexed beam search (models/beam.py, BASELINE config #4).
- The reference runs its RandomAffine augmentation at inference time
  (a defect; dataset.py:365-371 via ocr_model.py:97); we don't.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from texocr_tpu.config import ModelConfig, with_defaults
from texocr_tpu.models import OCRModel
from texocr_tpu.models.generate import greedy_decode, sampled_decode
from texocr_tpu.tokenizer import RegexBPETokenizer
from texocr_tpu.utils import pad_to_multiple, process_output


class TexOCR:
    """config dict (reference format: tokenizer_path, model_path, model/token
    hyperparams) -> callable OCR engine."""

    def __init__(self, config: dict, params=None):
        config = with_defaults(dict(config))
        self.tokenizer = RegexBPETokenizer()
        self.tokenizer.load(config["tokenizer_path"])
        config["vocab_size"] = self.tokenizer.vocab_size

        model_path = config.get("model_path")
        loaded = None
        if params is None and model_path:
            if str(model_path).endswith((".pth", ".pt")):
                from texocr_tpu.checkpoint import load_torch_checkpoint

                loaded = load_torch_checkpoint(
                    model_path,
                    num_encoder_layers=config["encoder"]["num_layers"],
                    num_decoder_layers=config["decoder"]["num_layers"],
                    resnet_depths=tuple(
                        config["encoder"].get("resnet_depths", (2, 4, 6))
                    ),
                    glu=config.get("glu", True),
                )
            else:
                from texocr_tpu.checkpoint.orbax_io import load_checkpoint

                loaded = load_checkpoint(model_path)["params"]
            # Adopt the checkpoint's pos-embedding length (the reference
            # wrapper rebuilds the embedding to match; ocr_model.py:84-88).
            pos_len = loaded["decoder"]["pos_embedding"]["embedding"].shape[0]
            config["max_length"] = int(pos_len)
        elif "max_length" not in config:
            config["max_length"] = 512

        self.config = config
        self.model = OCRModel(ModelConfig.from_dict(config))

        if params is not None:
            self.params = {"params": params} if "params" not in params else params
        elif loaded is not None:
            self.params = {"params": jax.tree.map(jnp.asarray, loaded)}
        else:  # random init (useful for tests/benchmarks)
            img = jnp.zeros((1, 32, 64, 1), jnp.float32)
            lbl = jnp.full((1, 8), self.model.config.pad_token, jnp.int32)
            self.params = self.model.init(jax.random.PRNGKey(0), img, lbl)

        self._compiled: Dict[Tuple, object] = {}
        self._rng = jax.random.PRNGKey(config.get("seed", 42))

    # -- jit cache per (canvas, max_len, mode) -------------------------------

    def _decode_fn(self, canvas: Tuple[int, int], max_len: int, mode: str,
                   beam_size: int = 5):
        key = (canvas, max_len, mode, beam_size if mode == "beam" else None)
        if key not in self._compiled:
            model, cfg = self.model, self.model.config

            def to_model_input(images_u8):
                # uint8 white-background canvases cross the host->device link
                # (4x less traffic than float32); scale+invert fuses into the
                # encoder's first conv on device.
                return 1.0 - images_u8.astype(jnp.float32) / 255.0

            if mode == "greedy":

                @jax.jit
                def fn(params, images_u8):
                    images = to_model_input(images_u8)
                    enc = model.apply(params, images, method=OCRModel.encode)
                    return greedy_decode(
                        model, params, enc,
                        bos_token=cfg.bos_token, eos_token=cfg.eos_token,
                        pad_token=cfg.pad_token, max_len=max_len,
                    )

            elif mode == "beam":
                from texocr_tpu.models.beam import beam_decode

                @jax.jit
                def fn(params, images_u8):
                    images = to_model_input(images_u8)
                    enc = model.apply(params, images, method=OCRModel.encode)
                    return beam_decode(
                        model, params, enc,
                        bos_token=cfg.bos_token, eos_token=cfg.eos_token,
                        pad_token=cfg.pad_token, max_len=max_len,
                        beam_size=beam_size,
                    )

            else:

                @jax.jit
                def fn(params, images_u8, rng, temp):
                    images = to_model_input(images_u8)
                    enc = model.apply(params, images, method=OCRModel.encode)
                    return sampled_decode(
                        model, params, enc, rng,
                        bos_token=cfg.bos_token, eos_token=cfg.eos_token,
                        pad_token=cfg.pad_token, max_len=max_len, temp=temp,
                    )

            self._compiled[key] = fn
        return self._compiled[key]

    # -- preprocessing ---------------------------------------------------------

    def preprocess(self, img) -> np.ndarray:
        """PIL image -> (1, H', W', 1) uint8 white-background bucket canvas.

        Stays uint8 on the host; grayscale+invert+scale runs fused on device
        inside the jitted decode function.
        """
        from PIL import Image

        if img.mode != "L":
            img = img.convert("L")
        w, h = img.size
        max_h, max_w = self.model.config.encoder.img_size
        ch = min(pad_to_multiple(max(h, 16), 16), max_h)
        cw = min(pad_to_multiple(max(w, 64), 64), max_w)
        if h > ch or w > cw:  # downscale oversized inputs to the max canvas
            scale = min(ch / h, cw / w)
            img = img.resize(
                (max(1, int(w * scale)), max(1, int(h * scale))), Image.BILINEAR
            )
            w, h = img.size
            ch = pad_to_multiple(max(h, 16), 16)
            cw = pad_to_multiple(max(w, 64), 64)
        canvas = np.full((ch, cw), 255, np.uint8)
        top, left = (ch - h) // 2, (cw - w) // 2
        canvas[top : top + h, left : left + w] = np.asarray(img)
        return canvas[None, ..., None]

    # -- inference --------------------------------------------------------------

    def __call__(
        self,
        img,
        max_len: int = 350,
        temp: float = 0.3,
        mode: str = "greedy",
        beam_size: int = 5,
    ) -> Tuple[list, str]:
        """Returns (token id list up to and excluding EOS, LaTeX string) —
        the reference wrapper's surface (ocr_model.py:94-110).
        ``mode``: 'greedy' | 'beam' | 'sample'."""
        batch = self.preprocess(img)
        tokens = self.generate_batch(
            batch, max_len=max_len, temp=temp, mode=mode, beam_size=beam_size
        )
        return self.postprocess(np.asarray(tokens)[0])

    def generate_batch(self, images: np.ndarray, max_len=350, temp=0.3,
                       mode="greedy", beam_size=5):
        canvas = tuple(images.shape[1:3])
        fn = self._decode_fn(canvas, max_len, mode, beam_size=beam_size)
        x = jnp.asarray(images)
        if mode in ("greedy", "beam"):
            return fn(self.params, x)
        self._rng, sub = jax.random.split(self._rng)
        return fn(self.params, x, sub, jnp.float32(temp))

    def postprocess(self, row: np.ndarray) -> Tuple[list, str]:
        cfg = self.model.config
        ids = []
        for t in row.tolist():
            if t == cfg.eos_token or t == cfg.pad_token:
                break
            ids.append(int(t))
        out_str = process_output(self.tokenizer.decode(ids))
        return ids, out_str
