"""Generate numeric-parity goldens from the PyTorch reference model.

Builds a SMALL instance of the reference architecture (same code paths, fewer
channels/layers so the committed golden stays a few MB), runs fixed inputs
through it in eval mode / float32, and saves:
  - the torch state_dict (npz, torch key names)
  - backbone features, encoder output, decoder logits, loss
  - a capped greedy (argmax) generation trace with per-step logits

Run once with /root/reference mounted; tests compare our converted-weight
model against these without importing the reference.
"""

import os
import sys
import types
from functools import partial

import numpy as np

REF_PARENT = "/tmp/refpkg"
GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

# -- make the reference importable as the TeXOCR package --------------------
os.makedirs(REF_PARENT, exist_ok=True)
link = os.path.join(REF_PARENT, "TeXOCR")
if not os.path.exists(link):
    os.symlink("/root/reference", link)
sys.path.insert(0, REF_PARENT)

# torchvision is not installed; stub the handful of symbols imported at
# module scope (dataset.py builds img_transform on import — we never call it).
tv = types.ModuleType("torchvision")
tf = types.ModuleType("torchvision.transforms")


class _IM:
    BILINEAR = "bilinear"


tf.InterpolationMode = _IM
tf.Compose = lambda x: x
tf.RandomAffine = lambda **kw: None
tf.ToTensor = lambda: None
tf.Grayscale = lambda **kw: None
tv.transforms = tf
sys.modules["torchvision"] = tv
sys.modules["torchvision.transforms"] = tf

import torch  # noqa: E402

from TeXOCR.model.encoder import HybridEmbedResNet, VisionEncoder  # noqa: E402
from TeXOCR.model.resnet import ResNetV2  # noqa: E402
from TeXOCR.model.decoder import Transformer, AutoRegressiveDecoder  # noqa: E402
from TeXOCR.model.attention import DecoderLayers  # noqa: E402
from TeXOCR.model.ocr_model import OCRModel  # noqa: E402

# Small-but-faithful config: exercises every code path (hybrid embed, shared
# norm, GLU out-proj, inner-dim != embed-dim, cross-attn, SAME pads).
CFG = dict(
    img_size=(48, 128),
    patch_size=16,
    vocab_size=50,
    max_length=32,
    embed_dim=64,
    enc_layers=2,
    dec_layers=2,
    heads=2,
    depths=[1, 1, 1],
    channels=[128, 128, 128],
    stem_channels=32,
    pad=49,
    bos=48,
    eos=47,
)


def build_model():
    torch.manual_seed(1234)
    backbone = ResNetV2(
        depths=CFG["depths"],
        channels=CFG["channels"],
        in_channels=1,
        stem_channels=CFG["stem_channels"],
    )
    encoder = VisionEncoder(
        img_size=CFG["img_size"],
        patch_size=CFG["patch_size"],
        in_channels=1,
        embed_dim=CFG["embed_dim"],
        num_layers=CFG["enc_layers"],
        heads=CFG["heads"],
        embed_layer=partial(HybridEmbedResNet, backbone_net=backbone),
    )
    dec_layers = DecoderLayers(
        embed_dim=CFG["embed_dim"],
        num_layers=CFG["dec_layers"],
        heads=CFG["heads"],
        cross_attend=True,
        glu=True,
        exp_factor=4,
    )
    transformer = Transformer(
        vocab_size=CFG["vocab_size"],
        max_len=CFG["max_length"],
        attn_layers=dec_layers,
        dropout=0.0,
    )
    decoder = AutoRegressiveDecoder(net=transformer)
    model = OCRModel(
        encoder,
        decoder,
        bos_token=CFG["bos"],
        eos_token=CFG["eos"],
        trg_pad_idx=CFG["pad"],
        device=torch.device("cpu"),
    )
    model.eval()
    return model


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    model = build_model()

    rng = np.random.default_rng(7)
    b = 2
    images = rng.normal(size=(b, 1, *CFG["img_size"])).astype(np.float32)
    # Targets with trailing pads: row 0 length 10, row 1 length 7 (then pad).
    t = 12
    targets = rng.integers(0, 40, size=(b, t)).astype(np.int64)
    targets[:, 0] = CFG["bos"]
    targets[0, 9] = CFG["eos"]
    targets[0, 10:] = CFG["pad"]
    targets[1, 6] = CFG["eos"]
    targets[1, 7:] = CFG["pad"]

    img_t = torch.from_numpy(images)
    trg_t = torch.from_numpy(targets)

    with torch.no_grad():
        feats = model.encoder.patch_embed.backbone_net(img_t)
        enc = model.encoder(img_t)
        trg_mask = model.make_trg_mask(trg_t)
        x_in, x_out = trg_t[:, :-1], trg_t[:, 1:]
        logits = model.decoder.net(x_in, mask=trg_mask[:, :-1], enc=enc)
        loss = torch.nn.functional.cross_entropy(
            logits.transpose(1, 2), x_out
        )

        # Greedy argmax generation trace (capped): replicate the reference
        # loop (decoder.py:97-116) with argmax instead of sampling so it is
        # deterministic and comparable.
        steps = 16
        out_tokens = torch.full((b, 1), CFG["bos"], dtype=torch.long)
        mask = torch.ones_like(out_tokens, dtype=torch.bool)
        step_logits = []
        for _ in range(steps):
            lg = model.decoder.net(out_tokens, mask=mask, enc=enc)[:, -1, :]
            step_logits.append(lg.numpy().copy())
            nxt = lg.argmax(-1, keepdim=True)
            out_tokens = torch.cat([out_tokens, nxt], dim=-1)
            mask = torch.nn.functional.pad(mask, (0, 1), value=True)

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(os.path.join(GOLDEN, "model_state.npz"), **state)
    np.savez_compressed(
        os.path.join(GOLDEN, "model_io.npz"),
        images=images,
        targets=targets,
        backbone_feats=feats.numpy(),
        enc_out=enc.numpy(),
        dec_logits=logits.numpy(),
        loss=np.float32(loss.item()),
        greedy_tokens=out_tokens.numpy(),
        greedy_step_logits=np.stack(step_logits, 1),  # (B, steps, V)
    )
    n_params = sum(v.size for v in state.values())
    print(f"saved goldens: {n_params} params, enc_out {tuple(enc.shape)}, "
          f"loss {loss.item():.6f}")


if __name__ == "__main__":
    main()
