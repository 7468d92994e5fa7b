"""Reference-format .pth checkpoint loading end to end.

Builds a torch state dict with the reference's exact key layout from the
committed npz golden, saves it with torch.save, and loads it through the
serving wrapper's .pth path (conversion shim + pos-embedding adaptation)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens")

CONFIG = {
    "tokenizer_path": None,  # filled in fixture
    "img_size": (48, 128),
    "patch_size": 16,
    "glu": True,
    "bos_token": 48,
    "eos_token": 47,
    "trg_pad_idx": 49,
    "dtype": "float32",
    "encoder": {
        "n_channels": 1, "embed_dim": 64, "num_layers": 2, "heads": 2,
        "resnet_depths": (1, 1, 1), "resnet_channels": (128, 128, 128),
        "stem_channels": 32,
    },
    "decoder": {
        "embed_dim": 64, "num_layers": 2, "heads": 2, "cross_attend": True,
        "dropout": 0.0, "exp_factor": 4,
    },
}


@pytest.fixture()
def pth_path(tmp_path):
    state = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in np.load(os.path.join(GOLDEN, "model_state.npz")).items()
    }
    path = tmp_path / "model.pth"
    torch.save(state, str(path))
    return str(path)


def test_load_torch_checkpoint(pth_path):
    from texocr_tpu.checkpoint import load_torch_checkpoint

    params = load_torch_checkpoint(
        pth_path,
        num_encoder_layers=2,
        num_decoder_layers=2,
        resnet_depths=(1, 1, 1),
    )
    assert params["decoder"]["pos_embedding"]["embedding"].shape == (32, 64)


def test_training_checkpoint_blob(pth_path, tmp_path):
    """The {model_state_dict, optimizer_state_dict, epoch} training blob
    (reference utils.py:52-61) loads too."""
    from texocr_tpu.checkpoint import load_torch_checkpoint

    blob = {
        "model_state_dict": torch.load(pth_path, weights_only=True),
        "optimizer_state_dict": {},
        "epoch": 3,
    }
    path = tmp_path / "checkpoint_e3.pth"
    torch.save(blob, str(path))
    params = load_torch_checkpoint(
        str(path),
        num_encoder_layers=2,
        num_decoder_layers=2,
        resnet_depths=(1, 1, 1),
    )
    assert "encoder" in params and "decoder" in params


def test_wrapper_pth_end_to_end(pth_path):
    """TexOCR wrapper: .pth in, greedy decode out, matching the committed
    golden model's encoder output."""
    from PIL import Image

    from texocr_tpu.serving import TexOCR
    from texocr_tpu.tokenizer import RegexBPETokenizer

    # Tokenizer matching the golden model's vocab (50, specials 49/48/47 —
    # the wrapper takes vocab_size from the tokenizer, ocr_model.py:78).
    tok = RegexBPETokenizer(
        vocab_size=50,
        special_tokens={"<PAD>": 49, "<BOS>": 48, "<EOS>": 47},
    )
    import tempfile, os as _os

    tok_path = _os.path.join(tempfile.mkdtemp(), "tok50.txt")
    tok.save(tok_path)

    cfg = dict(CONFIG)
    cfg["tokenizer_path"] = tok_path
    cfg["model_path"] = pth_path
    engine = TexOCR(cfg)
    # max_length adopted from the checkpoint's pos-embedding table.
    assert engine.model.config.decoder.max_length == 32
    img = Image.fromarray(np.full((40, 100), 255, np.uint8))
    tokens, latex = engine(img, max_len=5)
    assert isinstance(latex, str)
