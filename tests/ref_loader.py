"""Import the PyTorch reference (/root/reference) as the ``TeXOCR`` package.

Used by the full-scale parity test (and mirrored by tools/gen_model_goldens.py)
to build reference models in-process instead of committing a ~95 MB production
state dict. Tests that use this must skip when the reference tree is absent.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "model"))


def import_reference():
    """Make /root/reference importable as ``TeXOCR`` and return the package.

    Stubs torchvision (not installed; the reference's dataset.py builds
    img_transform at import time — never called here).
    """
    ref_parent = "/tmp/refpkg"
    os.makedirs(ref_parent, exist_ok=True)
    link = os.path.join(ref_parent, "TeXOCR")
    if not os.path.exists(link):
        os.symlink(REFERENCE_DIR, link)
    if ref_parent not in sys.path:
        sys.path.insert(0, ref_parent)

    if "torchvision" not in sys.modules:
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

    import TeXOCR  # noqa: F401

    return sys.modules["TeXOCR"]
