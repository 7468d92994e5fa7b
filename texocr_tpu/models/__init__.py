"""Model zoo: hybrid ResNet+ViT encoder, causal cross-attending decoder."""

from texocr_tpu.models.attention import AttentionStack, MultiHeadAttention  # noqa: F401
from texocr_tpu.models.decoder import TransformerDecoder  # noqa: F401
from texocr_tpu.models.encoder import VisionEncoder  # noqa: F401
from texocr_tpu.models.ocr_model import OCRModel, create_model  # noqa: F401
from texocr_tpu.models.resnet import ResNetV2  # noqa: F401
