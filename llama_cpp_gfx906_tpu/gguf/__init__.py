"""GGUF format layer: constants, block-quant codecs, reader, writer."""

from .constants import (  # noqa: F401
    GGML_BLOCK_SIZES,
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    QK_K,
    FileType,
    GGMLType,
    GGUFValueType,
    Keys,
    RopeScalingType,
    TokenType,
    type_size_bytes,
)
from .quants import dequantize, quantize, supported_dequant_types, supported_quant_types  # noqa: F401
from .reader import GGUFModelReader, GGUFReader, TensorInfo  # noqa: F401
from .writer import GGUFWriter, write_split  # noqa: F401
