from . import losses
from .gru import BiGRUEncoder, build_bigru
from .m_resnet import ModifiedResNet, build_m_resnet
from .model import TextReIDModel, build_model, build_textual_model, build_visual_model
from .resnet import ResNet, build_resnet
from .text_transformer import TextTransformer, build_text_transformer

__all__ = [
    "losses",
    "BiGRUEncoder",
    "build_bigru",
    "ModifiedResNet",
    "build_m_resnet",
    "ResNet",
    "build_resnet",
    "TextReIDModel",
    "TextTransformer",
    "build_model",
    "build_text_transformer",
    "build_visual_model",
    "build_textual_model",
]
