"""Neural building blocks: fusion layers, image encoder, point blocks.

Reference parity targets (SURVEY.md §2.1):
- F1 FusionLayer / PerceiverIO -> fusion.py
- F2 ConvPosEnc (LCPE)         -> fusion.py
- F3 ImageEncoder (ResNet34/8) -> resnet.py
"""

from gmf_tpu.nn.fusion import FusionLayer, ConvPosEnc, Attention, FeedForward
from gmf_tpu.nn.resnet import ImageEncoder, ResNet
