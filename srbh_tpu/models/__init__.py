"""Flax model zoo."""
from srbh_tpu.models.edsr import EDSR, ResBlock
from srbh_tpu.models.efficientnet import EfficientNetEncoder
from srbh_tpu.models.espcn import ESPCN
from srbh_tpu.models.height_model import (
    SRRegressClsFeature,
    SRRegressClsFeatureGeo,
    SRRegressClsFeatureRefine,
    SRRegressClsNosuper,
)
from srbh_tpu.models.hrfuse import (
    GeoNet,
    HRFeature,
    HRFuse,
    HRFuseResidual,
    HRFuseX2,
    HRUpsample,
    RefineResidual,
)
from srbh_tpu.models.discriminators import UNetDiscriminatorSN, VGGStyleDiscriminator
from srbh_tpu.models.layers import BasicBlock, ConvBNAct, PixelShuffleUpsampler, param_count
from srbh_tpu.models.rrdbnet import RRDB, RRDBNet, RRDBNetSimple, ResidualDenseBlock
from srbh_tpu.models.sr_regress import SRRegress, SRRegressClsDecision, SRRegressClsEDSR
from srbh_tpu.models.swinir import SwinIR, SwinTransformerBlock, WindowAttention
from srbh_tpu.models.unet_decoder import UnetDecoder
from srbh_tpu.models.vgg import VGG19Features, load_torchvision_vgg19
from srbh_tpu.models.clip import (
    CLIPVisionTransformer,
    MAPVisionTransformer,
    convert_clip_visual,
    convert_siglip_visual,
)
from srbh_tpu.models.lpips import LPIPS, AlexNetFeatures, convert_lpips_alex

__all__ = [
    "EDSR", "ResBlock", "EfficientNetEncoder", "ESPCN",
    "SRRegressClsFeature", "SRRegressClsFeatureGeo",
    "SRRegressClsFeatureRefine", "SRRegressClsNosuper",
    "SRRegress", "SRRegressClsDecision", "SRRegressClsEDSR",
    "GeoNet", "HRFeature", "HRFuse", "HRFuseResidual", "HRFuseX2",
    "HRUpsample", "RefineResidual",
    "UNetDiscriminatorSN", "VGGStyleDiscriminator",
    "SwinIR", "SwinTransformerBlock", "WindowAttention",
    "VGG19Features", "load_torchvision_vgg19",
    "BasicBlock", "ConvBNAct", "PixelShuffleUpsampler", "param_count",
    "RRDB", "RRDBNet", "RRDBNetSimple", "ResidualDenseBlock", "UnetDecoder",
    "CLIPVisionTransformer", "MAPVisionTransformer", "convert_clip_visual",
    "convert_siglip_visual",
    "LPIPS", "AlexNetFeatures", "convert_lpips_alex",
]
