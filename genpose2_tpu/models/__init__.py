from genpose2_tpu.models.layers import (
    Dense,
    GaussianFourierProjection,
    MLP,
    SharedMLP,
    zero_init,
)
from genpose2_tpu.models.pointnet2 import (
    PointNet2ClsMSG,
    PointNet2ClsMSGFus,
    SetAbstractionMSG,
)
from genpose2_tpu.models.pointnet import PointNetFeat
from genpose2_tpu.models.scorenet import PoseScoreNet
from genpose2_tpu.models.energynet import PoseEnergyNet
from genpose2_tpu.models.scalenet import ScaleNet
from genpose2_tpu.models.img_encoder import ImgEncoder
from genpose2_tpu.models.vit import ViT, vit_s16
from genpose2_tpu.models.posenet import GFObjectPose

__all__ = [
    "Dense",
    "GaussianFourierProjection",
    "MLP",
    "SharedMLP",
    "zero_init",
    "PointNet2ClsMSG",
    "PointNet2ClsMSGFus",
    "SetAbstractionMSG",
    "PointNetFeat",
    "PoseScoreNet",
    "PoseEnergyNet",
    "ScaleNet",
    "ImgEncoder",
    "ViT",
    "vit_s16",
    "GFObjectPose",
]
