"""HyperSeg v0_2: v1_0 clone that splits the signal with the buggy legacy
divide_feature (hyperseg_v0_2.py:199,764-813). Kept to load older checkpoints
whose arch strings name hyperseg.models.hyperseg_v0_2 (SURVEY.md §2.2)."""

from __future__ import annotations

from hyperseg_tpu.models.backbones.efficientnet import EfficientNet
from hyperseg_tpu.models import hyperseg_v1_0 as _v1


def build_hypergen(backbone: EfficientNet, **kwargs):
    return _v1.build_hypergen(backbone, legacy_divide=True, **kwargs)


def hyperseg_efficientnet(model_name, pretrained=False, out_feat_scale=0.25,
                          levels=3, weights_path=None, backbone_remat=False,
                          **kwargs):
    backbone = EfficientNet(model_name, out_feat_scale=out_feat_scale,
                            head=None, return_features=True,
                            remat=backbone_remat)
    model = build_hypergen(backbone, wm_levels=levels, **kwargs)
    if pretrained and weights_path is None:
        from hyperseg_tpu.models.backbones.pretrained import (
            stage_pretrained_backbone)
        stage_pretrained_backbone(model, model_name, pretrained)
    if weights_path is not None:
        from hyperseg_tpu.core import checkpoint as ckpt
        model._pretrained_params, _ = ckpt.load_params(weights_path)
    return model


if __name__ == "__main__":
    from hyperseg_tpu.models.hypergen import smoke_main
    smoke_main("hyperseg_tpu.models.hyperseg_v0_2.hyperseg_efficientnet('efficientnet-b1', levels=2, kernel_sizes=[1,1,1,3,3], level_channels=[64,32,16,16,16], expand_ratio=2, weight_groups=[32,16,8,16,4], num_classes=19)")
