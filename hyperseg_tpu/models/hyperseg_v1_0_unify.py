"""HyperSeg v1_0_unify: unified-weight-generation variant (Cityscapes-S).

Mirrors hyperseg/models/hyperseg_v1_0_unify.py: same HyperGen topology as
v1_0, but the decoder hoists signal->weights into a weight_blocks list with a
fused block for levels >= unify_level (see MultiScaleDecoderUnify)."""

from __future__ import annotations

from hyperseg_tpu.models.backbones.efficientnet import EfficientNet
from hyperseg_tpu.models.decoder import MultiScaleDecoderUnify
from hyperseg_tpu.models.weight_mapper import WeightMapperV1
from hyperseg_tpu.models.hypergen import HyperGen


def build_hypergen(backbone: EfficientNet, *, num_classes=3, kernel_sizes=3,
                   level_layers=1, level_channels=None, expand_ratio=1,
                   weight_groups=1, with_out_fc=False, decoder_groups=1,
                   decoder_dropout=None, inference_hflip=False,
                   inference_gather="mean", coords_res=None, unify_level=None,
                   wm_levels=3, in_nc=3, decoder_remat=False) -> HyperGen:
    feat_channels = [in_nc] + backbone.feat_channels[:-1]
    decoder = MultiScaleDecoderUnify(
        feat_channels, backbone.feat_channels[-1], num_classes=num_classes,
        kernel_sizes=kernel_sizes, level_layers=level_layers,
        level_channels=level_channels, expand_ratio=expand_ratio,
        groups=decoder_groups, weight_groups=weight_groups,
        with_out_fc=with_out_fc, dropout=decoder_dropout,
        coords_res=coords_res, unify_level=unify_level, remat=decoder_remat)
    weight_mapper = WeightMapperV1(backbone.feat_channels[-1],
                                   decoder.param_groups, levels=wm_levels)
    return HyperGen(backbone, decoder, weight_mapper,
                    inference_hflip=inference_hflip,
                    inference_gather=inference_gather)


def hyperseg_efficientnet(model_name, pretrained=False, out_feat_scale=0.25,
                          levels=3, weights_path=None, backbone_remat=False,
                          **kwargs) -> HyperGen:
    """Factory mirroring hyperseg_v1_0_unify.hyperseg_efficientnet."""
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
    smoke_main("hyperseg_tpu.models.hyperseg_v1_0_unify.hyperseg_efficientnet('efficientnet-b1', levels=2, kernel_sizes=[1,1,1,3,3], level_channels=[32,16,8,8,8], expand_ratio=2, weight_groups=[32,16,8,16,4], unify_level=4, num_classes=19)")
