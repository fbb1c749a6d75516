"""HyperSeg v0_1: oldest variant (PASCAL VOC HyperSeg-L, EfficientNet-B3).

Mirrors hyperseg/models/hyperseg_v0_1.py: the weight mapper itself emits a
list of per-level weight tensors through a multi-head output conv
(Conv2dMulti); decoder blocks are MetaPatch compositions consuming raw
weights."""

from __future__ import annotations

from hyperseg_tpu.models.backbones.efficientnet import EfficientNet
from hyperseg_tpu.models.decoder import MultiScaleDecoderV0
from hyperseg_tpu.models.weight_mapper import WeightMapperV0
from hyperseg_tpu.models.hypergen import HyperGen


def build_hypergen(backbone: EfficientNet, *, num_classes=3, kernel_sizes=3,
                   level_layers=1, expand_ratio=1, with_out_fc=False,
                   decoder_dropout=None, inference_hflip=False,
                   inference_gather="mean", wm_levels=2, down_groups=1,
                   flat_groups=1, weight_groups=1, avg_pool=True,
                   in_nc=3, decoder_remat=False) -> HyperGen:
    feat_channels = [in_nc] + backbone.feat_channels[:-1]
    decoder = MultiScaleDecoderV0(
        feat_channels, num_classes=num_classes, kernel_sizes=kernel_sizes,
        level_layers=level_layers, expand_ratio=expand_ratio,
        with_out_fc=with_out_fc, out_kernel_size=1, dropout=decoder_dropout,
        remat=decoder_remat)
    weight_mapper = WeightMapperV0(
        backbone.feat_channels[-1], decoder.param_groups, levels=wm_levels,
        down_groups=down_groups, flat_groups=flat_groups,
        weight_groups=weight_groups, avg_pool=avg_pool)
    return HyperGen(backbone, decoder, weight_mapper,
                    inference_hflip=inference_hflip,
                    inference_gather=inference_gather)


def hyperseg_efficientnet(model_name, pretrained=False, levels=3,
                          down_groups=1, flat_groups=1, weight_groups=1,
                          avg_pool=True, weights_path=None,
                          backbone_remat=False, **kwargs) -> HyperGen:
    """Factory mirroring hyperseg_v0_1.hyperseg_efficientnet (:409-424).

    Note the reference passes no out_feat_scale here, so the backbone's
    default 0.25 compression applies (efficientnet_utils.py:508-510)."""
    backbone = EfficientNet(model_name, out_feat_scale=0.25, head=None,
                            return_features=True, remat=backbone_remat)
    model = build_hypergen(backbone, wm_levels=levels, down_groups=down_groups,
                           flat_groups=flat_groups, weight_groups=weight_groups,
                           avg_pool=avg_pool, **kwargs)
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
    smoke_main("hyperseg_tpu.models.hyperseg_v0_1.hyperseg_efficientnet('efficientnet-b3', levels=3, kernel_sizes=(1,1,3,3,3,3), expand_ratio=2, weight_groups=16, num_classes=21)")
