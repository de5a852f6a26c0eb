"""Backbone zoo: builders returning flat layer-spec lists.

Wiring contract (reference ``lib/modeling/model_builder.py`` networks_map,
SURVEY.md §2.5): a backbone is "a list of layers + the indices/channel-counts
in ``cfg.MODEL.FEATURE_LAYER``". Here each builder returns a tuple of
``LayerSpec`` (zero-arg callables producing flax modules); integer
FEATURE_LAYER entries index into this list, so the list layout IS the API —
documented per-backbone in each module.
"""

from ssds_tpu.models.backbones.darknet import darknet_19, darknet_53
from ssds_tpu.models.backbones.mobilenet import (
    mobilenet_v1,
    mobilenet_v1_025,
    mobilenet_v1_050,
    mobilenet_v1_075,
    mobilenet_v2,
    mobilenet_v2_025,
    mobilenet_v2_050,
    mobilenet_v2_075,
)
from ssds_tpu.models.backbones.resnet import resnet_18, resnet_34, resnet_50, resnet_101
from ssds_tpu.models.backbones.vgg import vgg16

networks_map = {
    "vgg16": vgg16,
    "resnet_18": resnet_18,
    "resnet_34": resnet_34,
    "resnet_50": resnet_50,
    "resnet_101": resnet_101,
    "mobilenet_v1": mobilenet_v1,
    "mobilenet_v1_075": mobilenet_v1_075,
    "mobilenet_v1_050": mobilenet_v1_050,
    "mobilenet_v1_025": mobilenet_v1_025,
    "mobilenet_v2": mobilenet_v2,
    "mobilenet_v2_075": mobilenet_v2_075,
    "mobilenet_v2_050": mobilenet_v2_050,
    "mobilenet_v2_025": mobilenet_v2_025,
    "darknet_19": darknet_19,
    "darknet_53": darknet_53,
}
