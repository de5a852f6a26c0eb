"""Model zoo: backbones × detection heads (the reference's L4 layer).

Reference surface covered (SURVEY.md §2.5):
- ``lib/modeling/model_builder.py`` -> :mod:`ssds_tpu.models.builder`
- ``lib/modeling/nets/``            -> :mod:`ssds_tpu.models.backbones`
- ``lib/modeling/ssds/``            -> :mod:`ssds_tpu.models.heads`

Wiring contract (preserved from the reference): a backbone is a list of
layers plus the indices/channel-counts in ``cfg.MODEL.FEATURE_LAYER``; a
head builder composes with ANY backbone through that tuple.
"""

from ssds_tpu.models.builder import create_model, networks_map, ssds_map
