"""ActiveCoSLAM: uncertainty (beta) head + information-gain keyframe selection.

TPU-native re-implementation of the reference's research variant
(reference: ActiveCoSLAM/ — ac_decoder.py ColorSDFNet_v3,
ac_scene_rep.py uncertainty rendering, ac_coslam.py info-gain keyframe
selection over a holdout window).
"""

from .scene_rep import ActiveJointEncoding  # noqa: F401
from .slam import ActiveCoSLAM  # noqa: F401
