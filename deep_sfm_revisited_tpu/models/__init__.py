"""Task networks + composite SfM model (reference layers L3-L4, SURVEY.md §1)."""

from deep_sfm_revisited_tpu.models.submodules import SPPFeatureExtractor  # noqa: F401
from deep_sfm_revisited_tpu.models.psnet import PSNet  # noqa: F401
from deep_sfm_revisited_tpu.models.raft import RAFT  # noqa: F401
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet  # noqa: F401
