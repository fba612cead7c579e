from .stutter import StutterModel
from .base_quality import BaseQuality
from .alignment_model import (
    MAX_HOMOP_LEN,
    LOG_INS_TO_INS,
    LOG_INS_TO_MATCH,
    LOG_DEL_TO_DEL,
    LOG_DEL_TO_MATCH,
    LOG_MATCH_TO_MATCH,
    LOG_MATCH_TO_INS,
    LOG_MATCH_TO_DEL,
)
