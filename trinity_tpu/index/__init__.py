"""Index lifecycle layer (SURVEY §1 L1-L2): segment format, build, open, merge."""

from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.index.format import FieldStatistics, SegmentData

__all__ = ["SegmentIndexSession", "SegmentData", "FieldStatistics"]
