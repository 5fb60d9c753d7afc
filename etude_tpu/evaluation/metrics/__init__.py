from .wpd import WPDCalculator
from .rgc import RGCCalculator
from .ipe import IPECalculator
from .onset_f1 import onset_f1
from .base_metric import get_onsets_from_file

__all__ = ["WPDCalculator", "RGCCalculator", "IPECalculator", "get_onsets_from_file", "onset_f1"]
